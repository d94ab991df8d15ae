package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** POSIX ustar / GNU tar shard reader — the WebDataset container:
  * large-scale multimodal training corpora ship as .tar shards whose
  * members group by basename stem (`0001.jpg` + `0001.cls` +
  * `0001.json` = one sample). One shard = one task, same ingest
  * contract as [[Warc]].
  *
  * Pure byte-layout decode (no library): 512-byte headers — name
  * (100, NUL-terminated), size (12, octal; GNU base-256 for >8 GiB
  * members), typeflag (156), ustar prefix field (345+155) — data
  * rounded up to 512, archive ends at two zero blocks. GNU 'L'
  * long-name records are applied to the following member. Only
  * regular files ('0' or NUL) yield entries; directories and other
  * types are skipped. TOTAL on arbitrary bytes: malformed headers end
  * the walk with the entries parsed so far (the Warc robustness
  * contract).
  */
object Tar {

  /** One regular-file member: path inside the shard + raw bytes. */
  case class TarEntry(name: String, size: Long, data: Array[Byte])

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    // GNU base-256 extension: high bit of the first byte set
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7f).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      return v
    }
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i)
      if (c >= '0' && c <= '7') v = (v << 3) | (c - '0')
      else if (v > 0 || (c != ' ' && c != 0)) i = end // terminator/garbage
      i += 1
    }
    v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** All regular-file members of a tar shard (empty on garbage). */
  def entries(b: Array[Byte]): Seq[TarEntry] = {
    if (b == null) return Nil
    val out = Seq.newBuilder[TarEntry]
    var p = 0
    var pendingLongName: String = null
    var done = false
    while (!done && p + 512 <= b.length) {
      // end-of-archive: a zero block
      var allZero = true
      var z = 0
      while (allZero && z < 512) { if (b(p + z) != 0) allZero = false; z += 1 }
      if (allZero) done = true
      else {
        val size = parseOctal(b, p + 124, 12)
        val typeflag = b(p + 156)
        if (size < 0 || size > b.length.toLong) done = true // header lies
        else {
          val nameRaw = cstr(b, p, 100)
          val prefix =
            if (cstr(b, p + 257, 6).startsWith("ustar"))
              cstr(b, p + 345, 155)
            else ""
          val name =
            if (pendingLongName != null) pendingLongName
            else if (prefix.nonEmpty) s"$prefix/$nameRaw"
            else nameRaw
          pendingLongName = null
          val dataStart = p + 512
          // a member whose data is cut off is DROPPED, not emitted
          // partially — same contract as [[parseStream]]
          if (dataStart.toLong + size > b.length) done = true
          else {
            if (typeflag == 'L') {
              // GNU long name: the data block names the NEXT member
              pendingLongName = cstr(b, dataStart, size.toInt)
            } else if ((typeflag == '0' || typeflag == 0) && name.nonEmpty) {
              out += TarEntry(name, size, java.util.Arrays.copyOfRange(
                b, dataStart, dataStart + size.toInt))
            } // directories ('5'), links, pax headers: skipped
            val padded = ((size + 511L) / 512L) * 512L
            if (dataStart.toLong + padded > Int.MaxValue) done = true
            else p = dataStart + padded.toInt
          }
        }
      }
    }
    out.result()
  }

  val entriesUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    entries(b).map(e => (e.name, e.size, e.data)))

  /** Streaming member iterator over an open shard stream — peak task
    * memory is ONE member, not the shard (WebDataset shards run to
    * gigabytes). Same totality contract as the in-memory walk: a
    * malformed header or truncation ends the iterator with the members
    * parsed so far; the stream closes at exhaustion.
    *
    * `maxMemberBytes` is the same per-member budget [[Zip.entries]]
    * enforces: the header's declared size is UNTRUSTED input, so a
    * corrupted size field must not translate into a multi-GiB task
    * allocation. An over-budget member is skipped (its bytes are
    * streamed past in 64 KiB chunks, never buffered) and the walk
    * continues with the next header.
    */
  def parseStream(in: java.io.InputStream,
      maxMemberBytes: Int = 1 << 28): Iterator[TarEntry] =
    new Iterator[TarEntry] {
      private var nextE: TarEntry = _
      private var finished = false
      private var pendingLongName: String = null

      private def finish(): Unit = {
        finished = true
        nextE = null
        try in.close() catch { case _: java.io.IOException => () }
      }

      private def readBlock(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) return null
          off += r
        }
        buf
      }

      private def skipFully(n: Long): Boolean = {
        var remaining = n
        val buf = new Array[Byte](1 << 16)
        while (remaining > 0) {
          val r = in.read(buf, 0, math.min(remaining, buf.length.toLong).toInt)
          if (r < 0) return false
          remaining -= r
        }
        true
      }

      private def advance(): Unit = {
        nextE = null
        try {
          while (nextE == null && !finished) {
            val h = readBlock(512)
            if (h == null) { finish(); return }
            var allZero = true
            var z = 0
            while (allZero && z < 512) { if (h(z) != 0) allZero = false; z += 1 }
            if (allZero) { finish(); return }
            val size = parseOctal(h, 124, 12)
            val typeflag = h(156)
            // absurd declared length = malformed (never eagerly trusted)
            if (size < 0 || size > Int.MaxValue - 16) { finish(); return }
            val overBudget = size > maxMemberBytes
            val padded = ((size + 511L) / 512L) * 512L
            val nameRaw = cstr(h, 0, 100)
            val prefix =
              if (cstr(h, 257, 6).startsWith("ustar")) cstr(h, 345, 155)
              else ""
            val name =
              if (pendingLongName != null) pendingLongName
              else if (prefix.nonEmpty) s"$prefix/$nameRaw"
              else nameRaw
            pendingLongName = null
            if (overBudget) {
              // header-declared size beyond the budget: drop the
              // member, keep walking (the Zip.entries policy)
              if (!skipFully(padded)) { finish(); return }
            } else if (typeflag == 'L') {
              val data = readBlock(size.toInt)
              if (data == null || !skipFully(padded - size)) { finish(); return }
              pendingLongName = cstr(data, 0, data.length)
            } else if ((typeflag == '0' || typeflag == 0) && name.nonEmpty) {
              val data = readBlock(size.toInt)
              if (data == null) { finish(); return }
              if (!skipFully(padded - size)) {
                // truncated padding: keep this tail member, then stop
                finished = true
                try in.close() catch { case _: java.io.IOException => () }
              }
              nextE = TarEntry(name, size, data)
            } else {
              if (!skipFully(padded)) { finish(); return }
            }
          }
        } catch { case _: java.io.IOException => finish() }
      }

      advance()
      override def hasNext: Boolean = nextE != null
      override def next(): TarEntry = {
        val e = nextE
        if (e == null) throw new NoSuchElementException
        if (finished) nextE = null else advance()
        e
      }
    }

  /** Distributed shard reader: one .tar file = one task (the
    * WebDataset unit of work), members exploded to rows with the
    * source path retained. Identical plan shape and memory contract to
    * [[Warc.read]]: binaryFile supplies only the file listing (column
    * pruning keeps `content` unread); each task re-opens its shard as
    * a Hadoop stream and walks it member-at-a-time.
    */
  /** Transparent gzip/zstd unwrap by magic bytes (compressed
    * WebDataset/.tar.gz/.tar.zst shards): plain streams pass through;
    * a stream whose codec header will not even construct holds zero
    * members, so it degrades to empty (the parseStream totality
    * contract, one layer earlier).
    */
  private def sniffDecompress(
      in0: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(in0, 1 << 16), 4)
    val head = new Array[Int](4)
    var hn = 0
    while (hn < 4 && { head(hn) = pb.read(); head(hn) >= 0 }) hn += 1
    var k = hn - 1
    while (k >= 0) { pb.unread(head(k)); k -= 1 }
    try {
      if (head(0) == 0x1f && head(1) == 0x8b)
        new java.util.zip.GZIPInputStream(pb, 1 << 16)
      else if (hn == 4 &&
        ZstdFrames.isZstdMagic(head(0), head(1), head(2), head(3)))
        // accepts a leading skippable frame too (the warc-zstd
        // dictionary layout) and honors its dictionary slot
        ZstdFrames.open(pb)
      else pb
    } catch {
      case scala.util.control.NonFatal(_) =>
        try pb.close() catch { case _: java.io.IOException => () }
        new java.io.ByteArrayInputStream(Array.emptyByteArray)
    }
  }

  def read(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val paths = spark.read.format("binaryFile").load(path)
      .select(col("path")).as[String]
    paths
      .flatMap { p =>
        val hp =
          try new org.apache.hadoop.fs.Path(new java.net.URI(p))
          catch { case _: Exception => new org.apache.hadoop.fs.Path(p) }
        val fs = hp.getFileSystem(conf.value)
        val in = fs.open(hp)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
          try in.close() catch { case _: java.io.IOException => () })
        parseStream(sniffDecompress(in)).map(e =>
          (p, e.name, e.size, e.data))
      }
      .toDF("path", "name", "size", "payload")
  }

  /** Minimal ustar writer for fixtures/tests: regular files only. */
  private[graft] def build(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    files.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        val sb = padded.getBytes("US-ASCII")
        System.arraycopy(sb, 0, h, off, sb.length)
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8) // uid/gid
      oct(data.length.toLong, 124, 12)
      oct(0, 136, 12) // mtime
      h(156) = '0'
      "ustar".getBytes("US-ASCII").copyToArray(h, 257)
      h(262) = 0; h(263) = '0'; h(264) = '0'
      // checksum: spaces while summing, then octal + NUL + space
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(x => sum += (x & 0xff))
      oct(sum, 148, 7)
      h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = ((data.length + 511) / 512) * 512 - data.length
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two zero end blocks
    out.toByteArray
  }
}
