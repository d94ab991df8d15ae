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
          val avail = math.max(0L, (b.length - dataStart).toLong)
          val take = math.min(size, avail).toInt
          if (typeflag == 'L') {
            // GNU long name: the data block names the NEXT member
            pendingLongName = cstr(b, dataStart, take)
          } else if ((typeflag == '0' || typeflag == 0) && name.nonEmpty) {
            out += TarEntry(name, size,
              java.util.Arrays.copyOfRange(b, dataStart, dataStart + take))
          } // directories ('5'), links, pax headers: skipped
          val padded = ((size + 511L) / 512L) * 512L
          if (dataStart.toLong + padded > Int.MaxValue) done = true
          else p = dataStart + padded.toInt
        }
      }
    }
    out.result()
  }

  val entriesUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    entries(b).map(e => (e.name, e.size, e.data)))

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
