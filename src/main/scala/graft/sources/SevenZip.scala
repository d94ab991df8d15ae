package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** 7z archive member reader (the remaining common archive container
  * after zip/tar — HF and academic dumps still ship it). Decode rides
  * the commons-compress sevenz reader Spark already bundles, which
  * handles the full public layout (7zFormat.txt): encoded headers,
  * solid multi-member folders, Copy/LZMA/LZMA2/bzip2 coders (LZMA
  * paths through the same tukaani jar the xz codec uses), BCJ filters.
  * Same contract as [[Zip]]/[[Tar]]:
  *
  *  - one row per regular member, directories skipped;
  *  - total on arbitrary bytes — malformed input keeps the members
  *    decoded so far, never throws;
  *  - budget-bounded — a per-member cap (bytes ACTUALLY inflated, not
  *    the header claim) plus the reader's own memory limit, so a
  *    crafted bomb cannot expand past the budget (over-budget members
  *    are dropped, the walk continues);
  *  - encryption is refused by the underlying reader (no password is
  *    ever supplied), which the catch degrades to "members so far".
  *
  * Scale shape: archives are per-row payloads decoded map-only, one
  * task per shard partition — the Tar/Zip ingestion contract at
  * 100 TB, grown by adding shards.
  */
object SevenZip {

  /** (name, size, data) per regular member; directories skipped. */
  def entries(b: Array[Byte],
      maxMemberBytes: Int = 1 << 28): Seq[(String, Long, Array[Byte])] = {
    if (b == null || b.length < 32) return Nil
    val out = Seq.newBuilder[(String, Long, Array[Byte])]
    var f: org.apache.commons.compress.archivers.sevenz.SevenZFile = null
    try {
      f = org.apache.commons.compress.archivers.sevenz.SevenZFile.builder()
        .setSeekableByteChannel(
          new org.apache.commons.compress.utils.SeekableInMemoryByteChannel(b))
        // header/dictionary memory budget: stops hostile headers that
        // declare huge dictionaries before any allocation happens
        .setMaxMemoryLimitKiB(1 << 18) // 256 MiB
        .get()
      var e = f.getNextEntry
      while (e != null) {
        if (!e.isDirectory && e.hasStream) {
          val buf = new java.io.ByteArrayOutputStream(1 << 12)
          val chunk = new Array[Byte](1 << 16)
          var n = f.read(chunk)
          var over = false
          while (n > 0 && !over) {
            buf.write(chunk, 0, n)
            if (buf.size > maxMemberBytes) over = true
            else n = f.read(chunk)
          }
          if (!over) {
            val data = buf.toByteArray
            out += ((e.getName, data.length.toLong, data))
          }
        } else if (!e.isDirectory && !e.hasStream) {
          // empty-file entries carry no stream but ARE members
          out += ((e.getName, 0L, Array.emptyByteArray))
        }
        e = f.getNextEntry
      }
    } catch {
      // malformed tail / unsupported coder / encrypted folder: keep
      // the members decoded so far (the Warc/Tar/Zip contract)
      case scala.util.control.NonFatal(_) => ()
    } finally {
      if (f != null) { try f.close() catch {
        case scala.util.control.NonFatal(_) => () } }
    }
    out.result()
  }

  val entriesUdf: UserDefinedFunction = udf((b: Array[Byte]) => entries(b))

  /** Deterministic 7z writer for fixtures/tests: no timestamps are
    * set, so bytes are a pure function of (names, payloads, codec).
    * `codec` = "copy" or "lzma2" — the two layouts the read path must
    * prove (LZMA2 archives also carry compressed/ENCODED headers,
    * exercising that branch of the reader).
    */
  private[graft] def build(files: Seq[(String, Array[Byte])],
      codec: String = "lzma2"): Array[Byte] = {
    import org.apache.commons.compress.archivers.sevenz._
    val ch = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel()
    val out = new SevenZOutputFile(ch)
    try {
      // LZMA2 with an explicit 64 KiB dictionary: the encoder's 8 MiB
      // default re-allocates per archive — a GC storm at fixture scale
      // (the xz codec hit the same wall, see PERF.md) — and the DECODER
      // allocates whatever the stream declares, so small fixtures
      // should declare small
      val cfg = codec match {
        case "copy" => new SevenZMethodConfiguration(SevenZMethod.COPY)
        case _ => new SevenZMethodConfiguration(SevenZMethod.LZMA2,
          Integer.valueOf(1 << 16))
      }
      out.setContentMethods(java.util.Collections.singletonList(cfg))
      files.foreach { case (name, data) =>
        val e = new SevenZArchiveEntry()
        e.setName(name)
        e.setDirectory(false)
        out.putArchiveEntry(e)
        out.write(data)
        out.closeArchiveEntry()
      }
      out.finish()
    } finally out.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }
}
