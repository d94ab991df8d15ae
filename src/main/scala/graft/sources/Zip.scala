package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** ZIP archive member reader over the JDK's own inflater
  * (java.util.zip — the same public machinery the xlsx parser uses):
  * one row per regular member, for dataset dumps and scraped archives
  * that arrive zipped rather than tarred. Total on arbitrary bytes —
  * a malformed stream ends the walk with the members decoded so far
  * (the Warc/Tar contract).
  */
object Zip {

  /** (name, size, data) per regular member; directories skipped. */
  def entries(b: Array[Byte],
      maxMemberBytes: Int = 1 << 28): Seq[(String, Long, Array[Byte])] = {
    if (b == null) return Nil
    val out = Seq.newBuilder[(String, Long, Array[Byte])]
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          // grow with bytes ACTUALLY inflated, never the header claim —
          // and a hard cap so a zip bomb cannot expand past the budget
          val buf = new java.io.ByteArrayOutputStream(1 << 12)
          val chunk = new Array[Byte](1 << 16)
          var n = zis.read(chunk)
          var over = false
          while (n >= 0 && !over) {
            buf.write(chunk, 0, n)
            if (buf.size > maxMemberBytes) over = true
            else n = zis.read(chunk)
          }
          if (!over) {
            val data = buf.toByteArray
            out += ((e.getName, data.length.toLong, data))
          } // an over-budget member is dropped, the walk continues
        }
        e = zis.getNextEntry
      }
    } catch {
      case _: java.io.IOException => () // malformed tail: keep parsed prefix
      case _: IllegalArgumentException => () // hostile entry name encoding
    } finally {
      try zis.close() catch { case _: java.io.IOException => () }
    }
    out.result()
  }

  val entriesUdf: UserDefinedFunction = udf((b: Array[Byte]) => entries(b))

  /** Deterministic zip writer for fixtures/tests (fixed timestamp so
    * fixture bytes are stable; stored entries inflate-roundtrip through
    * the default DEFLATED method).
    */
  private[graft] def build(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    files.foreach { case (name, data) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L) // deterministic bytes
      zos.putNextEntry(e)
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
