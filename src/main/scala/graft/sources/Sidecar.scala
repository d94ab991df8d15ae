package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Tiny text-sidecar IO routed through the Hadoop FileSystem API so
  * ONE path string addresses ONE filesystem: an index written to
  * `s3a://…` or `hdfs://…` carries its centroid/vocabulary sidecar on
  * the same store, never silently split between cluster storage and
  * the driver's local disk (and local paths keep working — Hadoop's
  * `file://` scheme is the default).
  */
object Sidecar {

  def write(conf: Configuration, path: String, text: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(conf: Configuration, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
