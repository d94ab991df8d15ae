package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 WARC ingestion rung: measure `Warc.read` on multi-shard
  * synthetic `.warc.gz` in the Common Crawl shape — each shard a
  * concatenation of per-record gzip members — and demonstrate the
  * robustness contract under measurement, not just in unit tests:
  *
  *  - throughput: records/s and uncompressed MB/s through the
  *    one-task-per-shard streaming decode (peak task memory is one
  *    record; the shard is never materialized as a byte[]);
  *  - corruption: one shard gets a corrupt gzip member spliced in
  *    mid-stream — the job must NOT fail, must keep every record of
  *    every healthy shard AND the records before the corrupt member,
  *    losing only the poisoned shard's tail (the documented
  *    records-so-far policy, now load-bearing at scale).
  *
  * Usage: Test/runMain graft.WarcScaleProbe [--shards=N] [--recs=N]
  * Writes the shards under target/warc_probe (regenerated only when
  * missing) and prints one JSON line with the measured rung.
  */
object WarcScaleProbe {

  /** One WARC response record, ISO 28500 layout (same shape as the
    * WebSpec fixtures), ~4.5 KB of HTML body that varies per record so
    * gzip cannot collapse the corpus to nothing.
    */
  private def record(shard: Int, i: Int): Array[Byte] = {
    val body = {
      val sb = new StringBuilder(4700)
      sb.append(s"<html><head><title>doc $shard/$i</title></head><body>")
      var k = 0
      while (k < 64) {
        sb.append(s"<p>paragraph $k of record $i in shard $shard: ")
        sb.append((k * 2654435761L + i * 40503L + shard).toHexString)
        sb.append(" lorem ipsum dolor sit amet consectetur</p>")
        k += 1
      }
      sb.append("</body></html>")
      sb.toString
    }
    val payload = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
    val pb = payload.getBytes("UTF-8")
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: http://example.com/$shard/$i\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"WARC-Record-ID: <urn:uuid:$shard-$i>\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${pb.length}\r\n\r\n").getBytes("UTF-8") ++
      pb ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val shards = args.collectFirst { case s if s.startsWith("--shards=") =>
      s.stripPrefix("--shards=").toInt }.getOrElse(8)
    val recs = args.collectFirst { case s if s.startsWith("--recs=") =>
      s.stripPrefix("--recs=").toInt }.getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = new java.io.File("target/warc_probe")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // generate: one gzip member per record (the Common Crawl layout),
    // one corrupt member spliced into shard 0 at the 3/4 mark — built
    // distributed, one task per shard
    val expectHealthy = shards.toLong * recs
    val corruptAt = recs * 3 / 4
    val expectWithCorrupt = expectHealthy - (recs - corruptAt)
    if (!new java.io.File(dir, "shard-0.warc.gz").exists) {
      dir.mkdirs()
      spark.sparkContext.parallelize(0 until shards, shards).foreach { s =>
        val f = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(s"target/warc_probe/shard-$s.warc.gz"),
          1 << 20)
        var i = 0
        while (i < recs) { f.write(gzMember(record(s, i))); i += 1 }
        f.close()
      }
    }
    val gzBytes = (0 until shards)
      .map(s => new java.io.File(dir, s"shard-$s.warc.gz").length).sum

    def run(glob: String): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val row = sources.Warc.read(spark, glob)
        .agg(count(lit(1)), sum(col("content_length"))).head
      (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    // warmup lap then the measured lap (classload/codegen off the clock)
    run(s"$dir/shard-0.warc.gz")
    val (n, payloadBytes, secs) = run(s"$dir/shard-*.warc.gz")
    require(n == expectHealthy, s"healthy read lost records: $n != $expectHealthy")

    // corrupt-member lap: healthy shards intact, poisoned shard keeps
    // its pre-corruption records, job completes
    val poisonDir = new java.io.File(dir, "poison")
    if (!new java.io.File(poisonDir, s"shard-${shards - 1}.warc.gz").exists) {
      poisonDir.mkdirs()
      for (s <- 1 until shards) {
        java.nio.file.Files.copy(
          new java.io.File(dir, s"shard-$s.warc.gz").toPath,
          new java.io.File(poisonDir, s"shard-$s.warc.gz").toPath)
      }
      val f = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$poisonDir/shard-0.warc.gz"), 1 << 20)
      var i = 0
      while (i < corruptAt) { f.write(gzMember(record(0, i))); i += 1 }
      f.write(Array[Byte](0x1f, 0x8b.toByte, 0x00, 0x42, 0x42)) // bad method
      while (i < recs) { f.write(gzMember(record(0, i))); i += 1 }
      f.close()
    }
    val (nc, _, secsC) = run(s"$poisonDir/shard-*.warc.gz")
    require(nc == expectWithCorrupt,
      s"corrupt-member read: $nc != $expectWithCorrupt (healthy shards or " +
        "pre-corruption records were lost, or the tail leaked through)")

    val mb = payloadBytes / 1e6
    val json = f"""{"metric":"warc_read","shards":$shards,""" +
      f""""records":$n,"gz_mb":${gzBytes / 1e6}%.1f,""" +
      f""""payload_mb":$mb%.1f,"sec":$secs%.2f,""" +
      f""""rec_per_s":${n / secs}%.0f,"payload_mb_per_s":${mb / secs}%.1f,""" +
      f""""corrupt_member_sec":$secsC%.2f,"corrupt_member_records":$nc,""" +
      f""""corrupt_member_expected":$expectWithCorrupt}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_WARC.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
