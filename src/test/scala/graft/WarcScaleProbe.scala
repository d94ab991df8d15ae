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

    // hostile-envelope lap (the r15 fix classes, now load-bearing at
    // scale): every 997th record is a chunked response with a NEGATIVE
    // chunk size (raw-bytes fallback — still a record), every 499th
    // carries a gzip-bomb Content-Encoding body (budget → raw bytes),
    // and five over-budget records are appended (dropped under
    // maxRecordBytes; following records must survive — so they are
    // INTERLEAVED with five normal ones after them).
    def hostileChunked(i: Int): Array[Byte] = {
      val body = "-5\r\nhello world\r\n0\r\n\r\n".getBytes("ISO-8859-1")
      val envelope = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://example.com/hostile/$i\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${envelope.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        envelope ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def bombRecord(i: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      val zeros = new Array[Byte](1 << 20)
      (0 until 300).foreach(_ => g.write(zeros)) // ~300 MB inflated
      g.close()
      val bomb = bos.toByteArray
      val envelope = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
        .getBytes("ISO-8859-1") ++ bomb
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://example.com/bomb/$i\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${envelope.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        envelope ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def bigRecord(i: Int): Array[Byte] = {
      val body = new Array[Byte](2 << 20) // over a 1 MB record budget
      java.util.Arrays.fill(body, 'x'.toByte)
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"WARC-Target-URI: http://example.com/big/$i\r\n" +
        "Content-Type: application/octet-stream\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        body ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val hostileDir = new java.io.File(dir, "hostile")
    val bomb = bombRecord(0)
    if (!new java.io.File(hostileDir, "shard-0.warc.gz").exists) {
      hostileDir.mkdirs()
      val f = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$hostileDir/shard-0.warc.gz"), 1 << 20)
      var i = 0
      while (i < recs) {
        if (i % 997 == 0) f.write(gzMember(hostileChunked(i)))
        else if (i % 499 == 0) f.write(gzMember(bomb))
        else f.write(gzMember(record(0, i)))
        i += 1
      }
      // over-budget records interleaved with normal tails
      var k = 0
      while (k < 5) {
        f.write(gzMember(bigRecord(k)))
        f.write(gzMember(record(0, recs + k)))
        k += 1
      }
      f.close()
    }
    // 1 MB record budget: the ~305 KB compressed bombs pass it (their
    // ~300 MB INFLATION is what the decompress budget must stop), the
    // 2 MB resource records trip it
    val t0h = System.nanoTime()
    val nh = sources.Warc.read(spark, s"$hostileDir/shard-0.warc.gz",
      maxRecordBytes = 1L << 20).count()
    val secsH = (System.nanoTime() - t0h) / 1e9
    // hostile chunked + bomb rows still ARRIVE (raw-bytes fallback);
    // only the 5 over-budget records drop, their 5 followers survive
    require(nh == recs + 5,
      s"hostile-envelope read: $nh != ${recs + 5} (a hostile record " +
        "killed the task, or drop-and-continue lost followers)")

    val mb = payloadBytes / 1e6
    val json = f"""{"metric":"warc_read","shards":$shards,""" +
      f""""records":$n,"gz_mb":${gzBytes / 1e6}%.1f,""" +
      f""""payload_mb":$mb%.1f,"sec":$secs%.2f,""" +
      f""""rec_per_s":${n / secs}%.0f,"payload_mb_per_s":${mb / secs}%.1f,""" +
      f""""corrupt_member_sec":$secsC%.2f,"corrupt_member_records":$nc,""" +
      f""""corrupt_member_expected":$expectWithCorrupt,""" +
      f""""hostile_sec":$secsH%.2f,"hostile_records":$nh,""" +
      f""""hostile_expected":${recs + 5}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_WARC.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
