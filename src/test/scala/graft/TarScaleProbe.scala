package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 tar/WebDataset ingestion rung: measure `Tar.read` on
  * multi-shard synthetic .tar in the WebDataset shape (per-sample
  * member triplets: .jpg payload + .cls label + .json metadata) and
  * demonstrate the robustness contract under measurement:
  *
  *  - throughput: members/s and MB/s through the one-task-per-shard
  *    streaming walk (peak task memory is one member; the shard is
  *    never materialized as a byte[]);
  *  - corruption: one shard is truncated mid-member — the job must NOT
  *    fail, must keep every member of every healthy shard and the
  *    complete members before the cut (drop-partial contract).
  *
  * Usage: Test/runMain graft.TarScaleProbe [--shards=N] [--samples=N]
  * Writes shards under target/tar_probe (regenerated when missing) and
  * prints one JSON line with the measured rung.
  */
object TarScaleProbe {

  private def sample(shard: Int, i: Int): Seq[(String, Array[Byte])] = {
    // ~4 KB pseudo-image payload that varies per member
    val img = Array.tabulate[Byte](4096)(k =>
      ((k * 31 + i * 7 + shard * 131) % 251).toByte)
    Seq(
      (f"s$shard%03d/$i%06d.jpg", img),
      (f"s$shard%03d/$i%06d.cls", ((i * 31 + shard) % 1000).toString.getBytes("UTF-8")),
      (f"s$shard%03d/$i%06d.json",
        s"""{"shard":$shard,"i":$i}""".getBytes("UTF-8")))
  }

  def main(args: Array[String]): Unit = {
    val shards = args.collectFirst {
      case a if a.startsWith("--shards=") => a.drop(9).toInt }.getOrElse(8)
    val samples = args.collectFirst {
      case a if a.startsWith("--samples=") => a.drop(10).toInt }.getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = new java.io.File("target/tar_probe")
    if (!dir.isDirectory || dir.listFiles().length < shards + 1) {
      dir.mkdirs()
      var s = 0
      while (s < shards) {
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(new java.io.File(dir, f"shard$s%03d.tar")))
        var i = 0
        while (i < samples) {
          out.write(graft.sources.Tar.build(sample(s, i))
            .dropRight(1024)) // end blocks only once, below
          i += 1
        }
        out.write(new Array[Byte](1024))
        out.close()
        s += 1
      }
      // the poisoned shard: healthy samples, then a truncated member
      val healthy = new java.io.ByteArrayOutputStream()
      (0 until samples / 2).foreach(i =>
        healthy.write(graft.sources.Tar.build(sample(999, i)).dropRight(1024)))
      val tail = graft.sources.Tar.build(sample(999, samples))
      healthy.write(tail, 0, 512 + 100) // header + partial data, no end
      val pw = new java.io.FileOutputStream(
        new java.io.File(dir, "poisoned.tar"))
      pw.write(healthy.toByteArray)
      pw.close()
    }

    val totalBytes = dir.listFiles().map(_.length()).sum
    val t0 = System.nanoTime()
    val counts = graft.sources.Tar.read(spark, dir.toString)
      .groupBy(col("path")).count().collect()
      .map(r => r.getString(0).split("/").last -> r.getLong(1)).toMap
    val dt = (System.nanoTime() - t0) / 1e9
    val healthyOk = (0 until shards).forall(s =>
      counts(f"shard$s%03d.tar") == 3L * samples)
    // poisoned shard: all complete members survive, the cut one drops
    val poisonedCount = counts("poisoned.tar")
    val poisonedOk = poisonedCount == 3L * (samples / 2)
    val members = counts.values.sum
    println(f"""{"tar_shards": ${shards + 1}, "tar_members": $members, """ +
      f""""tar_bytes": $totalBytes, "tar_sec": $dt%.2f, """ +
      f""""tar_members_per_sec": ${members / dt}%.0f, """ +
      f""""tar_mb_per_sec": ${totalBytes / dt / 1e6}%.0f, """ +
      f""""healthy_ok": $healthyOk, "poisoned_ok": $poisonedOk, """ +
      f""""poisoned_members": $poisonedCount}""")
    spark.stop()
  }
}
