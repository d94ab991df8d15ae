package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run dedup_minhash once and report how many rows executed
  * the signature kernel vs the corpus size — a ratio > 1 means the
  * persisted signature frame is being recomputed by downstream stages.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    graft.functions.Udfs.shingleKernelCalls.reset()
    val t0 = System.nanoTime()
    SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[cacheprobe] wall=${(System.nanoTime() - t0) / 1e9}%.2f docs=$docs " +
      s"kernelCalls=${graft.functions.Udfs.shingleKernelCalls.sum()}")
    spark.stop()
  }
}
