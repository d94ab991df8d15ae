package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query bench: `Test/runMain graft.BenchOne <query> [runs]`.
  * Same harness contract as graft.Bench (noop sink, warmup at sf0.001,
  * unpersist between runs, median-of-N) but for one query — the
  * fast iteration loop when shaving a specific query's constant factor.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m") // match Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // catalog.clearCache, NOT raw RDD unpersist: unpersisting the
      // underlying RDD pins its storage level to NONE while the SQL
      // CacheManager still holds the InMemoryRelation — every later run
      // then RECOMPUTES the cached subtree in each consuming stage
      // (measured: dedup_minhash runs degrade 3.1s -> 5.9s across a
      // 5-run series). clearCache drops the CacheManager entries so the
      // next run's persist() builds a fresh, working cache.
      spark.catalog.clearCache()
      dt
    }
    once("/root/testdata/sf0.001") // warmup: JIT + codegen + classloading
    val xs = (1 to runs).map(_ => once(sfDir))
    println(f"[benchone] $name runs=${xs.map(x => f"$x%.2f").mkString(",")} " +
      f"median=${xs.sorted.apply(xs.size / 2)}%.3f")
    spark.stop()
  }
}
