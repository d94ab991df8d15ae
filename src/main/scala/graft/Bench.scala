package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are fully materialized through the
  * `noop` sink — every output column is computed and serialized, so
  * Catalyst cannot prune the measured work down to a row count (a bare
  * .count() would let it skip all computed columns).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // default 128 MB splits leave a ~300 MB single-file table at 3
      // scan tasks — 29 of 32 cores idle on the flagship's hot stage.
      // 16 MB splits saturate local[32] at these SFs; a real cluster
      // sizes this to executor count x cores (same knob, PERF.md).
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      } finally {
        // deterministic inter-query cleanup (untimed, and also on
        // failure — an aborted query's persisted frames would inflict
        // the same storage-pressure noise on whatever runs next): the
        // dedup/ANN queries persist signature frames that otherwise
        // linger until the GC-driven ContextCleaner notices them.
        // catalog.clearCache, NOT raw RDD unpersist: unpersisting the
        // underlying RDD pins its storage level to NONE while the SQL
        // CacheManager still holds the InMemoryRelation — later runs of
        // the same query then RECOMPUTE the cached subtree in every
        // consuming stage (measured on dedup_minhash: 3.1s -> 5.9s
        // degradation across a 5-run series, median 4.05 vs 2.96 fixed).
        spark.catalog.clearCache()
      }
    }

    // Fixed warmup set at the smallest SF: exercises the same code paths
    // (UDF classloading, kernel JIT, codegen compilation, parquet footer
    // caching) the heavy queries hit, WITHOUT charging the first
    // measured query for it. Run-order variance on e.g. minhash_pairs
    // was 5x before this (BENCH_r02 vs local rerun).
    val warmupDir = "/root/testdata/sf0.001"
    val warmupQueries = Seq("baseline_13_directive_recipe", "dedup_minhash",
      "minhash_pairs", "simhash_pairs", "ann_brute_topk", "parse_as_date")
    for (n <- warmupQueries)
      try SparkEntry.queries(n)(spark, warmupDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    spark.catalog.clearCache()

    // median of N runs per query (N=3 by default): a single noisy run —
    // GC pause, first-touch JIT, OS cache miss — no longer moves the
    // reported number
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0
      else ok.sorted.apply(ok.size / 2)
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      n -> median((1 to runs).map(_ => materialize(n)))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout captures of this line have been truncated repeatedly, so
    // the full per-query JSON is also written to a file that can be
    // committed and parsed standalone
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: $e") }
    spark.stop()
  }
}
