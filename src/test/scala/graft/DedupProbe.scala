package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-level timing breakdown for the dedup/fuzzy-join
  * family: times each pipeline stage in isolation (fresh cache state
  * per run) so "cost is the work" adjudications carry numbers.
  * `Test/runMain graft.DedupProbe [keepbest|fuzzy]`.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("keepbest")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedupprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    if (mode == "fuzzyplan") {
      // minhashJoin's committed query plan is a checkpoint stub (its
      // output is eagerly localCheckpoint'd); this replays the body
      // WITHOUT the checkpoint to expose the real join/verify plan
      val lhs = docs.where(col("doc_id") < 250)
      val rhs = docs.where(col("doc_id") >= 250)
      def buckets(df: org.apache.spark.sql.DataFrame, side: Int) =
        df.select(col("doc_id").as("__id"),
            graft.functions.Udfs.minhashBandBucketsUdf(col("text"),
              lit(128), lit(16), lit(5), lit(42L)).as("__bk"))
          .filter(size(col("__bk")) > 0)
          .select(col("__id"), lit(side).as("__side"),
            posexplode(col("__bk")).as(Seq("__band", "__bucket")))
      val banded = buckets(lhs, 0).unionByName(buckets(rhs, 1)).persist()
      banded.count()
      // inlined dropHotBuckets (private[llm]): anti-join out any
      // (band,bucket) hotter than the cap
      val hot = banded.groupBy(col("__band"), col("__bucket")).count()
        .filter(col("count") > 10000)
        .select(col("__band"), col("__bucket"))
      val sized = banded.join(hot, Seq("__band", "__bucket"), "left_anti")
      val l = sized.filter(col("__side") === 0)
        .select(col("__band"), col("__bucket"), col("__id").as("id_a"))
      val r = sized.filter(col("__side") === 1)
        .select(col("__band"), col("__bucket"), col("__id").as("id_b"))
      val cands = l.join(r, Seq("__band", "__bucket"))
        .select("id_a", "id_b").distinct()
      val withA = cands.join(lhs.select(col("doc_id").as("id_a"),
        col("text").as("__ta")), "id_a")
      val withB = withA.join(rhs.select(col("doc_id").as("id_b"),
        col("text").as("__tb")), "id_b")
      val out = withB.withColumn("jaccard",
          graft.functions.Udfs.shingleJaccardUdf(
            col("__ta"), col("__tb"), lit(5)))
        .filter(col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
      out.write.format("noop").mode("overwrite").save()
      println(out.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      spark.stop()
      return
    }
    (1 to 3).foreach { round =>
      println(s"[dedupprobe] ---- round $round ($mode) ----")
      if (mode == "fuzzy") {
        val lhs = docs.where(col("doc_id") < 250)
        val rhs = docs.where(col("doc_id") >= 250)
        t("minhashJoin total") {
          graft.llm.Dedup.minhashJoin(lhs, rhs, "text", "text",
              "doc_id", "doc_id", threshold = 0.8)
            .write.format("noop").mode("overwrite").save()
        }
      } else {
        val dd = docs.withColumn("prio", length(col("text")))
        val distinctDocs = t("exactKeepBest") {
          val x = graft.llm.Dedup.exactKeepBest(
            dd.select(col("doc_id"), col("text"), col("prio")),
            "text", "doc_id", "prio")
          x.write.format("noop").mode("overwrite").save(); x
        }
        t("full keepbest query") {
          graft.llm.Dedup.minhashDedupKeepBest(dd, "text", "doc_id",
              "prio", threshold = 0.8)
            .select("doc_id", "lang", "source")
            .write.format("noop").mode("overwrite").save()
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
