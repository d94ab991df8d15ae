package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the cost/benefit of LayoutOps.spread around a
  * CPU-heavy kernel. `Test/runMain graft.SpreadProbe`. */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
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
      println(f"[spreadprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // A/B mode: `Test/runMain graft.SpreadProbe ab <query> [runs]` —
    // interleave spread-on/off runs of a full QueryBank query inside
    // one JVM (via the graft.spread.off measurement hook) so ambient
    // contention hits both variants equally
    if (args.headOption.contains("ab")) {
      val name = args(1)
      val runs = if (args.length > 2) args(2).toInt else 10
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      // warm both variants (JIT, codegen, .rdd conversion path)
      Seq(true, false).foreach { s =>
        if (s) sys.props.remove("graft.spread.off")
        else sys.props("graft.spread.off") = "1"
        try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      (1 to runs).foreach { i =>
        val s = i % 2 == 1
        if (s) sys.props.remove("graft.spread.off")
        else sys.props("graft.spread.off") = "1"
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (if (s) on else off) += dt
        spark.catalog.clearCache()
      }
      sys.props.remove("graft.spread.off")
      println(f"[spreadprobe] $name spreadON  min=${on.min}%.2f " +
        f"med=${on.sorted.apply(on.size / 2)}%.2f runs=${on.map(x => f"$x%.2f").mkString(",")}")
      println(f"[spreadprobe] $name spreadOFF min=${off.min}%.2f " +
        f"med=${off.sorted.apply(off.size / 2)}%.2f runs=${off.map(x => f"$x%.2f").mkString(",")}")
      spark.stop()
      return
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sel = docs.select(col("doc_id"), col("lang"), col("text"))
    (1 to 3).foreach { round =>
      println(s"[spreadprobe] ---- round $round ----")
      t("rdd.getNumPartitions") {
        println("[spreadprobe] parts=" + sel.rdd.getNumPartitions)
      }
      t("TF agg unspread") {
        sel.select(graft.functions.Udfs.hashingTfUdf(
            col("text").cast("string"), lit(16)).as("__tf"))
          .agg(sum(element_at(col("__tf"), 1))).head()
      }
      t("TF agg spread") {
        graft.ops.LayoutOps.spread(sel)
          .select(graft.functions.Udfs.hashingTfUdf(
            col("text").cast("string"), lit(16)).as("__tf"))
          .agg(sum(element_at(col("__tf"), 1))).head()
      }
      t("minhash kernel unspread") {
        sel.select(graft.functions.Udfs.minhashBandBucketsUdf(
            col("text"), lit(128), lit(16), lit(5), lit(42L)).as("__bk"))
          .agg(sum(size(col("__bk")))).head()
      }
      t("minhash kernel spread") {
        graft.ops.LayoutOps.spread(sel)
          .select(graft.functions.Udfs.minhashBandBucketsUdf(
            col("text"), lit(128), lit(16), lit(5), lit(42L)).as("__bk"))
          .agg(sum(size(col("__bk")))).head()
      }
      t("minhash kernel repart-only") {
        sel.repartition(32)
          .select(graft.functions.Udfs.minhashBandBucketsUdf(
            col("text"), lit(128), lit(16), lit(5), lit(42L)).as("__bk"))
          .agg(sum(size(col("__bk")))).head()
      }
    }
    spark.stop()
  }
}
