package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the PRE-checkpoint plan of a PageRank iteration (the
  * committed query plans are checkpoint-truncated stubs that hide the
  * join strategy) and time iteration variants. Mirrors graft.Bench's
  * session config. `Test/runMain graft.PageRankProbe [explain|time]`.
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("explain")
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

    // production pageRank scope-disables AQE for the iteration chain;
    // SPARK_GRAFT_PR_AQE=true reproduces the pre-r18 AQE-on shape
    if (mode == "explain")
      spark.conf.set("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PR_AQE", "false"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges0 = li.select(
      concat(lit("o"), col("l_orderkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst"))
    // replicate pageRank's setup exactly
    val edges = edges0
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .persist()
    val vertices = edges
      .select(explode(array(
        struct(col("src").as("vertex"), lit(1L).as("__w")),
        struct(col("dst").as("vertex"), lit(0L).as("__w")))).as("e"))
      .groupBy(col("e.vertex").as("vertex"))
      .agg(sum(col("e.__w")).as("__outdeg"))
      .persist()
    val n = vertices.count().toDouble
    val ranks0 = vertices.withColumn("rank", lit(1.0 / n))

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    val it1 = graph.Graph.pageRankIteration(edges, vertices, ranks0, n, 0.85)
    if (mode == "explain") {
      println("==== iteration 1 (ranks = cached vertices projection) ====")
      println(fmt(it1))
      // mirror pageRank's iteration chaining (localCheckpoint)
      val ranks1 = it1.localCheckpoint(true)
      val it2 = graph.Graph.pageRankIteration(edges, vertices, ranks1, n, 0.85)
      println("==== iteration 2 (ranks = previous iteration) ====")
      println(fmt(it2))
      // executed plan (AQE-final) of iteration 2
      it2.write.format("noop").mode("overwrite").save()
      println("==== iteration 2 EXECUTED (AQE final) ====")
      println(it2.queryExecution.executedPlan.toString)
    } else {
      // timing loop over the full query; interleaves AQE on/off when
      // mode == "aqeab" (contention waves hit both variants equally)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 10).foreach { i =>
        val aqeOff = mode == "aqeab" && i % 2 == 0
        spark.conf.set("spark.sql.adaptive.enabled", (!aqeOff).toString)
        val t0 = System.nanoTime()
        SparkEntry.queries("pagerank_links")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (if (aqeOff) bs else as) += dt
        println(f"[prtime] run $i aqeOff=$aqeOff $dt%.2f s")
        spark.catalog.clearCache()
      }
      println(f"[prtime] aqeON  min=${as.min}%.2f runs=${as.map(x => f"$x%.2f").mkString(",")}")
      if (bs.nonEmpty)
        println(f"[prtime] aqeOFF min=${bs.min}%.2f runs=${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
