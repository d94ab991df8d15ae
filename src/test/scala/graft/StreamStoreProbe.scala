package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B: HDFS-backed (default) vs RocksDB state store provider
  * for the stateful stream_* queries (r17 verdict Next #8). Interleaved
  * within one JVM; the provider is a per-query conf read at stream
  * start, so flipping the session conf between runs is enough.
  * `Test/runMain graft.StreamStoreProbe [runsPerVariant]`.
  */
object StreamStoreProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(4)
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
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val stateful = Seq("stream_hll_window", "stream_session_window",
      "stream_stream_join", "stream_window_agg", "stream_sessionize")
    // warm both providers once (classloading, native rocksdb lib)
    for (q <- stateful.take(1); useRocks <- Seq(false, true)) {
      if (useRocks)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
      else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[streamstore] warmup $q rocks=$useRocks FAILED: $e") }
      spark.catalog.clearCache()
    }
    for (q <- stateful) {
      val hdfs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val rdb = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 2 * runs).foreach { i =>
        val useRocks = i % 2 == 0
        if (useRocks)
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
        else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          (if (useRocks) rdb else hdfs) += dt
        } catch { case e: Throwable =>
          println(s"[streamstore] $q rocks=$useRocks FAILED: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
      def s(xs: Seq[Double]) =
        if (xs.isEmpty) "n/a"
        else f"min=${xs.min}%.2f med=${xs.sorted.apply(xs.size / 2)}%.2f " +
          xs.map(x => f"$x%.2f").mkString(",")
      println(s"[streamstore] $q HDFS  ${s(hdfs.toSeq)}")
      println(s"[streamstore] $q ROCKS ${s(rdb.toSeq)}")
    }
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.stop()
  }
}
