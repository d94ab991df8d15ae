package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-job wall profile of one QueryBank query:
  * `Test/runMain graft.JobProbe <query>` — prints each Spark job's
  * duration and description for the composed plan, after a warmup.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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

    def once(dir: String): Unit = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    once("/root/testdata/sf0.001")
    once(sfDir) // second warmup at target scale (page cache)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          println(f"[job] ${je.jobId}%3d ${(je.time - t0) / 1e3}%7.3f s  ${desc.take(80)}")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for (s <- si.submissionTime; e <- si.completionTime) yield e - s
        val tm = si.taskMetrics
        println(f"[stage] ${si.stageId}%3d wall=${dur.getOrElse(-1L) / 1e3}%7.3f" +
          f" run=${tm.executorRunTime / 1e3}%8.3f cpu=${tm.executorCpuTime / 1e9}%8.3f" +
          f" tasks=${si.numTasks}%3d in=${tm.inputMetrics.recordsRead}%8d" +
          f" sr=${tm.shuffleReadMetrics.recordsRead}%8d" +
          f" sw=${tm.shuffleWriteMetrics.recordsWritten}%8d  ${si.name.take(40)}" +
          s" rdds=${si.rddInfos.map(_.name).mkString("|").take(200)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    once(sfDir)
    Thread.sleep(2000) // let the listener bus drain
    println(f"[job] TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
