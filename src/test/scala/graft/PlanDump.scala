package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print (or dump to files) the formatted physical plan of
  * QueryBank queries (after their eager actions have run):
  *   `Test/runMain graft.PlanDump <q> [<q2> ...]`
  * With SPARK_GRAFT_PLAN_DIR set, each query's plan is written to
  * `$SPARK_GRAFT_PLAN_DIR/<q>_<SPARK_GRAFT_PLAN_TAG>.txt` (tag
  * defaults to "plan") — the round's plans/rNN evidence files.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <query> [<query> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      outDir match {
        case Some(dir) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${name}_$tag.txt"),
            plan.getBytes("UTF-8"))
          System.err.println(s"[plandump] wrote $dir/${name}_$tag.txt")
        case None =>
          println(s"==== $name ====")
          println(plan)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
