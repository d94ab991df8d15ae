package graft
// dev tool: dumps physical plans of representative queries for PERF.md
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def dump(name: String): Unit = {
      println(s"===== $name =====")
      println(QueryBank.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    println("===== flagship entry =====")
    println(SparkEntry.entry(spark).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    Seq("filter_row", "table_lookup", "dedup_exact", "ann_brute_topk",
      "decontaminate", "dup_spans", "pipeline_curation_v2").foreach(dump)
    spark.stop()
  }
}
