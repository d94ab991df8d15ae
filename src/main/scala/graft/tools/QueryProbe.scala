package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off query probe: run a registered query by name against a data dir
  * and print its row count (and optionally the formatted plan). Used to
  * quantify workload shape at ladder scales without hand-writing a main
  * per experiment.
  *
  * sbt "runMain graft.tools.QueryProbe <query> <dir> [--explain] [--show N]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <query> <dir> [--explain] [--show N]")
    val name = args(0)
    val dir = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (args.contains("--explain")) df.explain("formatted")
    val showIdx = args.indexOf("--show")
    if (showIdx >= 0) {
      require(showIdx + 1 < args.length, "--show requires a row count")
      df.show(args(showIdx + 1).toInt, truncate = false)
    }
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $name rows=$n time=$sec%.2fs dir=$dir")
    spark.stop()
  }
}
