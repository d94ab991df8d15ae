package graft
// dev probe main (test scope): drives the public API end-to-end
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + e.count())
    e.show(3)
    try Wrangle.recipe("frobnicate :x;").apply(e)
    catch { case ex: Exception => println("PROBE_UNKNOWN=" + ex.getMessage) }
    try Wrangle.recipe("rename :l_orderkey :revenue;").apply(e).collect()
    catch { case ex: Exception => println("PROBE_CLASH=" + ex.getMessage) }
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val res = Wrangle.recipe("send-to-error exp:{ l_quantity > 30 } 'too big';").run(li)
    println("MAIN=" + res.output.count() + " ERRORS=" + res.errors.count())
    res.errors.show(2, truncate = false)
    spark.stop()
  }
}
