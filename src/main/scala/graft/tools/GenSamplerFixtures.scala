package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch generator for the pinned sampler oracle fixtures (sf0.01).
  * Run: sbt "runMain graft.tools.GenSamplerFixtures". Delete-safe. */
object GenSamplerFixtures {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master(sys.env.getOrElse("GEN_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GEN_SHUF", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    println("parts=" + cust.rdd.getNumPartitions +
      " master=" + spark.sparkContext.master +
      " shuffle=" + spark.conf.get("spark.sql.shuffle.partitions") +
      " (pinned oracles were generated with the defaults — a non-default" +
      " override changes the fixtures!)")
    val b = graft.session.Sampler.bernoulli(cust, 0.05, seed = 7L)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    println("BERNOULLI(" + b.length + "): " + b.mkString(","))
    val p = graft.session.Sampler.poisson(cust, 0.04, seed = 7L)
      .groupBy("c_custkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    println("POISSON(" + p.length + "): " +
      p.map { case (k, n) => s"($k,$n)" }.mkString(","))
    val rv = graft.session.Sampler.reservoir(cust, 40, seed = 7L)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    println("RESERVOIR(" + rv.length + "): " + rv.mkString(","))
    spark.stop()
  }
}
