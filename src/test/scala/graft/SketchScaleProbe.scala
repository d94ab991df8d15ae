package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Sketches

/** Dev probe: isolate the per-group APPROX distinct (HLL sketch) from
  * the per-group EXACT distinct (expand + two-phase aggregate) that the
  * hll_distinct oracle row computes alongside it — at the base dir and
  * the 10x ladder dir. The oracle row's ladder ratio conflates the two;
  * this separates them. `Test/runMain graft.SketchScaleProbe`.
  */
object SketchScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    for (dir <- Seq("/root/testdata/sf0.1", "target/ladder/sf1")) {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      def run(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
        val t = med((1 to 3).map(_ => time(
          build.write.format("noop").mode("overwrite").save())))
        println(f"[probe] $dir%-28s $label%-16s $t%6.2f s")
      }
      run("sketch-only")(ev.groupBy(col("event_type"))
        .agg(Sketches.hllDistinct(col("user_id")).as("d")))
      run("exact-only")(ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("d")))
    }
    spark.stop()
  }
}
