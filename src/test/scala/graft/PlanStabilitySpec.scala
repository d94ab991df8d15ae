package graft

import java.nio.file.Files

import graft.ops.PlanStability
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** The layout-stability classifier plus the two directives that consume
  * it. The scale claim under test: a header=true CSV recipe or an
  * increment-variable over a RAW FILE SCAN must materialize NOTHING
  * (no localCheckpoint → no LogicalRDD in the result plan), while an
  * unstable upstream (post-repartition, sample, rand()) must still pin.
  */
class PlanStabilitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val nation = spark.read.parquet(s"$sfDir/nation.parquet")

  private def hasCheckpoint(d: DataFrame): Boolean =
    d.queryExecution.analyzed.collect { case l: LogicalRDD => l }.nonEmpty

  // ---- classifier: stable shapes -----------------------------------

  test("file scan is stable") {
    assert(PlanStability.stableLayout(nation))
  }

  test("file scan + narrow deterministic ops is stable") {
    val d = nation.filter(col("n_regionkey") > 0)
      .select(upper(col("n_name")).as("n"), col("n_nationkey"))
    assert(PlanStability.stableLayout(d))
  }

  test("local relation is stable, including under a limit") {
    val d = spark.range(0).sparkSession.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("a"), org.apache.spark.sql.Row("b")),
      org.apache.spark.sql.types.StructType.fromDDL("s string"))
    assert(PlanStability.stableLayout(d))
    assert(PlanStability.stableLayout(d.limit(1)))
  }

  test("range is stable") {
    assert(PlanStability.stableLayout(spark.range(100).toDF()))
  }

  // ---- classifier: unstable shapes ---------------------------------

  test("shuffles, samples, nondeterminism, unions, and file-scan limits are unstable") {
    assert(!PlanStability.stableLayout(nation.repartition(3)))
    assert(!PlanStability.stableLayout(nation.sample(0.5)))
    assert(!PlanStability.stableLayout(nation.withColumn("r", rand())))
    assert(!PlanStability.stableLayout(nation.union(nation)))
    assert(!PlanStability.stableLayout(nation.limit(5)))
    assert(!PlanStability.stableLayout(
      nation.groupBy("n_regionkey").agg(count(lit(1)))))
    assert(!PlanStability.stableLayout(
      nation.join(nation.select(col("n_nationkey").as("k")),
        col("n_nationkey") === col("k"))))
  }

  // ---- wired: parse-as-csv header probe ----------------------------

  private def csvFileDf(): DataFrame = {
    val dir = Files.createTempDirectory("graft_stab").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "in.csv")
    val w = new java.io.PrintWriter(f)
    w.println("first_name,last_name,city")
    (1 to 40).foreach(i => w.println(s"fn$i,ln$i,c$i"))
    w.close()
    spark.read.text(f.getAbsolutePath).withColumnRenamed("value", "body")
  }

  test("header=true over a raw file scan materializes no checkpoint") {
    val out = wrangle("parse-as-csv :body ',' true", csvFileDf())
    assert(!hasCheckpoint(out), "stable file-scan upstream must not pin:\n" +
      out.queryExecution.analyzed.toString)
    // and the semantics still hold: header consumed, names applied
    assert(out.columns.toSeq.containsSlice(Seq("first_name", "last_name", "city")))
    assert(out.count() === 40)
    assert(!strings(out, "first_name").contains("first_name"))
  }

  test("header=true over an unstable (repartitioned) upstream still pins") {
    val out = wrangle("parse-as-csv :body ',' true", csvFileDf().repartition(3))
    assert(hasCheckpoint(out), "unstable upstream must keep the pin")
    // after a round-robin shuffle the header line is usually not the
    // first physical row any more, so it may legitimately survive as
    // data (header detection is strictly first-row, like the reference)
    assert(Set(40L, 41L).contains(out.count()))
  }

  // ---- wired: increment-variable -----------------------------------

  test("increment-variable over a raw file scan materializes no checkpoint") {
    val out = wrangle("increment-variable ctr 1 n_regionkey > 1", nation)
    assert(!hasCheckpoint(out), "stable file-scan upstream must not pin:\n" +
      out.queryExecution.analyzed.toString)
    // running total still correct: final value = global matching count
    val total = out.agg(max(col("ctr"))).collect()(0).getLong(0)
    val expected = nation.filter(col("n_regionkey") > 1).count()
    assert(total === expected)
  }

  test("increment-variable over an unstable upstream still pins") {
    val out = wrangle("increment-variable ctr 1 n_regionkey > 1",
      nation.repartition(4))
    assert(hasCheckpoint(out), "unstable upstream must keep the pin")
    val total = out.agg(max(col("ctr"))).collect()(0).getLong(0)
    assert(total === nation.filter(col("n_regionkey") > 1).count())
  }

  test("pin upgrades to a reliable checkpoint when a dir is configured") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    val dir = Files.createTempDirectory("graft_ckpt").toFile
    dir.deleteOnExit()
    sc.setCheckpointDir(dir.getAbsolutePath)
    try {
      val out = wrangle("increment-variable ctr 1 n_regionkey > 1",
        nation.repartition(4))
      assert(hasCheckpoint(out), "unstable upstream must keep the pin")
      // the reliable path writes RDD files under the configured dir
      val wrote = dir.listFiles != null && dir.listFiles.nonEmpty
      assert(wrote, "reliable checkpoint must materialize to the dir")
      val total = out.agg(max(col("ctr"))).collect()(0).getLong(0)
      assert(total === nation.filter(col("n_regionkey") > 1).count())
    } finally {
      // SparkContext has no public unset and the session is shared
      // JVM-wide across suites; restore via the private[spark] setter
      // (public in bytecode) so other suites keep the local default
      sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[String]])
        .invoke(sc, None)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }
}
