package graft

import org.apache.spark.sql.functions._

/** Z-order layout clustering: Morton interleave correctness and the
  * locality/skipping property the layout exists for.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("zorderValue computes the Morton code on an exact grid") {
    // 4x4 grid, bits=2: equi-width bucketing from min/max is identity
    val d = (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toDF("x", "y")
    val z = graft.ops.LayoutOps.zorderValue(d, Seq("x", "y"), bits = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def morton(x: Int, y: Int): Long =
      (0 until 2).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum.toLong
    for (x <- 0 to 3; y <- 0 to 3)
      assert(z((x, y)) == morton(x, y), s"($x,$y)")
  }

  test("zorderValue: degenerate constant column buckets to zero") {
    val d = Seq((1.0, 7.0), (2.0, 7.0)).toDF("a", "b")
    val z = graft.ops.LayoutOps.zorderValue(d, Seq("a", "b"), bits = 2)
      .select("__zvalue").as[Long].collect().toSet
    // b contributes nothing; a buckets to 0 and 3 -> z = interleave(a)
    assert(z == Set(0L, 5L))
  }

  test("equiDepthBuckets: near-equal populations, order-preserving, null-safe") {
    val d = ((0 until 10000).map(i => ((i * i) % 9973).toDouble) :+
      Double.NaN).map(Option(_)).toDF("v")
      .selectExpr("CASE WHEN isnan(v) THEN NULL ELSE v END AS v")
    val b = graft.ops.LayoutOps.equiDepthBuckets(d, "v", 10)
    val counts = b.where(col("v").isNotNull).groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 10).toSet)
    counts.values.foreach(c =>
      assert(math.abs(c / 10000.0 - 0.1) < 0.03, counts.toString))
    // monotone: a larger value never lands in a smaller bucket
    val pairs = b.where(col("v").isNotNull)
      .orderBy("v").select("bucket").as[Int].collect()
    assert(pairs.sameElements(pairs.sorted))
    // null value -> null bucket
    assert(b.where(col("v").isNull).select("bucket").head().isNullAt(0))
  }

  test("approxPercentRank: bounded rank error in the compacted regime") {
    val n = 80000
    val d = new scala.util.Random(29).shuffle((0 until n).toVector)
      .map(_.toDouble).toDF("v")
    val ranked = graft.ops.LayoutOps.approxPercentRank(d, "v", k = 200)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    ranked.foreach { case (v, est) =>
      val exact = (v + 1) / n // distinct uniform values
      assert(math.abs(est - exact) < 0.03, s"v=$v est=$est exact=$exact")
    }
    // monotone in v
    val sorted = ranked.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }

  test("zorderBy clusters: disjoint partition z-ranges, corner stays local") {
    val rnd = new scala.util.Random(17)
    val d = (1 to 20000).map(_ => (rnd.nextDouble(), rnd.nextDouble()))
      .toDF("x", "y")
    val parted = graft.ops.LayoutOps.zorderBy(d, Seq("x", "y"), bits = 4,
      numPartitions = Some(16))
    // recompute z on the clustered output to check range disjointness
    val z = graft.ops.LayoutOps.zorderValue(parted, Seq("x", "y"), bits = 4)
      .select(spark_partition_id().as("pid"), col("__zvalue"))
    val ranges = z.groupBy("pid")
      .agg(min("__zvalue").as("lo"), max("__zvalue").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ =>
    }
    // both-dimensions-low corner (first quarter of x AND y) has z < 16
    // of 256 -> ~1/16 of rows -> must land in very few partitions
    val touched = z.where(col("__zvalue") < 16)
      .select("pid").distinct().count()
    assert(touched <= 3, s"corner touched $touched partitions")
  }
}
