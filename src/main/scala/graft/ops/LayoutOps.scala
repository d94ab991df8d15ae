package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Write-layout clustering: Morton (Z-order) interleaving of
  * equi-width column buckets, so that rows close in EVERY clustered
  * dimension land close in the output file order. At 100 TB this is
  * what makes multi-dimensional data skipping work: parquet row-group
  * min/max stats on z-clustered files prune scans for predicates on ANY
  * prefix-ish combination of the clustered columns, where sorting by
  * (a, b) only ever prunes on `a`.
  *
  * Everything is native Catalyst arithmetic (floor / shiftleft /
  * bitwiseAND inside whole-stage codegen): the only non-map-side work
  * is one bounded min/max stats action (2 values per column) and the
  * final range exchange that physically clusters the output.
  */
object LayoutOps {

  /** Spread a narrow input across the cluster BEFORE a CPU-heavy
    * per-row kernel when the scan produced fewer splits than the
    * session's parallelism — the guide-§2.5 input-skew remedy ("one
    * huge unsplittable file ... repartition immediately after the
    * read"). A tiny or unsplittable source otherwise serializes the
    * kernel onto one core while the rest idle.
    *
    * USE SPARINGLY — measure end-to-end, not the kernel. The r18
    * interleaved A/Bs found the isolated minhash kernel 2x faster
    * spread, yet every minhash/simhash/embedding pipeline NET SLOWER
    * (e.g. dedup_minhash 1.52 s unspread vs 2.28 s spread at sf0.1):
    * each downstream consumer of the spread frame multiplies its
    * map-task count by the core count, and that scheduling overhead
    * can exceed the kernel win. It pays only when the spread frame is
    * persisted AND feeds several concurrent consumers (the
    * model-training bases in QueryBank). Call it on a PROJECTED frame
    * (id + payload) so the exchange carries only what the kernel needs
    * (guide §2.3). At real scale inputs arrive in many splits, the
    * condition is false, and no shuffle is added.
    */
  def spread(df: DataFrame): DataFrame = {
    // dev-only measurement hook: lets a probe interleave spread-on/off
    // runs inside one JVM so contention waves hit both variants
    // equally (SpreadProbe/DedupProbe A/Bs). Never set in production.
    if (sys.props.contains("graft.spread.off")) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Attach `__zvalue`: each column is bucketed into 2^bits equi-width
    * cells from its own min/max (bounds from ONE stats pass; degenerate
    * all-equal columns collapse to bucket 0), and the bucket bits are
    * interleaved column-round-robin, lowest bit first.
    */
  def zorderValue(df: DataFrame, columns: Seq[String], bits: Int = 8): DataFrame = {
    require(columns.nonEmpty, "zorder: need at least one column")
    require(bits >= 1 && bits * columns.length <= 62,
      s"zorder: $bits bits x ${columns.length} cols overflows a long")
    val statsCols = columns.flatMap(c =>
      Seq(min(col(c).cast(DoubleType)).as(s"__lo_$c"),
        max(col(c).cast(DoubleType)).as(s"__hi_$c")))
    val stats = df.agg(statsCols.head, statsCols.tail: _*).head()
    val bounds = columns.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i))
        throw new IllegalArgumentException(
          s"zorder: column '$c' has no non-null values (empty input?)")
      (c, stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }
    val nBuckets = 1L << bits
    val bucketCols: Seq[Column] = bounds.map { case (c, lo, hi) =>
      val v = col(c).cast(DoubleType)
      if (hi > lo)
        least(greatest(
            floor((v - lit(lo)) * nBuckets / lit(hi - lo)), lit(0.0)),
          lit((nBuckets - 1).toDouble)).cast("long")
      else lit(0L)
    }
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      bucketCols.zipWithIndex.foldLeft(acc) { case (a, (bc, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bc, b).bitwiseAND(lit(1L)), b * columns.length + i))
      }
    }
    df.withColumn("__zvalue", z)
  }

  /** Equi-depth bucketing: assign each row a bucket 0..n-1 so buckets
    * hold ~equal row counts, with boundaries from ONE KLL sketch pass
    * (never a sort — the 100 TB stratification primitive behind
    * balanced splits and skew-aware partitioning). Boundaries are a
    * bounded (n-1)-value collect folded back as literals; the bucket
    * assignment is a codegen'd comparison chain, map-only.
    *
    * The sketch size SCALES WITH n (k = max(200, 40n) unless given):
    * rank error ~ 1/k, so a fixed k=200 (~1.7 %) would swamp the 1/n
    * bucket width as soon as n passes ~60 and quietly break the
    * equal-counts contract.
    */
  def equiDepthBuckets(df: DataFrame, column: String, n: Int,
      bucketCol: String = "bucket", k: Int = 0): DataFrame = {
    require(n >= 2 && n <= 1000, s"equiDepthBuckets: n=$n outside [2, 1000]")
    val kUse = if (k > 0) k else math.max(200, 40 * n)
    val probs = (1 until n).map(_.toDouble / n)
    val qs = df.agg(org.apache.spark.sql.graftx.Sketches
        .kllQuantiles(col(column).cast(DoubleType), probs, kUse).as("qs"))
      .head() match {
      case r if r.isNullAt(0) =>
        throw new IllegalArgumentException(
          s"equiDepthBuckets: column '$column' has no non-null values")
      case r => r.getSeq[Double](0)
    }
    val v = col(column).cast(DoubleType)
    val bucket = qs.map(b => when(v > lit(b), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn(bucketCol, when(v.isNull, lit(null)).otherwise(bucket))
  }

  /** Approximate percent-rank (CDF value) per row WITHOUT a global
    * sort/window: one KLL sketch pass, then the sketch's weighted
    * sample (≤ ~3k doubles at k=200) broadcasts inside a closure and
    * every row binary-searches its rank — map-only, any scale. Exact
    * when the sketch never compacted (n below capacity); ~1.7 % rank
    * error otherwise. Nulls rank as null.
    */
  def approxPercentRank(df: DataFrame, column: String,
      outCol: String = "percent_rank", k: Int = 200): DataFrame = {
    val sketchBytes = df.agg(org.apache.spark.sql.graftx.Sketches
        .kllSketchBinary(col(column).cast(DoubleType), k).as("s"))
      .head().getAs[Array[Byte]](0)
    val buf = org.apache.spark.sql.graftx.KllBuf.deserialize(sketchBytes)
    require(buf.n > 0,
      s"approxPercentRank: column '$column' has no non-null values")
    // the sketch's weighted sample as parallel sorted arrays — a
    // serializable, binary-search-fast closure payload
    val (values, cdf) = buf.weightedCdf()
    val rank = org.apache.spark.sql.functions.udf((v: java.lang.Double) =>
      if (v == null) null
      else {
        // rightmost index with values(i) <= v
        var lo = 0; var hi = values.length - 1; var ans = -1
        while (lo <= hi) {
          val m = (lo + hi) >>> 1
          if (values(m) <= v) { ans = m; lo = m + 1 } else hi = m - 1
        }
        java.lang.Double.valueOf(if (ans < 0) 0.0 else cdf(ans))
      })
    df.withColumn(outCol, rank(col(column).cast(DoubleType)))
  }

  /** Physically cluster the frame in z-order: range-repartition on the
    * interleaved value (each output partition covers one contiguous
    * z-range, so every clustered column is locally banded in every
    * file), keep the order inside partitions, drop the helper column.
    */
  def zorderBy(df: DataFrame, columns: Seq[String], bits: Int = 8,
      numPartitions: Option[Int] = None): DataFrame = {
    val withZ = zorderValue(df, columns, bits)
    val parted = numPartitions match {
      case Some(n) => withZ.repartitionByRange(n, col("__zvalue"))
      case None => withZ.repartitionByRange(col("__zvalue"))
    }
    parted.sortWithinPartitions(col("__zvalue")).drop("__zvalue")
  }
}
