package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / range join operators the built-in Spark surface lacks
  * (the brief's "compose existing ops if semantics allow" case: both are
  * expressed as single-shuffle compositions, no custom physical operator
  * needed — and crucially no BroadcastNestedLoopJoin / CartesianProduct
  * anywhere).
  *
  * Scale notes:
  *  - `asofJoin` is the union-merge formulation: tag both sides, union,
  *    ONE shuffle on the join key, per-key ordered window carries the
  *    most recent right-side payload forward onto left rows. Cost is a
  *    single hash exchange + sort of |L|+|R| rows — no row ever joins to
  *    more than one match, so there is no candidate explosion no matter
  *    how many right rows precede a left row (a naive
  *    `leftTime >= rightTime` range join is |L|x|avg preceding| and dies
  *    at scale). This is the shape a 1000-executor cluster wants: both
  *    inputs co-partitioned by key in one exchange.
  *  - `rangeJoin` maps the interval containment predicate onto a grid:
  *    intervals explode to the grid cells they cover, points hash to
  *    their cell, and the join becomes an equi-join on the cell id with
  *    the exact predicate re-applied as a post-filter. Shuffle volume is
  *    |points| + sum(interval width / cell width) — linear, co-located,
  *    AQE-skew-splittable, instead of the BroadcastNestedLoopJoin Spark
  *    plans for a bare non-equi condition.
  */
object JoinOps {

  /** As-of join: for each left row, attach the payload of the single
    * right row with the same key whose time is the latest at-or-before
    * (direction="backward") or earliest at-or-after ("forward") the left
    * row's time.
    *
    * @param payload      right-side columns carried onto the left rows
    *                     (emitted as `<prefix><name>`)
    * @param rightTiebreak orders right rows that share (key, time); the
    *                     LARGEST value wins, making the result
    *                     deterministic when right times collide
    * @param tolerance    max |leftTime - rightTime| in seconds; matches
    *                     further away are treated as no-match (pandas
    *                     merge_asof semantics)
    * @param inner        drop left rows with no match instead of
    *                     emitting them with null payloads
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String],
               direction: String = "backward",
               rightTiebreak: Option[String] = None,
               tolerance: Option[Double] = None,
               inner: Boolean = false,
               prefix: String = "asof_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got '$direction'")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      "asofJoin: payload column names collide with left columns")

    val keyType = left.schema(leftKey).dataType.sql
    val timeType = left.schema(leftTime).dataType.sql

    val kCol = "__asof_key"
    val tCol = "__asof_t"
    val side = "__asof_side" // 0 = right, 1 = left: right sorts first at
                             // equal times, so t_left == t_right matches
    val tb = "__asof_tb"
    val rt = "__asof_rt"     // matched right-row time (tolerance + inner)

    val lAligned = left.select(
      (leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType.sql).as(p)) :+
        col(leftKey).cast(keyType).as(kCol) :+
        col(leftTime).cast(timeType).as(tCol) :+
        lit(1).as(side) :+
        lit(null).cast("double").as(tb) :+
        lit(null).cast(timeType).as(rt)): _*)

    // null-key/null-time right rows can never be a match — and must be
    // removed up front, not just skipped by the rt carry: last(payload,
    // ignoreNulls) would still pick up a null-time row's payload while
    // rt came from an earlier row, an inconsistent half-match
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType.sql).as(c)) ++
          payload.map(col) :+
          col(rightKey).cast(keyType).as(kCol) :+
          col(rightTime).cast(timeType).as(tCol) :+
          lit(0).as(side) :+
          rightTiebreak.map(col(_).cast("double"))
            .getOrElse(lit(0.0)).as(tb) :+
          col(rightTime).cast(timeType).as(rt)): _*)

    // Within a (key, time) collision group the scan order is: right rows
    // ascending by tiebreak (so the last one seen — the survivor under
    // last() — carries the LARGEST tiebreak), then the left rows. For
    // "forward" the time axis flips but the within-time order must not.
    val ord: Seq[Column] =
      if (direction == "backward")
        Seq(col(tCol).asc, col(side).asc, col(tb).asc)
      else
        Seq(col(tCol).desc, col(side).asc, col(tb).asc)
    val w = Window.partitionBy(kCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(
      lAligned.unionByName(r)
        .withColumn(rt, last(col(rt), ignoreNulls = true).over(w))) {
      (d, p) => d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }

    // null-key/null-time LEFT rows are no-match by definition (standard
    // join null semantics). The time check is load-bearing for
    // direction="forward": its descending sort puts null-time left rows
    // AFTER every right row, where the window would hand them a
    // spurious "match"
    val matched = (tolerance match {
      case Some(tol) => col(rt).isNotNull &&
        abs(col(tCol).cast("double") - col(rt).cast("double")) <= tol
      case None => col(rt).isNotNull
    }) && col(tCol).isNotNull && col(kCol).isNotNull
    val masked = payload.foldLeft(carried.withColumn("__asof_ok", matched)) {
      (d, p) => d.withColumn(p,
        when(col("__asof_ok"), col(p)).otherwise(lit(null)))
    }

    val out = masked
      .where(col(side) === 1 && (if (inner) col("__asof_ok") else lit(true)))
      .select((leftCols.map(col) ++
        payload.map(p => col(p).as(s"$prefix$p"))): _*)
    out
  }

  /** Range (interval containment) join: pairs each point row with every
    * interval row satisfying lo <= point < hi, via grid bucketing.
    * Always inner — callers wanting existence semantics can distinct on
    * the point key afterwards.
    *
    * @param cellWidth grid cell size; pick ~ the median interval width.
    *                  Narrower cells shrink the post-filter waste but
    *                  grow the interval-side explosion (width/cellWidth
    *                  cells per interval).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                cellWidth: Double): DataFrame = {
    require(cellWidth > 0, "rangeJoin: cellWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"rangeJoin: overlapping column names ${overlap.mkString(", ")}")

    val cell = "__range_cell"
    val p = points.withColumn(cell,
      floor(col(pointCol).cast("double") / cellWidth).cast("long"))
    // half-open [lo, hi): the last covered cell is the one containing
    // the largest value strictly below hi; degenerate hi <= lo intervals
    // clamp to a single cell and are removed by the exact post-filter
    val iv = intervals.withColumn(cell,
      explode(sequence(
        floor(col(loCol).cast("double") / cellWidth).cast("long"),
        greatest(
          floor(col(loCol).cast("double") / cellWidth).cast("long"),
          ceil(col(hiCol).cast("double") / cellWidth).cast("long") - 1))))

    p.join(iv, Seq(cell), "inner")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(cell)
  }
}
