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
    * (direction="backward"), earliest at-or-after ("forward"), or
    * closest in either direction ("nearest", ties to the at-or-before
    * side like pandas merge_asof) relative to the left row's time.
    * "nearest" still runs on the single key exchange — it adds a second
    * sorted window over the same partitioning, not a second shuffle.
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
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward|forward|nearest, got '$direction'")
    require(payload.nonEmpty, "asofJoin: payload must name at least one column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      "asofJoin: payload column names collide with left columns")
    require(!payload.map(p => s"$prefix$p").exists(leftCols.contains),
      s"asofJoin: output column names ($prefix<payload>) collide with left columns")

    val keyType = left.schema(leftKey).dataType.sql
    val timeType = left.schema(leftTime).dataType.sql
    // tiebreak keeps its ORIGINAL type: a cast to double would collapse
    // long values above 2^53 and silently void the determinism guarantee
    val tbType = rightTiebreak.map(c => right.schema(c).dataType.sql)
      .getOrElse("int")

    val kCol = "__asof_key"
    val tCol = "__asof_t"
    val side = "__asof_side" // 0 = right, 1 = left: right sorts first at
                             // equal times, so t_left == t_right matches
    val tb = "__asof_tb"
    // The matched right row travels as ONE struct (its time + payload
    // values), non-null exactly on right rows: last(struct, ignoreNulls)
    // then lands on the nearest right ROW as a unit. Carrying payload
    // columns individually is wrong — ignoreNulls would skip a matched
    // row's legitimately-null payload value and surface a STALE value
    // from an older row (and different payload columns could come from
    // different rows).
    val rp = "__asof_row"

    val lAligned = left.select(
      (leftCols.map(col) :+
        col(leftKey).cast(keyType).as(kCol) :+
        col(leftTime).cast(timeType).as(tCol) :+
        lit(1).as(side) :+
        lit(null).cast(tbType).as(tb) :+
        lit(null).cast(
          s"struct<__rt:$timeType,${payload.zipWithIndex.map { case (p, i) =>
            s"__p$i:${right.schema(p).dataType.sql}" }.mkString(",")}>")
          .as(rp)): _*)

    // null-key/null-time right rows can never be a match: removed up
    // front so they cannot become the carried struct
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType.sql).as(c)) :+
          col(rightKey).cast(keyType).as(kCol) :+
          col(rightTime).cast(timeType).as(tCol) :+
          lit(0).as(side) :+
          rightTiebreak.map(col(_).cast(tbType))
            .getOrElse(lit(0).cast(tbType)).as(tb) :+
          struct((col(rightTime).cast(timeType).as("__rt") +:
            payload.zipWithIndex.map { case (p, i) => col(p).as(s"__p$i") }): _*)
            .as(rp)): _*)

    // Within a (key, time) collision group the scan order is: right rows
    // ascending by tiebreak (so the last one seen — the survivor under
    // last() — carries the LARGEST tiebreak), then the left rows. For
    // "forward" the time axis flips but the within-time order must not.
    // Both windows share the key partitioning: one exchange, and
    // "nearest" pays only a second sort, never a second shuffle.
    val wB = Window.partitionBy(kCol)
      .orderBy(col(tCol).asc, col(side).asc, col(tb).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(kCol)
      .orderBy(col(tCol).desc, col(side).asc, col(tb).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val u = lAligned.unionByName(r)
    val carried = direction match {
      case "backward" =>
        u.withColumn(rp, last(col(rp), ignoreNulls = true).over(wB))
      case "forward" =>
        u.withColumn(rp, last(col(rp), ignoreNulls = true).over(wF))
      case _ => // nearest: closer of the two candidates, tie -> backward
        val tD = col(tCol).cast("double")
        val dB = tD - col("__rpB").getField("__rt").cast("double")
        val dF = col("__rpF").getField("__rt").cast("double") - tD
        u.withColumn("__rpB", last(col(rp), ignoreNulls = true).over(wB))
          .withColumn("__rpF", last(col(rp), ignoreNulls = true).over(wF))
          .withColumn(rp,
            when(col("__rpB").isNull, col("__rpF"))
              .when(col("__rpF").isNull, col("__rpB"))
              .when(dF < dB, col("__rpF"))
              .otherwise(col("__rpB")))
          .drop("__rpB", "__rpF")
    }

    // null-key/null-time LEFT rows are no-match by definition (standard
    // join null semantics). The time check is load-bearing for
    // direction="forward": its descending sort puts null-time left rows
    // AFTER every right row, where the window would hand them a
    // spurious "match"
    val rt = col(rp).getField("__rt")
    val matched = (tolerance match {
      case Some(tol) => rt.isNotNull &&
        abs(col(tCol).cast("double") - rt.cast("double")) <= tol
      case None => rt.isNotNull
    }) && col(tCol).isNotNull && col(kCol).isNotNull

    carried
      .withColumn("__asof_ok", matched)
      .where(col(side) === 1 && (if (inner) col("__asof_ok") else lit(true)))
      .select((leftCols.map(col) ++
        payload.zipWithIndex.map { case (p, i) =>
          when(col("__asof_ok"), col(rp).getField(s"__p$i"))
            .otherwise(lit(null)).as(s"$prefix$p")
        }): _*)
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
    val iv = explodeToCells(intervals, cell, loCol, hiCol, cellWidth,
      "rangeJoin")

    p.join(iv, Seq(cell), "inner")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(cell)
  }

  /** Shared grid-cell generator for [[rangeJoin]] / [[intervalJoin]]:
    * one row per cell a half-open [lo, hi) interval covers — the last
    * covered cell is the one containing the largest value strictly
    * below hi; degenerate hi <= lo intervals clamp to a single cell
    * and are removed by the caller's exact post-filter. Generator
    * guard (same contract as resample's slot spine): one mis-sized
    * cellWidth against one outlier interval would explode to millions
    * of cell rows PER ROW — fail with an actionable message instead of
    * silently materializing that. The `<= 0` arm catches Long overflow
    * of the span arithmetic on ±Infinity bounds, which would otherwise
    * bypass the cap.
    */
  private def explodeToCells(df: DataFrame, cell: String, loCol: String,
      hiCol: String, cellWidth: Double, op: String): DataFrame = {
    val maxCells = 10000L
    val first = floor(col(loCol).cast("double") / cellWidth).cast("long")
    val last = greatest(first,
      ceil(col(hiCol).cast("double") / cellWidth).cast("long") - 1)
    val span = last - first + lit(1L)
    val guardedLast = when(span > maxCells || span <= 0L,
      raise_error(concat(
        lit(s"$op: an interval covers "), span.cast("string"),
        lit(s" grid cells at cellWidth $cellWidth (cap $maxCells) — " +
          "widen cellWidth"))).cast("long"))
      .otherwise(last)
    df.withColumn(cell, explode(sequence(first, guardedLast)))
  }

  /** Interval-OVERLAP join — every (left, right) pair whose half-open
    * intervals [lo, hi) intersect: `a.lo < b.hi AND b.lo < a.hi`.
    * The two-sided generalization of [[rangeJoin]] (time-range overlap
    * against maintenance windows, span-vs-span conflict detection).
    *
    * Spark plans a bare overlap predicate as BroadcastNestedLoopJoin —
    * quadratic scan work however selective the predicate. Here both
    * sides explode to the grid cells they cover and equi-join on the
    * cell, so the shuffle is linear in rows × cells-per-interval and
    * only cell-cohabiting pairs are ever compared. A pair sharing k
    * cells would surface k times; instead of a distinct() over the
    * candidate stream (a second full shuffle) each pair is kept ONLY
    * at the first cell of its overlap region —
    * `cell == floor(max(a.lo, b.lo) / W)` — which both sides cover by
    * construction, recomputed per row with plain codegen arithmetic.
    *
    * `cellWidth` tunes cells-per-interval (≈ interval length / W + 1
    * copies of each row through the shuffle) against cell population;
    * size it near the typical interval length.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftLo: String, leftHi: String,
                   rightLo: String, rightHi: String,
                   cellWidth: Double): DataFrame = {
    require(cellWidth > 0, "intervalJoin: cellWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin: overlapping column names ${overlap.mkString(", ")}")

    val cell = "__iv_cell"
    val l = explodeToCells(left, cell, leftLo, leftHi, cellWidth,
      "intervalJoin")
    val r = explodeToCells(right, cell, rightLo, rightHi, cellWidth,
      "intervalJoin")
    l.join(r, Seq(cell), "inner")
      .where(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi))
      .where(col(cell) ===
        floor(greatest(col(leftLo), col(rightLo)).cast("double") / cellWidth)
          .cast("long"))
      .drop(cell)
  }

  /** Snapshot diff — changed-data detection between two versions of a
    * keyed table: one co-partitioned full-outer join on the key, row
    * status derived null-safely per compared column. Output: the key
    * columns + `diff_status` in {added, removed, changed, unchanged}.
    * At 100 TB both sides hash-exchange once on the key (bucket both
    * snapshots on it and even that disappears); nothing else moves.
    *
    * @param compareCols columns whose change flips a row to `changed`;
    *                    default = every shared non-key column
    */
  def snapshotDiff(current: DataFrame, previous: DataFrame,
      keys: Seq[String], compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff: need at least one key column")
    val comp =
      if (compareCols.nonEmpty) compareCols
      else current.columns.filterNot(keys.contains)
        .filter(previous.columns.contains).toSeq
    val cur = current.select((keys ++ comp).map(col): _*)
      .withColumn("__in_cur", lit(1))
    val prev = previous.select(
      keys.map(col) ++ comp.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__in_prev", lit(1))
    val joined = cur.join(prev, keys, "full_outer")
    val anyChanged = comp.map(c => !(col(c) <=> col(s"__p_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(keys.map(col) :+
      when(col("__in_prev").isNull, "added")
        .when(col("__in_cur").isNull, "removed")
        .when(anyChanged, "changed")
        .otherwise("unchanged").as("diff_status"): _*)
  }

  /** CDC apply: merge a changelog onto a base snapshot, latest-wins.
    * The changelog carries an operation column (`upsert` / `delete`)
    * and a version column; for every key the highest-version change
    * wins (ties break toward the higher operation string, then the
    * change beats the base row). Output = the next snapshot.
    *
    * Scale shape: union + ONE window partitioned by key (single hash
    * exchange of base+changes co-partitioned) — the same cost as any
    * per-key merge, with no driver state. Bucket the base snapshot on
    * the key and only the (much smaller) changelog moves.
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
      keys: Seq[String], opCol: String, versionCol: String): DataFrame = {
    require(keys.nonEmpty, "applyChanges: need at least one key column")
    val dataCols = base.columns.filterNot(keys.contains).toSeq
    require(dataCols.forall(changes.columns.contains),
      "applyChanges: changelog is missing base data columns")
    val tagged = base.select(
      (keys ++ dataCols).map(col) :+
        lit("upsert").as("__op") :+
        lit(Long.MinValue).as("__v"): _*)
    val ch = changes.select(
      (keys ++ dataCols).map(col) :+
        col(opCol).as("__op") :+
        col(versionCol).cast("long").as("__v"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__v").desc, col("__op").desc)
    tagged.unionByName(ch)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("__op") =!= "delete")
      .select((keys ++ dataCols).map(col): _*)
  }

  /** SCD Type-2 history builder: turn a keyed changelog (one row per
    * key per version) into validity intervals — each row gains
    * `valid_from` (its version), `valid_to` (the next version for the
    * key, null while current) and `is_current`. ONE window partitioned
    * by key (single hash exchange + per-key sort); consecutive
    * duplicate states are collapsed first so a no-op change does not
    * open a new interval.
    */
  def scd2(changes: DataFrame, keys: Seq[String], versionCol: String,
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2: need at least one key column")
    val comp =
      if (compareCols.nonEmpty) compareCols
      else changes.columns.filterNot(keys.contains)
        .filterNot(_ == versionCol).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    // collapse consecutive identical states (null-safe)
    val sameAsPrev = comp.map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduceOption(_ && _).getOrElse(lit(false))
    val collapsed = changes
      .withColumn("__dup", when(lag(col(versionCol), 1).over(w).isNotNull
        && sameAsPrev, true).otherwise(false))
      .where(!col("__dup")).drop("__dup")
    // second window over the collapsed set for the interval bounds
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    collapsed
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(versionCol)
  }

  /** Join pre-flight: the diagnostic to run BEFORE a 100 TB join.
    * Exact output cardinality (Σ count_left(k) × count_right(k)) and
    * the hottest key — the two numbers that predict skew stalls and
    * output explosions. Cost: one partial-aggregated count per side +
    * a join of the distinct-key-sized count tables; rows never move.
    * Output: one row (matched_keys, est_rows, hottest_key,
    * hottest_key_rows); ties on the hot key resolve to the largest key.
    */
  def joinSizeProfile(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val lc = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__cl"))
    val rc = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cr"))
    // decimal(38,0) arithmetic: two hot multi-billion-row sides would
    // wrap long products negative (non-ANSI) in EXACTLY the explosion
    // regime this diagnostic exists to flag
    lc.join(rc, "__k")
      .withColumn("__out",
        col("__cl").cast("decimal(38,0)") * col("__cr").cast("decimal(38,0)"))
      .agg(count(lit(1)).as("matched_keys"),
        sum(col("__out")).as("est_rows"),
        max(struct(col("__out"), col("__k"))).as("__top"))
      .select(col("matched_keys"), col("est_rows").cast("decimal(38,0)"),
        col("__top.__k").as("hottest_key"),
        col("__top.__out").as("hottest_key_rows"))
  }

  /** Salted equi-join — the remedy for the hot keys
    * [[joinSizeProfile]] flags. A hash-partitioned join puts EVERY row
    * of a hot key in one task; AQE's skew handling splits oversized
    * sort-merge partitions, but a single key's rows still co-locate
    * because correctness requires it. Salting breaks that: the
    * `left` (big, skewed) side gets a deterministic per-row salt in
    * [0, salt) — xxhash64 of the whole row, so retries and
    * repartitioning re-derive the same value — and the `right` (small
    * unreplicable-broadcast) side is exploded into `salt` replicas,
    * one per salt value. The join keys become (key, salt), spreading
    * each hot key over `salt` tasks at the cost of scanning the right
    * side `salt` times.
    *
    * Result rows are exactly the plain join's (each left row meets
    * exactly the one replica set carrying its salt). Supported join
    * types: inner, left / left_outer, left_semi, left_anti — the ones
    * whose semantics survive right-side replication. right/full outer
    * would emit unmatched right rows once per replica; use the plain
    * join (or swap sides) for those.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int,
      how: String = "inner"): DataFrame = {
    require(salt >= 1 && salt <= 4096, s"saltedJoin: salt $salt")
    val ok = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(ok(how.toLowerCase),
      s"saltedJoin: join type '$how' does not survive right-side " +
        "replication (unmatched right rows would appear once per salt)")
    // salt basis: every hash-SAFE left column (xxhash64 rejects map
    // types). Content-derived, so retries/repartitioning re-derive the
    // same salt; the documented limit is that rows identical across
    // the hash-safe columns share a salt — including rows that differ
    // ONLY in map-typed columns. If a hot key's rows are
    // distinguishable only by a map, project a stable scalar out of it
    // first (or pre-aggregate the duplicates).
    def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.MapType(_, _, _) => false
      case org.apache.spark.sql.types.ArrayType(et, _) => hashSafe(et)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashSafe(f.dataType))
      case _ => true
    }
    val basis = left.schema.fields.filter(f => hashSafe(f.dataType))
      .map(f => col(f.name))
    require(basis.nonEmpty,
      "saltedJoin: no hash-safe columns to derive the row salt from")
    val l = left
      .withColumn("__sj_key", col(leftKey))
      .withColumn("__sj_salt",
        pmod(xxhash64(basis.toIndexedSeq: _*), lit(salt.toLong))
          .cast("int"))
    val r = right
      .withColumn("__sj_key", col(rightKey))
      .withColumn("__sj_salt",
        explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq("__sj_key", "__sj_salt"), how)
      .drop("__sj_key", "__sj_salt")
  }
}
