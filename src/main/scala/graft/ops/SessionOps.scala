package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands) — the offline counterpart of
  * [[graft.streaming.StreamOps.sessionize]]: group an event stream into
  * sessions that close after `gapSeconds` of inactivity per user.
  *
  * Scale shape: everything runs inside windows partitioned by the user
  * key — ONE hash exchange of the events, per-key local sort, no global
  * window (PlanGateSpec's unpartitioned-window rule holds). Session
  * rollup is a partial-aggregable groupBy on (user, session_idx). At
  * 100 TB the cost is the one shuffle every per-user analysis needs; a
  * skewed power-user key is AQE-skew-splittable only at the rollup, so
  * pathological single-user firehoses should be pre-split upstream
  * (the same caveat any per-key ordered computation carries).
  */
object SessionOps {

  /** Label each event with its user-scoped session index (0-based).
    * An event starts a new session when it is the user's first event or
    * arrives more than `gapSeconds` after the previous one.
    */
  def attachSessionIds(events: DataFrame,
                       userCol: String,
                       tsCol: String,
                       gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"sessionize: gapSeconds=$gapSeconds must be positive")
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol), 1).over(byUser)
    // epoch seconds via cast("timestamp").cast("double"): correct for
    // TimestampType AND numeric epoch-seconds columns (a bare
    // unix_timestamp(bigint) goes long->string->parse, yields null, and
    // silently collapses every user into one session)
    def secs(c: Column) = c.cast("timestamp").cast("double")
    val isNew = when(prevTs.isNull, 1)
      .when(secs(col(tsCol)) - secs(prevTs) > gapSeconds, 1)
      .otherwise(0)
    events
      .withColumn("__new_session", isNew)
      // running sum over the SAME partitioned window: no extra shuffle
      .withColumn("session_idx",
        sum(col("__new_session")).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new_session")
  }

  /** Trailing time-window aggregates per key: each event gains the
    * count and sum of its key's events in the preceding `windowSeconds`
    * (inclusive of itself) — one range-frame window over the SAME
    * key-partitioned exchange sessionization uses; no self-join, no
    * candidate explosion however dense the history.
    */
  def rollingAgg(events: DataFrame,
                 keyCol: String,
                 tsCol: String,
                 valueCol: String,
                 windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"rollingAgg: windowSeconds must be positive")
    val secs = col(tsCol).cast("timestamp").cast("double")
    val w = Window.partitionBy(col(keyCol)).orderBy(secs)
      .rangeBetween(-windowSeconds, 0)
    events
      .withColumn("rolling_n", count(lit(1)).over(w))
      .withColumn("rolling_sum", round(sum(col(valueCol)).over(w), 4))
  }

  /** Time-series resample with gap filling: one row per (key, slot) for
    * every `stepSeconds` slot between each key's first and last event —
    * empty slots carry n_events = 0 and a forward-filled value. Shapes:
    * a per-key span aggregate, a generator explode for the slot spine
    * (output-linear), one co-partitioned slot join, and one key window
    * for the forward fill. `maxSlotsPerKey` guards the generator
    * against a key whose span / step would explode the output.
    */
  def resample(events: DataFrame,
               keyCol: String,
               tsCol: String,
               valueCol: String,
               stepSeconds: Long,
               maxSlotsPerKey: Long = 10000000L): DataFrame = {
    require(stepSeconds > 0, "resample: stepSeconds must be positive")
    val slot = floor(col(tsCol).cast("timestamp").cast("double") / stepSeconds)
      .cast("long")
    val slotted = events.withColumn("__slot", slot)
    val bySlot = slotted.groupBy(col(keyCol), col("__slot"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col(valueCol)), 4).as("value_mean"))
    // NOTE (r17 measurement): deriving this span from the bySlot
    // rollup instead is a no-op — Catalyst's RemoveRedundantAggregates
    // collapses min/max-over-a-rollup back to min/max over the raw
    // slots, producing this exact plan (two partial-aggregated scans,
    // kilobytes shuffled); the direct spelling is kept as the honest
    // one
    val spans = slotted.groupBy(col(keyCol))
      .agg(min(col("__slot")).as("__lo"), max(col("__slot")).as("__hi"))
    // in-plan guard (no eager job, no extra input scan): a key whose
    // slot COUNT (span + 1) exceeds the cap fails at execution time
    // with a targeted error instead of exploding the generator
    val guardedHi = when(
      col("__hi") - col("__lo") + 1 > maxSlotsPerKey,
      raise_error(concat(
        lit("resample: a key emits "),
        (col("__hi") - col("__lo") + 1).cast("string"),
        lit(s" slots at step $stepSeconds s (cap $maxSlotsPerKey) — " +
          "widen the step or raise the cap"))).cast("long"))
      .otherwise(col("__hi"))
    val slots = spans.select(col(keyCol),
      explode(sequence(col("__lo"), guardedHi)).as("__slot"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__slot"))
    slots.join(bySlot, Seq(keyCol, "__slot"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("value_ffill",
        last(col("value_mean"), ignoreNulls = true).over(w))
      .withColumnRenamed("__slot", "slot")
  }

  /** One row per (user, session): start/end, event count, and a sum over
    * `valueCol` if given. `session_idx` is the user's 0-based session
    * ordinal, deterministic given the event times.
    */
  def sessionize(events: DataFrame,
                 userCol: String,
                 tsCol: String,
                 gapSeconds: Long,
                 valueCol: Option[String] = None): DataFrame = {
    val labeled = attachSessionIds(events, userCol, tsCol, gapSeconds)
    val aggs: Seq[Column] = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++
      // Exact decimal sum: double addition is order-dependent across
      // partitionings, so summing DECIMAL(38,6) keeps the 4-dp rounding
      // below deterministic regardless of the physical plan.
      valueCol.map(v =>
        round(sum(col(v).cast("decimal(38,6)")), 4).cast("double")
          .as("total_value"))
    labeled
      .groupBy(col(userCol), col("session_idx"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
