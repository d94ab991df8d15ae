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
      valueCol.map(v => round(sum(col(v)), 4).as("total_value"))
    labeled
      .groupBy(col(userCol), col("session_idx"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
