package graft.streaming

import graft.Wrangle
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface of the engine.
  *
  * The reference executes recipes inside CDAP streaming pipelines by
  * re-running the same row-at-a-time plugin per micro-batch
  * (reference: wrangler-transform Wrangler.java:353-420). Spark-native
  * equivalent: a recipe is a DataFrame→DataFrame function, so it drops
  * straight onto readStream sources; watermarked windowed aggregations
  * and keyed session state are genuine Structured Streaming operators.
  */
object StreamOps {

  /** Apply a recipe to a streaming DataFrame — recipes compile to the
    * same Column transformations, so the streaming planner accepts them
    * unchanged (no collect/sample-probe directives on this path).
    */
  def wrangleStream(recipe: String, stream: DataFrame): DataFrame =
    Wrangle.recipe(recipe).apply(stream)

  /** Watermarked sliding-window aggregation over an event stream:
    * count + sum(value) per (window, event_type).
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, window_ : String = "5 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String,
      value: Double)
  case class SessionInfo(user_id: Long, n_events: Long, total_value: Double,
      closed: Boolean)

  /** Keyed session state via mapGroupsWithState: per-user running
    * aggregates with a processing-time session timeout.
    */
  def sessionize(events: DataFrame, timeoutMs: Long = 30000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type").cast("string"), col("value").cast("double"))
      .as[Event]
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[SessionInfo, SessionInfo](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionInfo]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.copy(closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionInfo(uid, 0L, 0.0, closed = false))
            val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
              case ((cn, cv), e) => (cn + 1, cv + e.value)
            }
            val next = SessionInfo(uid, n, v, closed = false)
            state.update(next)
            state.setTimeoutDuration(timeoutMs)
            next
          }
      }.toDF()
  }

  /** Drive a batch DataFrame through a streaming query synchronously
    * (memory sink) — the local-smoke harness shape from the Spark docs.
    */
  def runBatchAsStream(spark: SparkSession, sourceDir: String,
      transform: DataFrame => DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
