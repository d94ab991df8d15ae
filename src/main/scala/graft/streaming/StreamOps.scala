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

  /** Normalize an event-time column to watermark-compatible
    * TimestampType: a nanosecond-precision LongType (read with
    * spark.sql.legacy.parquet.nanosAsLong=true — Spark has no
    * TIMESTAMP(NANOS) parquet type) becomes microsecond TimestampType,
    * and TIMESTAMP_NTZ (parquet isAdjustedToUTC=false, what pyarrow
    * writes for naive timestamps) is cast to TimestampType —
    * withWatermark only accepts TZ timestamps. The engine pins
    * spark.sql.session.timeZone=UTC, so the cast preserves the naive
    * wall clock exactly.
    */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, timestamp_micros(
          (col(tsCol) / 1000).cast(org.apache.spark.sql.types.LongType)))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Watermarked stream-stream INNER join — the impressions→
    * conversions shape (a `leftType` event joined to every
    * `rightType` event by the same user within `withinMs`). BOTH
    * sides carry watermarks and the join condition bounds event time
    * in BOTH directions, which is exactly what lets Spark expire join
    * state: a buffered left row can be dropped once the right
    * watermark passes `l_ts + within` — without the bound the state
    * grows forever. Self-splitting one source stream into the two
    * sides is the supported stream-stream self-join form.
    */
  def streamStreamJoin(events0: DataFrame, leftType: String,
      rightType: String, withinMs: Long,
      watermark: String = "1 hour"): DataFrame = {
    require(withinMs > 0, "streamStreamJoin: withinMs must be positive")
    val events = normalizeTs(events0, "ts")
    val left = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
      .withWatermark("r_ts", watermark)
    left.join(right,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          // MILLISECOND, not withinMs/1000 SECOND: integer division
          // silently collapsed sub-second bounds (500 ms → zero-width
          // join) and truncated 1500 ms → 1 s
          col("r_ts") <= col("l_ts") +
            expr(s"INTERVAL ${withinMs} MILLISECOND"))
      .select(col("user_id"), col("l_id"), col("r_id"))
  }

  /** Watermarked sliding-window aggregation over an event stream:
    * count + sum(value) per (window, event_type).
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, window_ : String = "5 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide), col(typeCol))
      // exact decimal accumulation: double sums are partition-order-
      // dependent at the last ulp, which flips 4-dp roundings downstream
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,6)")).cast("double")
          .as("total_value"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String,
      value: Double)
  case class SessionInfo(user_id: Long, n_events: Long, total_value: Double,
      closed: Boolean)
  /** Internal state: the running sum is fixed-point nanos (Long), so
    * accumulation is order-independent across micro-batch iterator
    * orderings — double folds differ at the last ulp per ordering,
    * which can flip downstream roundings. Error vs the exact sum is
    * <= n * 5e-10, far inside any sane rounding guard.
    */
  case class SessionAcc(n_events: Long, nanos: Long) // public: encoder codegen needs the ctor

  /** Keyed session state via mapGroupsWithState: per-user running
    * aggregates. `timeoutMs > 0` arms a processing-time session timeout
    * that closes idle sessions (long-running deployments); `<= 0` uses
    * NoTimeout — required when driving a bounded batch through
    * processAllAvailable, which never quiesces under re-arming timers.
    */
  def sessionize(events0: DataFrame, timeoutMs: Long = 0): DataFrame = {
    val events = normalizeTs(events0, "ts")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type").cast("string"), col("value").cast("double"))
      .as[Event]
    val timeoutKind =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[SessionAcc, SessionInfo](timeoutKind) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (timeoutMs > 0 && state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionInfo(uid, s.n_events, s.nanos / 1e9, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionAcc(0L, 0L))
            val (n, v) = rows.foldLeft((prev.n_events, prev.nanos)) {
              case ((cn, cv), e) => (cn + 1, cv + math.round(e.value * 1e9))
            }
            state.update(SessionAcc(n, v))
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            SessionInfo(uid, n, v / 1e9, closed = false)
          }
      }.toDF()
  }

  /** Native gap-based event-time sessions via `session_window` — the
    * scale-preferred sessionization: unlike the mapGroupsWithState
    * form above, session state lives in the state store as plain
    * window rows (merge handled by Spark's session-window operator),
    * is bounded by the watermark (append mode emits a session once
    * the watermark passes its end = last event + gap), and needs no
    * custom state class. Exact decimal value accumulation for the
    * same order-independence reason as [[windowedCounts]].
    */
  def sessionWindows(events0: DataFrame, tsCol: String = "ts",
      gap: String = "6 hours", watermark: String = "1 day"): DataFrame =
    normalizeTs(events0, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,6)")).cast("double")
          .as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Watermarked tumbling-window approximate distinct-count via the
    * mergeable HLL aggregate ([[org.apache.spark.sql.graftx.Sketches]]):
    * per open (window, type) group the state store holds ONE 4 KB
    * register set, not a per-key entry — the state stays bounded no
    * matter how many distinct ids a window sees, which is the only
    * distinct-count shape that survives an unbounded high-cardinality
    * stream (exact streaming countDistinct state grows with ids).
    */
  def windowedDistinct(events: DataFrame, tsCol: String, typeCol: String,
      idCol: String, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    normalizeTs(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(typeCol))
      .agg(org.apache.spark.sql.graftx.Sketches
        .hllDistinct(col(idCol)).as("approx_users"))

  /** Streaming exact dedup with BOUNDED state: duplicates are dropped
    * within the watermark horizon, and state for keys older than the
    * watermark is evicted — the only dedup shape that survives an
    * unbounded stream (a bare dropDuplicates grows state forever).
    */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    normalizeTs(stream, tsCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Recipe + error side-channel on a stream: per micro-batch, the
    * recipe runs once and the two DAG branches go to their own sinks
    * (foreachBatch is the Structured-Streaming shape for multi-output
    * queries). The batchDf is materialized once per batch so the main
    * and error branches don't recompute the source.
    */
  def wrangleStreamWithErrors(recipe: String, stream: DataFrame)(
      mainSink: (DataFrame, Long) => Unit,
      errorSink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val compiled = Wrangle.recipe(recipe)
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val cached = batch.persist()
      try {
        val result = compiled.run(cached)
        mainSink(result.output, id)
        errorSink(result.errors, id)
      } finally { cached.unpersist(); () }
    }
  }

  /** Drive a batch DataFrame through a streaming query synchronously
    * (memory sink) — the local-smoke harness shape from the Spark docs.
    *
    * `statePartitions` scope-sets spark.sql.shuffle.partitions for the
    * query's lifetime (restored after): a stateful streaming query
    * instantiates one state store per shuffle partition PER micro-batch,
    * so running a local smoke batch at the session's cluster-sized
    * partition count pays 32 store open/commit cycles per batch for
    * kilobytes of state. Result-invariant (partitioning never changes
    * streaming agg/dedup semantics); a real deployment sizes this to
    * its key cardinality, not to this harness default. 0 = leave the
    * session value.
    */
  def runBatchAsStream(spark: SparkSession, sourceDir: String,
      transform: DataFrame => DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Append,
      statePartitions: Int = 4): DataFrame = {
    // the events table carries TIMESTAMP(NANOS) — readable only as long.
    // Restored after the run: this is a session-wide legacy flag and a
    // later BATCH read of the same table must not inherit it.
    val prevNanos =
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val prevParts = spark.conf.getOption("spark.sql.shuffle.partitions")
    if (statePartitions > 0)
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    try {
    // FileStreamSource wants a directory; testdata tables are single
    // files — stage a symlink dir when given a file
    val src = {
      val p = java.nio.file.Paths.get(sourceDir)
      if (java.nio.file.Files.isDirectory(p)) sourceDir
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve(p.getFileName), p.toAbsolutePath)
        dir.toString
      }
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    // checkpoint on tmpfs when the box has one: every micro-batch
    // fsyncs offsets/commits/state snapshots through the checkpoint
    // manager, and on this harness's disk-backed /tmp those synchronous
    // writes dominate the fixed per-query streaming cost. The smoke
    // harness's checkpoint is throwaway by construction (temp dir,
    // bounded batch) — a real deployment MUST keep its checkpoint on
    // durable shared storage instead.
    val ckptBase = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory(ckptBase, "graft_ckpt_")
    // best-effort cleanup: tmpfs space is RAM — and it must run on the
    // FAILURE path too, or repeated failing runs leak RAM-backed
    // directories (ADVICE r17)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p,
          java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(c => rm(c)) finally s.close()
      }
      try java.nio.file.Files.deleteIfExists(p)
      catch { case _: java.io.IOException => () }
    }
    try {
      val q = transform(stream).writeStream
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt.toString)
        .format("memory")
        .queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally rm(ckpt)
    spark.table(queryName)
    } finally {
      prevNanos match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      if (statePartitions > 0) prevParts match {
        case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
        case None => spark.conf.unset("spark.sql.shuffle.partitions")
      }
    }
  }
}
