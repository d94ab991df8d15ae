package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamSpec extends SparkSpec {

  private val eventsDir = "/root/testdata/sf0.001"

  // the batch-equivalence reads below open the TIMESTAMP(NANOS) events
  // table directly; runBatchAsStream scopes this flag to its own run
  // and restores it, so the suite must opt in for its own batch reads
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  test("recipe applies unchanged to a streaming source") {
    val out = StreamOps.runBatchAsStream(spark, s"$eventsDir/events.parquet",
      st => StreamOps.wrangleStream(
        "filter-row exp:{ value > 0 } false; set-column :v2 exp:{ value * 2 };", st),
      queryName = "stream_recipe")
    assert(out.count() > 0)
    assert(out.columns.contains("v2"))
    val bad = out.filter(col("value") <= 0).count()
    assert(bad == 0)
  }

  test("watermarked windowed aggregation over the event stream") {
    val out = StreamOps.runBatchAsStream(spark, s"$eventsDir/events.parquet",
      st => StreamOps.windowedCounts(st, "ts", "event_type", "value",
        window_ = "1 hour", slide = "1 hour"),
      // Update mode: Append would hold back the newest (still-open)
      // window until the watermark passes it — correct but untestable
      // with a single micro-batch
      queryName = "stream_windows", outputMode = OutputMode.Update)
    assert(out.columns.toSet == Set("window", "event_type", "n", "total_value"))
    // batch equivalence: same grouped totals
    val batch = StreamOps.normalizeTs(
        spark.read.parquet(s"$eventsDir/events.parquet"), "ts")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(out.agg(sum("n")).head().getLong(0) ==
      batch.agg(sum("n")).head().getLong(0))
  }

  test("stream-stream join: watermarked self-join equals the batch interval join") {
    val out = StreamOps.runBatchAsStream(spark, s"$eventsDir/events.parquet",
      st => StreamOps.streamStreamJoin(st, "view", "purchase",
        withinMs = 86400000L),
      queryName = "stream_ssj")
    val ev = StreamOps.normalizeTs(
      spark.read.parquet(s"$eventsDir/events.parquet"), "ts")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("vid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val batch = v.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr("INTERVAL 86400 SECOND"))
      .select("user_id", "vid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the logical plan carries watermarks on BOTH sides and the
    // two-directional event-time bound — the preconditions for
    // watermark-driven join-state eviction (without them Spark
    // rejects or buffers forever)
    val st = spark.readStream
      .schema(spark.read.parquet(s"$eventsDir/events.parquet").schema)
      .parquet(eventsDir + "/events.parquet")
    val plan = StreamOps.streamStreamJoin(st, "view", "purchase",
      86400000L).queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), plan.take(2000))
    assert(plan.contains("l_ts") && plan.contains("r_ts"))
  }

  test("stream-stream join: sub-second withinMs holds exactly (r14 advice)") {
    // before the fix, INTERVAL ${withinMs/1000} SECOND truncated
    // withinMs=500 to a zero-width bound (empty join) and 1500 → 1 s
    val dir = java.nio.file.Files.createTempDirectory("ssj_ms").toString
    val t0 = 1700000000000L
    val rows = Seq(
      Row(1L, new java.sql.Timestamp(t0), "view", 10L, 1.0),
      Row(1L, new java.sql.Timestamp(t0 + 400), "purchase", 11L, 1.0), // in
      Row(2L, new java.sql.Timestamp(t0), "view", 20L, 1.0),
      Row(2L, new java.sql.Timestamp(t0 + 600), "purchase", 21L, 1.0)) // out
    df("user_id LONG, ts TIMESTAMP, event_type STRING, event_id LONG, value DOUBLE",
      rows).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StreamOps.runBatchAsStream(spark, s"$dir/events.parquet",
      st => StreamOps.streamStreamJoin(st, "view", "purchase",
        withinMs = 500L),
      queryName = "stream_ssj_ms")
    val pairs = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 10L, 11L))) // 400 ms in, 600 ms out
  }

  test("mapGroupsWithState sessionization emits per-user aggregates") {
    val out = StreamOps.runBatchAsStream(spark, s"$eventsDir/events.parquet",
      st => StreamOps.sessionize(st),
      queryName = "stream_sessions", outputMode = OutputMode.Update)
    assert(out.count() > 0)
    val batchUsers = spark.read.parquet(s"$eventsDir/events.parquet")
      .select("user_id").distinct().count()
    assert(out.select("user_id").distinct().count() == batchUsers)
  }

  test("streaming dedup drops within-watermark duplicates, bounded state") {
    // duplicate every event id by unioning the stream source with itself
    val src = s"$eventsDir/events.parquet"
    val out = StreamOps.runBatchAsStream(spark, src,
      st => StreamOps.streamingDedup(st.union(st), Seq("event_id"), "ts"),
      queryName = "stream_dedup", outputMode = OutputMode.Append)
    val distinctIds = spark.read.parquet(src).select("event_id").distinct().count()
    assert(out.count() == distinctIds)
  }

  test("curation ops compose on a stream: redact + lang-id + fingerprint dedup") {
    // per-row llm directives are plain Column ops, so a curation recipe
    // runs unchanged on a stream; content dedup = fingerprint +
    // within-watermark drop (bounded state)
    val src = s"$eventsDir/events.parquet"
    val out = StreamOps.runBatchAsStream(spark, src,
      st => {
        val enriched = StreamOps.wrangleStream(
          "set-column :txt exp:{ concat('mail u', user_id, '@ex.com re the ', event_type) }; " +
            "redact-pii :txt; lang-id :txt; fingerprint :txt;", st)
        StreamOps.streamingDedup(enriched, Seq("txt_fingerprint"), "ts")
      },
      queryName = "stream_curation", outputMode = OutputMode.Append)
    assert(out.filter(col("txt").contains("@")).count() == 0)
    assert(out.filter(!col("txt").contains("[EMAIL]")).count() == 0)
    // after redaction the text varies only by event_type, so the
    // fingerprint dedup keeps exactly one row per type
    val types = spark.read.parquet(src).select("event_type").distinct().count()
    assert(out.count() == types)
  }

  test("decontamination scores a stream against a batch benchmark") {
    // the benchmark side reduces to a broadcast array at PLAN BUILD
    // time (batch job); the corpus side is one more projection, so
    // markHits composes onto a stream like any stateless op
    val bench = df("q STRING", Seq(Row("purchase completed by user")))
    val src = s"$eventsDir/events.parquet"
    val out = StreamOps.runBatchAsStream(spark, src,
      st => {
        val withTxt = StreamOps.wrangleStream(
          "set-column :txt exp:{ concat(event_type, ' completed by user') };", st)
        graft.llm.Decontaminate.markHits(withTxt, "txt", bench, "q", n = 3)
      },
      queryName = "stream_decontam", outputMode = OutputMode.Append)
    // 'purchase' rows match both benchmark 3-grams ("purchase
    // completed by", "completed by user"); every other type shares
    // only "completed by user"
    val hits = out.groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.max("txt_contam_hits").as("h"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hits("purchase") == 2, s"got $hits")
    assert(hits.filter(_._1 != "purchase").values.forall(_ == 1), s"got $hits")

    // the SURGICAL variant is one fused map-only kernel, so it
    // composes on a stream the same way: the leaked window is cut,
    // the surrounding tokens survive
    val cut = StreamOps.runBatchAsStream(spark, src,
      st => {
        val withTxt = StreamOps.wrangleStream(
          "set-column :txt exp:{ concat('prefix kept ', event_type, ' completed by user') };", st)
        graft.llm.Decontaminate.dropSpans(withTxt, "txt", bench, "q", n = 3)
      },
      queryName = "stream_decontam_spans", outputMode = OutputMode.Append)
    val purchase = cut.filter(col("event_type") === "purchase")
      .select("txt").head().getString(0)
    assert(purchase == "prefix kept", s"got '$purchase'")
  }

  test("hash sampling and chunking compose on a stream") {
    // all three are stateless projections/generators, so the streaming
    // planner accepts them unchanged — the same subset and the same
    // chunks come out as in batch (hash decisions are key-pure)
    val src = s"$eventsDir/events.parquet"
    def shape(st: org.apache.spark.sql.DataFrame) = {
      val withTxt = StreamOps.wrangleStream(
        "set-column :txt exp:{ concat(event_type, ' by user ', user_id, ' value recorded today') }; " +
          "sample-by-hash :user_id 0.5; hash-split :user_id 'a:0.5,b:0.5' '' bucket;", st)
      graft.llm.TextAnalysis.chunkText(withTxt, "txt", 3, 1)
    }
    val streamed = StreamOps.runBatchAsStream(spark, src, shape,
      queryName = "stream_hashops", outputMode = OutputMode.Append)
    val batch = shape(spark.read.parquet(src))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    val sKeys = streamed.select("user_id", "chunk_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val bKeys = batch.select("user_id", "chunk_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(sKeys == bKeys)
  }

  test("streaming error channel: foreachBatch splits main and error rows") {
    val src = s"$eventsDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_err_")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(src).toAbsolutePath)
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val mains = scala.collection.mutable.ArrayBuffer.empty[Long]
    val errs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.wrangleStreamWithErrors(
      "send-to-error exp:{ value > 100 } 'too big';", stream)(
      (df, _) => mains += df.count(),
      (df, _) => errs += df.count())
      .start()
    q.processAllAvailable()
    q.stop()
    val total = spark.read.parquet(src).count()
    val big = spark.read.parquet(src).filter(col("value") > 100).count()
    assert(mains.sum == total - big)
    assert(errs.sum == big)
  }

  test("quality gate monitors a stream per micro-batch via foreachBatch") {
    // the streaming deployment shape for quality-report: evaluate the
    // rule suite on every micro-batch and collect verdicts — a failing
    // batch is visible the moment it lands
    val src = s"$eventsDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_q_")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(src).toAbsolutePath)
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val rules = graft.ops.QualityOps.parse(
      "rowcount >= 1; null_frac(event_type) <= 0.0; min(value) >= -1e9")
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.QualityOps.report(df, rules).collect().foreach(r =>
          verdicts += (r.getString(0) -> r.getBoolean(3)))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(verdicts.nonEmpty && verdicts.forall(_._2),
      verdicts.filterNot(_._2).toString)
    assert(verdicts.map(_._1).distinct.size == 3)
  }

}
