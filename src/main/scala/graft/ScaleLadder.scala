package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder harness: derives a larger dataset from an existing SF dir
  * by unioning K isomorphic copies, then times the heaviest registered
  * queries at both scales and reports the time ratio per query.
  *
  * The point (PERF.md "Knobs at real scale"): correctness runs at sf0.01
  * and the committed bench at sf0.1 — both small enough that a
  * super-linear plan (shuffle spill, driver-side state growth, banded-join
  * pair blowup) would not show up. A measured ~K x time ratio at K x the
  * rows is the cheapest possible evidence that the plan shapes really are
  * linear; anything well above K is an early 100x-scale warning.
  *
  * Copy construction keeps the WORKLOAD shape at the base rate instead of
  * degenerating it:
  *  - documents.text goes through a per-copy character bijection
  *    (translate over a 10-letter rotation). A bijection commutes with
  *    string equality, so each copy has exactly the base corpus's
  *    duplicate/near-duplicate structure internally, while cross-copy
  *    shingle spaces are disjoint — the global duplicate RATE stays at the
  *    base rate rather than every doc gaining K exact clones (which would
  *    turn the minhash banded join into an artificial hot-bucket storm).
  *  - id-like keys get per-copy offsets so uniqueness invariants hold.
  *  - embeddings get a per-copy diagonal ±1 sign flip (an exact isometry:
  *    intra-copy cosines preserved bit-for-bit, cross-copy cosines ~0), so
  *    the near-dup pair RATE and ANN neighborhoods scale linearly instead
  *    of every vector gaining K near-clones.
  *  - events keep their timestamp range (rows-per-window scales by K,
  *    which is what happens when a real stream gets busier) but user ids
  *    are offset (state scales in key count, the dimension that matters
  *    for mapGroupsWithState).
  *
  * Run: sbt "runMain graft.ScaleLadder"
  * Env: SPARK_GRAFT_SF_DIR (base, default /root/testdata/sf0.1),
  *      SPARK_GRAFT_LADDER_DIR (default target/ladder/sf1),
  *      SPARK_GRAFT_LADDER_COPIES (default 10),
  *      SPARK_GRAFT_LADDER_QUERIES (csv, default = top committed costs),
  *      SPARK_GRAFT_LADDER_RUNS (median-of-N, default 2),
  *      SPARK_GRAFT_LADDER_OUT (default SCALE_LADDER.json).
  */
object ScaleLadder {
  /** Per-copy text bijection: composed rotations of two DISJOINT
    * 10-letter alphabets give 100 distinct character bijections
    * (k = 0 is the identity), so ladders up to 100 copies keep every
    * copy's shingle space disjoint from every other's. The first
    * alphabet covers the most frequent English letters so nearly every
    * word (and therefore nearly every shingle hash) changes between
    * copies.
    */
  private val Alpha = "etaoinshrd"
  private val Alpha2 = "lucmgypwbv"
  private def rotOf(alpha: String, k: Int): String = {
    val d = alpha + alpha
    d.substring(k % alpha.length, k % alpha.length + alpha.length)
  }

  def generate(spark: SparkSession, baseDir: String, outDir: String,
               copies: Int): Unit = {
    // beyond 100 the composed rotations repeat (copy k = copy k-100),
    // minting exact cross-copy clones and silently corrupting the
    // measured ratios with an artificial hot-bucket storm
    require(copies >= 1 && copies <= 100,
      s"ScaleLadder: copies must be 1..100 (got $copies) — only 100 " +
        "distinct text bijections exist")
    val out = new java.io.File(outDir)
    def tbl(n: String): DataFrame =
      spark.read.parquet(s"$baseDir/$n.parquet")
    // parquet "file" paths in this layout are single files; write each
    // derived table as a directory of parts (the queries read either via
    // spark.read.parquet which handles both). 32 parts ≈ one per core so
    // scan parallelism at the ladder scale is realistic, not a
    // single-row-group artifact.
    def write(df: DataFrame, n: String): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$outDir/$n.parquet")
      System.err.println(s"[ladder] wrote $n")
    }

    val docs = tbl("documents")
    write((0 until copies).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else translate(
           translate(col("text"), Alpha, rotOf(Alpha, k % 10)),
           Alpha2, rotOf(Alpha2, k / 10))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _), "documents")

    val emb = tbl("embeddings")
    write((0 until copies).map { k =>
      // Per-copy diagonal ±1 sign flip — the vector analogue of the
      // text bijection. A diagonal isometry preserves every intra-copy
      // dot product EXACTLY (dot(Sx, Sy) = dot(x, y)), so each copy
      // reproduces the base corpus's near-dup/ANN structure; cross-copy
      // cosines collapse to ~N(0, 1/sqrt(d)) because the sign patterns
      // of two copies are uncorrelated. The r12 sweep's additive-jitter
      // form (±0.05) left cross-copy cosines at ~0.99, minting K-way
      // near-dup cliques: embedding_pairs' true output grew 878x at 10x
      // rows (138 -> 121,171 pairs) — a fixture artifact that buried
      // the linearity signal the ladder exists to measure.
      val e =
        if (k == 0) col("embedding")
        else transform(col("embedding"),
          (x, i) => x * (lit(1) - lit(2) *
            pmod(xxhash64(i, lit(k)), lit(2)).cast("int")).cast("float")
        ).cast("array<float>")
      emb.select(
        (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
        e.as("embedding"), col("label"))
    }.reduce(_ unionAll _), "embeddings")

    val li = tbl("lineitem")
    write((0 until copies).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 100000000L))
    }.reduce(_ unionAll _), "lineitem")

    val ev = tbl("events")
    write((0 until copies).map { k =>
      ev.withColumn("event_id", col("event_id") + lit(k.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(k.toLong * 10000000L))
    }.reduce(_ unionAll _), "events")

    // small dimension tables pass through unchanged so every registered
    // query can be pointed at the ladder dir
    for (n <- Seq("region", "nation", "customer", "supplier", "part", "orders"))
      write(tbl(n), n)
    out.mkdirs()
  }

  /** Default subset: every query whose committed sf0.1 cost is ≳0.7 s —
    * the plans whose scaling behavior actually matters.
    */
  val DefaultQueries: Seq[String] = Seq(
    "dedup_minhash", "dedup_minhash_cc", "minhash_pairs", "simhash_pairs",
    "dedup_exact", "dedup_spans_text", "decontaminate_bloom",
    "ann_brute_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_quantized_topk",
    "embedding_pairs", "normalize_embedding", "dequantize_embedding",
    "baseline_13_directive_recipe", "asof_join", "asof_join_forward",
    "range_join", "dedup_exact_keepbest",
    "stream_window_agg", "stream_dedup", "stream_sessionize",
    // sketch aggregates: constant-size buffers mean the only scale
    // dimension is the scan, so ratios near 1 are expected at 10x rows
    // on an underloaded 32-core box; anything near the copy count would
    // mean buffer growth is leaking into the merge path
    "hll_distinct", "hll_union_reaggregate", "kll_quantiles",
    "heavy_hitters", "topk_by_group", "sessionize_batch",
    "drift_psi", "zorder_values", "dedup_incremental_exact",
    "dedup_incremental_minhash")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ladderDir = sys.env.getOrElse("SPARK_GRAFT_LADDER_DIR", "target/ladder/sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_LADDER_COPIES", "10").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_LADDER_RUNS", "2").toInt
    val queries = sys.env.get("SPARK_GRAFT_LADDER_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$ladderDir/documents.parquet").exists ||
        sys.env.contains("SPARK_GRAFT_LADDER_FORCE")) {
      System.err.println(s"[ladder] generating ${copies}x $baseDir -> $ladderDir")
      generate(spark, baseDir, ladderDir, copies)
    }

    def materialize(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[ladder] $name failed at $dir: ${e.getMessage}")
        -1.0
      } finally spark.catalog.clearCache()
    }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.size / 2)
    }

    // warmup: same rationale as Bench — don't charge the first query for
    // classloading/codegen/JIT
    for (n <- Seq("baseline_13_directive_recipe", "dedup_minhash", "ann_brute_topk"))
      materialize(n, "/root/testdata/sf0.001")

    val rows = queries.map { n =>
      val b = median((1 to runs).map(_ => materialize(n, baseDir)))
      val l = median((1 to runs).map(_ => materialize(n, ladderDir)))
      val ratio = if (b > 0 && l > 0) l / b else -1.0
      System.err.println(f"[ladder] $n%-30s base=$b%7.2fs sf1=$l%7.2fs ratio=$ratio%5.1fx")
      (n, b, l, ratio)
    }

    def r3(v: Double) = if (v < 0) "-1" else f"$v%.3f"
    val json = rows.map { case (n, b, l, r) =>
      s""""$n":{"base":${r3(b)},"ladder":${r3(l)},"ratio":${r3(r)}}"""
    }.mkString(
      s"""{"copies":$copies,"base":"$baseDir","ladder":"$ladderDir","queries":{""",
      ",", "}}")
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_LADDER_OUT", "SCALE_LADDER.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
