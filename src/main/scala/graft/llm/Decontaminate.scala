package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.Udfs

/** Benchmark decontamination: flag or drop corpus documents that share
  * word n-grams with a held-out evaluation set, the standard guard
  * against train/test leakage in LLM training-data pipelines (n-gram
  * overlap decontamination as published in the GPT-3 and Llama training
  * reports and the open dataset pipelines that follow them).
  *
  * Shape at 100 TB: the corpus side is MAP-ONLY — no explode, no
  * shuffle, no join. The benchmark side (an eval set: thousands of
  * documents, not terabytes) is reduced to its distinct n-gram hashes
  * in one tiny job, sorted into a primitive `Array[Long]`, and
  * broadcast; each corpus document then counts its own gram hits by
  * binary search inside a JIT'd kernel. 10M benchmark grams = 80 MB
  * broadcast — well inside executor memory; the default guard caps at
  * 100M grams (800 MB) so existing callers never trip it by surprise,
  * but ~20M (160 MB, the order of Spark's own broadcast-join ceiling)
  * is the RECOMMENDED operating point — pass `maxBenchGrams` explicitly
  * to enforce a tighter budget. For a benchmark set too
  * large to broadcast (`maxBenchGrams` guard), the fallback shape is a
  * broadcast-or-shuffle equi-join on exploded gram hashes; that path is
  * deliberately NOT implicit because exploding the 100 TB corpus side
  * multiplies it ~100x — the caller should know they asked for it.
  *
  * Gram identity (normalization, windows, short/empty-document rules)
  * is defined by [[Udfs.tokenGramHashes]]; hits count DISTINCT shared
  * grams, so a gram repeated in the corpus document counts once.
  *
  * Lifecycle notes: the benchmark reduction (distinct + collect) runs
  * EAGERLY when the returned plan is BUILT — constructing a
  * decontaminate step costs one small Spark job before anything
  * executes, and the sorted gram array lives as a broadcast until the
  * driver GCs the returned plan (the usual Spark broadcast contract —
  * a long-lived session stacking many decontaminate steps against
  * large benchmarks should drop plan references when done with them).
  */
object Decontaminate {

  /** Append `<textCol>_contam_hits`: how many of the document's
    * distinct n-grams appear anywhere in the benchmark set.
    */
  def markHits(corpus: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      maxBenchGrams: Int = 20000000): DataFrame = {
    val hits = hitsColumn(corpus, textCol, bench, benchTextCol, n, maxBenchGrams)
    corpus.withColumn(s"${textCol}_contam_hits", hits)
  }

  /** Keep only documents with fewer than `minHits` shared n-grams. */
  def drop(corpus: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8, minHits: Int = 1,
      maxBenchGrams: Int = 20000000): DataFrame = {
    val hits = hitsColumn(corpus, textCol, bench, benchTextCol, n, maxBenchGrams)
    corpus.filter(hits < lit(minHits))
  }

  /** Scale path for benchmark sets too large for the sorted-array
    * broadcast: a Bloom-filter pre-screen plus an exact equi-join
    * verify, with BIT-IDENTICAL results to [[markHits]].
    *
    * Shape at 100 TB: the benchmark gram set stays a DataFrame (never
    * collected); one aggregation builds a Bloom filter over it (~1.2
    * bytes/gram at 1% fpp vs 8 for the sorted array — 100M grams
    * broadcast in ~120 MB instead of 800 MB). The corpus pass is then
    * MAP-ONLY: each document screens its own grams against the
    * broadcast filter and the overwhelming majority — clean documents —
    * are done right there with hits=0. Only screened-in documents (true
    * contaminations plus the fpp sliver of false positives) explode
    * their grams into the exact equi-join verify, so the
    * explode-multiplies-the-corpus cost the eager-join fallback pays
    * everywhere is paid only on the contaminated fraction. False
    * positives cannot reach the output: the verify join is exact, so
    * a bloom-FP document joins nothing and lands at hits=0.
    *
    * Requires `idCol` to uniquely identify corpus rows (the verified
    * counts are joined back on it — a small broadcast join, the only
    * non-map corpus-side step).
    */
  def markHitsScalable(corpus: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val benchGrams = bench
      .select(explode(Udfs.tokenGramHashesUdf(col(benchTextCol), lit(n)))
        .as("__g"))
      .distinct().persist()
    // sizes the filter AND materializes the persist so the verify join
    // reads the cache instead of re-exploding the benchmark
    val m = benchGrams.count()
    if (m == 0) {
      // empty benchmark: nothing can be contaminated, and Spark's
      // stat.bloomFilter NPEs on an empty frame
      benchGrams.unpersist()
      return corpus.withColumn(s"${textCol}_contam_hits", lit(0))
    }
    val bloom = benchGrams.stat.bloomFilter("__g", m, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val screenUdf = udf((s: String) => {
      val b = bc.value
      val gs = Udfs.tokenGramHashes(s, n)
      var i = 0
      var hit = false
      while (i < gs.length && !hit) {
        if (b.mightContainLong(gs(i))) hit = true
        i += 1
      }
      hit
    })
    val flagged = corpus
      .filter(screenUdf(col(textCol)))
      .select(col(idCol).as("__did"),
        explode(Udfs.tokenGramHashesUdf(col(textCol), lit(n))).as("__g"))
    // per-doc gram arrays are already distinct (tokenGramHashes is a
    // set) and benchGrams is distinct, so count(*) = distinct shared
    val hits = flagged.join(benchGrams, Seq("__g"))
      .groupBy(col("__did")).agg(count(lit(1)).as("__hits"))
      .withColumnRenamed("__did", idCol)
    corpus.join(hits, Seq(idCol), "left")
      .withColumn(s"${textCol}_contam_hits",
        coalesce(col("__hits").cast("int"), lit(0)))
      .drop("__hits")
  }

  /** SURGICAL span decontamination: instead of dropping whole
    * documents, cut only the length-`n` token windows that appear in
    * the benchmark (case-insensitive token match, positions mapped
    * back to the raw tokens). Keeps everything the document says
    * around the leaked span — the higher-recall variant for corpora
    * where whole-document dropping wastes too much data.
    *
    * Shape at 100 TB: the benchmark reduces to its distinct positional
    * window hashes (one tiny job, sorted array broadcast — same
    * contract as [[markHits]]), and the corpus pass is ONE map-only
    * kernel per document that hashes windows, binary-searches the
    * broadcast set, and rewrites the text in place: no explode, no
    * shuffle, nothing position-wise materialized. Documents with no
    * contaminated window pass through byte-identical; rewritten
    * documents get the same single-space token rejoin as dedup-spans.
    */
  def dropSpans(corpus: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      maxBenchGrams: Int = 20000000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val grams: Array[Long] = bench
      .select(explode(Udfs.wsGramHashesLowerUdf(col(benchTextCol), lit(n)))
        .as("g"))
      .distinct().as[Long].collect()
    require(grams.length <= maxBenchGrams,
      s"decontaminate-spans: benchmark has ${grams.length} distinct " +
        s"$n-token windows (max $maxBenchGrams)")
    java.util.Arrays.sort(grams)
    val bc = spark.sparkContext.broadcast(grams)
    val cutUdf = udf((s: String) => Udfs.cutContaminatedSpans(s, n, bc.value))
    corpus.withColumn(textCol, cutUdf(col(textCol)))
  }

  /** Semantic (embedding) decontamination — the fourth leg beside the
    * n-gram, Bloom, and span legs: a corpus row whose cosine against
    * ANY eval-set embedding reaches `threshold` is a contamination
    * hit (paraphrased benchmark leakage that token n-grams miss).
    * Same 100 TB shape as the n-gram legs: the eval set (a benchmark —
    * thousands of vectors, not terabytes) is collected under
    * `maxEval`, L2-normalized once on the driver, and broadcast; the
    * corpus side is MAP-ONLY (scan → per-row max-dot kernel → filter),
    * no shuffle, no explode. Returns (idCol, `cosine`) hit rows;
    * compose with an anti-join or use [[dropSemantic]] for survivors.
    */
  def semanticHits(corpus: DataFrame, idCol: String, vecCol: String,
      eval: DataFrame, evalVecCol: String, threshold: Double,
      maxEval: Int = 100000): DataFrame =
    corpus.select(col(idCol),
        maxCosColumn(corpus, vecCol, eval, evalVecCol, maxEval)
          .as("cosine"))
      // Spark orders NaN ABOVE every double, so the null/zero-vector
      // sentinel would satisfy >= threshold — exclude it explicitly
      .where(col("cosine") >= threshold && !isnan(col("cosine")))

  /** Survivors of [[semanticHits]]: the corpus minus semantic
    * contamination — the same map-only plan with the filter flipped
    * (NaN-vector rows, undecidable, are kept).
    */
  def dropSemantic(corpus: DataFrame, idCol: String, vecCol: String,
      eval: DataFrame, evalVecCol: String, threshold: Double,
      maxEval: Int = 100000): DataFrame =
    // compute the kernel ONCE per row: the same UDF twice inside a
    // filter predicate (cos < t || isnan(cos)) is not guaranteed
    // common-subexpression-eliminated, and the kernel is
    // O(|eval| x dim)
    corpus.withColumn("__semcos",
        maxCosColumn(corpus, vecCol, eval, evalVecCol, maxEval))
      .where(col("__semcos") < threshold || isnan(col("__semcos")))
      .drop("__semcos")

  private def maxCosColumn(corpus: DataFrame, vecCol: String,
      eval: DataFrame, evalVecCol: String, maxEval: Int): Column = {
    val spark = corpus.sparkSession
    // null eval vectors are skipped, not NPE'd (same pattern as
    // Similarity's driver samples)
    val evalRows = eval.select(col(evalVecCol)).limit(maxEval + 1)
      .collect().flatMap(r => Option(r.getSeq[Float](0)).map(_.toArray))
    require(evalRows.length <= maxEval,
      s"decontaminate-semantic: eval set exceeds $maxEval vectors — " +
        "an eval benchmark should be small; for corpus-vs-corpus " +
        "similarity use semanticPairs/ANN instead")
    val units: Array[Array[Float]] = evalRows.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val bc = spark.sparkContext.broadcast(units)
    val maxCos = udf((v: Seq[Float]) => {
      if (v == null || v.isEmpty) Double.NaN
      else {
        val c = v.toArray
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
        val cn = math.sqrt(s)
        if (cn == 0) Double.NaN
        else {
          var best = -1.0
          var anyComparable = false
          val es = bc.value
          var e = 0
          while (e < es.length) {
            val u = es(e)
            if (u.length == c.length) {
              anyComparable = true
              var d = 0.0; var j = 0
              while (j < c.length) { d += u(j) * c(j).toDouble; j += 1 }
              val cos = d / cn
              if (cos > best) best = cos
            }
            e += 1
          }
          // a corpus/eval dimension mismatch is UNDECIDABLE, not
          // low-similarity: a truncated dot product understates the
          // cosine and lets contaminated rows slip under the
          // threshold — surface NaN (kept, flagged) like null/zero
          // vectors, unless a same-dimension eval vector gave a real
          // answer
          if (!anyComparable) Double.NaN else best
        }
      }
    })
    maxCos(col(vecCol))
  }

  private def hitsColumn(corpus: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int,
      maxBenchGrams: Int): Column = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // distinct-then-collect keeps driver traffic at one row per unique
    // gram; the count guard fails fast instead of OOMing the driver
    val grams: Array[Long] = bench
      .select(explode(Udfs.tokenGramHashesUdf(col(benchTextCol), lit(n))).as("g"))
      .distinct().as[Long].collect()
    require(grams.length <= maxBenchGrams,
      s"decontaminate: benchmark has ${grams.length} distinct $n-grams " +
        s"(max $maxBenchGrams ≈ ${maxBenchGrams / 125000} MB broadcast); " +
        "use markHitsScalable (Bloom pre-screen + exact verify, " +
        "bit-identical results) for benchmark sets this large")
    java.util.Arrays.sort(grams)
    val bc = spark.sparkContext.broadcast(grams)
    val hitsUdf = udf((s: String) => {
      val sorted = bc.value
      val gs = Udfs.tokenGramHashes(s, n)
      var c = 0
      var i = 0
      while (i < gs.length) {
        if (java.util.Arrays.binarySearch(sorted, gs(i)) >= 0) c += 1
        i += 1
      }
      c
    })
    hitsUdf(col(textCol))
  }
}
