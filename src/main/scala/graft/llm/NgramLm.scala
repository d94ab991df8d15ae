package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-trained n-gram language-model perplexity — the quality
  * signal the published curation pipelines actually rank by (CCNet
  * buckets documents by LM perplexity; LLaMA/RedPajama keep pages a
  * KenLM scores as Wikipedia-like). [[TextAnalysis.surprisalScore]]
  * is the unigram proxy; this is the real interpolated bigram model,
  * trained on a reference slice of the corpus IN the engine.
  *
  * Model: P(w|v) = λ·P_ml(w|v) + (1−λ)·P_add1(w), with P_ml = c(v,w)
  * / c(v) over a pruned bigram table and P_add1 = (c(w)+1) / (N+V+1)
  * an add-one unigram with one shared OOV bucket (never zero, so the
  * log is always defined; the bigram term drops to 0 at document
  * starts, unknown contexts, and pruned pairs — plain Jelinek-Mercer
  * interpolation).
  *
  * Scale shape: the model is BOUNDED — top-`maxVocab` unigrams and
  * top-`maxBigrams` surviving bigrams (two TakeOrdered actions with
  * deterministic count-then-token tie-breaks, the same guarded-driver
  * pattern as decontaminate's gram table) — and scoring is token
  * explode → THREE BROADCAST joins (token rows never shuffle) → one
  * narrow (doc, decimal-partial-sum) exchange. Cross-row sums are
  * DECIMAL(38,15), so scores are partitioning-invariant and exactly
  * replayable by an external SQL engine.
  */
object NgramLm {

  /** Bounded bigram LM: vocabulary with counts, pruned bigram counts,
    * corpus token total. All driver-held (≤ maxVocab + maxBigrams
    * entries by construction) and broadcast into the scoring plan.
    */
  case class BigramLm(unigrams: Array[(String, Long)],
      bigrams: Array[(String, String, Long)], total: Long) {
    def vocabSize: Int = unigrams.length
  }

  /** Train on the rows matching `refPred` (the reference slice — e.g.
    * a trusted high-quality source). Vocabulary = top `maxVocab`
    * tokens by count (ties → token asc); bigrams = consecutive
    * in-vocab pairs with count ≥ `minBigramCount`, top `maxBigrams`
    * (ties → pair asc).
    */
  def train(df: DataFrame, textCol: String, refPred: Column,
      maxVocab: Int = 65536, minBigramCount: Int = 2,
      maxBigrams: Int = 1 << 20): BigramLm =
    trainToks(df,
      graft.functions.Udfs.normTokensUdf(col(textCol)), refPred,
      maxVocab, minBigramCount, maxBigrams)

  /** [[train]] with a caller-supplied token-array column — the
    * shared-featurization spelling: a pipeline that has already
    * materialized (cached) the normTokens pass hands `col("__toks")`
    * instead of re-tokenizing the text. Identical model (same tokens,
    * same counts, same tie-breaks).
    */
  def trainToks(df: DataFrame, toksCol: Column, refPred: Column,
      maxVocab: Int = 65536, minBigramCount: Int = 2,
      maxBigrams: Int = 1 << 20): BigramLm = {
    require(maxVocab >= 1 && maxVocab <= (1 << 20), s"maxVocab $maxVocab")
    require(maxBigrams >= 1 && maxBigrams <= (1 << 24),
      s"maxBigrams $maxBigrams")
    val toks = df.where(refPred).select(toksCol.as("__toks"))
      .persist()
    try {
      val uniGrouped = toks
        .select(explode(col("__toks")).as("__t"))
        .groupBy("__t").count()
      val unigrams = uniGrouped
        .orderBy(col("count").desc, col("__t"))
        .limit(maxVocab).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      if (unigrams.isEmpty) return BigramLm(Array.empty, Array.empty, 0L)
      // grand total includes tokens outside the capped vocabulary
      val total =
        if (unigrams.length < maxVocab) unigrams.map(_._2).sum
        else uniGrouped.agg(sum("count")).head().getLong(0)
      val vocabSet = unigrams.map(_._1).toSet
      val vocabBc = toks.sparkSession.sparkContext.broadcast(vocabSet)
      val inVocab = udf((t: String) => vocabBc.value.contains(t))
      val n1 = greatest(size(col("__toks")) - 1, lit(0))
      val pairs = toks.select(explode(
        zip_with(
          slice(col("__toks"), lit(1), n1),
          slice(col("__toks"), lit(2), n1),
          (a, b) => struct(a.as("p"), b.as("w")))).as("__bg"))
        .select(col("__bg.p").as("__p"), col("__bg.w").as("__w"))
        .where(inVocab(col("__p")) && inVocab(col("__w")))
        .groupBy("__p", "__w").count()
        .where(col("count") >= minBigramCount)
        .orderBy(col("count").desc, col("__p"), col("__w"))
        .limit(maxBigrams).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      BigramLm(unigrams, pairs, total)
    } finally toks.unpersist()
  }

  /** Score every row: per-token interpolated log-probabilities summed
    * exactly per document. Appends `<outPrefix>_tokens` (BIGINT),
    * `<outPrefix>_logprob` (mean log-prob, null for token-less rows)
    * and `<outPrefix>_ppl` (exp(−mean)).
    */
  def score(df: DataFrame, textCol: String, idCol: String, lm: BigramLm,
      lambda: Double = 0.7, outPrefix: String = "lm"): DataFrame =
    scoreToks(df, graft.functions.Udfs.normTokensUdf(col(textCol)),
      idCol, lm, lambda, outPrefix)

  /** [[score]] with a caller-supplied token-array column (see
    * [[trainToks]]). */
  def scoreToks(df: DataFrame, toksCol: Column, idCol: String,
      lm: BigramLm, lambda: Double = 0.7, outPrefix: String = "lm")
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (lm.total == 0L)
      return df
        .withColumn(s"${outPrefix}_tokens", lit(0L))
        .withColumn(s"${outPrefix}_logprob", lit(null).cast("double"))
        .withColumn(s"${outPrefix}_ppl", lit(null).cast("double"))
    val uniDf = lm.unigrams.toSeq.toDF("__w", "__cu")
    val prevDf = lm.unigrams.toSeq.toDF("__p", "__cp")
    val biDf = lm.bigrams.toSeq.toDF("__p", "__w", "__cb")
    val vocabPlus = (lm.vocabSize + 1).toDouble
    // (prev, cur) pairs with a null prev at position 0: zip the
    // null-prefixed token array against the array itself
    val pairs = df.select(col(idCol).as("__id"), toksCol.as("__toks"))
      .select(col("__id"), explode(
        // zip_with pads to the LONGER array — slice back to the token
        // count so the null-prefixed zip doesn't emit a trailing
        // (last, null) pair
        slice(zip_with(
          concat(array(lit(null).cast("string")), col("__toks")),
          col("__toks"),
          (p, w) => struct(p.as("p"), w.as("w"))),
          lit(1), size(col("__toks")))).as("__t"))
      .select(col("__id"), col("__t.p").as("__p"), col("__t.w").as("__w"))
    val scored = pairs
      .join(broadcast(uniDf), Seq("__w"), "left")
      .join(broadcast(prevDf), Seq("__p"), "left")
      .join(broadcast(biDf), Seq("__p", "__w"), "left")
      .withColumn("__pbi",
        when(col("__cb").isNotNull && col("__cp").isNotNull,
          col("__cb").cast("double") / col("__cp"))
          .otherwise(lit(0.0)))
      .withColumn("__puni",
        (coalesce(col("__cu"), lit(0L)).cast("double") + lit(1.0)) /
          lit(lm.total.toDouble + vocabPlus))
      .withColumn("__logp",
        log(lit(lambda) * col("__pbi") + lit(1.0 - lambda) * col("__puni")))
    val perDoc = scored.groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__logp").cast(DecimalType(38, 15))).as("__lp"))
      .select(col("__id"), col("__n"),
        (col("__lp").cast("double") / col("__n")).as("__avg"))
    df.join(perDoc, df(idCol) === perDoc("__id"), "left")
      .withColumn(s"${outPrefix}_tokens", coalesce(col("__n"), lit(0L)))
      .withColumn(s"${outPrefix}_logprob", col("__avg"))
      .withColumn(s"${outPrefix}_ppl", exp(-col("__avg")))
      .drop("__id", "__n", "__avg")
  }

  /** Train-then-score in one call (the pipeline spelling). */
  def perplexity(df: DataFrame, textCol: String, idCol: String,
      refPred: Column, maxVocab: Int = 65536, minBigramCount: Int = 2,
      lambda: Double = 0.7, outPrefix: String = "lm"): DataFrame =
    score(df, textCol, idCol,
      train(df, textCol, refPred, maxVocab, minBigramCount),
      lambda, outPrefix)
}
