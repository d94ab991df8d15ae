package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Unigram-LM subword tokenization (the SentencePiece unigram model,
  * Kudo 2018 — the tokenizer family most modern LMs actually train
  * with), learned on the corpus itself like [[Bpe]]:
  *
  *  - the word-frequency table is the ONLY distributed input (one
  *    partial-aggregated groupBy, top `maxWords` types collected with
  *    a deterministic tie-break) — training cost is independent of
  *    corpus size beyond that single pass;
  *  - the driver seeds a substring vocabulary scored by
  *    frequency × length, then runs hard-EM (Viterbi E-step, count
  *    re-estimation M-step) and prunes to `vocabSize` — Viterbi-EM
  *    rather than full forward-backward keeps every step exactly
  *    integer/argmax-deterministic, the property the pinned oracle
  *    pattern needs;
  *  - encoding is a map-only broadcast kernel: per word, the Viterbi
  *    segmentation under the learned piece log-probs, with a
  *    single-character fallback floor so ANY text is encodable.
  *
  * Words are pre-processed SentencePiece-style with the `▁` word
  * marker prepended, so the piece vocabulary itself distinguishes
  * word-initial from word-internal pieces.
  */
object UnigramLm {

  /** SentencePiece word-boundary marker (U+2581 LOWER ONE EIGHTH
    * BLOCK), prepended to every word before training and encoding.
    */
  val WordMark = "▁"

  /** Log-prob floor for characters outside the learned vocabulary. */
  private val UnkLogProb = math.log(1e-10)

  /** pieces: piece → log-prob; maxLen: longest piece, bounds the
    * Viterbi inner loop.
    */
  final case class Model(pieces: Map[String, Double], maxLen: Int)

  /** One distributed pass for the bounded word-frequency table, then
    * the driver-side trainer.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 2000,
      maxWords: Int = 50000, maxPieceLen: Int = 10,
      emIters: Int = 3): Model = {
    val words = df
      .select(explode(split(lower(coalesce(col(textCol).cast(StringType),
        lit(""))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromFreqs(words.toSeq, vocabSize, maxPieceLen, emIters)
  }

  /** Driver-side trainer over an explicit word-frequency table
    * (exposed for tests). Every step is deterministic: seed selection,
    * Viterbi ties, pruning, and re-estimation all carry explicit
    * orderings.
    */
  def trainFromFreqs(words: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 10, emIters: Int = 3): Model = {
    require(vocabSize >= 1, "unigram: vocabSize must be >= 1")
    require(maxPieceLen >= 1 && emIters >= 1, "unigram: bad parameters")
    // an all-null/empty corpus trains an empty model; encodeText still
    // covers any text through the single-char UNK floor (Bpe's empty
    // table degrades the same way)
    if (words.isEmpty) return Model(Map.empty, 1)
    val marked = words.map { case (w, c) => (WordMark + w, c) }

    // ---- seed: substrings scored by frequency x length --------------
    val seedCounts = new java.util.HashMap[String, Long]()
    marked.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var len = 1
        while (len <= maxPieceLen && i + len <= w.length) {
          val sub = w.substring(i, i + len)
          seedCounts.merge(sub, c * len, _ + _)
          len += 1
        }
        i += 1
      }
    }
    // required coverage: every single character always stays
    val chars: Set[String] = marked.flatMap(_._1.map(_.toString)).toSet
    val seedSize = math.max(vocabSize * 4, chars.size + vocabSize)
    import scala.jdk.CollectionConverters._
    val seed: Seq[String] = seedCounts.entrySet().asScala.toSeq
      .sortBy(e => (-e.getValue, e.getKey))
      .take(seedSize).map(_.getKey) ++ chars
    var probs: Map[String, Double] = {
      val counts = seed.distinct.map(p =>
        p -> math.max(seedCounts.getOrDefault(p, 1L), 1L).toDouble)
      val total = counts.map(_._2).sum
      counts.map { case (p, c) => p -> math.log(c / total) }.toMap
    }
    var maxLen = probs.keys.map(_.length).max

    // ---- hard EM: Viterbi E-step, count M-step ----------------------
    def estep(model: Map[String, Double],
        ml: Int): java.util.HashMap[String, Long] = {
      val counts = new java.util.HashMap[String, Long]()
      marked.foreach { case (w, c) =>
        viterbi(w, model, ml).foreach(p => counts.merge(p, c, _ + _))
      }
      counts
    }
    // pieces with Viterbi count > 0 survive; single chars survive with
    // a floor count so coverage never dies
    def mstep(counts: java.util.HashMap[String, Long]): Map[String, Double] = {
      val used = counts.entrySet().asScala.toSeq
        .collect { case e if e.getValue > 0L => e.getKey }
      val floored = (used.toSet ++ chars).toSeq.sorted.map { p =>
        p -> math.max(counts.getOrDefault(p, 0L), if (chars(p)) 1L else 0L)
      }
      val tot = floored.map(_._2).sum.toDouble
      floored.map { case (p, c) => p -> math.log(c / tot) }.toMap
    }
    var iter = 0
    while (iter < emIters) {
      probs = mstep(estep(probs, maxLen))
      maxLen = if (probs.isEmpty) 1 else probs.keys.map(_.length).max
      iter += 1
    }

    // ---- prune to vocabSize (chars always kept), final re-estimate --
    val charSet = chars
    val ranked = probs.toSeq.sortBy { case (p, lp) => (-lp, p) }
    val keptPieces = (ranked.filter { case (p, _) => !charSet(p) }
      .take(math.max(vocabSize - charSet.size, 0)).map(_._1) ++
      charSet.toSeq).toSet
    val pruned = probs.view.filterKeys(keptPieces).toMap
    val prunedMaxLen =
      if (pruned.isEmpty) 1 else pruned.keys.map(_.length).max
    val finalProbs = mstep(estep(pruned, prunedMaxLen))
    Model(finalProbs,
      if (finalProbs.isEmpty) 1 else finalProbs.keys.map(_.length).max)
  }

  /** Viterbi-best segmentation of one marked word: maximize the sum of
    * piece log-probs; a character absent from the vocabulary costs the
    * UNK floor. Ties resolve toward the LONGER final piece (the scan
    * takes `>=` on increasing piece length), so segmentations are
    * deterministic.
    */
  private[llm] def viterbi(w: String, pieces: Map[String, Double],
      maxLen: Int): List[String] = {
    val n = w.length
    if (n == 0) return Nil
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // piece start for position end
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var len = 1
      val lim = math.min(maxLen, end)
      while (len <= lim) {
        val start = end - len
        if (best(start) != Double.NegativeInfinity) {
          val piece = w.substring(start, end)
          val lp = pieces.get(piece) match {
            case Some(x) => x
            case None => if (len == 1) UnkLogProb else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity) {
            val cand = best(start) + lp
            if (cand >= best(end)) { // >= : longer piece wins ties
              best(end) = cand
              back(end) = start
            }
          }
        }
        len += 1
      }
      end += 1
    }
    var out: List[String] = Nil
    var pos = n
    while (pos > 0) {
      val start = back(pos)
      out = w.substring(start, pos) :: out
      pos = start
    }
    out
  }

  /** Encode one text: lowercase, whitespace-split, per-word Viterbi
    * under the learned pieces (each word carries the ▁ marker).
    */
  def encodeText(text: String, pieces: Map[String, Double],
      maxLen: Int): Array[String] = {
    if (text == null) return Array.empty
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty).flatMap(w =>
      viterbi(WordMark + w, pieces, maxLen))
  }

  /** Column of subword pieces under a trained model (broadcast to the
    * executors once; the kernel is map-only).
    */
  def encodeColumn(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val b = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf((s: String) =>
      encodeText(s, b.value.pieces, b.value.maxLen))
    df.withColumn(s"${textCol}_unigram",
      enc(col(textCol).cast(StringType)))
  }

  /** Persist a trained model as a TSV sidecar (`piece \t logprob` —
    * pieces never contain whitespace by construction; doubles render
    * through java.lang.Double, which round-trips exactly). The
    * train-once-apply-to-every-shard workflow: training reads one
    * corpus snapshot, every later ingest loads the frozen vocabulary.
    * IO goes through the Hadoop FileSystem resolved from the path, so
    * a cluster-storage path (hdfs://, s3a://) works the same as a
    * local one — like the IVF centroid sidecar.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    val lines = model.pieces.toSeq.sortBy(_._1)
      .map { case (p, lp) => s"$p\t${java.lang.Double.toString(lp)}" }
    graft.sources.Sidecar.write(
      spark.sparkContext.hadoopConfiguration, path, lines.mkString("\n"))
  }

  /** Reload a [[save]]d model (bit-identical pieces and log-probs). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val raw = graft.sources.Sidecar.read(
      spark.sparkContext.hadoopConfiguration, path)
    val pieces = raw.split("\n").iterator.filter(_.nonEmpty).map { l =>
      val tab = l.lastIndexOf('\t')
      l.substring(0, tab) -> java.lang.Double.parseDouble(l.substring(tab + 1))
    }.toMap
    Model(pieces, if (pieces.isEmpty) 1 else pieces.keys.map(_.length).max)
  }

  /** Train on the corpus, append `<textCol>_unigram_tokens` (the piece
    * count per document).
    */
  def tokenCount(df: DataFrame, textCol: String, vocabSize: Int = 2000,
      maxWords: Int = 50000): DataFrame = {
    val model = train(df, textCol, vocabSize, maxWords)
    encodeColumn(df, textCol, model)
      .withColumn(s"${textCol}_unigram_tokens",
        size(col(s"${textCol}_unigram")))
      .drop(s"${textCol}_unigram")
  }
}
