package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** WordPiece subword tokenization (Schuster & Nakajima 2012; the
  * BERT-family tokenizer — Wu et al. 2016 §4.1), trained on the corpus
  * itself like [[Bpe]] and [[UnigramLm]], completing the three subword
  * families real pipelines tokenize with.
  *
  * Shape at 100 TB (same bounded-driver contract as the other two):
  *  - TRAIN: ONE distributed word-frequency pass truncated to the
  *    `maxWords` most frequent word types; the merge loop is pure
  *    driver compute over that bounded table. WordPiece differs from
  *    BPE only in the merge objective: pairs are ranked by the
  *    likelihood gain score count(ab) / (count(a) * count(b)) rather
  *    than raw count — the published criterion.
  *  - ENCODE: the vocabulary broadcasts once; each document tokenizes
  *    map-only with the greedy longest-match-first algorithm BERT
  *    runtimes actually use (continuation pieces carry the `##`
  *    prefix; a word with any unmatchable position renders as a
  *    single `[UNK]`, the published whole-word-UNK semantics).
  *
  * Determinism: merge selection breaks score ties toward the
  * lexicographically smallest (left, right) pair, so the learned
  * vocabulary is a pure function of the word-frequency table — the
  * property the pinned oracle pattern needs.
  */
object WordPiece {

  /** Continuation-piece prefix (word-internal positions). */
  val ContPrefix = "##"

  /** Rendered for a word with an unmatchable position. */
  val Unk = "[UNK]"

  /** Words longer than this encode as [UNK] outright (BERT's
    * max_input_chars_per_word guard — bounds the matcher's quadratic
    * worst case on pathological tokens).
    */
  val MaxWordChars = 100

  /** vocab holds surface forms (word-initial pieces bare, word-internal
    * pieces `##`-prefixed); maxLen bounds the longest-match scan.
    */
  final case class Model(vocab: Set[String], maxLen: Int)

  /** One distributed pass for the bounded word-frequency table, then
    * the driver-side trainer.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 2000,
      maxWords: Int = 50000): Model = {
    val words = df
      .select(explode(split(lower(coalesce(col(textCol).cast(StringType),
        lit(""))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromFreqs(words.toSeq, vocabSize)
  }

  /** Driver-side trainer over an explicit word-frequency table
    * (exposed for tests). Starts from the character alphabet in both
    * position forms, then greedily merges the adjacent pair with the
    * highest likelihood score count(ab)/(count(a)*count(b)) until the
    * vocabulary reaches `vocabSize` or no pair repeats.
    */
  def trainFromFreqs(words: Seq[(String, Long)], vocabSize: Int): Model = {
    require(vocabSize >= 1, "wordpiece: vocabSize must be >= 1")
    // each word as its current symbol sequence: first char bare, the
    // rest ##-prefixed — position is part of the symbol identity
    var seqs: Array[(Array[String], Long)] = words
      .filter(_._1.nonEmpty).map { case (w, c) =>
        val syms = new Array[String](w.length)
        var i = 0
        while (i < w.length) {
          syms(i) = if (i == 0) w.substring(0, 1)
            else ContPrefix + w.charAt(i)
          i += 1
        }
        (syms, c)
      }.toArray
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    seqs.foreach(_._1.foreach(vocab += _))
    var done = vocab.size >= vocabSize
    while (!done) {
      // unigram + adjacent-pair counts, weighted by word frequency
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      // deterministic best: max score, ties toward the smaller pair;
      // singleton pairs (count 1 with singleton parts) score 1.0 and
      // would win over genuinely frequent merges — require the pair to
      // repeat before it can earn a vocabulary slot
      var best: (String, String) = null
      var bestScore = 0.0
      pairCounts.foreach { case (k, c) =>
        if (c >= 2) {
          val s = c.toDouble / (symCounts(k._1).toDouble * symCounts(k._2))
          if (s > bestScore || (s == bestScore && best != null &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestScore = s
          }
        }
      }
      if (best == null) done = true
      else {
        val merged = best._1 + best._2.substring(ContPrefix.length)
        vocab += merged
        seqs = seqs.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out =
              new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        if (vocab.size >= vocabSize) done = true
      }
    }
    val v = vocab.toSet
    Model(v, if (v.isEmpty) 1 else v.iterator.map(_.length).max)
  }

  /** Greedy longest-match-first encode of one word (the BERT runtime
    * algorithm): at each position take the longest vocabulary piece
    * (word-internal candidates carry the `##` prefix); any position
    * with no match renders the WHOLE word as [UNK].
    */
  private[graft] def encodeWord(w: String, vocab: Set[String],
      maxLen: Int): List[String] = {
    if (w.isEmpty) return Nil
    if (w.length > MaxWordChars) return List(Unk)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val prefix = if (pos == 0) "" else ContPrefix
      // longest piece first; maxLen bounds the surface form INCLUDING
      // the ## prefix, so the raw span limit subtracts it
      var len = math.min(w.length - pos, math.max(maxLen - prefix.length, 1))
      var hit: String = null
      while (hit == null && len >= 1) {
        val cand = prefix + w.substring(pos, pos + len)
        if (vocab(cand)) hit = cand else len -= 1
      }
      if (hit == null) return List(Unk)
      out += hit
      pos += len
    }
    out.toList
  }

  /** Encode one text: lowercase, whitespace-split, greedy per-word
    * matching.
    */
  def encodeText(text: String, vocab: Set[String],
      maxLen: Int): Array[String] = {
    if (text == null) return Array.empty
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty).flatMap(w => encodeWord(w, vocab, maxLen))
  }

  /** Column of subword pieces under a trained model (broadcast once;
    * the kernel is map-only).
    */
  def encodeColumn(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val b = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf((s: String) =>
      encodeText(s, b.value.vocab, b.value.maxLen))
    df.withColumn(s"${textCol}_wordpiece",
      enc(col(textCol).cast(StringType)))
  }

  /** Persist a trained vocabulary as a sidecar (one surface form per
    * line — pieces never contain whitespace by construction), sorted
    * for a canonical byte form. Same train-once-apply-everywhere
    * workflow as the BPE/unigram sidecars; IO goes through the path's
    * own Hadoop FileSystem.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit =
    graft.sources.Sidecar.write(spark.sparkContext.hadoopConfiguration,
      path, model.vocab.toSeq.sorted.mkString("\n"))

  /** Reload a [[save]]d model (identical vocabulary). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val raw = graft.sources.Sidecar.read(
      spark.sparkContext.hadoopConfiguration, path)
    val vocab = raw.split("\n").iterator.filter(_.nonEmpty).toSet
    Model(vocab, if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max)
  }

  /** Train on the corpus, append `<textCol>_wordpiece_tokens` (the
    * piece count per document).
    */
  def tokenCount(df: DataFrame, textCol: String, vocabSize: Int = 2000,
      maxWords: Int = 50000): DataFrame = {
    val model = train(df, textCol, vocabSize, maxWords)
    encodeColumn(df, textCol, model)
      .withColumn(s"${textCol}_wordpiece_tokens",
        size(col(s"${textCol}_wordpiece")))
      .drop(s"${textCol}_wordpiece")
  }
}
