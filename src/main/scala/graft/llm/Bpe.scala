package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding subword tokenization, trained on the corpus
  * itself (Sennrich et al. 2016 — the standard subword vocabulary
  * construction for LM training data).
  *
  * Shape at 100 TB:
  *  - TRAIN: one `groupBy(word)` count over the corpus, truncated to
  *    the `maxWords` most frequent word types (a distributed top-k —
  *    word-type frequency is Zipfian, so the tail the cap drops
  *    carries negligible mass). Only that bounded (word, count) table
  *    reaches the driver; the merge loop itself is pure driver-side
  *    compute over ≤ maxWords entries, independent of corpus size —
  *    the same bounded-driver contract as the IVF/k-means step.
  *  - ENCODE: the learned merge ranks broadcast (numMerges entries);
  *    each document tokenizes in a JIT'd kernel — map-only, no
  *    shuffle, no vocabulary join.
  *
  * Determinism: merge selection breaks frequency ties by
  * lexicographically smallest pair, so the learned vocabulary is a
  * pure function of the word-frequency table (stable under
  * partitioning/retries), and every derived count is fixture-stable.
  *
  * Words are the whitespace tokens of the lowercased text with an
  * end-of-word marker appended as a distinct symbol; `encode` emits
  * subword strings (marker included on word-final pieces), `tokenCount`
  * just counts them.
  */
object Bpe {

  /** End-of-word marker symbol (same role as the `</w>` of the
    * published algorithm).
    */
  val Eow = "</w>"

  type Merge = (String, String)

  /** Learn `numMerges` merges from the corpus word-frequency table.
    * Returns merges in rank order (apply order). `maxWords` bounds the
    * driver-side table: the TOP-frequency word types are kept
    * (deterministic tie-break toward the lexicographically smaller
    * word).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): Seq[Merge] = {
    require(numMerges >= 0, "bpe: numMerges must be >= 0")
    require(maxWords > 0, "bpe: maxWords must be > 0")
    val words = df
      .select(explode(split(lower(coalesce(col(textCol).cast(StringType),
        lit(""))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromFreqs(words, numMerges)
  }

  /** The driver-side merge loop over an explicit word-frequency table
    * (exposed for tests). Symbols start as single characters plus the
    * end-of-word marker on the final character.
    */
  def trainFromFreqs(words: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    // each word as its current symbol sequence
    var seqs: Array[(Array[String], Long)] = words.map { case (w, c) =>
      val chars = w.toCharArray.map(_.toString)
      chars(chars.length - 1) = chars(chars.length - 1) + Eow
      (chars, c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var m = 0
    while (m < numMerges) {
      // count adjacent symbol pairs, weighted by word frequency
      val pairCounts = scala.collection.mutable.HashMap.empty[Merge, Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) m = numMerges // no pairs left anywhere
      else {
        // deterministic best: max count, ties toward the lexicographically
        // smallest (left, right) pair
        var best: Merge = null
        var bestC = -1L
        pairCounts.foreach { case (k, c) =>
          if (c > bestC || (c == bestC &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestC = c
          }
        }
        merges += best
        // apply the merge to every word
        seqs = seqs.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += syms(i) + syms(i + 1); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Encode one text with the learned merges: per word, start from
    * characters (+marker) and apply merges in rank order — the
    * standard greedy lowest-rank-first application.
    */
  def encodeText(text: String, ranks: java.util.HashMap[Merge, Int]): Array[String] = {
    if (text == null) return Array.empty
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    words.foreach { w =>
      var syms = {
        val chars = w.toCharArray.map(_.toString)
        chars(chars.length - 1) = chars(chars.length - 1) + Eow
        chars
      }
      // repeatedly apply the LOWEST-rank merge present
      var done = false
      while (!done && syms.length > 1) {
        var bestI = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestI = i }
          i += 1
        }
        if (bestI < 0) done = true
        else {
          val merged = new Array[String](syms.length - 1)
          System.arraycopy(syms, 0, merged, 0, bestI)
          merged(bestI) = syms(bestI) + syms(bestI + 1)
          System.arraycopy(syms, bestI + 2, merged, bestI + 1,
            syms.length - bestI - 2)
          syms = merged
        }
      }
      out ++= syms
    }
    out.toArray
  }

  private def rankMap(merges: Seq[Merge]): java.util.HashMap[Merge, Int] = {
    val m = new java.util.HashMap[Merge, Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
    m
  }

  /** Column of subword tokens under the learned merges (broadcast
    * ranks, map-only).
    */
  def encodeColumn(df: DataFrame, textCol: String,
      merges: Seq[Merge]): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(rankMap(merges))
    udf((s: String) => encodeText(s, bc.value)).apply(col(textCol))
  }

  /** Persist learned merges, ONE PER LINE IN RANK ORDER (`a\tb` —
    * the line order IS the model: BPE applies merges by rank).
    * Hadoop-FS sidecar IO like UnigramLm.save, so cluster paths work.
    * The train-once-apply-per-shard workflow's freeze step.
    */
  def save(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit =
    graft.sources.Sidecar.write(
      spark.sparkContext.hadoopConfiguration, path,
      merges.map { case (a, b) => s"$a\t$b" }.mkString("\n"))

  /** Reload [[save]]d merges in their original rank order. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] =
    graft.sources.Sidecar.read(
        spark.sparkContext.hadoopConfiguration, path)
      .split("\n").iterator.filter(_.nonEmpty).map { l =>
        val t = l.indexOf('\t')
        (l.substring(0, t), l.substring(t + 1))
      }.toSeq

  /** Train on the corpus, append `<textCol>_bpe_tokens` (the subword
    * COUNT per document — the budget-relevant number).
    */
  def tokenCount(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): DataFrame = {
    val merges = train(df, textCol, numMerges, maxWords)
    df.withColumn(s"${textCol}_bpe_tokens",
      size(encodeColumn(df, textCol, merges)).cast(IntegerType))
  }
}
