package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Udfs

/** Exact duplicated-span detection and removal: any run of at least
  * `minTokens` whitespace tokens that appears more than once ANYWHERE
  * in the corpus (across documents or repeated within one) is removed
  * from every position except its first occurrence — the
  * suffix-array-style exact-substring deduplication published for LLM
  * training corpora (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"), re-expressed as three linear
  * shuffles instead of a giant shared suffix array:
  *
  *   1. anchor pass — each document emits one 64-bit hash per
  *      length-`minTokens` token window (posexplode of a JIT'd kernel
  *      array; O(total tokens) rows of (id, pos, hash));
  *   2. one hash-keyed groupBy finds windows occurring >= 2 times and,
  *      via min() over an (id,pos)-encoding BIGINT, the single global
  *      first occurrence to keep (map-side partials shrink every
  *      unique window to one row before the exchange);
  *   3. the anchors re-join the duplicated hashes (equi-join on the
  *      same key the groupBy shuffled on), non-keeper positions merge
  *      into maximal spans with a per-document window (gaps-and-
  *      islands; the window partitions by document id, so no task ever
  *      sees more than one document's removals).
  *
  * The anchor shuffle IS the honest cost of exact-substring dedup —
  * the same O(total tokens) a suffix array pays, but partitioned,
  * spillable, and with no shared in-memory structure. At 100 TB the
  * optional pre-pass that would pay for itself first: an approximate
  * membership filter over window hashes to drop the (overwhelmingly
  * unique) singletons before they shuffle.
  *
  * The anchor subtree is deliberately NOT persisted even though both
  * the groupBy side and the join stream side evaluate it (two scans +
  * two kernel passes, visible as two Generate/FileScan branches in the
  * plan): caching it would materialize an O(total tokens) frame —
  * data-sized — while the rescan is linear, pipelined, and free of
  * storage pressure. Recompute beats cache when the cached thing is as
  * big as the input.
  *
  * Overlapping duplicated windows chain into ONE maximal span
  * (consecutive duplicated positions merge), so a long copied
  * paragraph comes out as a single [start, end] token range. The
  * keeper is min over an (id, pos) STRUCT — lexicographic struct
  * ordering is identical in Spark and DuckDB, and unlike a packed
  * BIGINT it cannot overflow for 64-bit hash-derived document ids.
  */
object SpanDedup {

  /** Maximal duplicated token ranges per document, EXCLUDING each
    * duplicated window's single global first occurrence: columns
    * (idCol, span_start, span_end), token indices 1-based inclusive.
    */
  def duplicatedSpans(corpus: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 50): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val anchors = corpus
      .select(col(idCol).as("__id"),
        posexplode(Udfs.wsGramHashesUdf(col(textCol), lit(minTokens)))
          .as(Seq("__p0", "__h")))
      .select(col("__id"), (col("__p0") + 1).as("__p"), col("__h"),
        struct(col("__id"), (col("__p0") + 1).as("__p")).as("__k"))
    val dup = anchors.groupBy("__h")
      .agg(count(lit(1)).as("__c"), min("__k").as("__keeper"))
      .filter(col("__c") >= 2)
      .select("__h", "__keeper")
    val rm = anchors.join(dup, "__h")
      .filter(col("__k") =!= col("__keeper"))
      .select(col("__id"), col("__p"))
    // gaps-and-islands: a removal position starts a new span iff it
    // lies beyond the furthest end any earlier position in this doc
    // reaches; islands then aggregate to (min start, max end)
    val wPrev = Window.partitionBy("__id").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMax = max(col("__p") + lit(minTokens - 1)).over(wPrev)
    val wRun = Window.partitionBy("__id").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    rm.withColumn("__new",
        when(prevMax.isNull || col("__p") > prevMax, 1).otherwise(0))
      .withColumn("__isl", sum("__new").over(wRun))
      .groupBy(col("__id"), col("__isl"))
      .agg(min("__p").as("span_start"),
        (max("__p") + lit(minTokens - 1)).as("span_end"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Rewrite `textCol` with every non-first duplicated span removed.
    * Documents with no duplicated spans pass through byte-identical;
    * rewritten documents come back whitespace-normalized (kept tokens
    * joined by single spaces — the token cut cannot reconstruct the
    * original inter-token whitespace).
    */
  def removeDuplicatedSpans(corpus: DataFrame, textCol: String,
      idCol: String, minTokens: Int = 50): DataFrame = {
    val spans = duplicatedSpans(corpus, textCol, idCol, minTokens)
      .groupBy(col(idCol).as("__sid"))
      .agg(collect_list(struct(col("span_start").as("_1"),
        col("span_end").as("_2"))).as("__spans"))
    corpus.join(spans, corpus(idCol) === col("__sid"), "left")
      .withColumn(textCol,
        when(col("__spans").isNull, col(textCol))
          .otherwise(Udfs.cutTokenSpansUdf(col(textCol), col("__spans"))))
      .drop("__sid", "__spans")
  }
}
