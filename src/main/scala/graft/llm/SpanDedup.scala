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
  *   2. ROUND ONE: a bare `count(*)` groupBy on the hash finds the
  *      hashes occurring >= 2 times. count is hash-aggregable, so this
  *      is a HashAggregate whose exchange carries 16-byte (hash, count)
  *      rows and sorts NOTHING — the previous single-round shape
  *      computed `min(struct(id,pos))` here, which forces a
  *      SortAggregate: every window row in the corpus was sorted and
  *      shuffled with a struct payload;
  *   3. ROUND TWO: anchors semi-join the (small by construction)
  *      duplicated-hash set — AQE broadcasts it, so the O(tokens)
  *      anchor side streams map-only — and only the surviving
  *      duplicated anchors pay the (id,pos)-carrying shuffle: a
  *      hash-partitioned window takes min(struct) per hash for the
  *      global keeper, non-keepers merge into maximal spans with a
  *      per-document gaps-and-islands window.
  *
  * The count shuffle IS the honest cost of exact-substring dedup — an
  * exact scheme must get every distinct hash's cross-partition
  * multiplicity somewhere — but it is the CHEAPEST possible form (one
  * 16-byte row per distinct hash per partition, hash-aggregated, no
  * sort), and the expensive position-carrying shuffle now moves only
  * duplicated windows (10.0% of window rows on the sf0.1 corpus at
  * n=5 — 25,090 of 250,704, measured; the overwhelmingly-unique
  * singletons never shuffle their positions).
  * If the duplicated-hash set ever exceeds the broadcast ceiling (a
  * pathologically templated corpus), AQE degrades the semi-join to a
  * shuffle join — the right fallback, and the place a driver-bounded
  * Bloom filter would slot in as a further map-side prefilter.
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
    // round 1: duplicated hashes only — count is hash-aggregable
    val dupH = anchors.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__h")
    // round 2: the semi-join drops singleton windows map-side (AQE
    // broadcasts dupH); keeper-min and the non-keeper filter run in ONE
    // hash-partitioned window pass over the small duplicated subset, so
    // the anchors subtree evaluates exactly once here (a join-based
    // keeper would read it twice)
    val keeperW = Window.partitionBy("__h")
    val rm = anchors.join(dupH, Seq("__h"), "left_semi")
      .withColumn("__keeper", min("__k").over(keeperW))
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

  /** Corpus-wide exact LINE dedup (CCNet/Dolma-style): every line of at
    * least `minChars` characters that appears more than once ANYWHERE
    * in the corpus is removed from every position except its single
    * global first occurrence (min (id, line-index)); shorter lines —
    * headers, bullets, boilerplate below the length floor — are never
    * touched. Lines match EXACTLY (no normalization), so the rewrite is
    * byte-faithful: documents with no removals pass through untouched,
    * and rewritten documents keep their remaining lines and newlines
    * as-is. `delim` generalizes the unit: the default "\n" dedups
    * lines; "\n\n" dedups blank-line-separated PARAGRAPHS (the
    * dedup-paragraphs directive) with identical keep-first semantics.
    *
    * Same two-round scale shape as [[duplicatedSpans]]: a bare count
    * HashAggregate over native xxhash64 line hashes finds duplicated
    * lines (16-byte exchange rows, no sort), the duplicated-hash set
    * broadcasts into a left-semi join so singleton lines never shuffle
    * their positions, and only duplicated anchors pay the keeper
    * window. Removal positions fold to one small per-doc list; only
    * documents WITH removals rewrite (line split + index drop kernel).
    */
  def removeDuplicatedLines(corpus: DataFrame, textCol: String,
      idCol: String, minChars: Int = 30, delim: String = "\n"): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    require(delim.nonEmpty, "delim must be non-empty")
    val anchors = corpus
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim), -1)).as(Seq("__p", "__ln")))
      .filter(length(col("__ln")) >= minChars)
      .select(col("__id"), col("__p"), xxhash64(col("__ln")).as("__h"),
        struct(col("__id"), col("__p")).as("__k"))
    val dupH = anchors.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__h")
    val keeperW = Window.partitionBy("__h")
    val rm = anchors.join(dupH, Seq("__h"), "left_semi")
      .withColumn("__keeper", min(col("__k")).over(keeperW))
      .filter(col("__k") =!= col("__keeper"))
      .groupBy(col("__id").as("__rid"))
      .agg(collect_list(col("__p").cast("long")).as("__drop"))
    corpus.join(rm, corpus(idCol) === col("__rid"), "left")
      .withColumn(textCol,
        when(col("__drop").isNull, col(textCol))
          .otherwise(Udfs.cutBlocksUdf(col(textCol), col("__drop"),
            lit(delim))))
      .drop("__rid", "__drop")
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
