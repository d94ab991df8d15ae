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
      maxBenchGrams: Int = 100000000): DataFrame = {
    val hits = hitsColumn(corpus, textCol, bench, benchTextCol, n, maxBenchGrams)
    corpus.withColumn(s"${textCol}_contam_hits", hits)
  }

  /** Keep only documents with fewer than `minHits` shared n-grams. */
  def drop(corpus: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8, minHits: Int = 1,
      maxBenchGrams: Int = 100000000): DataFrame = {
    val hits = hitsColumn(corpus, textCol, bench, benchTextCol, n, maxBenchGrams)
    corpus.filter(hits < lit(minHits))
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
        s"(max $maxBenchGrams); use the explode+join shape for benchmark " +
        "sets this large")
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
