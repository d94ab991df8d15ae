package graft

import graft.llm._
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline: cleanse recipe → exact + near
  * dedup → quality/language filter → fingerprint + token accounting —
  * the composition a 100 TB curation job runs, exercised over the
  * documents table.
  */
class PipelineIntegrationSpec extends SparkSpec {

  test("full curation pipeline composes recipe + dedup + analysis") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    // 1. wrangle: cleanse + derive
    val cleaned = Wrangle.recipe("""
      trim :text;
      filter-empty-or-null :text;
      lang-id :text;
      token-count :text;
      quality-score :text;
      fingerprint :text;
    """).apply(docs)
    assert(cleaned.columns.toSet.intersect(
      Set("text_lang", "text_tokens", "text_quality", "text_fingerprint")).size == 4)

    // 2. dedup (exact + near)
    val deduped = Dedup.minhashDedup(cleaned, "text", "doc_id",
      numHashes = 64, bands = 16, shingleK = 5, threshold = 0.85)
    assert(deduped.count() <= cleaned.count())

    // 3. quality + length gate
    val curated = deduped
      .filter(col("text_quality") >= 0.5)
      .filter(col("text_tokens") >= 5)
    assert(curated.count() > 0)

    // 4. the whole pre-dedup stage stays in one scan projection
    val cleanedPlan = cleaned.queryExecution.executedPlan.toString
    assert(!cleanedPlan.contains("Exchange"),
      s"cleanse stage must not shuffle:\n$cleanedPlan")

    // 5. accounting: token totals survive the pipeline
    val total = curated.agg(sum("text_tokens")).head().getLong(0)
    assert(total > 0)
  }
}
