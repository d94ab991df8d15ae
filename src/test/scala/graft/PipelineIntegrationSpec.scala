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

  test("round-9 pipeline: unicode -> clean -> gate -> span-decontam -> url+semantic dedup -> budget") {
    import org.apache.spark.sql.functions._
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bench = all.filter(col("doc_id") % 97 === 0)
    val corpus = all.filter(col("doc_id") % 97 =!= 0)

    // 1. normalization + published gates + surgical decontamination +
    //    scoring, all via the recipe surface in ONE pass
    val prepped = Wrangle.recipe("""
      normalize-unicode :text NFKC;
      remove-accents :text;
      gopher-rules :text;
      quality-score :text;
      token-count :text;
      decontaminate-spans :text bench 3;
    """).withLookup("bench", bench.select(col("text").as("q")))
      .apply(corpus)
    assert(prepped.columns.toSet.intersect(
      Set("text_gopher_keep", "text_quality", "text_tokens")).size == 3)
    assert(prepped.count() == corpus.count()) // span cut, nothing dropped

    // 2. URL-level dedup on a synthetic url column (canonical collapse)
    val withUrl = prepped.withColumn("url",
      concat(lit("HTTPS://WWW.ex.COM/p/"), col("doc_id") % 100,
        lit("?utm_source=x")))
    val urlDeduped = Wrangle
      .recipe("normalize-url :url; dedup-exact :url :doc_id;")
      .apply(withUrl)
    assert(urlDeduped.count() == 100) // 100 canonical resources survive

    // 3. temperature-mix sources, then token-budget the best slice
    val mixed = graft.session.Sampler.temperatureMix(
      prepped, "doc_id", "lang", alpha = 0.5, targetFrac = 0.8)
    val budgeted = graft.llm.Packing.selectBudget(
      mixed, "text_tokens", "text_quality", "doc_id", budget = 10000)
    val toks = budgeted.agg(sum("text_tokens")).head().getLong(0)
    assert(toks <= 10000 && toks > 5000, s"budget landed at $toks")
    assert(budgeted.count() > 0)
  }

  test("retrieval pipeline: embed-dedup -> IVF index -> top-k per query") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 1. drop near-duplicate vectors (none planted here - set stays intact,
    //    which is itself the assertion: no false positives at 0.95)
    val deduped = graft.llm.Dedup.embeddingDedup(emb, "vec_id", "embedding",
      threshold = 0.95)
    assert(deduped.count() == emb.count())
    // 2. IVF index over the deduped corpus, then retrieval for 3 queries
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    for ((qid, q) <- queries) {
      val hits = graft.llm.Similarity.ivfTopK(deduped, "vec_id", "embedding",
        q, k = 5, nlist = 8, nprobe = 8)
      val ids = hits.collect().map(_.getLong(0))
      assert(ids.length == 5)
      assert(ids.head == qid, s"query $qid should retrieve itself first")
      // full probe == exact: matches brute force
      val brute = graft.llm.Similarity.cosineTopK(deduped, "vec_id",
        "embedding", q, 5).collect().map(_.getLong(0))
      assert(ids.toSeq == brute.toSeq)
    }
    // 3. quality gate + token budget over the documents side
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val curated = graft.Wrangle.recipe(
      "quality-score :text; token-count :text;").apply(docs)
      .filter(col("text_quality") >= 0.5 && col("text_tokens") >= 5)
    assert(curated.count() > 0)
    assert(curated.columns.contains("text_quality"))
  }

}
