package graft

import graft.llm.NgramLm
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {

  private def corpus = df("doc_id BIGINT, ref INT, text STRING", Seq(
    Row(1L, 1, "the cat sat on the mat and the cat slept"),
    Row(2L, 1, "the cat sat on the mat again and again"),
    Row(3L, 1, "the dog sat on the mat and the dog slept"),
    Row(4L, 0, "the cat sat on the mat"),        // in-distribution
    Row(5L, 0, "quantum chromodynamics lattice gauge renormalization"),
    Row(6L, 0, "")))                             // token-less

  test("train: vocabulary, totals, and pruned bigrams") {
    val lm = NgramLm.train(corpus, "text", col("ref") === 1,
      maxVocab = 100, minBigramCount = 2)
    val uni = lm.unigrams.toMap
    assert(uni("the") == 8 && uni("cat") == 3 && uni("sat") == 3)
    assert(lm.total == 29) // all ref tokens
    val bi = lm.bigrams.map { case (p, w, c) => (p, w) -> c }.toMap
    assert(bi(("the", "cat")) == 3) // "the cat" x3 in ref docs
    assert(bi(("sat", "on")) == 3)
    assert(!bi.contains(("cat", "slept"))) // count 1 < minBigramCount
  }

  test("train caps the vocabulary deterministically") {
    val lm = NgramLm.train(corpus, "text", col("ref") === 1,
      maxVocab = 3, minBigramCount = 2)
    // top-3 by count desc, token asc: the(8), and(3)<cat(3)<... ties
    // at 3 break alphabetically: and, cat
    assert(lm.unigrams.map(_._1).toSeq == Seq("the", "and", "cat"))
    // total still counts the WHOLE reference corpus, not just the cap
    assert(lm.total == 29)
  }

  test("score: in-distribution text beats out-of-distribution text") {
    val out = NgramLm.perplexity(corpus, "text", "doc_id",
      col("ref") === 1)
    val rows = out.select("doc_id", "lm_tokens", "lm_logprob", "lm_ppl")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(rows(4L)._1 == 6)
    assert(rows(6L)._1 == 0 && rows(6L)._2.isEmpty && rows(6L)._3.isEmpty)
    // familiar text scores a much lower perplexity than alien text
    assert(rows(4L)._3.get < rows(5L)._3.get / 2,
      s"expected in-distribution ppl << OOD ppl: $rows")
    // ppl = exp(-mean logprob), and logprobs are negative
    assert(rows(4L)._2.get < 0 && rows(4L)._3.get > 1)
  }

  test("scores are partitioning-invariant (decimal per-doc sums)") {
    val lm = NgramLm.train(corpus, "text", col("ref") === 1)
    def scores(parts: Int) = NgramLm.score(
      corpus.repartition(parts), "text", "doc_id", lm)
      .select("doc_id", "lm_logprob").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(scores(1) == scores(7))
  }

  test("lm-perplexity directive spelling") {
    val out = Wrangle.recipe(
      "lm-perplexity :text :doc_id exp:{ ref == 1 } 100 2")(corpus)
    assert(Seq("lm_tokens", "lm_logprob", "lm_ppl")
      .forall(out.columns.contains))
    assert(out.count() == 6)
  }

  test("scoring plan: broadcast joins only, one narrow doc exchange") {
    val lm = NgramLm.train(corpus, "text", col("ref") === 1)
    val plan = NgramLm.score(corpus, "text", "doc_id", lm)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model joins must broadcast:\n$plan")
    // the one permitted shuffle join is the final per-doc rejoin on
    // the id — the MODEL joins (on __w / __p) must never sort-merge
    assert(!plan.contains("SortMergeJoin [__"),
      s"token rows must never shuffle for the model joins:\n$plan")
  }

  test("shared-tokenization Toks variants are identical to the text " +
      "spelling") {
    val base = corpus.withColumn("__toks",
      graft.functions.Udfs.normTokensUdf(col("text")))
    val lmA = NgramLm.train(corpus, "text", col("ref") === 1,
      maxVocab = 8, minBigramCount = 2)
    val lmB = NgramLm.trainToks(base, col("__toks"), col("ref") === 1,
      maxVocab = 8, minBigramCount = 2)
    assert(lmA.unigrams.toSeq == lmB.unigrams.toSeq)
    assert(lmA.bigrams.toSeq == lmB.bigrams.toSeq)
    assert(lmA.total == lmB.total)
    def s(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "lm_tokens", "lm_logprob", "lm_ppl").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
          Option(r.get(3)))).toSet // token-less rows score null
    assert(s(NgramLm.score(corpus, "text", "doc_id", lmA, lambda = 0.5))
      == s(NgramLm.scoreToks(base, col("__toks"), "doc_id", lmB,
        lambda = 0.5)))
  }
}
