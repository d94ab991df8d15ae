package graft

import graft.llm.Classifier
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  // two separable vocabularies: "good" docs vs "spam" docs
  private def corpus = df("doc_id BIGINT, label INT, text STRING", Seq(
    Row(1L, 1, "thoughtful analysis of compiler optimization techniques"),
    Row(2L, 1, "careful analysis of query optimization and planning"),
    Row(3L, 1, "detailed analysis of storage engine compaction techniques"),
    Row(4L, 1, "rigorous analysis of distributed consensus techniques"),
    Row(5L, 0, "buy cheap pills now click here winner winner"),
    Row(6L, 0, "click here cheap deals winner prize now now"),
    Row(7L, 0, "winner prize click buy cheap now here deals"),
    Row(8L, 0, "cheap cheap pills prize click winner buy now")))

  test("trainLogistic separates the two vocabularies") {
    val (w, b) = Classifier.trainLogistic(corpus, "text", "label",
      dim = 32, iterations = 20, lr = 2.0)
    val scored = Classifier.scoreLogistic(corpus, "text", w, b)
      .select("label", "quality_score").collect()
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(scored.forall(r => r.getDouble(1) >= 0 && r.getDouble(1) <= 1))
    assert(pos.min > neg.max,
      s"classifier failed to separate: pos=${pos.toSeq} neg=${neg.toSeq}")
  }

  test("training is partitioning-invariant (decimal gradient sums)") {
    val (w1, b1) = Classifier.trainLogistic(corpus.repartition(1), "text",
      "label", dim = 16, iterations = 3, lr = 0.5)
    val (w7, b7) = Classifier.trainLogistic(corpus.repartition(7), "text",
      "label", dim = 16, iterations = 3, lr = 0.5)
    assert(b1 == b7)
    assert(w1.toSeq == w7.toSeq,
      "weights differ across partitionings — gradient sums not exact")
  }

  test("qualityScore trains on the predicate and scores every row") {
    val out = Classifier.qualityScore(corpus, "text", col("label") === 1,
      dim = 32, iterations = 20, lr = 2.0)
    assert(out.count() == 8)
    assert(out.columns.contains("quality_score"))
    // empty / null text scores exactly sigmoid(bias)
    val (w, b) = Classifier.trainLogistic(corpus, "text", "label",
      dim = 16, iterations = 2, lr = 0.5)
    val nullScore = Classifier.scoreLogistic(
      df("text STRING", Seq(Row(null: String), Row(""))), "text", w, b)
      .select("quality_score").collect().map(_.getDouble(0))
    val expect = 1.0 / (1.0 + math.exp(-b))
    assert(nullScore.forall(_ == expect))
  }

  test("dsirLogWeights ranks target-like docs above off-target docs") {
    val out = Classifier.dsirLogWeights(corpus, "text", col("label") === 1,
      dim = 32).select("label", "dsir_logweight").collect()
    val pos = out.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = out.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(pos.min > neg.max,
      s"dsir failed to rank: pos=${pos.toSeq} neg=${neg.toSeq}")
    // empty text -> zero log-weight (no tokens, no evidence)
    val z = Classifier.dsirLogWeights(
      df("label INT, text STRING", Seq(Row(1, ""), Row(0, "x"))),
      "text", col("label") === 1, dim = 8)
      .where(col("text") === "").select("dsir_logweight")
      .head().getDouble(0)
    assert(z == 0.0)
  }

  test("classifier-score and dsir-weights directive spellings") {
    val out = Wrangle.recipe(
      "classifier-score :text exp:{ label == 1 } 16 3")(corpus)
    assert(out.columns.contains("text_clf_score"))
    assert(out.count() == 8)
    val out2 = Wrangle.recipe(
      "dsir-weights :text exp:{ label == 1 } 16")(corpus)
    assert(out2.columns.contains("text_dsir_logweight"))
    assert(out2.count() == 8)
  }

  test("scoring stays whole-stage codegen (weights are literals)") {
    val (w, b) = Classifier.trainLogistic(corpus, "text", "label",
      dim = 8, iterations = 1, lr = 0.5)
    val plan = Classifier.scoreLogistic(corpus, "text", w, b)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must be map-only:\n$plan")
  }

  test("hashingTfFromToks over normTokens equals hashingTf") {
    import graft.functions.Udfs
    for (t <- Seq("The cat SAT!", "", null, "a b a c a",
        "mixed   Whitespace\tand\nlines"))
      assert(Udfs.hashingTf(t, 16).toSeq ==
        Udfs.hashingTfFromToks(Udfs.normTokens(t), 16).toSeq, s"text=$t")
  }

  test("shared-featurization Tf variants are bit-identical to the " +
      "text spelling") {
    import graft.functions.Udfs
    val base = corpus.withColumn("__tf",
      Udfs.hashingTfUdf(col("text").cast("string"), lit(16)))
    def m(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("doc_id"), col(c)).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaText = Classifier.qualityScore(corpus, "text",
      col("label") === 1, dim = 16, iterations = 3, lr = 0.5)
    val viaTf = Classifier.qualityScoreTf(base, col("__tf"),
      col("label") === 1, dim = 16, iterations = 3, lr = 0.5)
    assert(m(viaText, "quality_score") == m(viaTf, "quality_score"))
    val dText = Classifier.dsirLogWeights(corpus, "text",
      col("label") === 1, dim = 16)
    val dTf = Classifier.dsirLogWeightsTf(base, col("__tf"),
      col("label") === 1, dim = 16)
    assert(m(dText, "dsir_logweight") == m(dTf, "dsir_logweight"))
  }
}
