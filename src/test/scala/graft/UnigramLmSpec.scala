package graft

import graft.llm.UnigramLm

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    ("internationalization is an international nation", 400L),
    ("nation and nationalization", 300L),
    ("inter and intra nation", 200L),
    ("xyz", 1L))
  private val freqs: Seq[(String, Long)] = corpus
    .flatMap { case (t, c) => t.split(" ").map(w => (w, c)) }
    .groupBy(_._1).map { case (w, cs) => (w, cs.map(_._2).sum) }
    .toSeq.sortBy { case (w, c) => (-c, w) }

  test("training is deterministic and learns frequent multi-char pieces") {
    val m1 = UnigramLm.trainFromFreqs(freqs, vocabSize = 60)
    val m2 = UnigramLm.trainFromFreqs(freqs, vocabSize = 60)
    assert(m1.pieces == m2.pieces && m1.maxLen == m2.maxLen)
    // the dominant word-initial fragment must survive as a piece
    assert(m1.pieces.keys.exists(p => p.startsWith(UnigramLm.WordMark)
      && p.length >= 4), s"no multi-char word-initial piece in " +
      s"${m1.pieces.keys.toSeq.sorted.take(30)}")
    // log-probs normalize (sum of exp = 1 within fp tolerance)
    val mass = m1.pieces.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"mass $mass")
  }

  test("coverage: any text is encodable; unknown chars fall back to singles") {
    val m = UnigramLm.trainFromFreqs(freqs, vocabSize = 40)
    val enc = UnigramLm.encodeText("nation 你好 QQQ", m.pieces, m.maxLen)
    assert(enc.nonEmpty)
    // round trip: concatenating pieces restores the marked text
    assert(enc.mkString("") ==
      "▁nation" + "▁你好" + "▁qqq")
  }

  test("a bigger vocabulary never tokenizes a seen word into more pieces") {
    val small = UnigramLm.trainFromFreqs(freqs, vocabSize = 20)
    val big = UnigramLm.trainFromFreqs(freqs, vocabSize = 120)
    for ((w, _) <- freqs) {
      val a = UnigramLm.encodeText(w, small.pieces, small.maxLen).length
      val b = UnigramLm.encodeText(w, big.pieces, big.maxLen).length
      assert(b <= a, s"'$w': $b pieces at vocab 120 vs $a at 20")
    }
  }

  test("encodeColumn and tokenCount: map-only kernels over the broadcast model") {
    val df = corpus.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val m = UnigramLm.train(df, "text", vocabSize = 60)
    val enc = UnigramLm.encodeColumn(df, "text", m)
      .select("id", "text_unigram").collect()
    assert(enc.forall(r => r.getSeq[String](1).nonEmpty))
    val viaRecipe = wrangle("unigram-token-count :text 60", df)
      .select("id", "text_unigram_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = enc.map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    assert(viaRecipe == direct)
  }

  test("save/load round-trips the model bit-for-bit") {
    val m = UnigramLm.trainFromFreqs(freqs, vocabSize = 60)
    val path = java.nio.file.Files
      .createTempFile("graft_unigram_", ".tsv").toString
    UnigramLm.save(spark, m, path)
    val loaded = UnigramLm.load(spark, path)
    assert(loaded.pieces == m.pieces) // exact doubles, not approximate
    assert(loaded.maxLen == m.maxLen)
    // frozen-vocabulary encode equals the fresh model's encode
    val a = UnigramLm.encodeText("internationalization xq", m.pieces, m.maxLen)
    val b = UnigramLm.encodeText("internationalization xq",
      loaded.pieces, loaded.maxLen)
    assert(a.toSeq == b.toSeq)
  }

  test("an empty word table trains an empty model; encoding still covers") {
    val m = UnigramLm.trainFromFreqs(Seq.empty, vocabSize = 10)
    assert(m.pieces.isEmpty)
    // single-char UNK floor still segments anything
    val enc = UnigramLm.encodeText("hi", m.pieces, m.maxLen)
    assert(enc.mkString("") == "▁hi")
    // the distributed path over an all-null column doesn't crash
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, null), Row(2L, "  "))),
      StructType(Seq(StructField("id", LongType),
        StructField("text", StringType))))
    val out = wrangle("unigram-token-count :text 10", d)
      .select("text_unigram_tokens").collect().map(_.getInt(0))
    assert(out.forall(_ == 0))
  }

  test("hard-EM segmentation prefers one piece for a whole frequent word") {
    // a single dominant short word should become its own piece and
    // encode as exactly one token
    val m = UnigramLm.trainFromFreqs(Seq(("nation", 1000L), ("x", 1L)),
      vocabSize = 30)
    val enc = UnigramLm.encodeText("nation", m.pieces, m.maxLen)
    assert(enc.toSeq == Seq("▁nation"), s"got ${enc.toSeq}")
  }
}
