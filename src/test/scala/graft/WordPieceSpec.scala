package graft

import graft.llm.WordPiece

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("merge loop follows the likelihood score with deterministic ties") {
    // hand-computed: alphabet {a, ##a, ##b}; round 1 ties (a,##a) and
    // (##a,##b) at score 0.1 -> lexicographically smaller ("##a","##b")
    // merges first (##ab); round 2 ties again -> ("##a","##ab") gives
    // ##aab; vocabSize 5 stops there
    val m = WordPiece.trainFromFreqs(Seq(("aaab", 4L), ("aab", 2L)), 5)
    assert(m.vocab == Set("a", "##a", "##b", "##ab", "##aab"), m.vocab)
    assert(m.maxLen == 5)
    // greedy longest-match-first takes the deepest merge in one step
    assert(WordPiece.encodeText("aaab ab", m.vocab, m.maxLen).toSeq ==
      Seq("a", "##aab", "a", "##b"))
  }

  test("whole-word UNK semantics and the long-word guard") {
    val m = WordPiece.trainFromFreqs(Seq(("abc", 5L)), 10)
    // "abc" merges all the way to one piece; any unmatchable position
    // renders the WHOLE word as one [UNK]
    assert(WordPiece.encodeText("abc axc zzz", m.vocab, m.maxLen).toSeq ==
      Seq("abc", WordPiece.Unk, WordPiece.Unk))
    // words over MaxWordChars short-circuit to [UNK]
    val long = "a" * (WordPiece.MaxWordChars + 1)
    assert(WordPiece.encodeWord(long, m.vocab, m.maxLen) ==
      List(WordPiece.Unk))
    // null/empty text encode to nothing
    assert(WordPiece.encodeText(null, m.vocab, m.maxLen).isEmpty)
    assert(WordPiece.encodeText("   ", m.vocab, m.maxLen).isEmpty)
  }

  test("training is deterministic and input-order independent") {
    val words = Seq(("nation", 40L), ("national", 30L), ("nationalize", 20L),
      ("inter", 25L), ("international", 15L), ("intra", 5L), ("xyz", 1L))
    val m1 = WordPiece.trainFromFreqs(words, 80)
    val m2 = WordPiece.trainFromFreqs(scala.util.Random.shuffle(words), 80)
    assert(m1.vocab == m2.vocab && m1.maxLen == m2.maxLen)
    // frequent stems survive as multi-char pieces
    assert(m1.vocab.exists(p => !p.startsWith("##") && p.length >= 3),
      m1.vocab.toSeq.sorted.mkString(","))
  }

  test("empty corpus degrades to all-UNK, never throws") {
    val m = WordPiece.trainFromFreqs(Nil, 10)
    assert(m.vocab.isEmpty)
    assert(WordPiece.encodeText("anything here", m.vocab, m.maxLen).toSeq ==
      Seq(WordPiece.Unk, WordPiece.Unk))
  }

  test("save/load round-trips the vocabulary; frozen encode is identical") {
    val df = Seq("the merge loop scores pairs", "the pairs repeat",
      "scores rank the merge").toDF("text")
    val m = WordPiece.train(df, "text", vocabSize = 70)
    val dir = java.nio.file.Files.createTempDirectory("wp").toString
    val path = s"$dir/vocab.txt"
    WordPiece.save(spark, m, path)
    val m2 = WordPiece.load(spark, path)
    assert(m2.vocab == m.vocab && m2.maxLen == m.maxLen)
    val probe = "the merge scores unseen zzzz"
    assert(WordPiece.encodeText(probe, m2.vocab, m2.maxLen).toSeq ==
      WordPiece.encodeText(probe, m.vocab, m.maxLen).toSeq)
  }

  test("tokenCount appends the piece-count column map-only") {
    val df = Seq(("a", "aaab aab ab"), ("b", "aaab")).toDF("id", "text")
    val out = WordPiece.tokenCount(df, "text", vocabSize = 5)
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[Int]("text_wordpiece_tokens")).toSeq.forall(_ > 0))
    // the plan stays a project over the scan — no shuffle, no join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
