package graft

import graft.llm.AudioHash

class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  // the ONE fixture kernel shared with the QueryBank oracles and the
  // scale probe — margin guarantees validated here hold there verbatim
  private def wav16(samples: Array[Int]): Array[Byte] =
    QueryBank.wav16(samples)
  private def fixtureSamples(id: Long): Array[Int] =
    QueryBank.audioFixtureSamples(id % 100, perturb = id >= 100)

  test("audioHash64: monotone energy envelopes pin every bit") {
    // |s| strictly rising per segment (65 segments x 4 samples, each
    // segment's constant amplitude k+1): e[k+1] > e[k] everywhere ->
    // all 64 bits set
    val rising = wav16(Array.tabulate(260)(i => (i / 4 + 1) * 100))
    assert(AudioHash.audioHash64(rising) == -1L)
    assert(AudioHash.audioHashHex(rising) == "f" * 16)
    // strictly falling -> no bit set
    val falling = wav16(Array.tabulate(260)(i => (65 - i / 4) * 100))
    assert(AudioHash.audioHash64(falling) == 0L)
    assert(AudioHash.audioHashHex(falling) == "0" * 16)
  }

  test("audioHash64: gain-invariant — the same recording louder hashes identically") {
    val base = fixtureSamples(7).map(_ / 4) // headroom for x3
    val loud = base.map(_ * 3)
    val hBase = AudioHash.audioHash64(wav16(base))
    val hLoud = AudioHash.audioHash64(wav16(loud))
    assert(hBase != null)
    assert(hBase == hLoud)
    // ...while the exact sample content differs
    assert(!java.util.Arrays.equals(wav16(base), wav16(loud)))
  }

  test("audioHash64: null for short, non-PCM and undecodable payloads") {
    assert(AudioHash.audioHash64(wav16(Array.tabulate(64)(_ * 10))) == null)
    assert(AudioHash.audioHash64("not audio at all".getBytes) == null)
    assert(AudioHash.audioHash64(null) == null)
    assert(AudioHash.audioHashHex(null) == null)
    // 65 samples is the minimum: one sample per segment
    assert(AudioHash.audioHash64(wav16(Array.tabulate(65)(_ * 10))) != null)
  }

  test("fixture margins: planted twins <= 1 bit, all cross pairs >= 4 bits") {
    val hashes = (0L until 200L).map { id =>
      id -> AudioHash.audioHash64(wav16(fixtureSamples(id))).longValue
    }.toMap
    for (id <- 0L until 100L) {
      val d = java.lang.Long.bitCount(hashes(id) ^ hashes(id + 100))
      assert(d <= 1, s"planted twin ($id, ${id + 100}) at hamming $d")
    }
    for (a <- 0L until 200L; b <- a + 1 until 200L if b != a + 100 || a >= 100) {
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      assert(d >= 4, s"cross pair ($a, $b) at hamming $d")
    }
  }

  test("audioDupPairs finds exactly the planted twins through the banded pipeline") {
    val fx = (0L until 200L).map(id => (id, wav16(fixtureSamples(id))))
      .toDF("doc_id", "payload")
    val pairs = AudioHash.audioDupPairs(fx, "payload", "doc_id",
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 100L).map(id => (id, id + 100)).toSet)
  }

  test("audioDedup keeps the smallest id of each twin and all singletons") {
    val fx = (0L until 200L).map(id => (id, wav16(fixtureSamples(id))))
      .toDF("doc_id", "payload")
    val kept = AudioHash.audioDedup(fx, "payload", "doc_id", maxHamming = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 100L).toSet)
  }

  test("audioDedupAgainst: corpus twins drop, novel rows and undecodables survive") {
    val fx = (0L until 150L).map(id => (id, wav16(fixtureSamples(id))))
      .toDF("doc_id", "payload")
    val state = AudioHash.audioHashState(
      fx.where($"doc_id" < 50), "payload", "doc_id")
    val kept = AudioHash.audioDedupAgainst(
        fx.where($"doc_id" >= 50), "payload", "doc_id", state)
      .select("doc_id").as[Long].collect().toSet
    // 100..149 are twins of corpus ids 0..49 (<= 1 bit) -> drop;
    // 50..99 are novel (>= 4 bits from everything) -> survive
    assert(kept == (50L until 100L).toSet)
    // undecodable payloads can't match anything and always survive
    val junk = Seq((500L, "junk".getBytes)).toDF("doc_id", "payload")
    assert(AudioHash.audioDedupAgainst(junk, "payload", "doc_id", state)
      .count() == 1L)
  }

  test("audioDupPairs: undecodable payloads drop out instead of matching") {
    val fx = Seq(
      (1L, wav16(fixtureSamples(1))),
      (2L, "junk".getBytes),
      (3L, "junk".getBytes)).toDF("doc_id", "payload")
    assert(AudioHash.audioDupPairs(fx, "payload", "doc_id").count() == 0L)
  }
}
