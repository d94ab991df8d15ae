package graft

import graft.llm._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {

  private def docsDf = df("doc_id BIGINT, text STRING", Seq(
    Row(1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    Row(2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    Row(3L, "completely different content about spark catalyst optimizer internals"),
    Row(4L, "The quick brown fox jumps over the lazy dog near the river bank today!"), // exact dup of 1 modulo case/punct
    Row(5L, "another unrelated document mentioning databases and storage engines")))

  test("exact dedup keeps smallest id per normalized content") {
    val out = Dedup.exact(docsDf, "text", "doc_id")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 5L)) // 4 collapses into 1
  }

  test("minhash LSH finds the planted near-duplicate pair, no cross join") {
    val pairs = Dedup.minhashPairs(docsDf, "text", "doc_id",
      numHashes = 64, bands = 16, shingleK = 5, threshold = 0.6)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"missing planted pair, got $got")
    assert(got.contains((1L, 4L)))
    assert(!got.exists { case (a, b) => Set(a, b).contains(3L) })
    // scale contract: no cartesian in the plan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"all-pairs join detected:\n$plan")
  }

  test("minhashJoin matches near-dups ACROSS tables, no cross join") {
    val left = docsDf.filter(col("doc_id") <= 3)   // 1, 2, 3
    val right = df("rid BIGINT, body STRING", Seq(
      Row(10L, "The quick brown fox jumps over the lazy dog near the river bank today!"), // ~doc 1
      Row(11L, "entirely novel material on distributed shuffle services"),
      Row(12L, "completely different content about spark catalyst optimizer internals"))) // = doc 3
    val out = Dedup.minhashJoin(left, right, "text", "body",
      "doc_id", "rid", numHashes = 64, bands = 16, shingleK = 5,
      threshold = 0.6)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), s"missing planted cross match, got $got")
    assert(got.contains((3L, 12L)))
    assert(!got.exists(_._2 == 11L), s"unrelated right row matched: $got")
    // verified similarity comes back with the pair
    val j = out.filter(col("id_a") === 3 && col("id_b") === 12)
      .select("jaccard").head().getDouble(0)
    assert(j == 1.0, s"identical text should verify at 1.0, got $j")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"all-pairs join:\n$plan")
  }

  test("minhashDedup drops near-duplicates, keeps distinct docs") {
    val out = Dedup.minhashDedup(docsDf, "text", "doc_id",
      numHashes = 64, bands = 16, shingleK = 5, threshold = 0.6)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L) && ids.contains(5L) && ids.contains(1L))
    assert(!ids.contains(2L) && !ids.contains(4L))
  }

  test("simhash: near-dups within small hamming distance, distinct docs far") {
    val sigs = docsDf.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(4L)) <= 3, "case/punct variant should be close")
    assert(ham(sigs(1L), sigs(3L)) > 10, "unrelated docs should be far")
  }

  test("simhashPairs surfaces close pairs via banding") {
    val pairs = Dedup.simhashPairs(docsDf, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard: identical=1, planted near-dup high, unrelated low") {
    val d = docsDf.limit(1).select(
      Dedup.ngramJaccard(lit("a b c d e"), lit("a b c d e"), 2).as("same"),
      Dedup.ngramJaccard(
        lit("the quick brown fox jumps over the lazy dog today"),
        lit("the quick brown fox jumps over the lazy dog tonight"), 2).as("near"),
      Dedup.ngramJaccard(lit("a b c d e"), lit("x y z w v"), 2).as("far"))
    val r = d.collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) > 0.5)
    assert(r.getDouble(2) == 0.0)
  }

  private def embDf = {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    def jitter(eps: Float) = base.map(x => x + eps * rnd.nextGaussian().toFloat)
    val rows = Seq(
      Row(0L, base.toSeq), Row(1L, jitter(0.05f).toSeq), Row(2L, jitter(0.1f).toSeq)) ++
      (3L to 40L).map(i => Row(i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    df("vec_id BIGINT, embedding ARRAY<FLOAT>", rows)
  }

  test("brute-force cosine top-k ranks the jittered neighbors first") {
    val q = embDf.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val top = Similarity.cosineTopK(embDf, "vec_id", "embedding", q, 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(top.head == 0L)
    assert(top.toSet.contains(1L))
  }

  test("LSH top-k recalls the true nearest neighbors with multiprobe") {
    val q = embDf.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val brute = Similarity.cosineTopK(embDf, "vec_id", "embedding", q, 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(embDf, "vec_id", "embedding", q, 3,
      bits = 6, probeHamming = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((brute intersect lsh).size >= 2, s"poor recall: brute=$brute lsh=$lsh")
  }

  test("crossTopK: two-phase top-k, no full-corpus exchange into a per-qid window") {
    val queries = embDf.limit(2).select(
      col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.crossTopK(embDf, queries, "vec_id", "embedding",
      "qid", "qvec", 3)
    assert(out.count() == 6)
    // ranks agree with brute force per query
    val qs = queries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    qs.foreach { case (qid, qv) =>
      val brute = Similarity.cosineTopK(embDf, "vec_id", "embedding", qv, 3)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val got = out.filter(col("qid") === qid).orderBy("rank")
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == brute, s"qid=$qid: two-phase=$got brute=$brute")
    }
    val plan = out.queryExecution.executedPlan.toString
    // phase 1 (bounded per-partition heap) must sit below the window:
    // the window's input is Q×P×k rows, never the scored corpus
    assert(plan.contains("MapPartitions"),
      s"partial top-k phase missing from plan:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"))
    val winIdx = plan.indexOf("Window")
    val mapIdx = plan.indexOf("MapPartitions")
    assert(winIdx >= 0 && mapIdx > winIdx,
      s"window does not sit above the partial top-k:\n$plan")
  }

  test("simhashPairs skew guard bounds a degenerate hot bucket") {
    // 1000 identical docs ⇒ identical signatures ⇒ ONE bucket per band;
    // without the cap the bucket join goes quadratic (499 500 pairs ×4)
    val rows = (1L to 1000L).map(i => Row(i,
      "the exact same boilerplate text repeated across the corpus"))
    val d = df("doc_id BIGINT, text STRING", rows)
    val capped = Dedup.simhashPairs(d, "text", "doc_id",
      maxHamming = 3, maxBucketSize = 50)
    assert(capped.count() == 0, "oversized buckets must be dropped")
    // the documented path for hot buckets: collapse exact dups first
    val kept = Dedup.simhashDedup(d, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), s"exact pre-collapse should keep id 1, got $kept")
  }

  test("connectedComponents releases its cache and flags non-convergence") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
    def pairsDf(edges: Seq[(Long, Long)]) = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        edges.map { case (a, b) => Row(a, b) }: _*)), schema)
    val before = spark.sparkContext.getPersistentRDDs.size
    // both regimes agree on the components: driver union-find (the
    // small-pair-set fast path) and the distributed iteration
    // (driverLimit = 0 forces it)
    val edges1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val expect1 = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    val viaDriver = Dedup.connectedComponents(pairsDf(edges1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == expect1)
    val cc = Dedup.connectedComponents(pairsDf(edges1), driverLimit = 0)
    val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect1)
    // cache footprint must not scale with iterations: intermediate label
    // sets and edges are released; only the returned checkpoint lingers.
    // unpersist() is NON-blocking, so under load the bookkeeping lags a
    // moment behind the loop — poll briefly instead of reading one
    // racy snapshot (this was a rare flake on a contended box)
    def after = spark.sparkContext.getPersistentRDDs.size
    val deadline = System.currentTimeMillis + 15000
    while (after - before > 2 && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(after - before <= 2,
      s"persisted RDDs grew $before -> $after (cache leak across iterations)")
    // a chain deeper than maxIter exits WITHOUT converging — labels are
    // still a valid partial collapse (prefix of the chain), not garbage.
    // (maxIter only governs the distributed loop; the driver union-find
    // always converges, so force the iterative path.)
    val chain = (1L until 12L).map(i => (i, i + 1))
    val partial = Dedup.connectedComponents(pairsDf(chain), maxIter = 2,
      driverLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial(1L) == 1L)
    assert(partial.values.toSet.size > 1, "2 iters cannot collapse a 12-chain")
    // and enough iterations do collapse it fully
    val full = Dedup.connectedComponents(pairsDf(chain), maxIter = 15,
      driverLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.toSet == Set(1L))
    // the driver path collapses the same deep chain in one pass
    assert(Dedup.connectedComponents(pairsDf(chain))
      .collect().map(_.getLong(1)).toSet == Set(1L))
  }

  test("exactKeepBest keeps the highest-priority copy, ties to min id") {
    val d = df("id BIGINT, text STRING, q DOUBLE", Seq(
      Row(1L, "same content", 0.2),
      Row(2L, "SAME CONTENT!!", 0.9),   // best copy of the group
      Row(3L, "same   content", 0.9),   // tie on q -> loses to id 2
      Row(4L, "other doc", 0.5)))
    val kept = Dedup.exactKeepBest(d, "text", "id", "q")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
    // directive surface: optional third column flips the policy
    val viaRecipe = wrangle("dedup-exact :text :id :q", d)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaRecipe == kept)
    // without the priority column the original min-id policy holds
    assert(wrangle("dedup-exact :text :id", d)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
  }

  test("removeDuplicatedLines: global first occurrence survives, short lines exempt") {
    val header = "SHARED HEADER LINE WITH ENOUGH CHARACTERS"
    val d = df("id BIGINT, text STRING", Seq(
      Row(1L, s"$header\nunique one\nhi"),
      Row(2L, s"$header\nunique two\nhi"),          // header removed here
      Row(3L, s"unique three\n$header\nhi"),        // and here (later (id,pos))
      Row(4L, "no duplicates at all")))
    val out = graft.llm.SpanDedup.removeDuplicatedLines(d, "text", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"$header\nunique one\nhi") // global first kept
    assert(out(2L) == "unique two\nhi")
    assert(out(3L) == "unique three\nhi")
    assert(out(4L) == "no duplicates at all")     // byte-identical passthrough
    // "hi" repeats in 3 docs but is under minChars — never touched
    assert(out.values.count(_.endsWith("hi")) == 3)
    // directive surface + custom floor: with minChars=2 the "hi" lines
    // dedup too (first doc keeps it)
    val aggressive = wrangle("dedup-lines :text :id 2", d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(aggressive(1L).endsWith("hi") && !aggressive(2L).contains("hi"))
  }

  test("dedup-paragraphs: blank-line blocks dedup as units, lines inside survive") {
    // the shared paragraph spans two lines — line dedup would cut each
    // line independently; paragraph dedup treats the block as the unit
    val boiler = "SHARED BOILERPLATE PARAGRAPH\nSPANNING TWO LINES"
    val d = df("id BIGINT, text STRING", Seq(
      Row(1L, s"$boiler\n\nbody of the first document here"),
      Row(2L, s"$boiler\n\nbody of the second document here"),
      Row(3L, "no shared paragraphs\n\nanywhere in this one")))
    val out = wrangle("dedup-paragraphs :text :id", d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"$boiler\n\nbody of the first document here")
    assert(out(2L) == "body of the second document here")
    assert(out(3L) == "no shared paragraphs\n\nanywhere in this one")
  }

  test("bm25-score: relevance orders by term frequency and rarity") {
    val d = df("id BIGINT, text STRING", Seq(
      Row(1L, "spark spark spark runs fast"),       // high tf of a query term
      Row(2L, "spark is a query engine"),           // one query term
      Row(3L, "nothing relevant whatsoever here"),  // no overlap -> 0
      Row(4L, "window window spark")))              // two query terms
    val out = wrangle("bm25-score :text 'spark window'", d)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("text_bm25"))).toMap
    assert(out(3L) == 0.0)
    assert(out(4L) > out(2L)) // two matching terms beat one
    assert(out(1L) > out(2L)) // higher tf beats single occurrence
    // hand-check doc 2 ('spark' only): N=4, df(spark)=3, dl=5, avgdl=4.25
    val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    val expect2 = idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 5 / 4.25))
    assert(math.abs(out(2L) - expect2) < 1e-12)
  }

  test("quantize-embedding: int8 codes with per-vector scale") {
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      Row(2L, Seq(0.0f, 0.0f)),
      Row(3L, null)))
    val rows = wrangle("quantize-embedding :embedding", d)
      .orderBy("vec_id").collect()
    val c1 = rows(0).getSeq[Int](rows(0).fieldIndex("embedding"))
    // scale = 1/127; -0.5/scale = -63.5 rounds HALF-AWAY to -64
    assert(c1 == Seq(127, -64, 32, 0))
    assert(math.abs(rows(0).getDouble(rows(0).fieldIndex("embedding_scale")) - 1.0 / 127) < 1e-15)
    assert(rows(1).getSeq[Int](rows(1).fieldIndex("embedding")) == Seq(0, 0))
    assert(rows(1).getDouble(rows(1).fieldIndex("embedding_scale")) == 0.0)
    assert(rows(2).isNullAt(rows(2).fieldIndex("embedding")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("embedding_scale")))
  }

  test("split-sentences: terminal punctuation, attached closers, tail fragment") {
    val d = df("id BIGINT, text STRING", Seq(
      Row(1L, "Hello world. \"Are you ok?\" Yes! trailing tail"),
      Row(2L, "no terminal punctuation at all"),
      Row(3L, "")))
    val out = wrangle("split-sentences :text", d)
      .collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("sentence_id")),
        r.getString(r.fieldIndex("text"))))
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq == Seq(
      (0, "Hello world."), (1, "\"Are you ok?\""), (2, "Yes!"),
      (3, "trailing tail")))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("no terminal punctuation at all"))
    assert(!out.exists(_._1 == 3L)) // empty doc -> no rows
  }

  test("hashing-tf: stable buckets, counts, zero vector for empty") {
    import graft.functions.Udfs.hashingTf
    val v = hashingTf("spark spark window", 16)
    assert(v.sum == 3 && v.length == 16)
    // same token always lands in the same bucket; 'spark' bucket holds 2
    assert(v.max == 2)
    assert(hashingTf(null, 8).toSeq == Seq.fill(8)(0))
    // bucket matches the documented rule: first 32 md5 bits (unsigned) mod k
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("spark".getBytes("UTF-8"))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    assert(v((u % 16).toInt) == 2)
  }

  test("quantize/dequantize roundtrip bounds reconstruction error by scale/2") {
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(0.83f, -0.41f, 0.077f, 0.0f)),
      Row(2L, Seq(-1.25f, 0.5f))))
    val orig = Map(1L -> Seq(0.83f, -0.41f, 0.077f, 0.0f),
      2L -> Seq(-1.25f, 0.5f))
    val rows = wrangle(
      "quantize-embedding :embedding; dequantize-embedding :embedding", d)
      .collect()
    assert(!rows.head.schema.fieldNames.contains("embedding_scale"))
    rows.foreach { r =>
      val id = r.getLong(0)
      val rec = r.getSeq[Float](r.fieldIndex("embedding"))
      val scale = orig(id).map(math.abs(_)).max / 127.0
      orig(id).zip(rec).foreach { case (o, x) =>
        assert(math.abs(o - x) <= scale / 2 + 1e-7, s"id=$id $o vs $x")
      }
    }
  }

  test("quantized cosine top-k ranks like exact cosine on separable vectors") {
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.2f)),
      Row(1L, Seq(0.9f, 0.1f, 0.2f)),   // near the query
      Row(2L, Seq(-1.0f, 0.0f, 0.0f)),  // opposite
      Row(3L, Seq(0.0f, 1.0f, 0.0f))))  // orthogonal-ish
    val q = Array(1.0f, 0.0f, 0.2f)
    val top = graft.llm.Similarity
      .quantizedCosineTopK(d, "vec_id", "embedding", q, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L, 3L))
  }

  test("normalizeUrl canonicalizes and passes junk through") {
    import graft.functions.Udfs.normalizeUrl
    assert(normalizeUrl(
      "HTTPS://WWW.Shop.Example.COM:443//a//b/?utm_source=x&b=2&a=1&fbclid=y#frag")
      == "https://shop.example.com/a/b?a=1&b=2")
    assert(normalizeUrl("http://example.org:8080/x/") ==
      "http://example.org:8080/x")          // non-default port kept
    assert(normalizeUrl("http://example.org") == "http://example.org/")
    assert(normalizeUrl("https://example.org/?utm_source=x&utm_medium=y") ==
      "https://example.org/")               // all params tracking -> none
    assert(normalizeUrl("  not a url at all ") == "not a url at all")
    assert(normalizeUrl(null) == null)
  }

  test("langId picks the stopword-dominant language") {
    val d = df("t STRING", Seq(
      Row("the cat sat on the mat and it was happy"),
      Row("der hund ist nicht auf der straße und die katze"),
      Row("xyzzy plugh")))
    val out = d.select(TextAnalysis.langId(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("tokenCount and fingerprint are stable") {
    val d = df("t STRING", Seq(Row("  Hello,  World! one two ")))
    val r = d.select(TextAnalysis.tokenCount(col("t")),
      TextAnalysis.fingerprint(col("t")),
      TextAnalysis.fingerprint(lit("hello world one two"))).collect().head
    assert(r.getInt(0) == 4)
    assert(r.getString(1) == r.getString(2)) // normalization collapses
  }

  test("multimodal: metadata attach + stub decode + frame sampling plumbing") {
    val d = df("id BIGINT, payload BINARY", Seq(
      Row(1L, "somebinarypayloadcontentsimulatinganimage".getBytes),
      Row(2L, "anotherpayload".getBytes)))
    val withMeta = Multimodal.attachMetadata(d, "payload", "image", "png")
    val meta = withMeta.select("payload_meta.*")
    assert(meta.columns.toSet ==
      Set("media_type", "format", "n_bytes", "width", "height", "duration_ms", "checksum"))
    val feats = withMeta.withColumn("features",
      Multimodal.decodeStub(col("payload")))
    val v = feats.select("features").head().getSeq[Float](0)
    assert(v.size == 16 && math.abs(v.sum - 1.0) < 1e-5)
    val frames = Multimodal.sampleFrames(d, "payload", "id", n = 3, frameBytes = 8)
    assert(frames.count() == 6)
    assert(frames.columns.toSeq == Seq("id", "frame_idx", "offset", "frame"))
  }

  test("imageFeatures: real decode for PNG, stub fallback for opaque bytes") {
    // 2x2 RGB: pure red, green, blue, white
    val px = Array[Int](255,0,0, 0,255,0, 0,0,255, 255,255,255)
      .map(_.toByte)
    val png = MediaHeaders.pngEncode(2, 2, 2, px)
    val d = df("id BIGINT, payload BINARY", Seq(
      Row(1L, png), Row(2L, "notapngjustbytes".getBytes)))
    val out = d.withColumn("f", Multimodal.imageFeatures(col("payload"), 8))
      .orderBy("id").select("f").collect().map(_.getSeq[Float](0))
    val real = out(0)
    // channel means: r=(255+0+0+255)/4/255, same for g and b
    assert(real.size == 8)
    assert(math.abs(real(0) - 0.5f) < 1e-6, s"mean_r ${real(0)}")
    assert(math.abs(real(1) - 0.5f) < 1e-6)
    assert(math.abs(real(2) - 0.5f) < 1e-6)
    // luminance: red 76, green 149, blue 29, white 255 -> 5-bin hist
    // bins of width 51.2: b0={29}, b1={76}, b2={149->bin2}, b4={255}
    val hist = real.drop(3)
    assert(math.abs(hist.sum - 1.0f) < 1e-5)
    assert(hist(4) > 0.24f) // white pixel lands in the top bin
    // direct kernel agreement
    val k = MediaHeaders.pngFeatures(png, 8)
    assert(k.toSeq == real.toSeq)
    // non-PNG falls back to the deterministic stub (still 8 wide, sums to 1)
    val stub = out(1)
    assert(stub.size == 8 && math.abs(stub.sum - 1.0f) < 1e-5)
    assert(MediaHeaders.pngFeatures("notapngjustbytes".getBytes, 8) == null)
  }

  test("minhash dedup survives a heavily duplicated corpus (skew guard)") {
    // 500 docs x 40 exact copies = 20k rows; without the exact-collapse
    // + bucket cap this would generate ~40^2 x 500 x bands candidates
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val blown = (0 until 40).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ union _)
    val t0 = System.nanoTime()
    val out = Dedup.minhashDedup(blown, "text", "doc_id",
      numHashes = 64, bands = 16, shingleK = 5, threshold = 0.8)
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n <= 500, s"exact copies must collapse, got $n")
    // guard target is the QUADRATIC blowup (10-100x, minutes-to-hours),
    // not constant factors: hypervisor contention on this box inflates
    // wall clock up to ~1.5x (see PERF.md), so the bound leaves slack
    assert(secs < 240, s"took ${secs}s")
  }

  test("MediaHeaders.wavStats decodes PCM samples exactly") {
    import graft.llm.MediaHeaders
    def le16(v: Int): Seq[Byte] = Seq(v.toByte, (v >> 8).toByte)
    def le32(v: Long): Seq[Byte] =
      Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def wav16(samples: Seq[Int]): Array[Byte] =
      ("RIFF".getBytes.toSeq ++ le32(36L + samples.length * 2) ++
        "WAVE".getBytes.toSeq ++ "fmt ".getBytes.toSeq ++ le32(16) ++
        le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++
        le16(16) ++ "data".getBytes.toSeq ++ le32(samples.length * 2L) ++
        samples.flatMap(s => le16(s & 0xffff))).toArray
    // sign extension, extremes, and exact integer stats
    val st = MediaHeaders.wavStats(wav16(Seq(0, 1000, -1000, 32767, -32768)))
    assert(st.n_samples == 5)
    assert(st.peak == 32768)
    assert(st.sum == 0L + 1000 - 1000 + 32767 - 32768)
    assert(st.sumsq == 2L * 1000 * 1000 + 32767L * 32767 + 32768L * 32768)
    // 8-bit WAV: unsigned bytes around a 128 midpoint
    val w8 = ("RIFF".getBytes.toSeq ++ le32(36L + 3) ++
      "WAVE".getBytes.toSeq ++ "fmt ".getBytes.toSeq ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++
      le16(8) ++ "data".getBytes.toSeq ++ le32(3) ++
      Seq[Byte](128.toByte, 255.toByte, 0)).toArray
    val s8 = MediaHeaders.wavStats(w8)
    assert(s8.n_samples == 3 && s8.peak == 128 && s8.sum == -1L &&
      s8.sumsq == 127L * 127 + 128L * 128)
    // non-PCM (format 3 = IEEE float) and non-WAV payloads decode to null
    val f32 = ("RIFF".getBytes.toSeq ++ le32(36) ++ "WAVE".getBytes.toSeq ++
      "fmt ".getBytes.toSeq ++ le32(16) ++ le16(3) ++ le16(1) ++ le32(8000) ++
      le32(32000) ++ le16(4) ++ le16(32) ++ "data".getBytes.toSeq ++
      le32(0)).toArray
    assert(MediaHeaders.wavStats(f32) == null)
    assert(MediaHeaders.wavStats("not audio at all, sorry".getBytes ++
      new Array[Byte](40)) == null)
    // a data chunk whose declared length exceeds the buffer is clamped,
    // not crashed
    val trunc = wav16(Seq(1, 2, 3)).dropRight(2)
    assert(MediaHeaders.wavStats(trunc).n_samples == 2)
  }

  test("MediaHeaders.wavFrameStats: framing, silence, clipping, tail") {
    import graft.llm.MediaHeaders
    def le16(v: Int): Seq[Byte] = Seq(v.toByte, (v >> 8).toByte)
    def le32(v: Long): Seq[Byte] =
      Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def wav16(samples: Seq[Int]): Array[Byte] =
      ("RIFF".getBytes.toSeq ++ le32(36L + samples.length * 2) ++
        "WAVE".getBytes.toSeq ++ "fmt ".getBytes.toSeq ++ le32(16) ++
        le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++
        le16(16) ++ "data".getBytes.toSeq ++ le32(samples.length * 2L) ++
        samples.flatMap(s => le16(s & 0xffff))).toArray
    // 4+4+2 samples at frameSize 4: loud frame (one clipped), silent
    // frame (all |s| < 512), partial silent tail
    val smp = Seq(32767, -100, 200, -300, 511, -511, 0, 100, 400, -400)
    val st = MediaHeaders.wavFrameStats(wav16(smp), 4)
    assert(st.n_frames == 3)
    assert(st.clip_count == 1)      // only 32767 >= 32000
    assert(st.silence_frames == 2)  // frame 2 and the 2-sample tail
    assert(st.peak_frame_energy ==
      32767L * 32767 + 100L * 100 + 200L * 200 + 300L * 300)
    // boundary: |s| = 512 is NOT silent; |s| = 32000 IS clipped
    val b = MediaHeaders.wavFrameStats(wav16(Seq(512, 0, -32000, 1)), 2)
    assert(b.silence_frames == 0 && b.clip_count == 1)
    // 8-bit samples scale to 16-bit: (129,131) -> (+256, +768); the
    // frame peak 768 >= 512, so the scaled frame is NOT silent
    val w8 = ("RIFF".getBytes.toSeq ++ le32(36L + 2) ++
      "WAVE".getBytes.toSeq ++ "fmt ".getBytes.toSeq ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++
      le16(8) ++ "data".getBytes.toSeq ++ le32(2) ++
      Seq[Byte](129.toByte, 131.toByte)).toArray
    val s8 = MediaHeaders.wavFrameStats(w8, 4)
    assert(s8.n_frames == 1 && s8.silence_frames == 0 &&
      s8.peak_frame_energy == 256L * 256 + 768L * 768)
    // non-PCM and garbage -> null; empty data -> zero frames
    assert(MediaHeaders.wavFrameStats("nope".getBytes ++
      new Array[Byte](48), 4) == null)
    assert(MediaHeaders.wavFrameStats(wav16(Nil), 4).n_frames == 0)
  }

  test("MediaHeaders.probe reads PNG/GIF/WAV/JPEG headers") {
    import graft.llm.MediaHeaders
    def be32(v: Long): Seq[Byte] =
      Seq((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int): Seq[Byte] = Seq((v >> 8).toByte, v.toByte)
    def le16(v: Int): Seq[Byte] = Seq(v.toByte, (v >> 8).toByte)
    def le32(v: Long): Seq[Byte] =
      Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

    val png = (Seq(0x89.toByte) ++ "PNG".getBytes.toSeq ++
      Seq[Byte](0x0d, 0x0a, 0x1a, 0x0a) ++ be32(13) ++ "IHDR".getBytes.toSeq ++
      be32(640) ++ be32(480) ++ Seq[Byte](8, 6, 0, 0, 0)).toArray
    val pp = MediaHeaders.probe(png)
    assert(pp.format == "png" && pp.width == 640 && pp.height == 480)

    val gif = ("GIF89a".getBytes.toSeq ++ le16(320) ++ le16(200) ++
      Seq[Byte](0, 0, 0)).toArray
    val gp = MediaHeaders.probe(gif)
    assert(gp.format == "gif" && gp.width == 320 && gp.height == 200)

    // RIFF/WAVE: fmt chunk byteRate=16000, data chunk 32000 bytes -> 2000ms
    val wav = ("RIFF".getBytes.toSeq ++ le32(36 + 32000) ++
      "WAVE".getBytes.toSeq ++ "fmt ".getBytes.toSeq ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(16000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes.toSeq ++ le32(32000)).toArray
    val wp = MediaHeaders.probe(wav)
    assert(wp.format == "wav" && wp.duration_ms == 2000L)

    // JPEG with an APP0 segment before SOF0 (marker walk must skip it)
    val jpg = (Seq[Byte](0xff.toByte, 0xd8.toByte) ++
      Seq[Byte](0xff.toByte, 0xe0.toByte) ++ be16(4) ++ Seq[Byte](0, 0) ++
      Seq[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Seq[Byte](8) ++
      be16(1080) ++ be16(1920) ++ Seq[Byte](3, 0, 0)).toArray
    val jp = MediaHeaders.probe(jpg)
    assert(jp.format == "jpeg" && jp.width == 1920 && jp.height == 1080)

    assert(MediaHeaders.probe("plain text payload!!".getBytes) == null)

    // MP4 / ISO BMFF: ftyp + moov{mvhd v0 (timescale 1000, duration
    // 90000 -> 90000 ms), trak{tkhd v0 with 1280x720 16.16 fixed}}
    def box(id: String, payload: Seq[Byte]): Seq[Byte] =
      be32(8L + payload.length) ++ id.getBytes.toSeq ++ payload
    val mvhd = box("mvhd", Seq[Byte](0, 0, 0, 0) ++ // v0 + flags
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(90000) ++ be32(0x00010000L))
    val tkhd = box("tkhd", Seq[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(90000) ++
      be32(0) ++ be32(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      Seq.fill(36)(0.toByte) ++ // identity matrix slot
      be32(1280L << 16) ++ be32(720L << 16))
    val mp4 = (box("ftyp", "isom0000".getBytes.toSeq) ++
      box("moov", (mvhd ++ box("trak", tkhd)).toSeq)).toArray
    val m4 = MediaHeaders.probe(mp4)
    assert(m4.format == "mp4" && m4.duration_ms == 90000L &&
      m4.width == 1280 && m4.height == 720, s"got $m4")

    // MP3: ID3v2 (empty, syncsafe size 0) + MPEG-1 Layer III 128 kbps
    // frame header + 1600 bytes of payload -> (1600+4)*8/128 = 100 ms
    val mp3 = ("ID3".getBytes.toSeq ++ Seq[Byte](4, 0, 0) ++
      Seq[Byte](0, 0, 0, 0) ++
      Seq[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Seq.fill(1600)(0x55.toByte)).toArray
    val m3 = MediaHeaders.probe(mp3)
    assert(m3.format == "mp3" && m3.duration_ms == (1604L * 8 / 128),
      s"got $m3")

    // ID3v2.4 footer flag (0x10): tag = header(10)+data(0)+footer(10);
    // plus a trailing 128-byte ID3v1 "TAG" block — both are metadata,
    // so the sync check must skip 20 bytes and the CBR duration must
    // exclude the ID3v1 bytes: same 1604-byte payload as above
    val mp3Footer = ("ID3".getBytes.toSeq ++ Seq[Byte](4, 0, 0x10) ++
      Seq[Byte](0, 0, 0, 0) ++
      ("3DI".getBytes.toSeq ++ Seq[Byte](4, 0, 0x10) ++ Seq[Byte](0, 0, 0, 0)) ++
      Seq[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Seq.fill(1600)(0x55.toByte) ++
      ("TAG".getBytes.toSeq ++ Seq.fill(125)(0x20.toByte))).toArray
    val m3f = MediaHeaders.probe(mp3Footer)
    assert(m3f.format == "mp3" && m3f.duration_ms == (1604L * 8 / 128),
      s"got $m3f")
  }


  test("IVF top-k: full-probe equals brute force; partial probe prunes") {
    import graft.llm.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    // probing every cell must reproduce the exact answer
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
      nlist = 8, nprobe = 8).collect().map(_.getLong(0)).toSet
    assert(full == brute)
    // partial probe: bounded scan, decent recall
    val part = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
      nlist = 8, nprobe = 4)
    assert(part.count() <= 10)
    val recall = part.collect().map(_.getLong(0)).toSet.intersect(brute).size
    assert(recall >= 4, s"ivf recall too low: $recall/10")
    // the cell filter actually prunes the corpus
    val cents = Similarity.trainCentroids(emb, "embedding", 8)
    val cells = emb.withColumn("__cell",
      Similarity.ivfCell(org.apache.spark.sql.functions.col("embedding"), cents))
      .groupBy("__cell").count().collect()
    assert(cells.length > 1, "quantizer collapsed to one cell")
  }


  test("embedding-cosine near-dup: planted duplicates found, no cross join") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(5)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val bases = Array.fill(20)(vec())
    // ids 0..19 distinct vectors; 100..104 near-copies of bases 0..4
    val rows = bases.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq) } ++
      (0 until 5).map(i => Row((100 + i).toLong, jitter(bases(i)).toSeq))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val d = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows.toSeq: _*)), schema)
    val pairs = graft.llm.Dedup.embeddingPairs(d, "vec_id", "embedding",
      threshold = 0.95, bands = 8, bitsPerBand = 4)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 5).map(i => (i.toLong, (100 + i).toLong)).toSet
    assert(expected.subsetOf(found), s"missing planted pairs: ${expected -- found}")
    // nothing spurious: all found pairs really have cosine >= 0.95
    assert(pairs.filter(org.apache.spark.sql.functions.col("cosine") < 0.95).count() == 0)
    // physical plan: candidates come from a bucket equi-join, never a product
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    // dedup keeps the smallest id of each pair
    val kept = graft.llm.Dedup.embeddingDedup(d, "vec_id", "embedding",
      threshold = 0.95).select("vec_id").collect().map(_.getLong(0)).toSet
    assert((0L until 20L).forall(kept.contains))
    assert((100L to 104L).forall(id => !kept.contains(id)))
  }


  test("text-analysis kernels match their Column formulations exactly") {
    import graft.llm.TextAnalysis._
    val samples = Seq(
      "the quick brown fox and the lazy dog of it",
      "der hund und die katze sind nicht im haus",
      "le chat est dans la maison pour le moment",
      "el perro y el gato en la casa con su amigo",
      "", "   ", "a", "1 2 3 4 5 6 7 8 9",
      "!!! ??? ... ;;; ::: ~~~ ((( )))",
      "MiXeD CaSe The OF And TO in IS that",
      "word " * 200, "x\ty\nz  w", null,
      // astral chars: length() counts CODEPOINTS — 2 punct over 10
      // codepoints sits exactly on the 0.2 punct threshold
      "!!" + "😀" * 8)
    val d = df("t STRING", samples.map(Row(_)))
    val both = d.select(
      langId(col("t")).as("k_lang"), langIdColumns(col("t")).as("c_lang"),
      tokenCount(col("t")).as("k_tok"), tokenCountColumns(col("t")).as("c_tok"),
      qualityScore(col("t")).as("k_q"), qualityScoreColumns(col("t")).as("c_q"))
      .collect()
    both.zip(samples).foreach { case (r, s) =>
      val tag = Option(s).map(_.take(20)).getOrElse("NULL")
      assert(r.get(0) == r.get(1), s"langId mismatch on '$tag': ${r.get(0)} vs ${r.get(1)}")
      assert(r.get(2) == r.get(3), s"tokenCount mismatch on '$tag': ${r.get(2)} vs ${r.get(3)}")
      assert(r.get(4) == r.get(5), s"quality mismatch on '$tag': ${r.get(4)} vs ${r.get(5)}")
    }
  }

  test("fused band-bucket kernel matches the xxhash64 Column formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val numHashes = 128; val bands = 16; val r = numHashes / bands
    val sig = graft.functions.Udfs.minhashSigUdf(
      col("text"), lit(numHashes), lit(5), lit(42L))
    val oldBuckets = array((0 until bands).map(b =>
      xxhash64((b * r until (b + 1) * r)
        .map(i => element_at(sig, i + 1)): _*)): _*)
    val kernel = graft.functions.Udfs.minhashBandBucketsUdf(
      col("text"), lit(numHashes), lit(bands), lit(5), lit(42L))
    val rows = docs.select(kernel.as("k"), oldBuckets.as("c")).collect()
    rows.foreach { row =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1),
        "band buckets diverge from the xxhash64 fold")
    }
    // empty text: kernel returns an empty array (filtered upstream)
    val empty = df("text STRING", Seq(Row(""), Row(null))).select(
      graft.functions.Udfs.minhashBandBucketsUdf(
        col("text"), lit(numHashes), lit(bands), lit(5), lit(42L)).as("k"))
      .collect()
    assert(empty(0).getSeq[Long](0).isEmpty)
  }

  test("dedup-key normalization kernel matches the regex Column formulation") {
    val rnd = new scala.util.Random(19)
    val alphabet =
      "abcXYZ019 \t\n\f\r!.,;:-_()[]{}\"'åÅéÉüÜßİıÆæØø中日€😀 …"
    val fuzz = (1 to 400).map(_ =>
      (1 to rnd.nextInt(60)).map(_ =>
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq(
      null, "", " ", "  \t \n ", "a", " a ", "a .. b", "A.B", "a . b",
      "ABC!!!def", "x y", "İstanbul I ı", "STRASSE ß strasse",
      "1..2..3", "...", "über Äpfel señor", "a" * 5000,
      ("word " * 100) + "!@#$%^&*()")
    val d = df("t STRING", (fuzz ++ edges).map(Row(_)))
    val rows = d.select(
      graft.llm.Dedup.normalized(col("t")).as("kernel"),
      graft.llm.Dedup.normalizedRef(col("t")).as("ref"),
      col("t")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1),
        s"normalize mismatch on '${Option(r.get(2)).map(_.toString.take(40))}'" +
          s": kernel='${r.get(0)}' ref='${r.get(1)}'")
    }
  }

  test("dedup-simhash and dedup-embedding directives wire to the library") {
    val d = df("id BIGINT, t STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog"),
      Row(2L, "the quick brown fox jumps over the lazy dog"),
      Row(3L, "completely different text about spark engines")))
    val out = wrangle("dedup-simhash :t :id", d)
    assert(strings(out.orderBy("id"), "id") == Seq(1L, 3L))
    val d2 = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.0f, 0.0f, 0.5f)),
      Row(2L, Seq(1.0f, 0.0f, 0.5f)),
      Row(3L, Seq(-1.0f, 0.5f, 0.0f))))
    val out2 = wrangle("dedup-embedding :v :id", d2)
    assert(strings(out2.orderBy("id"), "id") == Seq(1L, 3L))
  }

  test("redact-pii masks each span type; subset selection; unknown type errors") {
    val d = df("t STRING", Seq(
      Row("mail a.b+c@x-y.co.uk, call (415) 555-2671 or +1 415.555.2671"),
      Row("ssn 078-05-1120 card 4111-1111-1111-1111 host 192.168.0.255"),
      Row(null)))
    val out = strings(wrangle("redact-pii :t", d), "t")
    assert(out(0) == "mail [EMAIL], call [PHONE] or [PHONE]")
    assert(out(1) == "ssn [SSN] card [CARD] host [IP]")
    assert(out(2) == null)
    // subset: only emails masked, the rest untouched
    val sub = strings(wrangle("redact-pii :t 'email'", d), "t")
    assert(sub(0) == "mail [EMAIL], call (415) 555-2671 or +1 415.555.2671")
    assert(sub(1).toString.contains("078-05-1120"))
    val ex = intercept[Exception](wrangle("redact-pii :t 'emali'", d).collect())
    assert(ex.getMessage.contains("unknown type"))
  }

  test("repetition-ratio: duplicate lines and trigrams") {
    import graft.functions.Udfs.repetitionRatios
    // 4 non-empty trimmed lines (x,x,x,y), 2 distinct -> 0.5; its two
    // trigrams (x x x, x x y) are distinct -> 0.0
    assert(repetitionRatios("x\n\n x \nx\ny") == (0.5, 0.0))
    assert(repetitionRatios("a b a b a b") == (0.0, 0.5))
    assert(repetitionRatios("") == (0.0, 0.0))
    assert(repetitionRatios(null) == (0.0, 0.0))
    val d = df("t STRING", Seq(Row("l1\nl1\nl2"), Row("a b c d"), Row(null)))
    val out = wrangle("repetition-ratio :t", d)
      .select("t_dup_line_ratio", "t_dup_3gram_ratio").collect()
    assert(out(0).getDouble(0) > 0.3 && out(0).getDouble(0) < 0.34)
    assert(out(1).getDouble(0) == 0.0 && out(1).getDouble(1) == 0.0)
    // null text -> (0.0, 0.0), matching the kernel and the DuckDB oracle
    assert(out(2).getDouble(0) == 0.0 && out(2).getDouble(1) == 0.0)
  }

  test("connected-components dedup collapses transitive chains") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // pairs (1,5),(5,9),(20,30) -> components {1,5,9} and {20,30}
    val schema = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
    val pairs = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, 5L), Row(5L, 9L), Row(20L, 30L))), schema)
    val cc = graft.llm.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 20L -> 20L, 30L -> 20L))

    // end-to-end: a duplicate CHAIN (A~B, B~C, A!~C) keeps only A
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // B: overlaps heavily with A (drop tail, add one)
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      // C: overlaps heavily with B but less with A
      (2L, "alpha beta gamma delta epsilon zeta eta theta lambda mu"),
      (3L, "completely different content nothing shared here at all ok"))
    val dsch = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val d = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        docs.map { case (i, t) => Row(i, t) }: _*)), dsch)
    val kept = graft.llm.Dedup.minhashDedupCC(d, "text", "doc_id",
      numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && kept.contains(3L))
    assert(!kept.contains(1L), "B should collapse into A's component")
  }

  test("decontaminate counts shared n-grams and drops contaminated docs") {
    val bench = df("q STRING", Seq(
      Row("what is the capital of france"),
      Row("list the prime numbers below ten")))
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      // contains the full benchmark 6-gram "what is the capital of france"
      Row(1L, "quiz answer: What is the capital of France? Paris of course"),
      // shares "is the capital" and "the capital of" with the benchmark
      Row(2L, "rome is the capital of italy and a very old city"),
      Row(3L, "nothing shared with any benchmark question at all here"),
      Row(4L, null)))

    // n=3: doc 1 shares 4 distinct 3-grams ("what is the", "is the
    // capital", "the capital of", "capital of france"), doc 2 two
    val marked = graft.llm.Decontaminate
      .markHits(corpus, "text", bench, "q", n = 3)
      .select("doc_id", "text_contam_hits").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(marked == Map(1L -> 4, 2L -> 2, 3L -> 0, 4L -> 0), s"got $marked")

    // drop with minHits=3 removes only doc 1; null text survives
    val kept = graft.llm.Decontaminate
      .drop(corpus, "text", bench, "q", n = 3, minHits = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))

    // a doc shorter than n tokens forms one whole-doc gram; it hits
    // only if the benchmark contains that exact short sequence too
    val shortBench = df("q STRING", Seq(Row("tiny doc")))
    val shortCorpus = df("doc_id BIGINT, text STRING",
      Seq(Row(1L, "tiny doc"), Row(2L, "tiny")))
    val shortHits = graft.llm.Decontaminate
      .markHits(shortCorpus, "text", shortBench, "q", n = 8)
      .select("doc_id", "text_contam_hits").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shortHits == Map(1L -> 1, 2L -> 0), s"got $shortHits")

    // directive surface: registered benchmark table + recipe syntax
    val viaDirective = graft.Wrangle
      .recipe("decontaminate :text bench 3 3")
      .withLookup("bench", bench)
      .apply(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaDirective == Set(2L, 3L, 4L))

    // mark-only directive form
    val hitCol = graft.Wrangle
      .recipe("contamination-hits :text bench 3")
      .withLookup("bench", bench)
      .apply(corpus)
    assert(hitCol.columns.contains("text_contam_hits"))

    // an empty benchmark contaminates nothing (empty broadcast array)
    val emptyBench = df("q STRING", Seq(Row(null.asInstanceOf[String])))
    val zeroed = graft.llm.Decontaminate
      .markHits(corpus, "text", emptyBench, "q", n = 3)
      .select("text_contam_hits").collect().map(_.getInt(0))
    assert(zeroed.forall(_ == 0))
  }

  test("pool-embeddings averages element-wise per group, skips nulls") {
    val d = df("doc BIGINT, v ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.0f, 2.0f)), Row(1L, Seq(3.0f, 4.0f)),
      Row(1L, null), Row(2L, Seq(10.0f, 20.0f)), Row(3L, null)))
    val out = graft.llm.Similarity.meanPoolEmbeddings(d, "doc", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(out == Map(1L -> Seq(2.0f, 3.0f), 2L -> Seq(10.0f, 20.0f)),
      s"got $out") // group 3 (all null) absent
    val viaRecipe = graft.Wrangle.recipe("pool-embeddings :v :doc").apply(d)
    assert(viaRecipe.columns.toSet == Set("doc", "v_pooled"))
    assert(viaRecipe.count() == 2)
  }

  test("semantic dedup: planted near-identical vectors pair within their cluster") {
    import graft.llm.Similarity
    val rnd = new scala.util.Random(7)
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(16)(r.nextFloat() * 2 - 1)
    }
    // 40 random vectors + a planted near-duplicate of id 3 (tiny jitter)
    val base = (0L until 40L).map(i => Row(i, vec(i.toInt)))
    val nearDup = Row(100L, vec(3).map(x => x + 0.001f * rnd.nextFloat()))
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", base :+ nearDup)
    val pairs = Similarity.semanticPairs(d, "vec_id", "embedding",
      k = 4, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((3L, 100L)), s"planted pair missing: ${pairs.toSeq}")
    // dedup drops the larger id of each pair, keeps everything else
    val kept = Similarity.semanticDedup(d, "vec_id", "embedding",
      k = 4, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(100L) && kept.contains(3L))
    assert(kept.size == 41 - pairs.map(_._2).distinct.size)
    // directive surface
    val viaRecipe = graft.Wrangle
      .recipe("dedup-semantic :embedding :vec_id 4 0.95").apply(d)
    assert(viaRecipe.count() == kept.size)
  }

  test("normalize-embedding yields unit vectors; zero and null pass through") {
    val d = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      Row(1L, Seq(3.0f, 4.0f)),
      Row(2L, Seq(0.0f, 0.0f)),
      Row(3L, null)))
    val out = graft.llm.Similarity.normalizeEmbedding(d, "v")
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Float](1)).map(_.toSeq)).toMap
    assert(out(1L).get == Seq(0.6f, 0.8f), s"got ${out(1L)}")
    assert(out(2L).get == Seq(0.0f, 0.0f)) // zero vector unchanged
    assert(out(3L).isEmpty)
    // directive surface + unit norm on real data
    val viaRecipe = graft.Wrangle.recipe("normalize-embedding :v").apply(d)
      .filter(col("id") === 1L).select("v").head().getSeq[Float](0)
    val norm = math.sqrt(viaRecipe.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("BPE: deterministic merges, canonical encoding, fewer tokens with more merges") {
    import graft.llm.Bpe
    // hand-checkable frequency table: "low" x5, "lower" x2, "newest" x6,
    // "widest" x3 — the published toy example family
    val freqs = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m1 = Bpe.trainFromFreqs(freqs, 1)
    // most frequent pair: (e,s) appears in newest(6) + widest(3) = 9
    assert(m1 == Seq(("e", "s")), s"got $m1")
    val m4 = Bpe.trainFromFreqs(freqs, 4)
    // then (es,t</w>) 9, then (l,o) 7, then the 6-count tie
    // (n,e)/(e,w)/(w,est</w>) resolves lexicographically to (e,w)
    assert(m4 == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")),
      s"got $m4")

    // encoding applies merges by rank; unseen chars stay singletons
    val ranks = new java.util.HashMap[(String, String), Int]()
    m4.zipWithIndex.foreach { case (p, i) => ranks.put(p, i) }
    assert(Bpe.encodeText("low", ranks).toSeq == Seq("lo", "w</w>"))
    assert(Bpe.encodeText("lowest", ranks).toSeq == Seq("lo", "w", "est</w>"))
    assert(Bpe.encodeText("Newest LOW", ranks).toSeq ==
      Seq("n", "ew", "est</w>", "lo", "w</w>")) // lowercased words
    assert(Bpe.encodeText(null, ranks).isEmpty)

    // corpus-level: 0 merges = character count (+marker fusion), more
    // merges never increase any document's token count
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "low lower newest"), Row(2L, "widest low newest newest"),
      Row(3L, null)))
    val c0 = Bpe.tokenCount(d, "text", numMerges = 0)
      .select("doc_id", "text_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(c0(1L) == 3 + 5 + 6 && c0(3L) == 0, s"got $c0")
    val c6 = Bpe.tokenCount(d, "text", numMerges = 6)
      .select("doc_id", "text_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(c6.forall { case (k, v) => v <= c0(k) }, s"got $c6 vs $c0")

    // directive surfaces
    val viaCount = graft.Wrangle.recipe("bpe-token-count :text 6").apply(d)
    assert(viaCount.columns.contains("text_bpe_tokens"))
    val viaEnc = graft.Wrangle.recipe("bpe-encode :text 6").apply(d)
      .filter(col("doc_id") === 1L)
      .select("text_bpe").head().getSeq[String](0)
    assert(viaEnc.nonEmpty && viaEnc.forall(_.nonEmpty))
  }

  test("select-budget keeps best-quality rows within the token budget") {
    val d = df("id BIGINT, tok INT, q DOUBLE", Seq(
      Row(1L, 100, 0.5), Row(2L, 200, 0.9), Row(3L, 150, 0.9),
      Row(4L, 300, 0.7), Row(5L, 50, 0.2), Row(6L, null, 0.95)))
    // order: id6(q.95,tok0) id2(q.9,200) id3(q.9,150 — tie broken by id)
    // id4(q.7,300) id1(q.5,100) id5(q.2,50); cum: 0,200,350,650,750,800
    def sel(budget: Long) = graft.llm.Packing
      .selectBudget(d, "tok", "q", "id", budget)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sel(650) == Set(6L, 2L, 3L, 4L), s"got ${sel(650)}")
    // stop at first overflow: 649 excludes id4 but not later smaller rows
    assert(sel(649) == Set(6L, 2L, 3L), s"got ${sel(649)}")
    assert(sel(0) == Set(6L)) // null tokens cost 0, still kept
    assert(sel(10000) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // partition-independent: same subset from a different layout
    assert(graft.llm.Packing
      .selectBudget(d.repartition(5), "tok", "q", "id", 650)
      .select("id").collect().map(_.getLong(0)).toSet == Set(6L, 2L, 3L, 4L))
    // directive surface
    val viaRecipe = graft.Wrangle
      .recipe("select-budget :tok :q :id 650").apply(d)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaRecipe == Set(6L, 2L, 3L, 4L))
  }

  test("decontaminate-spans cuts only the leaked windows, keeps the rest") {
    val bench = df("q STRING", Seq(Row("what is the capital of france")))
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      // leaked 6-gram mid-document, case-differing
      Row(1L, "quiz: What IS the Capital of FRANCE answer Paris obviously"),
      Row(2L, "nothing shared with the benchmark here at all"),
      Row(3L, null),
      Row(4L, "short doc")))
    val out = graft.llm.Decontaminate
      .dropSpans(corpus, "text", bench, "q", n = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the 6 leaked tokens cut, survivors rejoin with single spaces
    assert(out(1L) == "quiz: answer Paris obviously", s"got ${out(1L)}")
    // untouched documents byte-identical (not re-tokenized)
    assert(out(2L) == "nothing shared with the benchmark here at all")
    assert(out(3L) == null)
    assert(out(4L) == "short doc") // fewer than n tokens: untouched
    // directive surface
    val viaRecipe = graft.Wrangle
      .recipe("decontaminate-spans :text bench 6")
      .withLookup("bench", bench)
      .apply(corpus)
      .filter(col("doc_id") === 1L).select("text").head().getString(0)
    assert(viaRecipe == "quiz: answer Paris obviously")
    // overlapping windows merge: a doc that IS the benchmark goes empty
    val whole = graft.llm.Decontaminate.dropSpans(
      df("doc_id BIGINT, text STRING",
        Seq(Row(1L, "What is THE capital of france"))),
      "text", bench, "q", n = 6)
      .select("text").head().getString(0)
    assert(whole == "")
  }

  test("decontaminate scale path (bloom + exact verify) matches markHits") {
    val bench = df("q STRING", Seq(
      Row("what is the capital of france"),
      Row("list the prime numbers below ten")))
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "quiz answer: What is the capital of France? Paris of course"),
      Row(2L, "rome is the capital of italy and a very old city"),
      Row(3L, "nothing shared with any benchmark question at all here"),
      Row(4L, null)))
    val scal = graft.llm.Decontaminate
      .markHitsScalable(corpus, "text", "doc_id", bench, "q", n = 3)
      .select("doc_id", "text_contam_hits").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // bit-identical to the sorted-array path: bloom FPs join nothing
    assert(scal == Map(1L -> 4, 2L -> 2, 3L -> 0, 4L -> 0), s"got $scal")

    // all corpus columns survive, hits column appended
    val out = graft.llm.Decontaminate
      .markHitsScalable(corpus, "text", "doc_id", bench, "q", n = 3)
    assert(out.columns.toSet == Set("doc_id", "text", "text_contam_hits"))

    // directive surface
    val viaDirective = graft.Wrangle
      .recipe("contamination-hits-scale :text :doc_id bench 3")
      .withLookup("bench", bench)
      .apply(corpus)
      .select("doc_id", "text_contam_hits").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaDirective == Map(1L -> 4, 2L -> 2, 3L -> 0, 4L -> 0))

    // an empty benchmark (no grams) contaminates nothing and the
    // bloomFilter build tolerates expectedNumItems=0 via the max guard
    val emptyBench = df("q STRING", Seq(Row(null.asInstanceOf[String])))
    val zeroed = graft.llm.Decontaminate
      .markHitsScalable(corpus, "text", "doc_id", emptyBench, "q", n = 3)
      .select("text_contam_hits").collect().map(_.getInt(0))
    assert(zeroed.forall(_ == 0))
  }

  test("chunk-text: sliding windows with overlap, tail covered, no degenerates") {
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      Row(2L, "a b c"),                           // shorter than one window
      Row(3L, ""),
      Row(4L, null)))
    // size 4, overlap 1 -> step 3, starts while s <= len-1: 1,4,7
    val chunks = graft.llm.TextAnalysis.chunkText(corpus, "text", 4, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc(1L).map(c => c._2 -> c._3).sortBy(_._1).toSeq == Seq(
      0 -> "t1 t2 t3 t4", 1 -> "t4 t5 t6 t7", 2 -> "t7 t8 t9 t10"))
    assert(byDoc(2L).map(_._3).toSeq == Seq("a b c")) // one short chunk
    assert(!byDoc.contains(3L) && !byDoc.contains(4L)) // empty/null: no rows
    // directive form + guard rails
    assert(wrangle("chunk-text :text 4 1", corpus).count() == chunks.length)
    intercept[IllegalArgumentException](
      graft.llm.TextAnalysis.chunkText(corpus, "text", 4, 4))
  }

  test("surprisal-score ranks common-token docs below anomalous ones") {
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the cat sat on the mat"),
      Row(2L, "the cat sat on the rug"),
      Row(3L, "the dog sat on the mat"),
      Row(4L, "zyx qwv jkl pqr mno vwx"), // all-rare token soup
      Row(5L, ""),
      Row(6L, null)))
    val out = graft.llm.TextAnalysis.surprisalScore(corpus, "text")
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("text_surprisal"))).toMap
    // boilerplate-ish docs (shared vocab) score lower than token soup
    assert(out(1L).get < out(4L).get)
    assert(out(2L).get < out(4L).get)
    // empty/null -> null, not a crash or a zero
    assert(out(5L).isEmpty && out(6L).isEmpty)
    // exact value check: doc 4's tokens each occur once in a corpus of
    // 24 tokens -> surprisal = -ln(1/24) = ln(24)
    assert(math.abs(out(4L).get - math.log(24)) < 1e-9, s"got ${out(4L)}")
    // directive surface
    val viaRecipe = wrangle("surprisal-score :text", corpus)
    assert(viaRecipe.columns.contains("text_surprisal"))

    // zero-token corpus (all null/empty docs): null column, no NPE
    val empties = df("doc_id BIGINT, text STRING",
      Seq(Row(1L, ""), Row(2L, null)))
    val z = graft.llm.TextAnalysis.surprisalScore(empties, "text")
      .select("text_surprisal").collect()
    assert(z.forall(_.isNullAt(0)))
  }

  test("cluster-embeddings: deterministic seeded cells, map-only") {
    val out = graft.llm.Similarity.clusterAssign(embDf, "embedding", k = 4)
    assert(out.columns.contains("cell"))
    val a = out.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = graft.llm.Similarity.clusterAssign(embDf, "embedding", k = 4)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "seeded quantizer must be deterministic")
    assert(a.values.toSet.subsetOf((0 until 4).toSet))
    // the jittered near-copies of vec 0 land in vec 0's cell
    assert(a(1L) == a(0L) && a(2L) == a(0L))
    // no shuffle: assignment is one kernel pass over the scan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // directive surface
    val viaRecipe = wrangle("cluster-embeddings :embedding 4", embDf)
    assert(viaRecipe.columns.contains("cell"))

    // composition op, not a query: an empty corpus gets a null cell
    // column instead of aborting the pipeline; k<1 fails at plan build
    val empty = graft.llm.Similarity.clusterAssign(
      embDf.filter(col("vec_id") < 0), "embedding", k = 4)
    assert(empty.count() == 0 && empty.columns.contains("cell"))
    intercept[IllegalArgumentException](
      graft.llm.Similarity.clusterAssign(embDf, "embedding", k = 0))
  }

  test("span dedup removes non-first occurrences of duplicated runs") {
    // docs 1 and 2 share the 8-token boilerplate prefix; doc 3 repeats
    // a 5-token phrase internally; doc 4 is clean and short
    val boiler = "this document is provided as is without warranty"
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, s"$boiler alpha beta gamma delta epsilon"),
      Row(2L, s"$boiler zeta eta theta iota kappa"),
      Row(3L, "one two three four five STOP one two three four five"),
      Row(4L, "too short to matter"),
      Row(5L, null)))

    val spans = graft.llm.SpanDedup
      .duplicatedSpans(corpus, "text", "doc_id", minTokens = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1 holds the first occurrence (smallest id) — only doc 2's
    // copy of the 8-token boilerplate is a span; doc 3's SECOND
    // "one two three four five" (tokens 7..11) is a span
    assert(spans == Set((2L, 1, 8), (3L, 7, 11)), s"got $spans")

    val rewritten = graft.llm.SpanDedup
      .removeDuplicatedSpans(corpus, "text", "doc_id", minTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rewritten(1L) == s"$boiler alpha beta gamma delta epsilon")
    assert(rewritten(2L) == "zeta eta theta iota kappa")
    assert(rewritten(3L) == "one two three four five STOP")
    assert(rewritten(4L) == "too short to matter")
    assert(rewritten(5L) == null)

    // a doc whose every token is duplicated rewrites to empty, not null
    val all = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c d e"), Row(2L, "a b c d e")))
    val gone = graft.llm.SpanDedup
      .removeDuplicatedSpans(all, "text", "doc_id", minTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gone == Map(1L -> "a b c d e", 2L -> ""))

    // directive surface
    val viaRecipe = wrangle("dedup-spans :text :doc_id 5", corpus)
      .filter(col("doc_id") === 2L).head().getString(1)
    assert(viaRecipe == "zeta eta theta iota kappa")

    // scale contract: no cartesian/BNLJ anywhere in the plan
    val plan = graft.llm.SpanDedup
      .duplicatedSpans(corpus, "text", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("C4 line cleaning keeps terminal-punct lines and blanks bad pages") {
    import graft.functions.Udfs.c4CleanLines
    val page = Seq(
      "First sentence of the page ends fine.",
      "Too short.", //                       2 words < 3
      "this line never terminates properly", // no terminal punct
      "Please enable javascript to continue.", // banned word
      "Second good sentence right here!",
      "A third one follows immediately?",
      "Fourth sentence also reads well.",
      "Fifth sentence closes the page.").mkString("\n")
    val cleaned = c4CleanLines(page, 3, 5)
    assert(cleaned == Seq(
      "First sentence of the page ends fine.",
      "Second good sentence right here!",
      "A third one follows immediately?",
      "Fourth sentence also reads well.",
      "Fifth sentence closes the page.").mkString("\n"))
    // page-level blanks: lorem ipsum, code brace, too few sentences
    assert(c4CleanLines(s"$page\nSome lorem ipsum filler appears.", 3, 5) == "")
    assert(c4CleanLines(s"$page\nvar x = { a: 1 };", 3, 5) == "")
    assert(c4CleanLines("Just one good sentence here.", 3, 5) == "")
    assert(c4CleanLines("Just one good sentence here.", 3, 1) ==
      "Just one good sentence here.")
    assert(c4CleanLines(null, 3, 5) == null)
    // quoted-speech lines end with a quote mark, which C4 retains
    assert(c4CleanLines("He said \"stop right there.\"", 3, 1) ==
      "He said \"stop right there.\"")
    // directive surface rewrites in place
    val d = df("text STRING", Seq(Row(page)))
    assert(wrangle("clean-lines-c4 :text 3 5", d).head().getString(0)
      .startsWith("First sentence"))
  }

  test("Gopher rules gate flips on each published threshold") {
    import graft.functions.Udfs.gopherKeep
    val good = "the data and value row " * 12 // 60 words, 2 stopwords
    assert(gopherKeep(good))
    assert(!gopherKeep("the and a few words.")) //        wc < 50
    assert(!gopherKeep("the data ### and value row " * 12)) // symbol ratio
    assert(!gopherKeep("- the item and value\n" * 20)) //  all bullets
    assert(!gopherKeep("the data and value trailing dots...\n" * 12)) // ellipsis
    assert(!gopherKeep("111 222 333 444 " * 20)) //  alpha + stopwords
    assert(!gopherKeep("antidisestablishmentarianism arian " * 30)) // mean len
    assert(!gopherKeep("")); assert(!gopherKeep(null))
    // boundary: mean word length exactly 3.0 passes (>= 3)
    assert(gopherKeep("the and abc " * 20))
    val d = df("text STRING", Seq(Row(good), Row("tiny.")))
    val kept = wrangle("gopher-rules :text", d)
      .collect().map(_.getBoolean(1)).toSeq
    assert(kept == Seq(true, false))
  }

  test("sequence packing is greedy first-fit within id-ordered buckets") {
    // single bucket: 100+100 fit one 256-bin, 100 opens the next;
    // an oversize doc gets its own bin and the scan continues after it
    val d = df("id BIGINT, tok INT", Seq(
      Row(10L, 100), Row(11L, 100), Row(12L, 100),
      Row(13L, 300), Row(14L, 50), Row(15L, 200), Row(16L, 57)))
    val packed = graft.llm.Packing
      .packSequences(d, "tok", "id", ctx = 256, buckets = 1)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
    assert(packed.toSeq == Seq(
      (10L, 0, 0), (11L, 0, 100), (12L, 1, 0), (13L, 2, 0),
      (14L, 3, 0), (15L, 3, 50), (16L, 4, 0)))
    // bucketing: ids split by id % 2; packing restarts per bucket
    val two = graft.llm.Packing
      .packSequences(d, "tok", "id", ctx = 256, buckets = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(two.toSeq == Seq(
      (10L, 0, 0, 0), (11L, 1, 0, 0), (12L, 0, 0, 100),
      (13L, 1, 1, 0), (14L, 0, 0, 200), (15L, 1, 2, 0), (16L, 0, 1, 0)))
    // directive surface + argument validation
    val viaRecipe = wrangle("pack-sequences :tok :id 256 2", d)
    assert(viaRecipe.columns.toSeq.takeRight(3) ==
      Seq("pack_bucket", "pack_bin", "pack_offset"))
    intercept[IllegalArgumentException](
      graft.llm.Packing.packSequences(d, "tok", "id", 0, 1))
  }


  test("randomProject: JL sign-matrix projection") {
    import graft.llm.Similarity
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq.tabulate(8)(i => (i + 1).toFloat)),
      Row(2L, Seq.tabulate(8)(i => (8 - i).toFloat)),
      Row(3L, Seq(1f, 2f)),          // short vector -> zero-padded
      Row(4L, null)))
    val out = Similarity.randomProject(vecs, "embedding", inDim = 8,
      outDim = 4, seed = 7L)
    val m = out.select("vec_id", "embedding_jl").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(m(1L).get.length == 4)
    assert(m(4L).isEmpty) // null passes through
    // deterministic: identical on recompute and across partitionings
    val again = Similarity.randomProject(vecs.repartition(3), "embedding",
      8, 4, 7L).select("vec_id", "embedding_jl").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(m == again)
    // exact JL property of +-1 signs: a standard basis vector projects
    // to a row of the sign matrix / sqrt(k), whose norm is EXACTLY 1
    val basis = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, (1f +: Seq.fill(7)(0f)))))
    val b = Similarity.randomProject(basis, "embedding", 8, 4, 7L)
      .select("embedding_jl").head().getSeq[Double](0)
    assert(math.abs(b.map(x => x * x).sum - 1.0) < 1e-12)
    // linearity (exact in double for small-integer floats)
    val sum12 = Seq.tabulate(8)(_ => 9f) // vec1 + vec2 elementwise
    val s12 = Similarity.randomProject(
      df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(Row(9L, sum12))),
      "embedding", 8, 4, 7L).select("embedding_jl").head().getSeq[Double](0)
    val added = m(1L).get.zip(m(2L).get).map { case (a, bb) => a + bb }
    assert(s12.zip(added).forall { case (x, y) => x == y })
    // directive spelling
    val viaDir = Wrangle.recipe("reduce-dim :embedding 8 4")(vecs)
    assert(viaDir.columns.contains("embedding_jl"))
  }

  test("mineHardNegatives excludes positives, keeps hardest k") {
    import graft.llm.Similarity
    // query 0 at the origin-ish; ids 1..5 progressively farther
    def v(x: Float, y: Float) = Seq(x, y)
    val corpus = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(0L, v(1f, 0f)), Row(1L, v(1f, 0.1f)), Row(2L, v(1f, 0.3f)),
      Row(3L, v(1f, 0.6f)), Row(4L, v(0f, 1f)), Row(5L, v(-1f, 0f))))
    val q = df("qid BIGINT, qvec ARRAY<FLOAT>", Seq(Row(0L, v(1f, 0f))))
    val pos = df("qid BIGINT, pos_id BIGINT", Seq(Row(0L, 0L), Row(0L, 1L)))
    val out = Similarity.mineHardNegatives(corpus, q, "vec_id",
      "embedding", "qid", "qvec", pos, "pos_id", k = 2)
      .orderBy("neg_rank").collect()
    // self (0) and planted positive (1) excluded; hardest remaining
    // are 2 then 3 by cosine
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2))
  }

  test("validateEmbeddings labels every issue class by priority") {
    import graft.llm.Similarity
    val rows = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(0L, null),
      Row(1L, Seq(1f, 0f)),                       // wrong dim (expect 4)
      Row(2L, Seq(Float.NaN, 0f, 0f, 0f)),        // nan beats zero-ish
      Row(3L, Seq(0f, 0f, 0f, 0f)),               // all zero
      Row(4L, Seq(0.01f, 0f, 0f, 0f)),            // norm too low
      Row(5L, Seq(100f, 0f, 0f, 0f)),             // norm too high
      Row(6L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),       // ok (norm 1)
      Row(7L, Seq(1f, null, 1f, 1f))))            // null element
    val out = Similarity.validateEmbeddings(rows, "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(0L -> "null_vector", 1L -> "wrong_dim",
      2L -> "nan", 3L -> "all_zero", 4L -> "norm_low",
      5L -> "norm_high", 6L -> "ok", 7L -> "null_element"))
    // directive spelling + map-only plan
    val viaDir = Wrangle.recipe("validate-embeddings :embedding 4")(rows)
    assert(viaDir.columns.contains("embedding_issue"))
    val plan = Similarity.validateEmbeddings(rows, "embedding", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be map-only:\n$plan")
  }

  test("chunkCdc: hash-anchor boundaries re-align after edits") {
    import graft.functions.Udfs
    val rnd = new scala.util.Random(42)
    val base = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val chunks = Udfs.cdcChunks(base, 16, 128)
    assert(chunks.mkString == base, "chunks must concatenate to the input")
    assert(chunks.length > 3, s"expected several chunks, got ${chunks.length}")
    assert(chunks.forall(_.nonEmpty))
    // THE content-defined property: prepend an edit — every chunk
    // after the first anchor is byte-identical to the unedited copy,
    // so chunk-level dedup still collapses the shared tail (fixed-size
    // chunking re-cuts everything after the insertion point)
    val edited = "INSERTED PREAMBLE " + base
    val chunksE = Udfs.cdcChunks(edited, 16, 128)
    val shared = chunks.toSet.intersect(chunksE.toSet)
    assert(shared.size >= chunks.length - 2,
      s"edit destroyed tail chunks: ${shared.size} of ${chunks.length} survive")
    // short text = one chunk; null/empty = none; determinism
    assert(Udfs.cdcChunks("tiny", 16, 128).toSeq == Seq("tiny"))
    assert(Udfs.cdcChunks(null, 16, 128).isEmpty)
    assert(Udfs.cdcChunks("", 16, 128).isEmpty)
    assert(Udfs.cdcChunks(base, 16, 128).toSeq == chunks.toSeq)
    // the O(1) rolling update must equal the naive per-window fold —
    // the property the DuckDB oracle (which does the naive fold) rests on
    def naiveBounds(text: String, w: Int, m: Int): Seq[Int] = {
      val cps = text.codePoints().toArray
      val bs = scala.collection.mutable.ArrayBuffer(0)
      for (i <- w to cps.length) {
        var h = 0L
        for (j <- (i - w) until i) h = (h * 257 + cps(j)) % 1099511627776L
        if (h % m == 0) bs += i
      }
      if (bs.last != cps.length) bs += cps.length
      bs.toSeq
    }
    for (trial <- 1 to 20) {
      val r2 = new scala.util.Random(trial)
      val t = (1 to 500).map(_ =>
        (r2.nextInt(0x2000) + 32).toChar).mkString // incl. non-ASCII
      val viaKernel = Udfs.cdcChunks(t, 16, 64)
      val nb = naiveBounds(t, 16, 64)
      val lens = viaKernel.map(c => c.codePointCount(0, c.length)).toSeq
      val nbLens = nb.sliding(2).map { case Seq(a, b) => b - a }
        .filter(_ > 0).toSeq
      assert(lens == nbLens && viaKernel.mkString == t,
        s"rolling != naive fold on trial $trial: $lens vs $nbLens")
    }
    // directive spelling explodes with ordinals
    val out = Wrangle.recipe("chunk-cdc :text 16 128")(
      df("doc_id BIGINT, text STRING", Seq(Row(1L, base))))
    assert(out.count() == chunks.length)
    assert(out.columns.toSeq == Seq("doc_id", "chunk_id", "text"))
  }
}
