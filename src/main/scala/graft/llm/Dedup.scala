package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Scale design (the 100 TB contract):
  *  - exact dedup = one hash-keyed shuffle with map-side partial
  *    aggregation (`min_by`), no window/sort;
  *  - near-dup = banded MinHash-LSH: candidate pairs come from a
  *    shuffle on (band, bucket) keys only — never an all-pairs cross
  *    join — then exact Jaccard verification on the candidates;
  *  - SimHash = 64-bit signature banded into 16-bit chunks, same
  *    bucket-join pattern, Hamming verify via native bit_count(xor).
  *
  * The relational structure (shuffles, joins, filters) is all native
  * DataFrame ops; the per-document signature kernels are JIT'd
  * functions (see graft.functions.Udfs) because Catalyst higher-order
  * functions are CodegenFallback and re-evaluate captured
  * subexpressions per array element.
  */
object Dedup {

  /** Normalization used for exact/near dedup keys: lowercase, collapse
    * whitespace, strip non-alphanumerics. Kernel form — the regex
    * formulation costs ~1.26 ms per 2 KB document and dominates exact
    * dedup at scale (629 s CPU over 500 K docs, measured at the 100x
    * ladder); the single-scan kernel is property-tested equivalent
    * (LlmSpec "dedup-key normalization kernel").
    */
  def normalized(text: Column): Column =
    graft.functions.Udfs.normalizeDedupKeyUdf(text)

  /** The reference Column formulation of [[normalized]] — the spec the
    * kernel is tested against.
    */
  private[graft] def normalizedRef(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (hex string). */
  def fingerprint(text: Column): Column = md5(normalized(text).cast(BinaryType))

  /** Exact deduplication: keeps the row with the smallest `idCol` per
    * normalized-content hash.
    *
    * Shape (the low-dup-rate fast path): ONE NARROW shuffle —
    * `(hash, rank)` pairs only, ~24 bytes/row — finds each duplicated
    * group's losers, and a broadcast anti-join on (hash, id) removes
    * them. The document text never enters an exchange; the surviving
    * rows keep their input partitioning (no output shuffle either).
    * Measured at the 100x ladder (500 K docs, ~5 % dup rate): 19.9 s
    * for the full-row min_by shuffle vs ~1.2 s for this shape, which
    * is bounded by the (kernel) normalize+hash scan.
    *
    * When the loser set exceeds `maxBroadcastLosers` (extreme dup
    * rates — the count is one cheap action on the already-narrow
    * frame), falls back to the classic full-row min_by shuffle, which
    * never needs a broadcast.
    *
    * Note this operator is EAGER: the loser set is materialized
    * (checkpoint + count) when the result frame is built, like the
    * signature cache in [[minhashPairs]] — the guarded plan choice
    * needs the loser count before a plan can be returned.
    */
  def exact(df: DataFrame, textCol: String, idCol: String,
      maxBroadcastLosers: Long = 10000000L): DataFrame =
    exactByRank(df, textCol, idCol, col(idCol).cast(DoubleType),
      maxBroadcastLosers)

  /** Exact deduplication keeping the BEST copy per normalized-content
    * group instead of the smallest id: the row with the highest
    * (numeric) `prioCol` survives, ties broken toward the smallest
    * `idCol`. The published keep-longest / keep-highest-quality dedup
    * policy (duplicate web pages often differ only in truncation —
    * keeping the longest or best-scored copy preserves the most
    * content). Same narrow-shuffle + anti-join shape as [[exact]].
    */
  def exactKeepBest(df: DataFrame, textCol: String, idCol: String,
      prioCol: String, maxBroadcastLosers: Long = 10000000L): DataFrame =
    exactByRank(df, textCol, idCol,
      lit(0.0) - col(prioCol).cast(DoubleType), maxBroadcastLosers)

  /** Shared engine for [[exact]] / [[exactKeepBest]]: within each
    * normalized-content group the row minimizing (`rank`, `idCol`)
    * survives.
    */
  private def exactByRank(df: DataFrame, textCol: String, idCol: String,
      rank: Column, maxBroadcastLosers: Long): DataFrame = {
    val cols = df.columns
    // NOT spread (unlike the minhash signature kernels): the
    // normalize+hash pass is cheap enough that a pre-kernel round-robin
    // exchange LOSES — interleaved A/B at sf0.1 read dedup_exact median
    // 0.54 s unspread vs 0.95 s spread (the full-row exchange plus the
    // extra plan execution outweigh parallelizing ~0.2 s of regex+md5)
    val keyed = df.withColumn("__h", xxhash64(normalized(col(textCol))))
    // narrow single pass: (hash, (rank, id)) pairs through ONE exchange;
    // the per-group min comes from a window over the hash partition so
    // the normalize+hash scan runs exactly once (a groupBy+self-join
    // formulation re-scans the text side per branch — measured 2x the
    // CPU at the 100x ladder)
    val ids = keyed.select(col("__h"),
      struct(rank.as("__rk"), col(idCol).as("__id")).as("__r"))
    // loser ids — everything except each group's (rank, id) minimum.
    // localCheckpoint (eager, spills to disk) hands the anti-join a
    // LINEAGE-FREE small frame: without it the join would embed df's
    // plan tree twice, and callers that replicate this result across
    // self-joins (the minhash pipeline's exact-collapse step) would
    // multiply that into plan-explosion territory (measured: explain
    // OOM on a 40-branch union input)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
    val losers = ids
      // null-safe struct compare: a null rank (e.g. null priority) must
      // not silently exempt a row from loser-hood
      .withColumn("__keep", min(col("__r")).over(w))
      .where(not(col("__r") <=> col("__keep")))
      .select(col("__h").as("__lh"), col("__r.__id").as("__lid"))
      .localCheckpoint()
    val nLosers = losers.count()
    if (nLosers == 0) df
    else if (nLosers <= maxBroadcastLosers)
      // anti-join on (hash, id) — not id alone: with duplicated id
      // values an id-only anti-join would delete same-id rows from
      // UNRELATED content groups, and a null-id loser would never match.
      // The hash recompute on the left is the cheap kernel scan; rows
      // identical in BOTH (hash, id) are mutually indistinguishable and
      // all kept (the fallback keeps one — the only divergence, and only
      // on same-id byte-duplicate rows).
      keyed.join(broadcast(losers),
          col("__h") === col("__lh") && col(idCol) <=> col("__lid"),
          "left_anti")
        .select(cols.map(col).toSeq: _*)
    else {
      // extreme-dup fallback: classic single full-row shuffle, no
      // broadcast anywhere (the checkpointed loser blocks are freed by
      // the ContextCleaner)
      keyed
        .groupBy(col("__h"))
        .agg(min_by(struct(cols.map(col).toSeq: _*),
          struct(rank.as("__rk"), col(idCol).as("__ti"))).as("__w"))
        .select(cols.map(c => col(s"__w.$c").as(c)).toSeq: _*)
    }
  }

  /** Skew guard shared by the banded-LSH pair generators: a bucket with
    * B members yields B² candidate pairs, so one hot bucket (identical
    * boilerplate, the all-zero chunk) goes quadratic. One
    * partial-aggregated groupBy over the banded rows finds the
    * oversized buckets — few by construction — and a broadcast
    * anti-join removes their rows. Unlike the previous window
    * (`count().over(partitionBy(band,bucket))`), this never sorts and
    * never re-shuffles the full banded set: the aggregate combines
    * map-side, the hot-key list is tiny, and the anti-join is
    * broadcast. Runs should collapse exact duplicates first (see
    * [[exact]]) — that is what makes buckets hot.
    */
  private[llm] def dropHotBuckets(banded: DataFrame, keys: Seq[String],
      maxBucketSize: Int): DataFrame = {
    val hot = banded.groupBy(keys.map(col): _*).count()
      .filter(col("count") > maxBucketSize)
      .select(keys.map(col): _*)
    // no broadcast() hint: the hot-key list is tiny on sane corpora
    // (AQE broadcasts it at runtime), but a pathologically templated
    // corpus — the exact case this guard exists for — can have
    // millions of hot buckets, and a FORCED broadcast would OOM the
    // driver right when the guard is most needed. Letting the planner
    // choose degrades that case to a plain anti shuffle join.
    banded.join(hot, keys, "left_anti")
  }

  /** Candidate duplicate pairs by banded LSH + exact Jaccard verify.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    *
    * @param numHashes signature length (bands * rowsPerBand)
    * @param bands     LSH bands; P(candidate) ≈ 1-(1-j^r)^b
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5,
      threshold: Double = 0.7, maxBucketSize: Int = 10000): DataFrame =
    minhashPairsAndIds(df, textCol, idCol, numHashes, bands, shingleK,
      threshold, maxBucketSize, textSource = df)._2

  /** Per-group duplication report — the dedup TELEMETRY a pipeline
    * reads before deciding which dedup pass to pay for: row count,
    * distinct normalized contents, and the duplicate fraction per
    * group (source, shard, ingest date, ...). ONE partial-aggregated
    * pass: only (group, fingerprint) leaves the map side — text never
    * shuffles — and the same normalize kernel as [[exact]] means the
    * report counts exactly what `dedup-exact` would drop.
    */
  def dupReport(df: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "dupReport: at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        // countDistinct skips null fingerprints, but exact() groups
        // null-text rows together and KEEPS one — count that group
        // explicitly so the report matches what dedup-exact drops
        // (and an all-null group reads 1 distinct, not 0)
        (countDistinct(fingerprint(col(textCol))) +
          max(when(col(textCol).isNull, 1L).otherwise(0L)))
          .as("n_distinct"))
      .withColumn("dup_frac",
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_docs").cast("double"), 4))
  }

  /** Fuzzy similarity JOIN between two corpora — "which of my new
    * documents already exist, slightly edited, in that other table" —
    * by the same banded-MinHash LSH as [[minhashPairs]], but across
    * tables: each side computes signatures once, candidates come from
    * an equi-join on (band, bucket) — never a cross product — and the
    * exact shingle-Jaccard verify runs on the candidate sliver only.
    * The hot-bucket skew guard applies to the COMBINED bucket
    * population: a bucket hot on either side (boilerplate, templates)
    * would explode the equi-join output, so it is dropped from both.
    *
    * Output: (id_a from left, id_b from right, jaccard ≥ threshold).
    * Unlike the self-join there is no id ordering constraint — the
    * sides are distinct tables.
    */
  def minhashJoin(left: DataFrame, right: DataFrame,
      leftText: String, rightText: String,
      leftId: String, rightId: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5,
      threshold: Double = 0.7, maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    def buckets(df: DataFrame, text: String, id: String, side: Int) =
      // NOT spread before the kernel — measured net loss, interleaved
      // A/B at sf0.1: 1.76 s unspread vs 2.53 s spread (see the
      // identical adjudication in minhashPairsAndIds)
      df.select(col(id).as("__id"),
          graft.functions.Udfs.minhashBandBucketsUdf(col(text),
            lit(numHashes), lit(bands), lit(shingleK), lit(42L)).as("__bk"))
        .filter(size(col("__bk")) > 0)
        .select(col("__id"), lit(side).as("__side"),
          posexplode(col("__bk")).as(Seq("__band", "__bucket")))
    // one cached pass over both signature kernels: the banded union
    // feeds the hot-bucket count and both join branches
    val banded = buckets(left, leftText, leftId, 0)
      .unionByName(buckets(right, rightText, rightId, 1))
      .persist()
    banded.count() // eager: signatures compute once, not per consumer
    val sized = dropHotBuckets(banded, Seq("__band", "__bucket"),
      maxBucketSize)
    val l = sized.filter(col("__side") === 0)
      .select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val r = sized.filter(col("__side") === 1)
      .select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val cands = l.join(r, Seq("__band", "__bucket"))
      .select("id_a", "id_b").distinct()
    // exact verify from TEXT on the candidate sliver (pruned scans of
    // the sources; no corpus-wide text shuffle)
    val withA = cands.join(left.select(col(leftId).as("id_a"),
      col(leftText).as("__ta")), "id_a")
    val withB = withA.join(right.select(col(rightId).as("id_b"),
      col(rightText).as("__tb")), "id_b")
    // the verified pair set is small — pin IT eagerly and release the
    // banded signature cache, which at crawl scale is numHashes/band
    // rows per document per side and must not outlive this call (a
    // repeated-ingest loop would otherwise accumulate one full
    // signature cache per invocation in the CacheManager)
    val out = withB.withColumn("jaccard",
        graft.functions.Udfs.shingleJaccardUdf(
          col("__ta"), col("__tb"), lit(shingleK)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .localCheckpoint()
    banded.unpersist()
    out
  }

  /** [[minhashPairs]] plus the materialized (cached) `__id` column of
    * every input row — the dedup wrappers read keeper ids from this
    * cache instead of re-running their upstream exact-dedup shuffle.
    *
    * `textSource` is where candidate-pair verification fetches text
    * from (any frame with unique `idCol` covering the candidate ids —
    * the dedup wrappers pass the ORIGINAL corpus so the fetch is a
    * plain pruned scan, not a replay of their exact-dedup shuffle).
    */
  private[llm] def minhashPairsAndIds(df: DataFrame, textCol: String,
      idCol: String, numHashes: Int = 128, bands: Int = 16,
      shingleK: Int = 5, threshold: Double = 0.7,
      maxBucketSize: Int = 10000, textSource: DataFrame): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")

    // Per-document signature kernel is a JIT'd function — Catalyst
    // higher-order functions are CodegenFallback and re-evaluate
    // captured expressions per element (measured 100x slower here).
    // ONLY the fixed-width signature leaves the kernel: the shingle set
    // is text-sized (one hash per character), and an earlier shape that
    // cached and shuffled it for the verify step spent 2-3x the whole
    // query's wall in columnar decode + exchange serialization of those
    // arrays at sf0.1 — and a corpus-sized cache column is exactly what
    // does not survive 100 TB. Verification below recomputes shingles
    // from text for the candidate SLIVER only. The count() materializes
    // the persist BEFORE the self-join runs: without it, the join's two
    // branches race to populate the cache within one job and each
    // uncached partition computes its signature twice (measured:
    // bimodal 2x run-to-run swings).
    // The kernel fuses banding too: only `bands` bucket longs per doc
    // are cached (8x smaller than the signature array), and every
    // consumer of the banded frame (hot-bucket count, both self-join
    // sides) pays a posexplode instead of bands x r element_at+xxhash64
    // Catalyst calls on each re-read — at the 100x ladder those three
    // re-reads were the query's dominant CPU (60-80 s per branch).
    // Bucket values are bit-identical to the old Column formulation
    // (Udfs.minhashBandBuckets scaladoc), so candidate sets — and the
    // pinned oracles — are unchanged.
    // NOT spread before the kernel (a guide-§2.5 pre-kernel round-robin
    // was tried in r18 and measured a NET LOSS end-to-end, interleaved
    // A/B at sf0.1: minhash_pairs 0.99 s unspread vs 1.34 s spread,
    // dedup_minhash 1.52 vs 2.28 — the isolated kernel does run ~2x
    // faster spread, but every downstream consumer of the banded cache
    // then multiplies its map-task count by the core count, and that
    // scheduling overhead exceeds the kernel win at bench scale; at
    // real scale inputs arrive well-split and the spread would be a
    // no-op anyway)
    val raw = df.select(
      col(idCol).as("__id"),
      graft.functions.Udfs.minhashBandBucketsUdf(col(textCol),
        lit(numHashes), lit(bands), lit(shingleK), lit(42L)).as("__bk"))
      .persist()
    raw.count() // eager: signatures compute exactly once, not per join branch
    val base = raw.filter(size(col("__bk")) > 0)

    // (band, bucketHash, id): one row per band per doc
    val buckets = base.select(col("__id"),
      posexplode(col("__bk")).as(Seq("__band", "__bucket")))
      .select(col("__id"), col("__band"), col("__bucket"))

    // skew guard — see [[dropHotBuckets]]
    val sized = dropHotBuckets(buckets, Seq("__band", "__bucket"), maxBucketSize)

    // candidates: same (band,bucket), ordered pair, de-duplicated.
    // shuffle keys = (band,bucket) — candidate generation never compares
    // documents outside a shared bucket.
    val l = sized.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val rgt = sized.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val cands = l.join(rgt, Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // Exact shingle-Jaccard on candidates only, recomputed from TEXT:
    // the tiny candidate set broadcasts against two pruned text scans
    // (no corpus shuffle, no big-array exchange), then one merge-
    // intersect kernel per pair. Verify cost scales with the candidate
    // sliver, not the corpus.
    val texts = textSource.select(col(idCol), col(textCol))
    val withA = cands.join(
      texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
    val withB = withA.join(
      texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
    val pairs = withB
      .withColumn("jaccard", graft.functions.Udfs.shingleJaccardUdf(
        col("__ta"), col("__tb"), lit(shingleK)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    (raw.select("__id"), pairs)
  }

  /** Near-dedup: drop every row that appears as the larger id of a
    * verified MinHash pair (keep-smallest-id policy; transitive chains
    * collapse toward their smallest member over repeated application).
    */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5,
      threshold: Double = 0.7): DataFrame = {
    // collapse exact duplicates first: dirt-cheap, and it keeps the LSH
    // buckets from concentrating identical signatures (the skew guard's
    // pathological case). Only (id, text) feed the signature kernel —
    // the final output rows come from the source semi-join below, so
    // the exact-dedup shuffle never carries the other columns.
    val distinctDocs = exact(df.select(col(idCol), col(textCol)), textCol, idCol)
    // textSource = the ORIGINAL corpus: candidate verification fetches
    // pair text through a pruned scan of df instead of replaying the
    // exact-dedup shuffle (winner ids keep their text verbatim in df)
    val (ids, pairs) = minhashPairsAndIds(distinctDocs, textCol, idCol,
      numHashes, bands, shingleK, threshold, textSource = df)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    // keeper ids = exact-dedup winners minus verified near-dup losers,
    // both read from the signature CACHE — then ONE semi-join back to
    // the source on the (unique) id. The previous shape anti-joined
    // against `distinctDocs`, which re-ran exact()'s regex
    // normalization + full-row content shuffle a second time; the
    // semi-join final pass touches the corpus once, with no regex and
    // no aggregation (measured ~25% off the whole query at sf0.1).
    // Contract: idCol uniquely identifies rows (duplicate ids would
    // surface every copy of a keeper id; exact() itself tolerates them).
    val keepers = ids.select(col("__id").as(idCol))
      .join(losers, Seq(idCol), "left_anti")
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** Connected components over a verified pair set: each id maps to the
    * smallest id reachable through duplicate pairs.
    *
    * Two regimes behind one signature:
    *  - pair sets up to `driverLimit` (default 5M ≈ 80 MB) collect to a
    *    driver union-find — near-dup pair sets are a small fraction of
    *    the corpus by construction (exact dups are collapsed first and
    *    LSH candidates are verified), so this is the common case, and
    *    it replaces the iteration's per-round join+count jobs with ONE
    *    collect (measured: the sf0.1 CC dedup dropped from 9.3 s to
    *    the plain dedup's cost envelope);
    *  - larger pair sets fall back to the distributed min-label
    *    propagation loop below — the shape that holds when the dup
    *    graph itself is cluster-sized.
    *
    * Returns (id, component) — component = min id of the cluster.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      driverLimit: Long = 5000000L): DataFrame = {
    val spark = pairs.sparkSession
    // Validate up front instead of silently casting: a string/UUID id
    // column would cast to null and corrupt labels (or NPE the driver
    // union-find). Non-Long integrals (int/short/byte) widen losslessly.
    Seq("id_a", "id_b").foreach { c =>
      val dt = pairs.schema(pairs.schema.fieldIndex(c)).dataType
      require(dt == LongType || dt == IntegerType || dt == ShortType ||
          dt == ByteType,
        s"connectedComponents: column '$c' has type ${dt.simpleString}; " +
          "ids must be integral (byte/short/int/long). Map string/UUID " +
          "keys to a dense long id (e.g. hash or zipWithIndex) first.")
    }
    val pinned = pairs.select(col("id_a").cast(LongType),
      col("id_b").cast(LongType)).persist()
    val n = pinned.count()
    if (n <= driverLimit) {
      import spark.implicits._
      // collect through the primitive tuple encoder, not Row: (Long,Long)
      // tuples are @specialized, so 5M pairs cost ~2 long[] worth of heap
      // plus tuple headers (~200 MB) instead of the GenericRow + boxed
      // Long cost (~1 GB) that a plain collect() pays. Same reason the
      // union-find below is an open-addressed primitive map, not a boxed
      // java.util.HashMap. toLocalIterator is still avoided: it schedules
      // one job PER PARTITION.
      val rows = pinned.as[(Long, Long)].collect()
      val parent = new LongLongMap(math.min(Int.MaxValue.toLong,
        rows.length.toLong * 2 + 16).toInt)
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      var ri = 0
      while (ri < rows.length) {
        val p = rows(ri); ri += 1
        val a = p._1; val b = p._2
        if (!parent.contains(a)) parent.put(a, a)
        if (!parent.contains(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        // union toward the SMALLER root so component = min id
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      val out = new Array[(Long, Long)](parent.size)
      var oi = 0
      parent.foreachKey { k => out(oi) = (k, find(k)); oi += 1 }
      pinned.unpersist()
      spark.createDataset(out.toSeq).toDF("id", "component")
    } else {
      val r = connectedComponentsIterative(pinned, maxIter)
      pinned.unpersist()
      r
    }
  }

  /** The distributed min-label propagation loop — the at-scale CC path
    * (see [[connectedComponents]]). Stops at fixpoint (checked via a
    * changed-label count) with a hard iteration cap.
    */
  private def connectedComponentsIterative(pairs: DataFrame,
      maxIter: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id"))
      .distinct().withColumn("component", col("id"))
    var labelsPinned = false // is `labels` a persist we must release?
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // each node adopts the min of its own and its neighbors' labels
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("nmin"))
      val step = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
      // every 3rd iteration truncate lineage (localCheckpoint) so the
      // plan tree doesn't deepen with the iteration count; otherwise a
      // plain persist. The PREVIOUS labels are released once `changed`
      // (which reads both) has been computed. Caveat: unpersist() is a
      // no-op on a localCheckpoint'd dataset (no cacheManager entry),
      // so checkpointed label sets (1 per 3 iterations) are freed by
      // the ContextCleaner on GC, not eagerly — the EAGERLY-held
      // footprint stays at one label set.
      val next =
        if ((it + 1) % 3 == 0) step.localCheckpoint() else step.persist()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      if (labelsPinned) labels.unpersist()
      labels = next
      labelsPinned = true
      converged = changed == 0
      it += 1
    }
    edges.unpersist()
    // maxIter exits with changed>0 mean a duplicate chain longer than
    // maxIter hops did NOT fully collapse — surface it, don't be silent
    if (!converged)
      System.err.println(
        s"[graft] connectedComponents: NOT converged after $maxIter " +
          "iterations — components wider than maxIter hops are split; " +
          "raise maxIter for deep duplicate chains")
    // pin the final result eagerly, then drop the loop's persist handle:
    // callers get a lineage-free, materialized label set and the cache
    // owes nothing to intermediate iterations
    val out = labels.localCheckpoint()
    if (labelsPinned) labels.unpersist()
    out
  }

  /** Near-dedup with TRANSITIVE collapse: verified pairs are clustered
    * into connected components and only each component's smallest id
    * survives — the standard MinHash-LSH dedup policy for chains
    * (A~B, B~C ⇒ keep A only, even though A~C was never verified).
    * [[minhashDedup]] keeps the weaker only-drop-verified-partners
    * policy; this one assumes similarity is transitive across a chain.
    */
  def minhashDedupCC(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5,
      threshold: Double = 0.7): DataFrame = {
    val distinctDocs = exact(df.select(col(idCol), col(textCol)), textCol, idCol)
    val (ids, pairs) = minhashPairsAndIds(distinctDocs, textCol, idCol,
      numHashes, bands, shingleK, threshold, textSource = df)
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol)).distinct()
    // same cached-keeper semi-join shape as [[minhashDedup]]
    val keepers = ids.select(col("__id").as(idCol))
      .join(losers, Seq(idCol), "left_anti")
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** [[minhashDedupCC]] with the KEEP-BEST policy: within each
    * connected component the row with the highest (numeric) `prioCol`
    * survives, ties toward the smallest `idCol` — the CC analogue of
    * [[exactKeepBest]] (near-duplicate web pages often differ only in
    * truncation; keeping the longest or best-scored copy preserves the
    * most content). Exact duplicates collapse first under the SAME
    * (prio, id) rank, so the copy entering the LSH stage is already
    * each content group's best and the two stages compose into one
    * policy. A null priority ranks below every non-null one.
    */
  def minhashDedupKeepBest(df: DataFrame, textCol: String, idCol: String,
      prioCol: String, numHashes: Int = 128, bands: Int = 16,
      shingleK: Int = 5, threshold: Double = 0.7): DataFrame = {
    val distinctDocs = exactKeepBest(
      df.select(col(idCol), col(textCol), col(prioCol)),
      textCol, idCol, prioCol)
    val (ids, pairs) = minhashPairsAndIds(distinctDocs, textCol, idCol,
      numHashes, bands, shingleK, threshold, textSource = df)
    // rank each clustered doc inside its component by (prio desc, id
    // asc). The component frame only carries CLUSTERED ids — a small
    // fraction of the corpus by construction — so the window shuffle
    // never touches the full population.
    val ranked = connectedComponents(pairs)
      .join(distinctDocs.select(col(idCol).as("id"),
        coalesce(col(prioCol).cast(DoubleType),
          lit(Double.NegativeInfinity)).as("__prio")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    val losers = ranked
      .withColumn("__r", struct((lit(0.0) - col("__prio")).as("__rk"),
        col("id").as("__id")))
      .withColumn("__keep", min(col("__r")).over(w))
      .where(not(col("__r") <=> col("__keep")))
      .select(col("id").as(idCol))
    // same cached-keeper semi-join shape as [[minhashDedup]]
    val keepers = ids.select(col("__id").as(idCol))
      .join(losers, Seq(idCol), "left_anti")
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** 64-bit SimHash over whitespace tokens (sign of per-bit vote sums). */
  def simhash64(text: Column): Column =
    graft.functions.Udfs.simhashSigUdf(text)

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (any shared chunk ⇒ candidate, guaranteeing recall for
    * Hamming distance ≤ 3), verify with native bit_count(xor).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame =
    // shared banded-Hamming machinery (4×16-bit chunks, skew guard,
    // bit_count(xor) verify) — also drives perceptual image dedup.
    // NOT spread before the kernel — measured net loss, interleaved
    // A/B at sf0.1: 0.71 s unspread vs 1.29 s spread (see the
    // adjudication in minhashPairsAndIds)
    ImageHash.hammingPairs64(
      df.select(col(idCol).as("__id"), simhash64(col(textCol)).as("__sig")),
      maxHamming, maxBucketSize)

  /** SimHash near-dedup: exact duplicates collapse first (keeping the
    * LSH chunks from concentrating identical signatures — the skew
    * guard's pathological case), then keep-smallest-id over verified
    * Hamming pairs, same policy as [[minhashDedup]].
    */
  def simhashDedup(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val distinctDocs = exact(df, textCol, idCol)
    val losers = simhashPairs(distinctDocs, textCol, idCol, maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    distinctDocs.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs: candidates from banded
    * random-hyperplane LSH (any shared band ⇒ candidate), exact cosine
    * verification ≥ threshold. Identical (band, bucket)-shuffle shape
    * to [[minhashPairs]] — candidate generation never compares vectors
    * outside a shared bucket, so no all-pairs product at any scale.
    *
    * Output: (id_a, id_b, cosine) with id_a < id_b, cosine ≥ threshold.
    *
    * Sizing: candidate volume ≈ bands · n²/2^(bitsPerBand+1), so
    * bitsPerBand must grow with the corpus (≈ log2(n / desired bucket
    * size)). The defaults (8×8) target high-threshold near-dup (≥0.9);
    * low thresholds need coarser bands and accept more candidates.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, bands: Int = 8, bitsPerBand: Int = 8,
      seed: Long = 7L, maxBucketSize: Int = 10000): DataFrame = {
    // planes derive lazily from the vector length on the executors (no
    // driver-side dim-probe job); the count() materializes the persist
    // before the downstream branches race over it — uncached partitions
    // read concurrently by two join sides compute their signatures twice
    // NOT spread before the kernel — measured net loss, interleaved
    // A/B at sf0.1: 0.83 s unspread vs 1.24 s spread (see the
    // adjudication in minhashPairsAndIds; the banded0 repartition
    // below already spreads the narrow rows where it pays)
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__sig",
        Similarity.lshBucketAuto(col("__v"), bands * bitsPerBand, seed))
      .withColumn("__norm", Similarity.vecNorm(col("__v")))
      .persist()
    base.count() // eager: signatures compute exactly once, not per join branch
    val mask = (1L << bitsPerBand) - 1
    val banded0 = base.select(col("__id"), col("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("__sig"), b * bitsPerBand).bitwiseAND(lit(mask))
            .as("chunk"))): _*)).as("__bb"))
      .select(col("__id"), col("__sig"), col("__bb.band").as("__band"),
        col("__bb.chunk").as("__chunk"))
    // The downstream joins are all broadcast, so the candidate + verify
    // pipeline inherits the STREAM side's partitioning. A small input
    // (one parquet split) would funnel the whole quadratic-ish verify
    // through a single task; spreading the narrow (id,sig,band,chunk)
    // rows here is far cheaper than shuffling the pair stream later.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val banded =
      if (banded0.rdd.getNumPartitions < par)
        banded0.repartition(par, col("__band"), col("__chunk"))
      else banded0
    // skew guard — see [[dropHotBuckets]]
    val sized = dropHotBuckets(banded, Seq("__band", "__chunk"), maxBucketSize)
    val l = sized.select(col("__band"), col("__chunk"),
      col("__id").as("id_a"), col("__sig").as("__sa"))
    val rgt = sized.select(col("__band"), col("__chunk"),
      col("__id").as("id_b"), col("__sig").as("__sb"))
    // A pair sharing k bands would surface k times; instead of a
    // distinct() (a full shuffle of the candidate stream — the hot spot
    // at low thresholds, where most pairs share several bands) keep
    // each pair only at its FIRST shared band, recomputed per row from
    // the signature XOR with plain codegen'd bit arithmetic:
    //   x        = sa ^ sb            (zero nibble b ⇔ band b shared)
    //   folded   = x | x>>1 | … | x>>(bits-1)   (bit B·b = OR of nibble b)
    //   z        = ~folded & mask     (bit B·b set ⇔ band b shared)
    //   first    = bit_count((z & -z) - 1)  ( = B · lowest shared band)
    // If the first shared band's bucket was dropped by the skew guard
    // the pair is dropped with it — same best-effort-recall contract
    // the guard already imposes.
    val x = col("__sa").bitwiseXOR(col("__sb"))
    val folded = (1 until bitsPerBand).foldLeft(x)(
      (acc, s) => acc.bitwiseOR(shiftright(x, s)))
    val bandMask = (0 until bands).map(b => 1L << (b * bitsPerBand)).reduce(_ | _)
    val shared = bitwise_not(folded).bitwiseAND(lit(bandMask))
    val lowestBit = shared.bitwiseAND(negate(shared))
    val cands = l.join(rgt, Seq("__band", "__chunk"))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(lowestBit - lit(1L)) === col("__band") * lit(bitsPerBand))
      .select("id_a", "id_b")
    cands
      .join(base.select(col("__id").as("id_a"), col("__v").as("__va"),
        col("__norm").as("__na")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__v").as("__vb"),
        col("__norm").as("__nb")), "id_b")
      .withColumn("cosine", Similarity.pairCosinePrenorm(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** [[embeddingPairs]] with the band geometry sized from the corpus
    * instead of fixed — the scale path for semantic pair mining.
    *
    * The fixed-geometry form packs its whole signature into one Long,
    * capping bands × bitsPerBand at 64; with the bank's 16×4 layout the
    * bucket space per band is 2^4 = 16, so two UNRELATED vectors
    * collide at 1/16 per band and the candidate stream is Θ(n²)
    * regardless of threshold (measured on the r13 ladder: 10× rows →
    * ~100× candidates, 11.4 s for an output of ZERO pairs at τ=0.9).
    * Here [[Similarity.lshPlan]] grows bitsPerBand like log₂(n) (the
    * per-band arrays from [[Similarity.lshBandBuckets]] lift the 64-bit
    * cap) and re-derives the band count from the recall formula, so
    * expected null candidates stay ~`candidatesPerRow`·n and the
    * verify sliver is linear. True pairs at `threshold` are found with
    * probability ≥ `recall`; EXACTLY parallel vectors (cosine 1) share
    * every band signature and are found with probability 1. Candidates
    * dedup through a distinct() — cheap by construction on the linear
    * sliver (the fixed-geometry form's first-shared-band bit trick
    * exists precisely because ITS candidate stream is too big to
    * shuffle). Only meaningful at τ ≳ 0.8 — see [[Similarity.lshPlan]]
    * for why low-τ pair mining is output-quadratic no matter the index.
    */
  def embeddingPairsScaled(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, recall: Double = 0.95,
      candidatesPerRow: Double = 16.0, seed: Long = 7L,
      maxBucketSize: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__norm", Similarity.vecNorm(col("__v")))
      .persist()
    val n = base.count() // eager: also sizes the plan
    if (n == 0) {
      base.unpersist()
      return df.sparkSession.emptyDataFrame
        .select(lit(null).cast("long").as("id_a"),
          lit(null).cast("long").as("id_b"),
          lit(null).cast("double").as("cosine")).limit(0)
    }
    val (bands, bits) = Similarity.lshPlan(n, threshold, recall,
      candidatesPerRow)
    val banded0 = base.select(col("__id"),
      posexplode(Similarity.lshBandBuckets(col("__v"), bands, bits, seed))
        .as(Seq("__band", "__chunk")))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val banded =
      if (banded0.rdd.getNumPartitions < par)
        banded0.repartition(par, col("__band"), col("__chunk"))
      else banded0
    val sized = dropHotBuckets(banded, Seq("__band", "__chunk"),
      maxBucketSize)
    val cands = sized.select(col("__band"), col("__chunk"),
        col("__id").as("id_a"))
      .join(sized.select(col("__band"), col("__chunk"),
        col("__id").as("id_b")), Seq("__band", "__chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // pin the verified pairs, release the signature/norm cache (same
    // lifetime policy as minhashJoin)
    val out = cands
      .join(base.select(col("__id").as("id_a"), col("__v").as("__va"),
        col("__norm").as("__na")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__v").as("__vb"),
        col("__norm").as("__nb")), "id_b")
      .withColumn("cosine", Similarity.pairCosinePrenorm(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .localCheckpoint()
    base.unpersist()
    out
  }

  /** Embedding-cosine near-dedup: keep-smallest-id over verified pairs,
    * same policy as [[minhashDedup]].
    */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9): DataFrame = {
    val losers = embeddingPairs(df, idCol, vecCol, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Word n-gram Jaccard similarity between two text columns (exact,
    * for candidate verification or small joined sets). JIT'd kernel —
    * the HOF formulation (transform/slice/to_json per window) is
    * CodegenFallback and re-evaluated the normalization regexes per
    * element (measured ~15 s vs <1 s over 5 K docs at sf0.1).
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    graft.functions.Udfs.ngramJaccardUdf(a.cast(StringType),
      b.cast(StringType), lit(n))
}

/** Open-addressed long→long hash map (linear probing, power-of-two
  * capacity) for the driver union-find fast path in
  * [[Dedup.connectedComponents]]: two primitive arrays + a bitmap-ish
  * used flag ≈ 17 bytes/slot, vs ~80 bytes/entry for a boxed
  * java.util.HashMap — the difference between ~300 MB and >1 GB of
  * driver heap at the 5M-pair limit.
  */
private[llm] final class LongLongMap(expected: Int) {
  private[this] var cap = {
    var c = 16
    while (c < expected && c > 0) c <<= 1
    if (c <= 0) 1 << 30 else c // overflow clamp
  }
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var vals = new Array[Long](cap)
  private[this] var used = new Array[Boolean](cap)
  private[this] var n = 0

  def size: Int = n

  private[this] def slot(k: Long): Int = {
    // 64→32 bit mix (splitmix64 finalizer tail) then mask
    var h = k * -7046029254386353131L // 0x9E3779B97F4A7C15
    h ^= h >>> 32
    var i = h.toInt & mask
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    i
  }

  def contains(k: Long): Boolean = used(slot(k))

  /** Value for a key that is known to be present (union-find parents
    * are always seeded before lookup); undefined for absent keys.
    */
  def get(k: Long): Long = vals(slot(k))

  def put(k: Long, v: Long): Unit = {
    val i = slot(k)
    if (!used(i)) {
      used(i) = true; keys(i) = k; vals(i) = v; n += 1
      if (n.toLong * 2 > cap) grow()
    } else vals(i) = v
  }

  private[this] def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    var i = 0
    while (i < oc) {
      if (ou(i)) {
        val j = slot(ok(i))
        used(j) = true; keys(j) = ok(i); vals(j) = ov(i)
      }
      i += 1
    }
  }

  def foreachKey(f: Long => Unit): Unit = {
    var i = 0
    while (i < cap) { if (used(i)) f(keys(i)); i += 1 }
  }
}
