package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental deduplication — the daily-ingest shape: dedupe a NEW
  * batch against the accumulated corpus WITHOUT touching corpus rows,
  * using compact persisted state.
  *
  * At 100 TB the corpus is never re-scanned per batch: exact dedup
  * keeps a fingerprint table (16-byte md5 per distinct doc, bucketed by
  * fingerprint so the daily anti-join is shuffle-free on the corpus
  * side), and near-dedup keeps the banded MinHash bucket table
  * (`bands` longs per doc). Each ingest is then:
  * batch-internal dedup → one anti-join / banded join against state →
  * append survivors' state rows. Verification fetches only the
  * candidate sliver's text from the corpus (pruned scan), mirroring
  * [[Dedup.minhashPairsAndIds]].
  */
object IncrementalDedup {

  /** Fingerprint state of a corpus: one row per distinct normalized
    * content, column `fp`.
    */
  def exactState(df: DataFrame, textCol: String): DataFrame =
    df.select(Dedup.fingerprint(col(textCol)).as("fp")).distinct()

  /** Exact incremental dedup: batch-internal keep-smallest-id first,
    * then drop everything whose fingerprint is already in `state`
    * (column `fp`). ONE content shuffle for the internal dedup and one
    * anti-join against the state table.
    */
  def exactAgainst(newBatch: DataFrame, textCol: String, idCol: String,
      state: DataFrame): DataFrame = {
    val internal = Dedup.exact(newBatch, textCol, idCol)
    internal
      .withColumn("__fp", Dedup.fingerprint(col(textCol)))
      .join(state.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Membership-SKETCH state: a Bloom filter over the corpus's
    * normalized-content keys. The 100 TB alternative to [[exactState]]
    * + anti-join when the seen-set is huge and a controlled
    * false-positive rate is acceptable (dedup's FP direction is SAFE —
    * a false positive drops a genuinely-novel row, never re-admits a
    * duplicate): ~28.8 bits ≈ 3.6 bytes/key at fpp 1e-6 (the classic
    * m/n = -ln(p)/ln(2)^2), so a BILLION seen documents broadcast as
    * ~3.6 GB of bits — or ~1.2 GB at a looser fpp 1e-2 — instead of
    * shuffling a
    * 16-byte-fingerprint table into every ingest join. Built with ONE
    * partial-aggregated pass (Spark's BloomFilter merge is a bitwise
    * OR — order/partitioning independent, so the bits are
    * deterministic for a given key multiset).
    */
  def bloomState(df: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 1e-6):
      org.apache.spark.util.sketch.BloomFilter = {
    require(expectedItems > 0 && expectedItems <= 2000000000L,
      s"bloomState: expectedItems must be in (0, 2e9], got $expectedItems")
    require(fpp > 0 && fpp < 1, s"bloomState: fpp must be in (0,1), got $fpp")
    df.select(Dedup.normalized(col(textCol)).as("__k"))
      .filter(col("__k").isNotNull)
      .stat.bloomFilter("__k", expectedItems, fpp)
  }

  /** Exact incremental dedup against a Bloom [[bloomState]]: map-only —
    * the filter broadcasts once and every batch row probes it with NO
    * join and NO shuffle. No false negatives (every true duplicate of
    * the state drops); a false-positive rate of `fpp` drops that
    * fraction of novel rows. Rows with a null key (null text) cannot
    * be probed and are KEPT, like the undecodable-row policy of the
    * image/audio dedup legs. Batch-internal duplicates are NOT
    * collapsed — compose with [[Dedup.exact]] first when that matters.
    */
  def exactAgainstBloom(newBatch: DataFrame, textCol: String,
      state: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bc = newBatch.sparkSession.sparkContext.broadcast(state)
    val hit = udf((k: String) => k != null && bc.value.mightContainString(k))
    newBatch
      .withColumn("__k", Dedup.normalized(col(textCol)))
      .filter(col("__k").isNull || !hit(col("__k")))
      .drop("__k")
  }

  /** Banded-bucket state of a corpus for near-dedup: (__id, __band,
    * __bucket) rows — `bands` longs per doc, the signature never needs
    * recomputing at ingest time.
    */
  def minhashState(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5): DataFrame =
    df.select(col(idCol).as("__id"),
        graft.functions.Udfs.minhashBandBucketsUdf(col(textCol),
          lit(numHashes), lit(bands), lit(shingleK), lit(42L)).as("__bk"))
      .filter(size(col("__bk")) > 0)
      .select(col("__id"), posexplode(col("__bk")).as(Seq("__band", "__bucket")))

  /** Near-dedup a new batch against stored corpus state: signatures are
    * computed for the BATCH only, candidates come from the banded join
    * batch-buckets × state-buckets, and exact Jaccard verifies each
    * candidate against the corpus text (pruned fetch by id). Batch rows
    * near-matching any corpus doc are dropped; pass the result through
    * [[Dedup.minhashDedup]] first if batch-internal near-dupes matter.
    *
    * @param corpusText frame with (idCol, textCol) covering state ids —
    *                   only candidate ids are ever fetched from it
    */
  /** Full near-dedup ingest in ONE batch signature pass: in-batch
    * near-dedup AND the corpus-state check share the same persisted
    * banded-bucket frame (the two-call
    * `minhashDedup` → [[minhashAgainst]] composition computes batch
    * signatures twice; this fuses them). Survivors equal full-corpus
    * `Dedup.minhashDedup` restricted to batch ids whenever corpus ids
    * precede batch ids (RobustnessSpec proves the identity).
    */
  def minhashDedupAgainst(batch: DataFrame, textCol: String, idCol: String,
      state: DataFrame, corpusText: DataFrame,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5,
      threshold: Double = 0.7, maxBucketSize: Int = 10000): DataFrame = {
    // collapse in-batch EXACT duplicates first, like Dedup.minhashDedup:
    // identical docs concentrate identical signatures into hot buckets,
    // which the skew guard would then DROP — letting every copy through
    // "near-dedup". Only distinct contents feed the signature kernel;
    // exact-dup losers fall out via the final keeper semi-join.
    val distinctDocs = Dedup.exact(
      batch.select(col(idCol), col(textCol)), textCol, idCol)
    val raw = distinctDocs.select(col(idCol).as("__id"),
        graft.functions.Udfs.minhashBandBucketsUdf(col(textCol),
          lit(numHashes), lit(bands), lit(shingleK), lit(42L)).as("__bk"))
      .persist()
    raw.count() // eager: one signature pass feeds BOTH joins below
    val buckets = raw.filter(size(col("__bk")) > 0)
      .select(col("__id"), posexplode(col("__bk")).as(Seq("__band", "__bucket")))
    val sized = Dedup.dropHotBuckets(buckets, Seq("__band", "__bucket"),
      maxBucketSize)
    // pair text fetched from the ORIGINAL batch (pruned scan, winner
    // ids keep their text verbatim), mirroring minhashPairsAndIds
    val texts = batch.select(col(idCol), col(textCol))

    // in-batch: same banded self-join + Jaccard verify as minhashPairs
    val l = sized.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val rgt = sized.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val inLosers = l.join(rgt, Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .filter(graft.functions.Udfs.shingleJaccardUdf(
        col("__ta"), col("__tb"), lit(shingleK)) >= threshold)
      .select(col("id_b").as(idCol)).distinct()

    // vs corpus: the SAME buckets against the stored state
    val stateSized = Dedup.dropHotBuckets(
      state.select(col("__id"), col("__band"), col("__bucket")),
      Seq("__band", "__bucket"), maxBucketSize)
    val crossMatched = sized
      .select(col("__id").as("__id_new"), col("__band"), col("__bucket"))
      .join(stateSized.select(col("__id").as("__id_old"),
        col("__band"), col("__bucket")), Seq("__band", "__bucket"))
      .select("__id_new", "__id_old").distinct()
      .join(batch.select(col(idCol).as("__id_new"),
        col(textCol).as("__tn")), "__id_new")
      .join(corpusText.select(col(idCol).as("__id_old"),
        col(textCol).as("__to")), "__id_old")
      .filter(graft.functions.Udfs.shingleJaccardUdf(
        col("__tn"), col("__to"), lit(shingleK)) >= threshold)
      .select(col("__id_new").as(idCol)).distinct()

    // keepers = exact-dedup winners minus near-dup losers minus corpus
    // matches; exact-dup losers are excluded by not being in `raw`
    val keepers = raw.select(col("__id").as(idCol))
      .join(inLosers.union(crossMatched).distinct(), Seq(idCol), "left_anti")
    batch.join(keepers, Seq(idCol), "left_semi")
  }

  def minhashAgainst(newBatch: DataFrame, textCol: String, idCol: String,
      state: DataFrame, corpusText: DataFrame,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5,
      threshold: Double = 0.7, maxBucketSize: Int = 10000): DataFrame = {
    val batchBuckets = minhashState(newBatch, textCol, idCol,
      numHashes, bands, shingleK)
      .select(col("__id").as("__id_new"), col("__band"), col("__bucket"))
    // hot-bucket guard on the STATE side (the side that grows):
    // same aggregate+anti-join policy as the self-join generators
    val stateSized = Dedup.dropHotBuckets(state, Seq("__band", "__bucket"),
      maxBucketSize)
    val cands = batchBuckets
      .join(stateSized.select(col("__id").as("__id_old"),
        col("__band"), col("__bucket")), Seq("__band", "__bucket"))
      .select("__id_new", "__id_old").distinct()
    val matched = cands
      .join(newBatch.select(col(idCol).as("__id_new"),
        col(textCol).as("__tn")), "__id_new")
      .join(corpusText.select(col(idCol).as("__id_old"),
        col(textCol).as("__to")), "__id_old")
      .filter(graft.functions.Udfs.shingleJaccardUdf(
        col("__tn"), col("__to"), lit(shingleK)) >= threshold)
      .select(col("__id_new")).distinct()
    newBatch.join(matched.select(col("__id_new").as(idCol)),
      Seq(idCol), "left_anti")
  }
}
