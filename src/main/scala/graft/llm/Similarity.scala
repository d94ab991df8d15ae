package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers:
  *  - [[cosineTopK]] — brute-force exact scan, the correctness baseline;
  *    a single narrow pass + top-k, no shuffle of the corpus.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus is bucketed by a
  *    signed projection signature, the query probes only its own bucket
  *    (plus optional multi-probe neighbors). At 100 TB the scan touches
  *    1/2^bits of the data per probe instead of everything.
  *
  * Dot products are native `zip_with` + `aggregate` expressions.
  */
object Similarity {

  // Per-row vector math is a JIT'd kernel (same rationale as the dedup
  // signature kernels: Catalyst higher-order functions are interpreted
  // per element). The relational shape — scans, top-k, broadcast —
  // stays native.
  private def cosineKernel(q: Array[Double]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    udf((v: Array[Float]) => {
      if (v == null) null
      else {
        var dot = 0.0
        var n = 0.0
        var i = 0
        val len = math.min(v.length, q.length)
        while (i < len) {
          val x = v(i).toDouble
          dot += x * q(i)
          n += x * x
          i += 1
        }
        val denom = math.sqrt(n) * qn
        if (denom == 0) java.lang.Double.valueOf(0.0)
        else java.lang.Double.valueOf(dot / denom)
      }
    })
  }

  private def normLit(q: Array[Double]): Double =
    math.sqrt(q.map(x => x * x).sum)

  /** L2 norm of the embedding column (native, for composability). */
  def l2norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  def cosineToQuery(vec: Column, q: Array[Double]): Column =
    cosineKernel(q)(vec)

  /** Exact brute-force top-k by cosine similarity to a query vector.
    * Deterministic tiebreak on id.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes (seeded). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Signed-projection LSH signature (`bits`-bit bucket id) — one JIT'd
    * pass over the vector for all planes.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val kernel = udf((v: Array[Float]) => sigOf(v, planes))
    kernel(vec)
  }

  private def sigOf(v: Array[Float], planes: Array[Array[Double]]): java.lang.Long =
    if (v == null) null
    else {
      var sig = 0L
      var b = 0
      while (b < planes.length) {
        val p = planes(b)
        var dot = 0.0
        var i = 0
        val len = math.min(v.length, p.length)
        while (i < len) { dot += v(i).toDouble * p(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }

  /** [[lshBucket]] with the plane set derived lazily from the incoming
    * vector's length — removes the driver-side dimension-probe job
    * (planes are a deterministic function of (dim, bits, seed), so
    * every executor derives the identical set; uniform-dim corpora get
    * byte-identical signatures to the probed form).
    */
  def lshBucketAuto(vec: Column, bits: Int, seed: Long): Column = {
    val kernel = udf((v: Array[Float]) => {
      if (v == null) null
      else sigOf(v, planesFor(v.length, bits, seed))
    })
    kernel(vec)
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  private def planesFor(dim: Int, bits: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, bits, seed),
      key => hyperplanes(key._1, key._2, key._3))

  /** Per-band signed-projection bucket ids — [[lshBucketAuto]] without
    * the single-Long ceiling (which caps bands × bitsPerBand at 64 and
    * therefore caps the bucket space at 2^(64/bands) per band): bands ×
    * bitsPerBand planes derived lazily from the vector length, band b
    * packing bits [b·r, (b+1)·r) into element b of an array<long>.
    * Null vector → null. The r ≤ 64-bits-TOTAL cap is exactly what
    * makes the fixed-geometry pair mine quadratic: with 2^r buckets per
    * band, two UNRELATED vectors collide with probability 2^-r per
    * band, so candidate volume is Θ(bands · n² / 2^r) — scale-safe only
    * when r grows with log₂(n), which needs more than 64 total bits.
    */
  def lshBandBuckets(vec: Column, bands: Int, bitsPerBand: Int,
      seed: Long): Column = {
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 63,
      s"lshBandBuckets: bands >= 1 and bitsPerBand in [1,63], " +
        s"got ($bands, $bitsPerBand)")
    val kernel = udf((v: Array[Float]) => {
      if (v == null) null
      else {
        val planes = planesFor(v.length, bands * bitsPerBand, seed)
        val out = new Array[Long](bands)
        var b = 0
        while (b < bands) {
          var sig = 0L
          var j = 0
          while (j < bitsPerBand) {
            val p = planes(b * bitsPerBand + j)
            var dot = 0.0; var i = 0
            val len = math.min(v.length, p.length)
            while (i < len) { dot += v(i).toDouble * p(i); i += 1 }
            if (dot >= 0) sig |= (1L << j)
            j += 1
          }
          out(b) = sig
          b += 1
        }
        out
      }
    })
    kernel(vec)
  }

  /** Corpus-sized band geometry for a sign-LSH pair mine: pick
    * (bands, bitsPerBand) so the expected NULL-pair candidate stream
    * stays linear while true pairs at `threshold` are found with
    * probability ≥ `recall`.
    *
    * Per-bit collision of a pair at cosine τ is p = 1 − acos(τ)/π; a
    * band of r bits collides at p^r for true pairs and 2^-r for the
    * null mass, so: r ≈ log₂(bands·n / candidatesPerRow) bounds null
    * candidates per row, and bands = ln(1−recall)/ln(1−p^r) restores
    * recall. The two equations are coupled; a short fixed-point
    * iteration converges (bands↑ ⇒ r↑ by a log factor ⇒ p^r↓ ⇒ bands↑,
    * bounded by the caps). When the iteration saturates at `maxBands`
    * the threshold is too low for subquadratic LSH — at τ = 0.45 on
    * 64-dim data the NULL cosine distribution (σ ≈ 1/√dim) alone puts
    * Θ(n²)·P(cos>τ) TRUE pairs in the output, so no index can help;
    * this mine is for the published semantic-dedup operating points
    * (τ ≳ 0.8), where the null mass at τ is ~zero and output is linear.
    */
  def lshPlan(n: Long, threshold: Double, recall: Double = 0.95,
      candidatesPerRow: Double = 16.0, maxBands: Int = 64,
      maxBits: Int = 30): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"lshPlan: threshold in (0,1), got $threshold")
    require(recall > 0.0 && recall < 1.0,
      s"lshPlan: recall in (0,1), got $recall")
    require(n > 0, s"lshPlan: n must be > 0, got $n")
    val p = 1.0 - math.acos(threshold) / math.Pi
    var bands = 16
    var bits = 8
    var it = 0
    while (it < 4) {
      bits = math.max(4, math.min(maxBits, math.ceil(
        math.log(bands.toDouble * n.toDouble / candidatesPerRow) /
          math.log(2.0)).toInt))
      val perBand = math.pow(p, bits.toDouble)
      bands =
        if (perBand >= recall) 1
        else math.max(1, math.min(maxBands, math.ceil(
          math.log1p(-recall) / math.log1p(-perBand)).toInt))
      it += 1
    }
    (bands, bits)
  }

  /** Bucketed approximate top-k: probe the query's bucket and all
    * buckets within `probeHamming` bit flips (multi-probe LSH), exact
    * cosine within the probed buckets.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, bits: Int = 8,
      probeHamming: Int = 1, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(query.length, bits, seed)
    // query-side bucket + multiprobe neighbors, computed on the driver
    val qSig = planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      val dot = p.zip(query).map { case (a, b) => a * b }.sum
      if (dot >= 0) acc | (1L << i) else acc
    }
    val probes: Seq[Long] = {
      def flips(sig: Long, left: Int, startBit: Int): Seq[Long] =
        if (left == 0) Seq(sig)
        else (startBit until bits).flatMap(b =>
          flips(sig ^ (1L << b), left - 1, b + 1)) :+ sig
      (0 to probeHamming).flatMap(h => flips(qSig, h, 0)).distinct
    }
    df.withColumn("__bucket", lshBucket(col(vecCol), planes))
      .filter(col("__bucket").isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF coarse quantizer: driver-side Lloyd k-means over a bounded
    * sample (IVF quantizers are trained offline on samples in every
    * real ANN system; `sampleN` caps the driver work). Vectors are
    * unit-normalized so nearest-centroid-by-dot ≡ nearest-by-cosine.
    * Deterministic: seeded init, fixed iteration count.
    */
  def trainCentroids(df: DataFrame, vecCol: String, nlist: Int,
      iters: Int = 10, sampleN: Int = 2048, seed: Long = 11L): Array[Array[Double]] = {
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val sample = df.select(col(vecCol)).limit(sampleN).collect()
      .flatMap(r => Option(r.getSeq[Float](0)))
      .map(s => unit(s.map(_.toDouble).toArray))
    require(sample.nonEmpty, "ivf: empty corpus sample")
    val rnd = new scala.util.Random(seed)
    val cents = Array.fill(math.min(nlist, sample.length))(
      sample(rnd.nextInt(sample.length)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](sample.head.length))
      val counts = new Array[Int](cents.length)
      for (v <- sample) {
        var best = 0; var bestDot = Double.MinValue; var c = 0
        while (c < cents.length) {
          var dot = 0.0; var i = 0
          while (i < v.length) { dot += v(i) * cents(c)(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < cents.length) {
        if (counts(c) > 0) cents(c) = unit(sums(c).map(_ / counts(c)))
        c += 1 // empty cell keeps its previous centroid
      }
      it += 1
    }
    cents
  }

  /** Nearest-centroid cell id (argmax dot against unit centroids —
    * cosine-consistent without normalizing the data side). */
  def ivfCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    val kernel = udf((v: Array[Float]) => {
      if (v == null) null
      else {
        var best = 0; var bestDot = Double.MinValue; var c = 0
        while (c < centroids.length) {
          val cent = centroids(c)
          var dot = 0.0; var i = 0
          val len = math.min(v.length, cent.length)
          while (i < len) { dot += v(i).toDouble * cent(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        java.lang.Integer.valueOf(best)
      }
    })
    kernel(vec)
  }

  /** IVF approximate top-k: probe the `nprobe` cells whose centroids
    * are closest to the query, exact cosine inside the probed cells.
    * The scale path: the cell filter runs in the scan projection, so
    * only ~nprobe/nlist of the corpus reaches the cosine kernel — and
    * at real scale the cell id is a precomputed, partition-prunable
    * index column (write the corpus partitioned by it).
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 11L): DataFrame = {
    val cents = trainCentroids(df, vecCol, nlist, seed = seed)
    val probes = cents.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      (i, dot)
    }.sortBy(-_._2).take(nprobe).map(_._1).toSeq
    df.withColumn("__cell", ivfCell(col(vecCol), cents))
      .filter(col("__cell").isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Persist a cell-partitioned ANN index: the corpus is written
    * `partitionBy` its IVF cell, and the trained centroids ride along
    * as an underscore-prefixed sidecar (parquet directory listings
    * skip `_`-files). [[ivfTopKIndexed]]'s cell filter then becomes
    * PARTITION PRUNING at the source — only ~nprobe/nlist of the index
    * FILES are listed and opened. This is the physical realization of
    * [[ivfTopK]]'s cell filter at 100 TB, where the win is not just
    * skipping the cosine kernel on 3/4 of the corpus but never reading
    * those bytes at all.
    */
  def writeIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, nlist: Int = 16, seed: Long = 11L): Unit = {
    val cents = trainCentroids(df, vecCol, nlist, seed = seed)
    df.select(col(idCol), col(vecCol))
      .withColumn("__cell", ivfCell(col(vecCol), cents))
      .write.partitionBy("__cell").mode("overwrite").parquet(path)
    val json = cents.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    graft.sources.Sidecar.write(
      df.sparkSession.sparkContext.hadoopConfiguration,
      s"$path/_centroids.json", json)
  }

  /** Centroids persisted by [[writeIvfIndex]] (tiny nested JSON array
    * of doubles; hand-rolled parse keeps the library dependency-free).
    * Sidecar IO goes through the Hadoop FileSystem resolved from the
    * path itself, so the index and its centroids always live on the
    * same store (local, HDFS, or S3 — whatever the path names).
    */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    val json = graft.sources.Sidecar.read(
      spark.sparkContext.hadoopConfiguration,
      s"$path/_centroids.json").trim
    json.stripPrefix("[[").stripSuffix("]]").split("\\],\\[")
      .map(_.split(",").map(_.toDouble))
  }

  /** [[ivfTopK]] against a persisted [[writeIvfIndex]] layout: probe
    * selection uses the index's OWN centroids (so results are
    * bit-identical to ivfTopK over the same corpus and parameters),
    * and the cell filter prunes index partitions instead of filtering
    * scanned rows.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, query: Array[Double], k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val probes = cents.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      (i, dot)
    }.sortBy(-_._2).take(nprobe).map(_._1).toSeq
    spark.read.parquet(path)
      .filter(col("__cell").isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Append a `cell` column assigning each embedding to its nearest
    * seeded-k-means centroid — the IVF coarse quantizer exposed as a
    * corpus-analysis op (cluster composition, diversity-aware mixing,
    * and the precompute step for a cell-partitioned ANN layout: write
    * the corpus partitioned by this column and ivfTopK's cell filter
    * becomes partition pruning). Centroids train on a bounded driver
    * sample (seeded, deterministic); assignment is one map-side kernel
    * pass — no shuffle. A corpus with no non-null embeddings yields a
    * null cell column (composition op, not a query — it must not abort
    * an otherwise-valid pipeline).
    */
  def clusterAssign(df: DataFrame, vecCol: String, k: Int = 16,
      seed: Long = 11L, outCol: String = "cell"): DataFrame = {
    require(k >= 1, s"cluster-embeddings: k must be >= 1, got $k")
    try {
      val cents = trainCentroids(df, vecCol, k, seed = seed)
      df.withColumn(outCol, ivfCell(col(vecCol), cents))
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("empty corpus sample") =>
        df.withColumn(outCol, lit(null).cast("int"))
    }
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023):
    * cluster the embeddings with the seeded coarse quantizer, then
    * compare pairs only WITHIN a cluster — the published design point
    * is k large enough that cells stay small, so the per-cell
    * self-join is bounded-quadratic and the corpus never sees an
    * all-pairs product. Output: (id_a, id_b, cosine) with
    * id_a < id_b and cosine ≥ threshold.
    *
    * Scale shape: one shuffle on the cell key for the self-join; a
    * groupBy-count + anti-join guard (same policy as the LSH
    * [[graft.llm.Dedup.minhashPairs]] skew guard) drops cells larger
    * than `maxCellSize` rather than letting one degenerate cell go
    * quadratic — at 100 TB, k should scale ~sqrt(N) per the paper.
    */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, threshold: Double = 0.7, seed: Long = 11L,
      maxCellSize: Int = 10000): DataFrame = {
    val cells = clusterAssign(df.select(col(idCol), col(vecCol)),
      vecCol, k, seed = seed)
      .filter(col("cell").isNotNull)
    val hot = cells.groupBy("cell").count()
      .filter(col("count") > maxCellSize).select("cell")
    val sized = cells.join(hot, Seq("cell"), "left_anti")
    val l = sized.select(col("cell"), col(idCol).as("id_a"),
      col(vecCol).as("__va"))
    val r = sized.select(col("cell"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"))
    l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", pairCosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Element-wise mean-pool of an embedding column per group key — the
    * chunk-embeddings→document-embedding step of a RAG/embedding
    * pipeline (embed chunk-text windows, pool back to one vector per
    * document). Pure relational: posexplode to (group, pos, value),
    * ONE hash-aggregated groupBy on (group, pos) with map-side partial
    * averages, reassemble with sort_array(collect_list) — no UDAF, no
    * driver-side state, scales with rows × dims. Null vectors are
    * skipped; groups with only nulls don't appear. Output: (groupCol,
    * `<vecCol>_pooled` float32 array).
    */
  def meanPoolEmbeddings(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val exploded = df
      .filter(col(vecCol).isNotNull)
      .select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
    exploded
      .groupBy(col(groupCol), col("__pos"))
      .agg(avg(col("__v").cast("double")).as("__m"))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__m"))))
        .as("__ps"))
      .select(col(groupCol),
        transform(col("__ps"), p => p("__m").cast("float"))
          .as(s"${vecCol}_pooled"))
  }

  /** Drop the larger id of every [[semanticPairs]] pair — per-cluster
    * semantic dedup with the keep-smallest policy.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, threshold: Double = 0.7, seed: Long = 11L): DataFrame = {
    val losers = semanticPairs(df, idCol, vecCol, k, threshold, seed)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Σx² accumulated in index order — the SAME order [[pairCosine]]
    * uses, so for a UNIFORM-dimension corpus (the assumption the whole
    * hyperplane-LSH path already makes: planes derive from the vector
    * length) sqrt(norm2(a)) * sqrt(norm2(b)) is bit-identical to the
    * fused denominator and precomputing norms cannot move a borderline
    * threshold comparison. Mixed-length vectors are outside that
    * contract: [[pairCosine]] folds over the common prefix while this
    * norm covers the full vector, so the two forms diverge there.
    */
  val vecNorm: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Array[Float]) => {
      if (v == null) null
      else {
        var na = 0.0; var i = 0
        while (i < v.length) { val x = v(i).toDouble; na += x * x; i += 1 }
        java.lang.Double.valueOf(math.sqrt(na))
      }
    })

  /** cosine from precomputed norms: dot(a,b) / (na * nb) — 1/3 the
    * float work of [[pairCosine]] on a pair stream where each vector
    * appears in many pairs.
    */
  val pairCosinePrenorm: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Float], b: Array[Float], na: java.lang.Double, nb: java.lang.Double) => {
      if (a == null || b == null || na == null || nb == null) null
      else {
        var dot = 0.0; var i = 0
        val len = math.min(a.length, b.length)
        while (i < len) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
        val denom = na * nb
        if (denom == 0) java.lang.Double.valueOf(0.0)
        else java.lang.Double.valueOf(dot / denom)
      }
    })

  val pairCosine: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Float], b: Array[Float]) => {
      if (a == null || b == null) null
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        val len = math.min(a.length, b.length)
        while (i < len) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0) java.lang.Double.valueOf(0.0)
        else java.lang.Double.valueOf(dot / denom)
      }
    })

  /** All-queries × corpus exact top-k for a (small, broadcastable) set
    * of query vectors — TWO-PHASE top-k:
    *
    *  1. broadcast-join queries onto the corpus and reduce EACH INPUT
    *     PARTITION to ≤ queries×k rows with a bounded per-query heap
    *     (`mapPartitions` — the scored corpus is never shuffled and no
    *     task ever holds more than Q×k rows);
    *  2. rank the surviving queries × partitions × k rows with a
    *     per-query window (bounded input, so the single-task-per-query
    *     window is fine here).
    *
    * The naive alternative — `Window.partitionBy(qid)` directly over
    * the scored corpus — funnels every query's FULL corpus score set
    * onto one task: an OOM at real scale. Phase 1 exists to keep the
    * window's input at Q×P×k, independent of corpus size.
    */
  def crossTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .withColumn("cosine", pairCosine(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("cosine"))
    topKPerQuery(scored, qidCol, idCol, k)
  }

  /** Batched IVF ANN: top-k per QUERY ROW against a cell-pruned corpus
    * — the scale shape for query STREAMS (millions of probes against an
    * indexed corpus), where [[ivfTopK]] serves one driver-side vector
    * and [[crossTopK]] pays a full corpus scan per batch. The coarse
    * quantizer trains once on a bounded sample; the corpus is assigned
    * cells in one map pass (at real scale precompute this column and
    * write the corpus partitioned by it — the probe join then becomes
    * partition pruning); each query explodes to its `nprobe` nearest
    * cells and meets only ~nprobe/nlist of the corpus through a
    * broadcast equi-join on the cell id. Exact cosine inside probed
    * cells, per-query top-k through the same partial-heap + window
    * pass as [[crossTopK]]. A (query, vector) pair can meet in at most
    * one cell (a vector HAS one cell), so no candidate dedup is
    * needed. Cell assignment is scale-invariant (argmax of dots), so a
    * query parallel to a corpus vector always probes that vector's
    * cell: exact twins are found with probability 1 at any nprobe ≥ 1.
    * Column names must not collide between corpus and queries.
    */
  def ivfCrossTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, qvecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 11L): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist,
      s"ivfCrossTopK: nprobe in [1, nlist], got ($nprobe, $nlist)")
    val cents = trainCentroids(corpus, vecCol, nlist, seed = seed)
    val probeUdf = udf((q: Seq[Float]) => {
      if (q == null) null
      else {
        val scoredCells = Array.tabulate(cents.length) { c =>
          val cent = cents(c)
          var dot = 0.0; var i = 0
          val len = math.min(q.length, cent.length)
          while (i < len) { dot += q(i).toDouble * cent(i); i += 1 }
          (c, dot)
        }
        scoredCells.sortBy { case (c, d) => (-d, c) }
          .take(math.min(nprobe, cents.length)).map(_._1)
      }
    })
    val qc = queries.select(col(qidCol), col(qvecCol))
      .withColumn("__cell", explode(probeUdf(col(qvecCol))))
    val cc = corpus.select(col(idCol), col(vecCol))
      .withColumn("__cell", ivfCell(col(vecCol), cents))
    val scored = cc.join(broadcast(qc), Seq("__cell"))
      .withColumn("cosine", pairCosine(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("cosine"))
    topKPerQuery(scored, qidCol, idCol, k)
  }

  /** Distributed per-query top-k over a (qid, id, cosine) stream:
    * per-partition bounded heaps (at most k rows per query per
    * partition reach the shuffle), then a window ranking on the
    * partials. Shared tail of [[crossTopK]] / [[ivfCrossTopK]].
    */
  private def topKPerQuery(scored: DataFrame, qidCol: String,
      idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.expressions.Window
    // heap ordering: dequeue() must evict the WORST row — lowest cosine,
    // then largest id (matching the final orderBy(cosine desc, id asc))
    val worstFirst: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val ca = if (a.isNullAt(2)) Double.NegativeInfinity else a.getDouble(2)
        val cb = if (b.isNullAt(2)) Double.NegativeInfinity else b.getDouble(2)
        val c = java.lang.Double.compare(cb, ca)
        if (c != 0) c
        else (a.get(1), b.get(1)) match {
          case (null, null) => 0
          // Spark's orderBy(id) ASC ranks nulls FIRST, i.e. a null id
          // is the BEST row at a cosine tie — the heap must agree or
          // phase 1 could evict a row phase 2 would have kept
          case (null, _)    => -1
          case (_, null)    => 1
          case (x, y)       => x.asInstanceOf[Comparable[Any]].compareTo(y)
        }
      }
    }
    val partial = scored.mapPartitions { rows =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(0),
          scala.collection.mutable.PriorityQueue.empty[Row](worstFirst))
        h += r
        if (h.size > k) h.dequeue()
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(scored.schema))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    partial.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("__rank").as("rank"))
  }

  // ---- embedding quantization ----------------------------------------

  /** Symmetric per-vector int8 quantization: the storage path for
    * embedding columns at corpus scale (4x smaller than float32, and
    * the format int8-SIMD ANN kernels consume). The vector column is
    * REPLACED by `array<int>` codes in [-127, 127] with a per-vector
    * `<vecCol>_scale` (double) appended such that `code * scale`
    * reconstructs the value to within scale/2.
    *
    * Entirely native Catalyst expressions (transform/array_max/round)
    * — whole-stage-codegen'd, no UDF, no shuffle: quantizing a 100 TB
    * corpus is a pure map pass. round() is half-away-from-zero in both
    * Spark and DuckDB, which is what makes the op exactly
    * SQL-oracle-able. All-zero vectors quantize to all-zero codes with
    * scale 0; null vectors stay null with null scale.
    */
  def quantizeEmbedding(df: DataFrame, vecCol: String,
      scaleCol: String = ""): DataFrame = {
    val sc = if (scaleCol.nonEmpty) scaleCol else s"${vecCol}_scale"
    val v = col(vecCol)
    val mx = array_max(transform(v, x => abs(x.cast("double"))))
    // Two-step on purpose: higher-order transform() is CodegenFallback
    // and re-evaluates CAPTURED expressions per array element, so a
    // lambda closing over the array_max subtree costs O(d^2) per row.
    // Staging the scale as a column first makes the capture a bound
    // attribute read (O(1) per element); CollapseProject keeps the two
    // projections separate because the scale is non-cheap and
    // referenced twice below. Same math, ~2x faster at d=256.
    val codes = when(v.isNull, lit(null))
      .when(col(sc) === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v,
        x => round(x.cast("double") / col(sc)).cast("int")))
    df.withColumn(sc, mx / lit(127.0)).withColumn(vecCol, codes)
  }

  /** L2-normalize an embedding column to unit vectors — the standard
    * ANN precompute (dot product of unit vectors = cosine, so a
    * normalized index skips the per-query norm work). Pure Catalyst
    * transform/aggregate, map-only, codegen; the norm accumulates in
    * double over the array IN ORDER (deterministic, SQL-mirrorable) and
    * elements narrow back to float32. All-zero vectors pass through
    * unchanged (norm 0 — there is nothing to scale).
    */
  def normalizeEmbedding(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // stage the norm as a COLUMN before the transform: interpreted HOF
    // lambdas re-evaluate captured subtrees per element, so an inline
    // aggregate() norm is O(d^2) per vector — same trap as the round-9
    // dequantize fix (measured here: 122 s CPU for 200 K x 64-float
    // vectors, 9.5 µs/element). As an attribute it evaluates once/row.
    val nc = "__l2_norm"
    df.withColumn(nc, sqrt(aggregate(v, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn(vecCol,
        when(v.isNull, lit(null))
          .when(col(nc) === 0.0, v)
          .otherwise(transform(v,
            x => (x.cast("double") / col(nc)).cast("float"))))
      .drop(nc)
  }

  /** Inverse of [[quantizeEmbedding]]: codes x scale back to float32
    * (reconstruction error <= scale/2 per element). Drops the scale
    * column; pure Catalyst transform, map-only.
    */
  def dequantizeEmbedding(df: DataFrame, vecCol: String,
      scaleCol: String = ""): DataFrame = {
    val sc = if (scaleCol.nonEmpty) scaleCol else s"${vecCol}_scale"
    df.withColumn(vecCol,
        transform(col(vecCol), c => (c.cast("double") * col(sc)).cast("float")))
      .drop(sc)
  }

  /** Driver-side mirror of [[quantizeEmbedding]]'s per-element rule —
    * same max|x|/127 scale, same HALF_UP rounding Spark's round() uses.
    */
  private[graft] def quantizeCodes(v: Array[Float]): Array[Int] = {
    var mx = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble); if (a > mx) mx = a; i += 1
    }
    if (mx == 0.0) return new Array[Int](v.length)
    val scale = mx / 127.0
    Array.tabulate(v.length) { j =>
      java.math.BigDecimal.valueOf(v(j).toDouble / scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).intValue
    }
  }

  /** Exact top-k by cosine over int8-QUANTIZED codes — the search side
    * of the quantized storage path: per-vector scales cancel out of
    * cosine, so scoring is integer dot products + one sqrt over a 4x
    * smaller column (the asymmetric-distance shape; at 100 TB this is
    * the same narrow scan + TakeOrderedAndProject as [[cosineTopK]]
    * but reading a quarter of the bytes, and the int kernel
    * SIMD-vectorizes). Quantization error only reorders
    * near-equal-cosine neighbors.
    */
  def quantizedCosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val qc = quantizeCodes(query)
    val qn = {
      var s = 0L
      var i = 0
      while (i < qc.length) { s += qc(i).toLong * qc(i); i += 1 }
      math.sqrt(s.toDouble)
    }
    val kernel = udf((codes: Array[Int]) => {
      if (codes == null) null
      else {
        var dot = 0L
        var n1 = 0L
        var i = 0
        val m = math.min(codes.length, qc.length)
        while (i < m) {
          dot += codes(i).toLong * qc(i)
          n1 += codes(i).toLong * codes(i)
          i += 1
        }
        // zero query OR zero data vector -> cosine undefined; score 0
        // (mirrors the n1 guard so an all-zero query can't flood the
        // top-k with NaN/Infinity orderings)
        if (n1 == 0L || qn == 0.0) java.lang.Double.valueOf(0.0)
        else java.lang.Double.valueOf(dot / (math.sqrt(n1.toDouble) * qn))
      }
    })
    quantizeEmbedding(df.select(col(idCol), col(vecCol)), vecCol)
      .select(col(idCol), kernel(col(vecCol)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-column QA — the sanity gate before ANN indexing or
    * training consumes a vector dump: per row, one issue label by
    * priority (`null_vector` / `wrong_dim` / `null_element` / `nan` /
    * `all_zero` / `norm_low` / `norm_high` / `ok`). The null_element
    * check runs BEFORE any arithmetic predicate — null elements turn
    * exists/forall/aggregate into SQL nulls, which would otherwise
    * fall through every `when` to a spurious `ok`. Norm bounds compare
    * the SQUARED L2 norm (accumulated in array order) against
    * [loNormSq, hiNormSq] — unit-normalized corpora sit at 1.0.
    * Map-only, pure Catalyst, no shuffle; appends `<vecCol>_issue`.
    */
  def validateEmbeddings(df: DataFrame, vecCol: String, expectedDim: Int,
      loNormSq: Double = 0.25, hiNormSq: Double = 4.0,
      outCol: String = ""): DataFrame = {
    require(expectedDim >= 1, s"validateEmbeddings: dim $expectedDim")
    require(loNormSq >= 0 && hiNormSq > loNormSq,
      s"validateEmbeddings: bounds [$loNormSq, $hiNormSq]")
    val out = if (outCol.nonEmpty) outCol else s"${vecCol}_issue"
    val v = col(vecCol)
    val n2 = aggregate(v, lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double"))
    df.withColumn(out,
      when(v.isNull, lit("null_vector"))
        .when(size(v) =!= expectedDim, lit("wrong_dim"))
        .when(exists(v, x => x.isNull), lit("null_element"))
        .when(exists(v, x => isnan(x.cast("double"))), lit("nan"))
        .when(forall(v, x => x.cast("double") === 0.0), lit("all_zero"))
        .when(n2 < loNormSq, lit("norm_low"))
        .when(n2 > hiNormSq, lit("norm_high"))
        .otherwise(lit("ok")))
  }

  /** Hard-negative mining for contrastive training data: for each
    * query, the top-k most-similar corpus items that are NOT its known
    * positives — the negatives that actually teach an embedding model
    * (random negatives are trivially separable; the near-misses carry
    * the gradient signal).
    *
    * Shape: one [[crossTopK]] retrieval over-fetched by the largest
    * per-query positive count (a bounded count aggregate), an
    * anti-join against the positive pairs, and a re-rank window over
    * the bounded Q×(k+p) candidate set — corpus rows never funnel
    * into a per-query window, exactly crossTopK's scale contract.
    * Output: (qidCol, idCol, cosine, neg_rank ≤ k).
    */
  def mineHardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, qvecCol: String,
      positives: DataFrame, posIdCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxPos = positives.groupBy(col(qidCol)).count()
      .agg(max("count")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    require(maxPos <= 10000,
      s"mineHardNegatives: $maxPos positives for one query — over-fetch " +
        "would dominate retrieval; dedupe the positive set first")
    val cand = crossTopK(corpus, queries, idCol, vecCol, qidCol, qvecCol,
      k + maxPos.toInt)
    val neg = cand.join(
      positives.select(col(qidCol), col(posIdCol).as(idCol)),
      Seq(qidCol, idCol), "left_anti")
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("cosine").desc, col(idCol))
    neg.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("neg_rank"))
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign matrix (Achlioptas
    * 2003: Rademacher entries satisfy the JL lemma like Gaussians do,
    * with integer-friendly arithmetic): sign(i, j) from the first 32
    * bits of md5("jl:seed:i:j"), i 1-based — the same derivation an
    * external SQL engine can replay
    * (('0x' || substr(md5(...), 1, 8))::BIGINT % 2).
    */
  def jlSigns(inDim: Int, outDim: Int, seed: Long): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(inDim, outDim) { (i0, j) =>
      val u = graft.functions.Udfs.md5Bucket32(md, s"jl:$seed:${i0 + 1}:$j")
      if (u % 2 == 0) 1.0 else -1.0
    }
  }

  /** Random projection to `outDim` dimensions: out_j = Σ_i v_i ·
    * sign(i,j) / √outDim — the standard dimensionality cut BEFORE
    * LSH/IVF indexing at corpus scale (a 768-d embedding column costs
    * 12x the scan bytes of its 64-d JL sketch, and JL preserves
    * pairwise distances within (1±ε) w.h.p.). Map-only kernel, no
    * shuffle, no model state beyond the seeded sign matrix; vectors
    * shorter than `inDim` are zero-padded, null stays null. Appends
    * `<vecCol>_jl` (array<double>).
    */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int,
      outDim: Int, seed: Long = 7L, outCol: String = ""): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"randomProject: $inDim -> $outDim")
    val out = if (outCol.nonEmpty) outCol else s"${vecCol}_jl"
    val signs = jlSigns(inDim, outDim, seed)
    val scale = math.sqrt(outDim.toDouble)
    val bc = df.sparkSession.sparkContext.broadcast(signs)
    // Seq[Double] kernel: an array<double> input must NOT be narrowed
    // to float on the way in (the implicit cast a Seq[Float] signature
    // would buy) — the documented external-SQL replay is exact double
    // arithmetic. array<float> columns widen losslessly instead.
    val kernel = udf((v: Seq[Double]) => {
      if (v == null) null
      else {
        val s = bc.value
        val o = new Array[Double](outDim)
        val n = math.min(v.length, inDim)
        var j = 0
        while (j < outDim) {
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v(i) * s(i)(j); i += 1 }
          o(j) = acc / scale
          j += 1
        }
        o
      }
    })
    df.withColumn(out, kernel(col(vecCol).cast("array<double>")))
  }

  // ---------------------------------------------------------------
  // Product quantization (Jégou et al. 2011): the byte-code ANN tier
  // above int8. The corpus stores m one-byte codes per vector
  // (dim=64, m=8 → 8 bytes vs 256 for float32 — a 32× scan-byte cut);
  // query-time scoring is an m-entry table lookup per row (ADC), no
  // float math on the corpus side. Vectors are unit-normalized before
  // encoding, so squared-L2 ADC ranks identically to cosine
  // (‖a−b‖² = 2−2·cos on the unit sphere).
  // ---------------------------------------------------------------

  /** Per-subspace codebooks: `codebooks(sub)(code)` is a subDim-length
    * centroid. Training is a bounded driver sample + seeded k-means
    * per subspace (the [[trainCentroids]] policy — the model is KBs;
    * the corpus-side work stays map-only).
    */
  case class PqModel(m: Int, ks: Int, subDim: Int,
      codebooks: Array[Array[Array[Double]]])

  private def unitD(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Train PQ codebooks on a bounded unit-normalized sample: the dim
    * axis splits into `m` contiguous subspaces, each running its own
    * seeded L2 k-means with `ks` codes. Deterministic for a fixed
    * sample prefix and seed.
    */
  def trainPq(df: DataFrame, vecCol: String, m: Int = 8, ks: Int = 16,
      iters: Int = 10, sampleN: Int = 2048, seed: Long = 11L): PqModel = {
    val sample = df.select(col(vecCol)).limit(sampleN).collect()
      .flatMap(r => Option(r.getSeq[Float](0)))
      .map(s => unitD(s.map(_.toDouble).toArray))
    require(sample.nonEmpty, "pq: empty corpus sample")
    val dim = sample.head.length
    require(m >= 1 && dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = Array.tabulate(m) { sub =>
      val off = sub * subDim
      val slices = sample.map(v =>
        java.util.Arrays.copyOfRange(v, off, off + subDim))
      val rnd = new scala.util.Random(seed + sub)
      val cents = Array.fill(math.min(ks, slices.length))(
        slices(rnd.nextInt(slices.length)).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](subDim))
        val counts = new Array[Int](cents.length)
        for (v <- slices) {
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < cents.length) {
            var d2 = 0.0; var i = 0
            while (i < subDim) {
              val d = v(i) - cents(c)(i); d2 += d * d; i += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        var c = 0
        while (c < cents.length) {
          if (counts(c) > 0) cents(c) = sums(c).map(_ / counts(c))
          c += 1 // empty cell keeps its previous centroid
        }
        it += 1
      }
      cents
    }
    PqModel(m, books.head.length, subDim, books)
  }

  /** Append `outCol`: the m-byte PQ code of the unit-normalized
    * vector (per-subspace L2 argmin, first-wins on exact ties).
    * Map-only — this is the index-build pass a 100 TB corpus runs
    * once; codes persist next to the id column and later ANN scans
    * never touch the float vectors.
    */
  def pqEncode(df: DataFrame, vecCol: String, model: PqModel,
      outCol: String = "pq_code"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val kernel = udf((v: Seq[Float]) => {
      if (v == null) null
      else {
        val mdl = bc.value
        val u = unitD(v.map(_.toDouble).toArray)
        if (u.length != mdl.m * mdl.subDim) null
        else {
          val code = new Array[Byte](mdl.m)
          var sub = 0
          while (sub < mdl.m) {
            val off = sub * mdl.subDim
            val book = mdl.codebooks(sub)
            var best = 0; var bestD = Double.MaxValue; var c = 0
            while (c < book.length) {
              var d2 = 0.0; var i = 0
              while (i < mdl.subDim) {
                val d = u(off + i) - book(c)(i); d2 += d * d; i += 1
              }
              if (d2 < bestD) { bestD = d2; best = c }
              c += 1
            }
            code(sub) = (best & 0xff).toByte
            sub += 1
          }
          code
        }
      }
    })
    df.withColumn(outCol, kernel(col(vecCol)))
  }

  /** The query-side ADC lookup table: `lut(sub)(code)` = squared L2
    * distance from the unit query's subvector to that codebook entry.
    * m×ks doubles — KBs, broadcast-literal into the scan.
    */
  private def adcLut(model: PqModel, query: Array[Double]): Array[Array[Double]] = {
    val q = unitD(query.clone())
    Array.tabulate(model.m) { sub =>
      val off = sub * model.subDim
      Array.tabulate(model.ks) { c =>
        var d2 = 0.0; var i = 0
        while (i < model.subDim) {
          val d = q(off + i) - model.codebooks(sub)(c)(i); d2 += d * d
          i += 1
        }
        d2
      }
    }
  }

  /** ADC distance column over a code column (sum of m table lookups —
    * no float-vector reads).
    */
  def pqAdcDistance(codeCol: Column, model: PqModel,
      query: Array[Double]): Column = {
    val lut = adcLut(model, query)
    val kernel = udf((code: Array[Byte]) => {
      if (code == null || code.length != lut.length) null
      else {
        var s = 0.0; var sub = 0
        while (sub < lut.length) {
          s += lut(sub)(code(sub) & 0xff); sub += 1
        }
        java.lang.Double.valueOf(s)
      }
    })
    kernel(codeCol)
  }

  /** PQ approximate top-k: train on the corpus sample, encode
    * map-only, rank by ADC (ascending = cosine descending on the unit
    * sphere), deterministic id tie-break. One narrow scan +
    * TakeOrderedAndProject — at scale the encode pass is precomputed
    * and the scan reads only (id, 8-byte code).
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, m: Int = 8, ks: Int = 16,
      seed: Long = 11L): DataFrame = {
    val model = trainPq(df, vecCol, m, ks, seed = seed)
    pqEncode(df, vecCol, model)
      .select(col(idCol), pqAdcDistance(col("pq_code"), model, query).as("adc"))
      .filter(col("adc").isNotNull)
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
  }

  /** Serialize a [[PqModel]] as a TSV sidecar (exact-double
    * round-trip via java.lang.Double, the UnigramLm convention):
    * header `m ks subDim`, then one line per (sub, code) centroid.
    */
  def savePqModel(conf: org.apache.hadoop.conf.Configuration,
      path: String, model: PqModel): Unit = {
    val sb = new StringBuilder
    sb.append(s"${model.m}\t${model.ks}\t${model.subDim}\n")
    var sub = 0
    while (sub < model.m) {
      var c = 0
      while (c < model.codebooks(sub).length) {
        sb.append(sub).append('\t').append(c).append('\t')
        sb.append(model.codebooks(sub)(c)
          .map(java.lang.Double.toString).mkString(","))
        sb.append('\n')
        c += 1
      }
      sub += 1
    }
    graft.sources.Sidecar.write(conf, path, sb.toString)
  }

  /** Reload a [[savePqModel]]-persisted model bit-identically. */
  def loadPqModel(conf: org.apache.hadoop.conf.Configuration,
      path: String): PqModel = {
    val lines = graft.sources.Sidecar.read(conf, path)
      .split("\n").filter(_.nonEmpty)
    val head = lines(0).split("\t")
    val (m, ks, subDim) = (head(0).toInt, head(1).toInt, head(2).toInt)
    val books = Array.fill(m, ks)(new Array[Double](subDim))
    lines.drop(1).foreach { l =>
      val p = l.split("\t")
      books(p(0).toInt)(p(1).toInt) =
        p(2).split(",").map(java.lang.Double.parseDouble)
    }
    PqModel(m, ks, subDim, books)
  }

  /** Persist a PQ ANN index: `(id, pq_code)` parquet + the trained
    * codebooks as an underscore sidecar. The 100 TB contract: the
    * encode pass runs ONCE; every later query scans 8-byte codes
    * (32× fewer bytes than the float vectors) and never reads the
    * embeddings again.
    */
  def writePqIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int = 8, ks: Int = 16, seed: Long = 11L): Unit = {
    val model = trainPq(df, vecCol, m, ks, seed = seed)
    pqEncode(df, vecCol, model)
      .select(col(idCol), col("pq_code"))
      .write.mode("overwrite").parquet(path)
    savePqModel(df.sparkSession.sparkContext.hadoopConfiguration,
      s"$path/_pq_model.tsv", model)
  }

  /** Append a batch to a persisted PQ index — the daily-ingest shape:
    * the batch encodes with the index's EXISTING codebooks (no
    * retrain, so old and new codes stay mutually comparable and
    * queries over the union are exactly pqTopK under the frozen
    * model), one map-only pass, parquet append. Retrain+rewrite only
    * when the corpus distribution has drifted enough that the frozen
    * quantizer's recall decays — a deliberate, monitored event, not
    * an ingest side effect.
    */
  def appendToPqIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val model = loadPqModel(
      df.sparkSession.sparkContext.hadoopConfiguration,
      s"$path/_pq_model.tsv")
    pqEncode(df, vecCol, model)
      .select(col(idCol), col("pq_code"))
      .write.mode("append").parquet(path)
  }

  /** ADC top-k against a persisted [[writePqIndex]] layout —
    * bit-identical to [[pqTopK]] over the same corpus and parameters
    * (the index stores the SAME model its queries score with).
    */
  def pqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, query: Array[Double],
      k: Int): DataFrame = {
    val model = loadPqModel(
      spark.sparkContext.hadoopConfiguration, s"$path/_pq_model.tsv")
    spark.read.parquet(path)
      .select(col(idCol), pqAdcDistance(col("pq_code"), model, query).as("adc"))
      .filter(col("adc").isNotNull)
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ: the coarse quantizer prunes to `nprobe` of `nlist` cells
    * (partition pruning when the corpus is written by cell), ADC ranks
    * the survivors by byte code — the FAISS IVFPQ shape, minus
    * residual encoding (codes quantize the vector itself, so one code
    * table serves every cell; documented trade of a little recall for
    * a reusable corpus-wide codebook).
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ks: Int = 16, seed: Long = 11L): DataFrame = {
    val cents = trainCentroids(df, vecCol, nlist, seed = seed)
    val probes = cents.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      (i, dot)
    }.sortBy(-_._2).take(nprobe).map(_._1).toSeq
    val model = trainPq(df, vecCol, m, ks, seed = seed)
    pqEncode(df, vecCol, model)
      .withColumn("__cell", ivfCell(col(vecCol), cents))
      .filter(col("__cell").isin(probes: _*))
      .select(col(idCol), pqAdcDistance(col("pq_code"), model, query).as("adc"))
      .filter(col("adc").isNotNull)
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
  }
}
