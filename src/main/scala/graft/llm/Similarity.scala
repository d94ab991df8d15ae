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

  /** dot(vec, literal query) as a native expression (double math). */
  private def dotLit(vec: Column, q: Array[Double]): Column =
    aggregate(
      zip_with(vec, lit(q), (x, y) => x.cast(DoubleType) * y),
      lit(0.0), (acc, x) => acc + x)

  private def normLit(q: Array[Double]): Double =
    math.sqrt(q.map(x => x * x).sum)

  /** L2 norm of the embedding column. */
  def l2norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  def cosineToQuery(vec: Column, q: Array[Double]): Column =
    dotLit(vec, q) / (l2norm(vec) * lit(normLit(q)))

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

  /** Signed-projection LSH signature (`bits`-bit bucket id). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc.bitwiseOR(when(dotLit(vec, p) >= 0, lit(1L << i)).otherwise(0L))
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

  /** All-queries × corpus exact top-k, for a (small, broadcastable) set
    * of query vectors: broadcast join + per-query window top-k. The
    * corpus side never shuffles for the join; only the (queries × k)
    * result aggregates.
    */
  def crossTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dot = aggregate(
      zip_with(col(vecCol), col(qvecCol), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val cos = dot / (l2norm(col(vecCol)) * l2norm(col(qvecCol)))
    val scored = corpus.join(broadcast(queries))
      .withColumn("cosine", cos)
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("__rank").as("rank"))
  }
}
