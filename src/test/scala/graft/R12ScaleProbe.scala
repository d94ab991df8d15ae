package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scale evidence for the new curation ops, measured the same
  * way as graft.ScaleLadder (noop sink, clearCache between runs):
  *
  *  - minhashJoin at sf0.1 (5 K docs, ~2.5 K per side) and on the 10×
  *    ladder (50 K docs, ~25 K per side): even/odd doc_id split so both
  *    sides scale with the corpus — unlike the pinned correctness
  *    fixture, whose 250-doc left side is constant by construction.
  *  - hammingPairs64 at 100 K and 1 M synthetic 64-bit signatures with
  *    planted near-dup twins: the banded-Hamming join that backs BOTH
  *    simhash_pairs and image_dup_pairs, isolated from decode cost
  *    (image decode is map-only and embarrassingly parallel; the join
  *    is the part whose scale shape needs proof).
  *
  * Usage: Test/runMain graft.R12ScaleProbe [ladderDir] [--deep]
  * (--deep adds the 10M-signature hammingPairs64 rung; flags and the
  * positional dir may appear in either order)
  */
object R12ScaleProbe {
  def main(args: Array[String]): Unit = {
    val ladderDir = args.filterNot(_.startsWith("--"))
      .headOption.getOrElse("/tmp/ladder_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time2(label: String)(body: => Unit): Double = {
      // median-of-2-style: run twice, report the min (same contract as
      // ScaleLadder's runs=2 median, which is also the min of two)
      val xs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val t = xs.min
      println(f"[r12probe] $label%-28s ${t}%.2f s (runs ${xs.map(x => f"$x%.2f").mkString(", ")})")
      t
    }

    def fuzzyJoin(dir: String, label: String): Double = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val left = docs.where(col("doc_id") % 2 === 0)
      val right = docs.where(col("doc_id") % 2 === 1)
      time2(label) {
        graft.llm.Dedup.minhashJoin(left, right, "text", "text",
            "doc_id", "doc_id", threshold = 0.7)
          .write.format("noop").mode("overwrite").save()
      }
    }

    def hammingAt(n: Long, label: String): Double = {
      // synthetic signatures: xxhash64 base, every 10th row gets a twin
      // (base id - 1) with 2 flipped bits -> ~n/10 planted pairs
      val sigs = spark.range(n).select(
        col("id").as("__id"),
        when(col("id") % 10 === 0 && col("id") > 0,
          xxhash64(col("id") - 1).bitwiseXOR(lit(0x9L)))
          .otherwise(xxhash64(col("id"))).as("__sig"))
      time2(label) {
        graft.llm.ImageHash.hammingPairs64(sigs, "__id", "__sig",
            maxHamming = 3, maxBucketSize = 10000)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // warmup: small pass through both kernels
    fuzzyJoin("/root/testdata/sf0.01", "warmup fuzzy sf0.01")
    val f01 = fuzzyJoin("/root/testdata/sf0.1", "minhashJoin sf0.1")
    val f1 = fuzzyJoin(ladderDir, s"minhashJoin $ladderDir")
    val h100k = hammingAt(100000L, "hammingPairs64 100K sigs")
    val h1m = hammingAt(1000000L, "hammingPairs64 1M sigs")
    val h10m =
      if (args.contains("--deep")) hammingAt(10000000L, "hammingPairs64 10M sigs")
      else -1.0
    println(f"""{"minhash_join_sf01": $f01%.2f, "minhash_join_ladder": $f1%.2f, """ +
      f""""minhash_join_ratio": ${f1 / f01}%.2f, """ +
      f""""hamming_100k": $h100k%.2f, "hamming_1m": $h1m%.2f, """ +
      f""""hamming_10m": $h10m%.2f, """ +
      f""""hamming_ratio_10x": ${h1m / h100k}%.2f}""")
    spark.stop()
  }
}
