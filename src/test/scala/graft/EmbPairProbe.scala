package graft
import org.apache.spark.sql.SparkSession
/** r13 scale probe: fixed-geometry embeddingPairs vs corpus-sized
  * embeddingPairsScaled on the 10x ladder. The fixed 16x4 form packs
  * its signature into one Long (bucket space 2^4 per band), so NULL
  * pairs collide at 1/16 per band and candidates are Θ(n²) regardless
  * of threshold; the scaled form grows bits like log2(n), keeping the
  * candidate stream ~linear. Run:
  *   sbt "Test/runMain graft.EmbPairProbe"
  * (expects target/ladder/sf1 from ScaleLadder).
  */
object EmbPairProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).appName("p").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def lap(tag: String, f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"$tag rows=$c time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (d <- Seq("/root/testdata/sf0.1", "target/ladder/sf1")) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      for (thr <- Seq(0.45, 0.9)) {
        lap(s"fixed  dir=$d thr=$thr", graft.llm.Dedup.embeddingPairs(
          emb, "vec_id", "embedding", threshold = thr,
          bands = 16, bitsPerBand = 4).count())
      }
      lap(s"scaled dir=$d thr=0.9", graft.llm.Dedup.embeddingPairsScaled(
        emb, "vec_id", "embedding", threshold = 0.9).count())
      // batched ANN: 200 probes x corpus — the IVF cell join reads
      // ~nprobe/nlist of the corpus per query vs crossTopK's full scan
      import org.apache.spark.sql.functions.col
      val probes = emb.filter(col("vec_id") < 200)
        .select((col("vec_id") + 50000000L).as("query_id"),
          col("embedding").as("qvec"))
      lap(s"crossTopK  dir=$d q=200", graft.llm.Similarity.crossTopK(
        emb, probes, "vec_id", "embedding", "query_id", "qvec",
        k = 10).count())
      lap(s"ivfCrossTopK dir=$d q=200", graft.llm.Similarity.ivfCrossTopK(
        emb, probes, "vec_id", "embedding", "query_id", "qvec",
        k = 10, nlist = 64, nprobe = 8).count())
    }
    spark.stop()
  }
}
