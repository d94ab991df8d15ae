package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 scale evidence for the session's new ops, measured the
  * same way as graft.ScaleLadder (noop sink, clearCache between runs,
  * min-of-2):
  *
  *  - audioDupPairs end-to-end (synthesize + DECODE + hash + banded
  *    join) at 20 K and 200 K WAV payloads with ~n/10 planted twins —
  *    the decode/hash stage is map-only, the join is the shared
  *    banded-Hamming core already measured to 10 M signatures
  *    (R12ScaleProbe), so the expected shape is ~linear.
  *  - minhashDedupKeepBest vs minhashDedupCC on documents at sf0.1 and
  *    a 10× isomorphic-copy ladder (same per-copy character bijection
  *    as ScaleLadder, so the duplicate RATE stays at the base rate):
  *    the keep-best delta is one window over the component frame,
  *    which only carries clustered ids.
  *  - fixMojibake throughput over 600 K / 6 M strings (map-only).
  *
  * Usage: Test/runMain graft.R13OpsScaleProbe
  */
object R13OpsScaleProbe {
  def main(args: Array[String]): Unit = {
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
      val xs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val t = xs.min
      println(f"[r13probe] $label%-32s ${t}%.2f s (runs ${xs.map(x => f"$x%.2f").mkString(", ")})")
      t
    }

    // ---- audio: synth WAV with planted twins every 10th row, from
    // the ONE fixture kernel shared with QueryBank and AudioHashSpec
    val synthWav = udf((id: Long) => {
      val twin = id % 10 == 0 && id > 0
      val seed = if (twin) id - 1 else id
      QueryBank.wav16(QueryBank.audioFixtureSamples(seed, perturb = twin))
    })

    def audioAt(n: Long, label: String): Double = {
      val wavs = spark.range(n)
        .select(col("id").as("doc_id"), synthWav(col("id")).as("payload"))
      time2(label) {
        graft.llm.AudioHash.audioDupPairs(wavs, "payload", "doc_id",
            maxHamming = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- documents at sf0.1 and a 10x isomorphic-copy ladder --------
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    def docs10x: DataFrame = {
      val alpha = "abcdefghijklmnopqrst"
      (0 until 10).map { k =>
        val rot = alpha.drop(k * 2 % alpha.length) +
          alpha.take(k * 2 % alpha.length)
        docs01.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, rot).as("text"))
      }.reduce(_ unionByName _)
    }

    def keepBest(d: DataFrame, label: String): Double = {
      val withPrio = d.withColumn("prio", length(col("text")))
      time2(label) {
        graft.llm.Dedup.minhashDedupKeepBest(withPrio, "text", "doc_id",
            "prio", threshold = 0.8)
          .write.format("noop").mode("overwrite").save()
      }
    }
    def ccBaseline(d: DataFrame, label: String): Double =
      time2(label) {
        graft.llm.Dedup.minhashDedupCC(d, "text", "doc_id", threshold = 0.8)
          .write.format("noop").mode("overwrite").save()
      }

    // ---- mojibake over lineitem comments ----------------------------
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(concat(lit("cafÃ© donâ€™t â‚¬9 item "), col("l_orderkey"),
        lit(" part "), col("l_partkey")).as("t"))
    def mojibake(d: DataFrame, label: String): Double =
      time2(label) {
        d.select(graft.functions.Udfs.fixMojibakeUdf(col("t")).as("fixed"))
          .write.format("noop").mode("overwrite").save()
      }

    // ---- unigram tokenizer: bounded train + map-only encode ---------
    def unigram(d: DataFrame, label: String): Double =
      time2(label) {
        graft.llm.UnigramLm.tokenCount(d, "text", vocabSize = 45)
          .write.format("noop").mode("overwrite").save()
      }

    // warmups (small)
    audioAt(2000L, "warmup audio 2K")
    val a20k = audioAt(20000L, "audioDupPairs 20K wavs")
    val a200k = audioAt(200000L, "audioDupPairs 200K wavs")
    val cc01 = ccBaseline(docs01, "minhashDedupCC sf0.1")
    val kb01 = keepBest(docs01, "minhashDedupKeepBest sf0.1")
    val kb10 = keepBest(docs10x, "minhashDedupKeepBest 10x")
    val m01 = mojibake(li, "fixMojibake 600K")
    val m10 = mojibake((0 until 10).map(_ => li).reduce(_ unionByName _),
      "fixMojibake 6M")
    val u01 = unigram(docs01, "unigramTokenCount sf0.1")
    val u10 = unigram(docs10x, "unigramTokenCount 10x")
    println(f"""{"audio_20k": $a20k%.2f, "audio_200k": $a200k%.2f, """ +
      f""""audio_ratio_10x": ${a200k / a20k}%.2f, """ +
      f""""keepbest_sf01": $kb01%.2f, "cc_sf01": $cc01%.2f, """ +
      f""""keepbest_10x": $kb10%.2f, """ +
      f""""keepbest_ratio_10x": ${kb10 / kb01}%.2f, """ +
      f""""mojibake_600k": $m01%.2f, "mojibake_6m": $m10%.2f, """ +
      f""""mojibake_ratio_10x": ${m10 / m01}%.2f, """ +
      f""""unigram_sf01": $u01%.2f, "unigram_10x": $u10%.2f, """ +
      f""""unigram_ratio_10x": ${u10 / u01}%.2f}""")
    spark.stop()
  }
}
