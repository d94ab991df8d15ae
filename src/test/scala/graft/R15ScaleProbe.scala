package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 100× rung for the Matroska front doors: sample/frame
  * extraction (muxed A/V with laced audio blocks) and embedded-
  * subtitle extraction at 100× the probe base. Both are map-only
  * explodes — the claim under test is that nothing super-linear
  * hides past the 10× full-bank sweep (no driver state, no shuffle,
  * no allocation blowup), so wall-clock should track input within
  * noise.
  *
  * Usage: Test/runMain graft.R15ScaleProbe
  */
object R15ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time1(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[r15x100] $label%-32s ${t}%.2f s")
      t
    }

    // muxed MKV: 6 video SimpleBlocks + 3 Xiph-laced audio blocks
    // (3 frames each) + 2 S_TEXT cues per container
    val synthMkv = udf((id: Long) => {
      import graft.llm.MediaHeaders.WebmBlockSpec
      val video = (0 until 6).map(i =>
        WebmBlockSpec(1L, i * 40, i % 3 == 0, useGroup = false,
          Array.tabulate(24)(j => ((id + i * 5 + j) % 256).toByte)))
      val audio = (0 until 3).map(i =>
        WebmBlockSpec(2L, i * 120, keyframe = true, useGroup = false,
          null, lacing = 1, lacedFrames = (0 until 3).map(j =>
            Array.tabulate((5 + (id + j) % 4).toInt)(k =>
              ((id + i + j + k) % 256).toByte))))
      val subs = (0 until 2).map(j =>
        WebmBlockSpec(3L, j * 2000, keyframe = true, useGroup = true,
          s"cue $id $j".getBytes("UTF-8"), durationMs = 1500L))
      graft.llm.MediaHeaders.webmBuild(Seq((0L, video ++ audio ++ subs)),
        tracks = Seq((1L, "V_VP9"), (2L, "A_OPUS"), (3L, "S_TEXT/UTF8")),
        docType = "matroska")
    })

    def framesAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        synthMkv(col("id")).as("payload"))
      time1(label) {
        graft.llm.Multimodal.sampleFramesWebm(d, "payload", "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    def subsAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        synthMkv(col("id")).as("payload"))
      time1(label) {
        graft.llm.Multimodal.extractWebmSubtitles(d, "payload", "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }

    framesAt(20000L, "warmup+base webm-frames 20K")
    val f20 = framesAt(20000L, "webm-frames 20K")
    val f2m = framesAt(2000000L, "webm-frames 2M (100x)")
    val s20 = subsAt(20000L, "webm-subtitles 20K")
    val s2m = subsAt(2000000L, "webm-subtitles 2M (100x)")
    println(f"""{"webm_frames_20k": $f20%.2f, "webm_frames_2m": $f2m%.2f, """ +
      f""""webm_frames_ratio_100x": ${f2m / f20}%.1f, """ +
      f""""webm_subs_20k": $s20%.2f, "webm_subs_2m": $s2m%.2f, """ +
      f""""webm_subs_ratio_100x": ${s2m / s20}%.1f}""")
    spark.stop()
  }
}
