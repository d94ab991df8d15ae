package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 100× rungs for the two routes the r15 verdict named:
  *
  *  1. `.warc.zst` in DICTIONARY mode (the Common Crawl layout fixed
  *     this round): shards lead with a skippable dictionary frame and
  *     every record frame references that dictionary. The splitter is
  *     a per-shard stream walk — map-only, no shuffle — so records/s
  *     should hold flat from 20K to 2M records.
  *  2. the extract-text front door over a MIXED subtitle-heavy corpus
  *     (SRT / VTT / ASS / HTML-with-arrow-comments / plain / xz-
  *     wrapped): the router is a per-row sniff chain, also map-only.
  *
  * Both rungs grow INPUT 100× with constant per-row work; the claim
  * under test is nothing super-linear hides past the 10× full-bank
  * sweep (no driver state, no accidental shuffle, no allocation
  * blowup).
  *
  * Usage: Test/runMain graft.R16ScaleProbe
  */
object R16ScaleProbe {
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
      println(f"[r16x100] $label%-36s ${t}%.2f s")
      t
    }

    // ---- rung 1: dictionary-mode .warc.zst ---------------------------
    // one shard = [skippable dict frame][100 dict-compressed record
    // frames]; the dictionary is trained once per executor (lazy) the
    // same way the bank fixture does it
    val recsPerShard = 100
    val synthShard = udf((shard: Long) => {
      val dict = R16ScaleProbe.probeDict
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(graft.sources.ZstdFrames.skippableFrame(dict))
      var i = 0
      while (i < recsPerShard) {
        val id = shard * recsPerShard + i
        val body = s"scaled dictionary text of record $id"
        val rec = (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
          s"WARC-Target-URI: http://ex.com/$id\r\n" +
          s"Content-Type: text/plain\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n")
          .getBytes("UTF-8")
        bos.write(graft.sources.ZstdFrames.compressWithDict(rec, dict))
        i += 1
      }
      bos.toByteArray
    })
    def warcAt(nShards: Long, label: String): Double = {
      val d = spark.range(nShards)
        .select(col("id"), synthShard(col("id")).as("w"))
        .select(col("id"),
          explode(graft.sources.Warc.parseAllUdf(col("w"))).as("r"))
        .select(col("id"), col("r.target_uri"), col("r.payload"))
      time1(label) {
        d.write.format("noop").mode("overwrite").save()
      }
    }

    // ---- rung 2: extract-text over a mixed subtitle corpus -----------
    val synthDoc = udf((id: Long) => {
      (id % 6) match {
        case 0 => // SRT
          (s"1\n00:00:01,000 --> 00:00:02,000\nsrt cue $id\n\n" +
            s"2\n00:00:03,000 --> 00:00:04,500\nsecond cue $id\n")
            .getBytes("UTF-8")
        case 1 => // WebVTT
          (s"WEBVTT\n\n00:05.000 --> 00:07.000\nvtt cue $id\n")
            .getBytes("UTF-8")
        case 2 => // ASS
          ("[Script Info]\nTitle: t\n\n[Events]\n" +
            "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text\n" +
            s"Dialogue: 0,0:00:01.00,0:00:03.00,Default,,0,0,0,,ass cue $id")
            .getBytes("UTF-8")
        case 3 => // HTML whose comment carries an arrow (r15 advice shape)
          (s"<!DOCTYPE html><!-- nav --> <html><body><p>web text $id" +
            "</p></body></html>").getBytes("UTF-8")
        case 4 => // plain prose mentioning the subtitle literals
          (s"notes $id: see a --> b mapping near [Events] handling")
            .getBytes("UTF-8")
        case _ => // xz-wrapped plain text (the new one-level unwrap)
          graft.functions.Udfs.compress(
            s"xz wrapped doc $id".getBytes("UTF-8"), "xz")
      }
    })
    def extractAt(n: Long, label: String): Double = {
      val d = spark.range(n)
        .select(col("id"), synthDoc(col("id")).as("payload"))
        .select(col("id"),
          graft.sources.Extract.extractAnyUdf(col("payload")).as("e"))
        .select(col("id"), col("e._1").as("format"), col("e._2").as("text"))
      time1(label) {
        d.write.format("noop").mode("overwrite").save()
      }
    }

    // xz-only rung: isolates the LZMA2 codec cost (compress fixture +
    // decode) from the router/subtitle cost in the mixed rung — the
    // first probe run showed the mixed rung dominated by xz rows
    // before the ArrayCache/dict-size fix
    def xzAt(n: Long, label: String): Double = {
      val d = spark.range(n)
        .select(col("id"),
          graft.sources.Extract.extractAnyUdf(
            graft.functions.Udfs.compressUdf(
              concat(lit("xz doc "), col("id")), lit("xz"))).as("e"))
        .select(col("id"), col("e._1").as("format"), col("e._2").as("text"))
      time1(label) {
        d.write.format("noop").mode("overwrite").save()
      }
    }

    warcAt(200L, "warmup warc-zst-dict 20K recs")
    val w20 = warcAt(200L, "warc-zst-dict 20K recs")
    val w2m = warcAt(20000L, "warc-zst-dict 2M recs (100x)")
    extractAt(20000L, "warmup extract-mixed 20K")
    val e20 = extractAt(20000L, "extract-mixed 20K docs")
    val e2m = extractAt(2000000L, "extract-mixed 2M docs (100x)")
    val x20 = xzAt(20000L, "xz-only 20K docs")
    val x200 = xzAt(200000L, "xz-only 200K docs (10x)")
    println(f"""{"warc_zst_dict_20k": $w20%.2f, "warc_zst_dict_2m": $w2m%.2f, """ +
      f""""warc_zst_dict_ratio_100x": ${w2m / w20}%.1f, """ +
      f""""warc_zst_dict_recs_per_s": ${2000000L / w2m}%.0f, """ +
      f""""extract_mixed_20k": $e20%.2f, "extract_mixed_2m": $e2m%.2f, """ +
      f""""extract_mixed_ratio_100x": ${e2m / e20}%.1f, """ +
      f""""extract_mixed_docs_per_s": ${2000000L / e2m}%.0f, """ +
      f""""xz_only_20k": $x20%.2f, "xz_only_200k": $x200%.2f, """ +
      f""""xz_only_ratio_10x": ${x200 / x20}%.1f, """ +
      f""""xz_only_docs_per_s": ${200000L / x200}%.0f}""")
    spark.stop()
  }

  /** Probe dictionary: trained once per JVM over record-shaped
    * samples (shards are self-contained — each carries the dictionary
    * its frames reference).
    */
  lazy val probeDict: Array[Byte] = {
    val samples = (0 until 400).map(i =>
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: http://ex.com/$i\r\n" +
        s"Content-Type: text/plain\r\n" +
        s"Content-Length: 30\r\n\r\nscaled dictionary text of record $i\r\n\r\n")
        .getBytes("UTF-8"))
    graft.sources.ZstdFrames.trainDict(samples, 4096)
  }
}
