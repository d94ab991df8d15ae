package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 scale evidence for the session's new ops (noop sink,
  * clearCache between runs, min-of-2 — the ScaleLadder method):
  *
  *  - parse-as-pdf end-to-end (synthesize a 3-page Flate PDF per row,
  *    decode objects + inflate + extract text) at 20 K / 200 K docs —
  *    map-only explode, expected ~linear under input growth.
  *  - parse-as-eml (multipart + QP + base64 + RFC 2047) at 60 K /
  *    600 K messages — map-only.
  *  - parse-as-feed at 60 K / 600 K two-item feeds — map-only.
  *  - PQ ANN: one-time pqEncode pass + ADC top-k scan at 500 K / 5 M
  *    vectors (synthetic 64-dim) — the scan reads (id, 8-byte code)
  *    only; expected ~linear encode, ~linear scan.
  *
  * Usage: Test/runMain graft.R14OpsScaleProbe
  */
object R14OpsScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time2(label: String)(body: => Unit): Double = {
      val xs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val t = xs.min
      println(f"[r14probe] $label%-32s ${t}%.2f s (runs ${xs.map(x => f"$x%.2f").mkString(", ")})")
      t
    }

    val wrangle = (recipe: String, d: DataFrame) =>
      Wrangle.recipe(recipe).apply(d)

    // ---- PDF: 3-page Flate document per row -------------------------
    val synthPdf = udf((id: Long) =>
      graft.sources.Pdf.build((0 until 3).map(p => Seq(
        s"Doc $id page $p heading",
        s"Body paragraph (${id * 7 + p}) with some running text",
        s"And a closing \\ line $p"))))
    def pdfAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        synthPdf(col("id")).as("payload"))
      time2(label) {
        wrangle("parse-as-pdf :payload", d)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- EML: the three-shape fixture kernel ------------------------
    def emlAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        QueryBank.synthEmlUdf(col("id")).as("payload"))
      time2(label) {
        wrangle("parse-as-eml :payload", d)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- feeds -------------------------------------------------------
    def feedAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        QueryBank.synthFeedUdf(col("id")).as("payload"))
      time2(label) {
        wrangle("parse-as-feed :payload", d)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- PQ: encode pass + ADC top-k scan over synthetic vectors ----
    val synthVec = udf((id: Long) => {
      val r = new scala.util.Random(id)
      Array.fill(64)(r.nextGaussian().toFloat)
    })
    def pqAt(n: Long, label: String): (Double, Double) = {
      val vecs = spark.range(n).select(col("id").as("vec_id"),
        synthVec(col("id")).as("embedding"))
      val model = graft.llm.Similarity.trainPq(vecs, "embedding")
      val enc = time2(s"$label encode") {
        graft.llm.Similarity.pqEncode(vecs, "embedding", model)
          .select("vec_id", "pq_code")
          .write.format("noop").mode("overwrite").save()
      }
      // persist codes once (the index build), then measure the scan
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pq_probe_").toString
      graft.llm.Similarity.pqEncode(vecs, "embedding", model)
        .select("vec_id", "pq_code").write.mode("overwrite").parquet(dir)
      val coded = spark.read.parquet(dir)
      val q = Array.tabulate(64)(i => math.sin(i + 1).toDouble)
      val scan = time2(s"$label adc scan") {
        coded.select(col("vec_id"),
            graft.llm.Similarity.pqAdcDistance(col("pq_code"), model, q)
              .as("adc"))
          .orderBy(col("adc").asc, col("vec_id")).limit(10)
          .write.format("noop").mode("overwrite").save()
      }
      (enc, scan)
    }

    // ---- router over a 4-format mixed corpus -------------------------
    val synthMixed = udf((id: Long) => (id % 4) match {
      case 0 => graft.sources.Pdf.build(Seq(Seq(s"R $id body text")))
      case 1 => graft.sources.Zip.build(Seq(("word/document.xml",
        s"<w:p><w:r><w:t>R $id body text</w:t></w:r></w:p>"
          .getBytes("UTF-8"))))
      case 2 => (s"<html><body><p>R $id body text</p></body></html>")
        .getBytes("UTF-8")
      case _ => s"R $id body text".getBytes("UTF-8")
    })
    def routeAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        synthMixed(col("id")).as("payload"))
      time2(label) {
        wrangle("extract-text :payload", d)
          .write.format("noop").mode("overwrite").save()
      }
    }

    pdfAt(2000L, "warmup pdf 2K")
    val p20 = pdfAt(20000L, "parse-as-pdf 20K x 3 pages")
    val p200 = pdfAt(200000L, "parse-as-pdf 200K x 3 pages")
    val e60 = emlAt(60000L, "parse-as-eml 60K")
    val e600 = emlAt(600000L, "parse-as-eml 600K")
    val f60 = feedAt(60000L, "parse-as-feed 60K")
    val f600 = feedAt(600000L, "parse-as-feed 600K")
    val r60 = routeAt(60000L, "extract-text 60K mixed")
    val r600 = routeAt(600000L, "extract-text 600K mixed")
    val (enc05, scan05) = pqAt(500000L, "pq 500K")
    val (enc5, scan5) = pqAt(5000000L, "pq 5M")
    println(f"""{"route_60k": $r60%.2f, "route_600k": $r600%.2f, """ +
      f""""route_ratio_10x": ${r600 / r60}%.2f, """ +
      f""""pdf_20k": $p20%.2f, "pdf_200k": $p200%.2f, """ +
      f""""pdf_ratio_10x": ${p200 / p20}%.2f, """ +
      f""""eml_60k": $e60%.2f, "eml_600k": $e600%.2f, """ +
      f""""eml_ratio_10x": ${e600 / e60}%.2f, """ +
      f""""feed_60k": $f60%.2f, "feed_600k": $f600%.2f, """ +
      f""""feed_ratio_10x": ${f600 / f60}%.2f, """ +
      f""""pq_encode_500k": $enc05%.2f, "pq_encode_5m": $enc5%.2f, """ +
      f""""pq_encode_ratio_10x": ${enc5 / enc05}%.2f, """ +
      f""""pq_scan_500k": $scan05%.2f, "pq_scan_5m": $scan5%.2f, """ +
      f""""pq_scan_ratio_10x": ${scan5 / scan05}%.2f}""")
    spark.stop()
  }
}
