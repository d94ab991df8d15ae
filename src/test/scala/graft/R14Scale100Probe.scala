package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 100× rung: the two headline ingestion paths at 100× the
  * probe base (2 M three-page PDFs; 6 M mixed documents through the
  * router). Both are map-only explodes — the claim under test is
  * that NOTHING super-linear hides past the 10× rung (no driver
  * state, no shuffle, no allocation blowup), so wall-clock should
  * track input within noise.
  *
  * Usage: Test/runMain graft.R14Scale100Probe
  */
object R14Scale100Probe {
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
      println(f"[r14x100] $label%-32s ${t}%.2f s")
      t
    }

    val wrangle = (recipe: String, d: DataFrame) =>
      Wrangle.recipe(recipe).apply(d)

    val synthPdf = udf((id: Long) =>
      graft.sources.Pdf.build((0 until 3).map(p => Seq(
        s"Doc $id page $p heading",
        s"Body paragraph (${id * 7 + p}) with some running text",
        s"And a closing \\ line $p"))))
    def pdfAt(n: Long, label: String): Double = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        synthPdf(col("id")).as("payload"))
      time1(label) {
        wrangle("parse-as-pdf :payload", d)
          .write.format("noop").mode("overwrite").save()
      }
    }

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
      time1(label) {
        wrangle("extract-text :payload", d)
          .write.format("noop").mode("overwrite").save()
      }
    }

    pdfAt(20000L, "warmup+base pdf 20K")
    val p20 = pdfAt(20000L, "parse-as-pdf 20K")
    val p2m = pdfAt(2000000L, "parse-as-pdf 2M (100x)")
    val r60 = routeAt(60000L, "extract-text 60K")
    val r6m = routeAt(6000000L, "extract-text 6M (100x)")
    println(f"""{"pdf_20k": $p20%.2f, "pdf_2m": $p2m%.2f, """ +
      f""""pdf_ratio_100x": ${p2m / p20}%.1f, """ +
      f""""route_60k": $r60%.2f, "route_6m": $r6m%.2f, """ +
      f""""route_ratio_100x": ${r6m / r60}%.1f}""")
    spark.stop()
  }
}
