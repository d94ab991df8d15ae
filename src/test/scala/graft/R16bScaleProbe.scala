package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 session-B rungs: input-growth ladders for the ops added
  * this session, mirroring R16ScaleProbe's method (warm once, measure
  * base and 10×/100×, docs-per-second at the top rung). All four are
  * map-only kernels (plus ONE rollup shuffle for the WAT pipeline), so
  * the claim under test is linear-or-better growth — no driver state,
  * no accidental shuffle, no allocation blowup:
  *
  *  1. 7z member ingestion (LZMA2 solid archives, 20 members each) —
  *     the decode side is the product under test, but the fixture
  *     COMPRESSION rides the same rung, so the measured time is an
  *     upper bound on the decode cost.
  *  2. WordPiece encode under a frozen model (train once on the
  *     sf0.01 corpus, broadcast, map-only greedy matching).
  *  3. WAT link mining end-to-end (record split → from_json envelope
  *     walk → PSL domain → rollup).
  *  4. TIFF/WebP header probes (pure byte peeking).
  *
  * Usage: Test/runMain graft.R16bScaleProbe
  */
object R16bScaleProbe {
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
      println(f"[r16b] $label%-36s ${t}%.2f s")
      t
    }

    // ---- rung 1: 7z solid archives, 20 members each ------------------
    val membersPerArchive = 20
    val synth7z = udf((shard: Long) =>
      graft.sources.SevenZip.build(
        (0 until membersPerArchive).map { i =>
          val id = shard * membersPerArchive + i
          (s"m$id.txt", s"member $id body text for the solid folder"
            .getBytes("UTF-8"))
        }, codec = "lzma2"))
    def szAt(nArchives: Long, label: String): Double = {
      val d = spark.range(nArchives)
        .select(col("id"), synth7z(col("id")).as("a"))
        .select(col("id"),
          explode(graft.sources.SevenZip.entriesUdf(col("a"))).as("m"))
        .select(col("id"), col("m._1"), col("m._2"))
      time1(label) { d.write.format("noop").mode("overwrite").save() }
    }

    // ---- rung 2: WordPiece encode under a frozen model ---------------
    val docsDf = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val model = graft.llm.WordPiece.train(docsDf, "text", vocabSize = 60)
    val bcModel = spark.sparkContext.broadcast(model)
    val wpCount = udf((s: String) =>
      graft.llm.WordPiece.encodeText(s, bcModel.value.vocab,
        bcModel.value.maxLen).length)
    def wpAt(n: Long, label: String): Double = {
      val d = spark.range(n)
        .select(col("id"), concat(lit("the quick corpus row number "),
          col("id"), lit(" carries repeated training words")).as("text"))
        .select(col("id"), wpCount(col("text")).as("n_pieces"))
      time1(label) { d.write.format("noop").mode("overwrite").save() }
    }

    // ---- rung 3: WAT link mining end-to-end --------------------------
    val synthWat = udf((id: Long) => {
      val json =
        s"""{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":""" +
          s"""{"HTML-Metadata":{"Links":[{"url":"http://site${id % 97}.org/p$id"},""" +
          s"""{"url":"https://www.site${(id + 1) % 97}.org/q"},""" +
          s"""{"url":"/rel"}]}}}}}"""
      val n = json.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: metadata\r\n" +
        s"WARC-Target-URI: http://ex.com/$id\r\n" +
        s"Content-Type: application/json\r\n" +
        s"Content-Length: $n\r\n\r\n$json\r\n\r\n"
    })
    val watSchema = org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<Envelope: STRUCT<`Payload-Metadata`: " +
        "STRUCT<`HTTP-Response-Metadata`: STRUCT<`HTML-Metadata`: " +
        "STRUCT<Links: ARRAY<STRUCT<url: STRING>>>>>>>")
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    def watAt(n: Long, label: String): Double = {
      val recs = spark.range(n)
        .select(col("id"), synthWat(col("id")).as("w"))
        .select(col("id"),
          explode(graft.sources.Warc.parseAllUdf(col("w"))).as("r"))
        .withColumn("j", from_json(col("r.payload").cast("string"), watSchema))
      val d = recs.select(explode(col("j").getField("Envelope")
          .getField("Payload-Metadata").getField("HTTP-Response-Metadata")
          .getField("HTML-Metadata").getField("Links").getField("url"))
          .as("url"))
        .withColumn("domain",
          graft.functions.Udfs.registrableDomainUdf(col("url")))
        .filter(col("domain").isNotNull)
        .groupBy(col("domain")).agg(count(lit(1)).as("n_links"))
      time1(label) { d.write.format("noop").mode("overwrite").save() }
    }

    // ---- rung 4: TIFF/WebP probes ------------------------------------
    val synthTw = udf((id: Long) => QueryBank.tiffWebpFixture(id))
    def twAt(n: Long, label: String): Double = {
      val d = spark.range(n)
        .select(col("id"), synthTw(col("id")).as("p"))
        .select(col("id"),
          graft.llm.MediaHeaders.probeUdf(col("p")).as("pr"))
        .select(col("id"), col("pr.format"), col("pr.width"))
      time1(label) { d.write.format("noop").mode("overwrite").save() }
    }

    szAt(1000L, "warmup 7z 20K members")
    val s20 = szAt(1000L, "7z 20K members")
    val s200 = szAt(10000L, "7z 200K members (10x)")
    wpAt(200000L, "warmup wordpiece 200K")
    val p200 = wpAt(200000L, "wordpiece-encode 200K docs")
    val p2m = wpAt(2000000L, "wordpiece-encode 2M docs (10x)")
    watAt(30000L, "warmup wat 30K")
    val t30 = watAt(30000L, "wat-links 30K records")
    val t300 = watAt(300000L, "wat-links 300K records (10x)")
    twAt(200000L, "warmup tiff/webp 200K")
    val w200 = twAt(200000L, "tiff/webp probe 200K")
    val w2m = twAt(2000000L, "tiff/webp probe 2M (10x)")
    println(f"""{"sevenz_20k_members": $s20%.2f, "sevenz_200k_members": $s200%.2f, """ +
      f""""sevenz_ratio_10x": ${s200 / s20}%.1f, """ +
      f""""sevenz_members_per_s": ${200000L / s200}%.0f, """ +
      f""""wordpiece_200k": $p200%.2f, "wordpiece_2m": $p2m%.2f, """ +
      f""""wordpiece_ratio_10x": ${p2m / p200}%.1f, """ +
      f""""wordpiece_docs_per_s": ${2000000L / p2m}%.0f, """ +
      f""""wat_30k": $t30%.2f, "wat_300k": $t300%.2f, """ +
      f""""wat_ratio_10x": ${t300 / t30}%.1f, """ +
      f""""wat_recs_per_s": ${300000L / t300}%.0f, """ +
      f""""tiffwebp_200k": $w200%.2f, "tiffwebp_2m": $w2m%.2f, """ +
      f""""tiffwebp_ratio_10x": ${w2m / w200}%.1f, """ +
      f""""tiffwebp_docs_per_s": ${2000000L / w2m}%.0f}""")
    spark.stop()
  }
}
