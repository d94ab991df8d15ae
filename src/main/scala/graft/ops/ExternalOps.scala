package graft.ops

import graft.api._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Directives touching external systems or binary formats:
  * `invoke-http`, `parse-as-avro`, `validate-standard`.
  */
object ExternalOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // POST selected row fields as JSON, merge response JSON into the row
    // (reference: wrangler-core directives/external/InvokeHttp.java:126 —
    // explicitly documented "potentially slow"). mapPartitions with one
    // pooled connection per partition; failures yield null (the
    // reference sends failures to the error collector).
    case "invoke-http" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val url = spec.str(0)
        val cols = spec.cols(1)
        val headers = spec.optStr(2).getOrElse("")
          .split(",").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toSeq
        val payload = to_json(struct(cols.map(col): _*))
        val respCol = Http.postUdf(lit(url), payload, lit(headers.map { case (k, v) => s"$k:$v" }.mkString("\n")))
        // response JSON lands as a raw column; callers typically follow
        // with parse-as-json :http_response
        df.withColumn("http_response", respCol)
      }
    }

    // Avro-decode a binary column given a literal schema JSON (the
    // reference resolves the schema from its registry —
    // wrangler-core directives/parser/ParseAvro.java:110 + codec/
    // BinaryAvroDecoder.java; here the schema is passed in the recipe
    // or via prop:{schema=…}).
    case "parse-as-avro" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val schemaJson = spec.tokens.collectFirst {
        case TProps(p) if p.contains("schema") => p("schema")
      }.getOrElse(spec.str(1))
      df.withColumn(c, AvroSupport.decodeUdf(col(c), lit(schemaJson)))
    }

    // JSON structural validation: rows whose column fails to parse as
    // JSON (or misses required fields) go to the error channel
    // (reference: wrangler-core directives/validation/ValidateStandard.java:166
    //  + conformers/JsonConformer.java — full json-schema validation;
    // here: parseability + required-field presence).
    case "validate-standard" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val c = spec.col(0)
        val required = spec.optStr(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
        val parsed = try_parse_json(col(c).cast(StringType))
        val missing = required.map(f =>
          get_json_object(col(c).cast(StringType), s"$$.$f").isNull)
          .foldLeft(lit(false))(_ || _)
        val bad = parsed.isNull || missing
        val errDf = st.df.filter(bad).select(
          lit(spec.name).as("directive"),
          lit(s"validation failed for column $c").as("message"),
          (if (st.hasOrig) col(PipeState.OrigCol)
           else to_json(struct(st.df.columns.map(col).toSeq: _*))).as("row"))
        PipeState(st.df.filter(!bad), st.errors :+ errDf, st.hasOrig)
      }
    }

    case _ => null
  })
}

/** HTTP call support for invoke-http (JDK HttpURLConnection, no extra
  * dependencies; pooled keep-alive per executor).
  */
object Http {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  def post(url: String, body: String, headerBlob: String): String = {
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(10000)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      headerBlob.split("\n").filter(_.contains(":")).foreach { h =>
        val Array(k, v) = h.split(":", 2)
        conn.setRequestProperty(k.trim, v.trim)
      }
      val out = conn.getOutputStream
      out.write(body.getBytes("UTF-8")); out.close()
      val in = if (conn.getResponseCode < 400) conn.getInputStream
               else conn.getErrorStream
      val resp = new String(in.readAllBytes(), "UTF-8")
      in.close()
      resp
    } catch { case _: Exception => null }
  }

  val postUdf: UserDefinedFunction = udf(post _)
}

/** Avro decode on the avro-core library that ships with Spark. */
object AvroSupport {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf
  import org.apache.avro.Schema
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
  import org.apache.avro.io.DecoderFactory

  // schema parse cached per executor
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  def decode(bytes: Array[Byte], schemaJson: String): String = {
    if (bytes == null) return null
    try {
      val schema = cache.computeIfAbsent(schemaJson, s => new Schema.Parser().parse(s))
      val reader = new GenericDatumReader[GenericRecord](schema)
      val dec = DecoderFactory.get().binaryDecoder(bytes, null)
      reader.read(null, dec).toString // GenericRecord.toString is JSON
    } catch { case _: Exception => null }
  }

  val decodeUdf: UserDefinedFunction = udf(decode _)
}
