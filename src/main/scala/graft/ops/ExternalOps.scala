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
    // explicitly documented "potentially slow"). Per-row UDF over ONE
    // pooled java.net.http.HttpClient per executor JVM (keep-alive
    // connection reuse across rows AND tasks — strictly wider reuse
    // than a per-partition pool) with a bounded retry budget on
    // transient failures; failures yield null (the reference sends
    // failures to the error collector).
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

/** HTTP call support for invoke-http: one `java.net.http.HttpClient`
  * per executor JVM (JDK-only, no extra dependencies). The client
  * keeps an internal keep-alive connection pool shared across every
  * row and task on the executor, so per-row cost after the first
  * request to a host is one pooled round-trip, not a TCP handshake.
  * Transient failures (IOException, HTTP 5xx) retry up to
  * [[Http.MaxAttempts]] times within the per-request timeout budget;
  * terminal failures (4xx body is still returned; malformed URL /
  * exhausted retries yield null) never throw — a flaky endpoint
  * degrades rows to null instead of failing the task.
  */
object Http {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  // lazy + per-JVM: materialized on first use on each executor; the
  // driver-side UDF registration never constructs (or serializes) it
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  private val MaxAttempts = 3
  private val RequestTimeout = java.time.Duration.ofSeconds(10)

  def post(url: String, body: String, headerBlob: String): String = {
    val req = try {
      val b = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(RequestTimeout)
        .header("Content-Type", "application/json")
      headerBlob.split("\n").filter(_.contains(":")).foreach { h =>
        val Array(k, v) = h.split(":", 2)
        b.header(k.trim, v.trim)
      }
      b.POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(if (body == null) "" else body)).build()
    } catch { case _: Exception => return null } // malformed URL/header
    var attempt = 0
    while (attempt < MaxAttempts) {
      attempt += 1
      try {
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        // 5xx is transient (retry); anything else — incl. 4xx, whose
        // body carries the server's error JSON — is the final answer
        if (resp.statusCode() < 500 || attempt == MaxAttempts)
          return resp.body()
      } catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); return null
        case _: java.io.IOException => () // connect/read failure: retry
        case _: Exception => return null
      }
    }
    null
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
