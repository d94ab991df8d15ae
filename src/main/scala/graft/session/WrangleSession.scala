package graft.session

import graft.Wrangle
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive authoring surface — Spark-native equivalent of the
  * reference's workspace/execute/schema/summary REST flow
  * (reference: wrangler-service service/directive/DirectivesHandler.java —
  * PUT workspace :175, POST execute :555, POST schema :683, POST
  * summary :654). A workspace is a bounded sample DataFrame; executing
  * a recipe against it returns rows + derived schema + error summary
  * eagerly, which is what the interactive UI consumes.
  */
final class WrangleSession(spark: SparkSession) {

  final case class ExecuteResult(
      rows: Seq[Map[String, Any]],
      schemaDdl: String,
      errorCount: Long,
      errorSamples: Seq[String])

  @volatile private var workspaces = Map.empty[String, DataFrame]

  /** Create a workspace from a source with a sampling method
    * (first|bernoulli|poisson|reservoir — reference SamplingMethod.java:27-30).
    *
    * With `keyCol` set, the seeded methods use the position-INDEPENDENT
    * hash-point samplers (bernoulliByKey/poissonByKey/reservoirByKey):
    * the draw is a pure function of (key, seed), so the workspace
    * sample is reproducible under retries, repartitioning, AQE
    * re-planning and cluster size — the only stable form over a
    * 100 TB source. Without it, the reference's per-row-RNG forms
    * apply (position-dependent by construction).
    */
  def createWorkspace(name: String, source: DataFrame,
      method: String = "first", n: Int = 1000,
      fraction: Double = 0.01, seed: Long = 42L,
      keyCol: String = null): Unit = {
    val sample = (method.toLowerCase, Option(keyCol)) match {
      case ("first", _)           => Sampler.first(source, n)
      case ("bernoulli", Some(k)) =>
        Sampler.bernoulliByKey(source, k, fraction, seed)
      case ("bernoulli", None)    =>
        Sampler.bernoulli(source, fraction, seed).limit(n)
      case ("poisson", Some(k))   =>
        Sampler.poissonByKey(source, k, fraction, seed)
      case ("poisson", None)      =>
        Sampler.poisson(source, fraction, seed).limit(n)
      case ("reservoir", Some(k)) => Sampler.reservoirByKey(source, k, n, seed)
      case ("reservoir", None)    => Sampler.reservoir(source, n, seed)
      case (other, _) => throw new IllegalArgumentException(s"sampling: $other")
    }
    workspaces += name -> sample.cache()
  }

  def workspace(name: String): DataFrame = workspaces(name)

  def dropWorkspace(name: String): Unit = {
    workspaces.get(name).foreach(_.unpersist())
    workspaces -= name
  }

  /** Execute a recipe on the workspace sample (bounded, eager). */
  def execute(workspaceName: String, recipe: String,
      limit: Int = 100): ExecuteResult = {
    val res = Wrangle.recipe(recipe).run(workspaces(workspaceName))
    val rows = res.output.limit(limit).collect().toSeq.map { r =>
      r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap
    }
    val errs = res.errors.limit(10).collect().toSeq
      .map(r => s"${r.getAs[String]("directive")}: ${r.getAs[String]("message")}")
    ExecuteResult(rows, res.output.schema.toDDL,
      res.errors.count(), errs)
  }

  /** Derived output schema without materializing data — free because
    * the plan is declarative (the reference must execute the sample to
    * find out; we ask Catalyst).
    */
  def schema(workspaceName: String, recipe: String): String =
    Wrangle.recipe(recipe).apply(workspaces(workspaceName)).schema.toDDL

  /** Column profile of the (optionally wrangled) workspace sample. */
  def summary(workspaceName: String, recipe: String = ""): DataFrame = {
    val base = workspaces(workspaceName)
    val df = if (recipe.trim.isEmpty) base else Wrangle.recipe(recipe).apply(base)
    Profiler.profile(df)
  }
}

/** Directive usage listing — the `/usage` surface
  * (reference: wrangler-core parser/UsageRegistry.java).
  */
object Usage {
  val directives: Seq[(String, String)] = Seq(
    "parse-as-csv" -> "parse-as-csv :col [delimiter] [header]",
    "parse-as-json" -> "parse-as-json :col [depth]",
    "json-path" -> "json-path :source :dest 'json-path'",
    "parse-xml-to-json" -> "parse-xml-to-json :col [depth]",
    "parse-as-xml" -> "parse-as-xml :col",
    "xpath" -> "xpath :col :dest 'xpath'",
    "xpath-array" -> "xpath-array :col :dest 'xpath'",
    "parse-as-avro" -> "parse-as-avro :col 'schema-json' | prop:{schema=…}",
    "parse-as-avro-file" -> "parse-as-avro-file :col",
    "parse-as-excel" -> "parse-as-excel :col [sheet] [first-row-as-header]",
    "parse-as-hl7" -> "parse-as-hl7 :col",
    "parse-as-protobuf" -> "parse-as-protobuf :col",
    "parse-as-log" -> "parse-as-log :col format",
    "parse-as-date" -> "parse-as-date :col [timezone]",
    "parse-as-simple-date" -> "parse-as-simple-date :col format",
    "parse-as-datetime" -> "parse-as-datetime :col format",
    "parse-timestamp" -> "parse-timestamp :col [seconds|milliseconds|microseconds]",
    "parse-as-currency" -> "parse-as-currency :source :dest [locale]",
    "format-as-currency" -> "format-as-currency :source :dest [locale]",
    "parse-as-fixed-length" -> "parse-as-fixed-length :col widths [padding]",
    "set-charset" -> "set-charset :col charset",
    "set-record-delim" -> "set-record-delim :col delimiter [limit]",
    "write-as-csv" -> "write-as-csv :col",
    "write-as-json-map" -> "write-as-json-map :col",
    "write-as-json-object" -> "write-as-json-object :dest :col[,:col]*",
    "drop" -> "drop :col[,:col]*",
    "keep" -> "keep :col[,:col]*",
    "rename" -> "rename :source :target",
    "set-headers" -> "set-headers :col[,:col]*",
    "columns-replace" -> "columns-replace s/pat/rep/[flags]",
    "cleanse-column-names" -> "cleanse-column-names",
    "change-column-case" -> "change-column-case [upper|lower]",
    "copy" -> "copy :source :dest [force]",
    "merge" -> "merge :col1 :col2 :dest 'separator'",
    "swap" -> "swap :left :right",
    "set-type" -> "set-type :col type [scale] [rounding]",
    "split-to-columns" -> "split-to-columns :col 'regex'",
    "split-to-rows" -> "split-to-rows :col 'regex'",
    "data-model-map-column" -> "data-model-map-column prop:{field=…,type=…} :col",
    "filter-row" -> "filter-row exp:{…} [true|false]",
    "filter-by-regex" -> "filter-by-regex if-matched|if-not-matched :col 'regex'",
    "filter-empty-or-null" -> "filter-empty-or-null :col[,:col]*",
    "fail" -> "fail exp:{…}",
    "send-to-error" -> "send-to-error exp:{…} [metric] [message]",
    "send-to-error-and-continue" -> "send-to-error-and-continue exp:{…} [metric] [message]",
    "flatten" -> "flatten :col[,:col]*",
    "set-variable" -> "set-variable name expression",
    "increment-variable" -> "increment-variable name value expression",
    "uppercase" -> "uppercase :col",
    "lowercase" -> "lowercase :col",
    "titlecase" -> "titlecase :col",
    "trim" -> "trim :col",
    "ltrim" -> "ltrim :col",
    "rtrim" -> "rtrim :col",
    "cut-character" -> "cut-character :source :dest ranges",
    "split" -> "split :source 'delimiter' :col1 :col2",
    "indexsplit" -> "indexsplit :source start end :dest",
    "split-email" -> "split-email :col",
    "split-url" -> "split-url :col",
    "url-encode" -> "url-encode :col",
    "url-decode" -> "url-decode :col",
    "encode" -> "encode base32|base64|hex :col",
    "decode" -> "decode base32|base64|hex :col",
    "find-and-replace" -> "find-and-replace :col[,:col]* s/pat/rep/[flags]",
    "extract-regex-groups" -> "extract-regex-groups :col 'regex'",
    "fill-null-or-empty" -> "fill-null-or-empty :col value",
    "hash" -> "hash :col algorithm [encode]",
    "mask-number" -> "mask-number :col 'pattern'",
    "mask-shuffle" -> "mask-shuffle :col",
    "generate-uuid" -> "generate-uuid :col",
    "text-distance" -> "text-distance method :col1 :col2 :dest",
    "text-metric" -> "text-metric method :col1 :col2 :dest",
    "stemming" -> "stemming :col",
    "set-column" -> "set-column :col exp:{…}",
    "quantize" -> "quantize :source :dest lo:hi=label[,lo:hi=label]*",
    "invoke-http" -> "invoke-http url :col[,:col]* [headers]",
    "format-date" -> "format-date :col format",
    "format-datetime" -> "format-datetime :col format",
    "format-unix-timestamp" -> "format-unix-timestamp :col format",
    "diff-date" -> "diff-date :col1 :col2 :dest",
    "current-datetime" -> "current-datetime :col [zone]",
    "datetime-to-timestamp" -> "datetime-to-timestamp :col [zone]",
    "timestamp-to-datetime" -> "timestamp-to-datetime :col [zone]",
    "catalog-lookup" -> "catalog-lookup catalog :col",
    "table-lookup" -> "table-lookup :col table",
    "asof-join" -> ("asof-join :leftKey :leftTime table :rightKey :rightTime " +
      "payload[,payload]* [backward|forward|nearest] [toleranceSeconds|none] [tiebreakCol]"),
    "range-join" -> "range-join :pointCol table :loCol :hiCol cellWidth",
    "interval-join" ->
      "interval-join :leftLo :leftHi table :rightLo :rightHi cellWidth",
    "validate-standard" -> "validate-standard :col [required-fields]",
    "dedup-exact" -> "dedup-exact :textcol :idcol",
    "dedup-minhash" -> "dedup-minhash :textcol :idcol [threshold]",
    "dedup-images" -> "dedup-images :payloadcol :idcol [maxHamming]",
    "dedup-report" -> "dedup-report :textcol :group1[,:group2...]",
    "lang-id" -> "lang-id :col",
    "token-count" -> "token-count :col",
    "quality-score" -> "quality-score :col",
    "code-features" -> "code-features :col",
    "repetition-signals" -> "repetition-signals :col",
    "filter-repetitive" -> "filter-repetitive :col",
    "strip-markdown" -> "strip-markdown :col",
    "fingerprint" -> "fingerprint :col")
}
