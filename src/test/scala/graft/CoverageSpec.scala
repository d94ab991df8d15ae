package graft

/** Every directive name the reference declares (the 82
  * `public static final String NAME` constants in wrangler-core) must
  * resolve in our Registry — the compile attempt may fail on missing
  * ARGUMENTS, but never with "unknown directive".
  */
class CoverageSpec extends SparkSpec {

  private val referenceDirectives = Seq(
      "catalog-lookup",
      "change-column-case",
      "cleanse-column-names",
      "columns-replace",
      "copy",
      "current-datetime",
      "cut-character",
      "data-model-map-column",
      "datetime-to-timestamp",
      "decode",
      "diff-date",
      "drop",
      "encode",
      "extract-regex-groups",
      "fail",
      "fill-null-or-empty",
      "filter-by-regex",
      "filter-empty-or-null",
      "filter-row",
      "find-and-replace",
      "flatten",
      "format-as-currency",
      "format-date",
      "format-datetime",
      "generate-uuid",
      "hash",
      "increment-variable",
      "indexsplit",
      "invoke-http",
      "json-path",
      "keep",
      "lowercase",
      "ltrim",
      "mask-number",
      "mask-shuffle",
      "merge",
      "parse-as-avro",
      "parse-as-avro-file",
      "parse-as-csv",
      "parse-as-currency",
      "parse-as-date",
      "parse-as-datetime",
      "parse-as-excel",
      "parse-as-fixed-length",
      "parse-as-hl7",
      "parse-as-json",
      "parse-as-log",
      "parse-as-protobuf",
      "parse-as-simple-date",
      "parse-timestamp",
      "parse-xml-to-json",
      "quantize",
      "rename",
      "rtrim",
      "send-to-error",
      "send-to-error-and-continue",
      "set-charset",
      "set-column",
      "set-headers",
      "set-record-delim",
      "set-type",
      "set-variable",
      "split",
      "split-email",
      "split-to-columns",
      "split-to-rows",
      "split-url",
      "stemming",
      "swap",
      "table-lookup",
      "text-distance",
      "text-metric",
      "timestamp-to-datetime",
      "titlecase",
      "trim",
      "uppercase",
      "url-decode",
      "url-encode",
      "validate-standard",
      "write-as-csv",
      "write-as-json-map",
      "write-as-json-object")

  private def unresolved(names: Seq[String]): Seq[String] =
    names.filter { name =>
      try {
        graft.Registry.compile(graft.api.DirectiveSpec(
          name, Vector(graft.api.TCol("a"), graft.api.TCol("b"),
            graft.api.TCol("c")), ":a :b :c"))
        false
      } catch {
        case e: graft.api.RecipeException =>
          e.getMessage.contains("unknown directive")
        case _: Throwable => false // arg-shape errors are fine
      }
    }

  test("all 82 reference directives resolve in the registry") {
    val missing = unresolved(referenceDirectives)
    assert(missing.isEmpty, s"not registered: ${missing.mkString(", ")}")
  }

  // the engine's own curation surface — every LLM-pipeline and
  // consistent-sampling directive must stay recipe-reachable
  private val curationDirectives = Seq(
    "dedup-exact", "dedup-minhash", "dedup-simhash", "dedup-embedding",
    "dedup-semantic",
    "dedup-spans", "dedup-lines", "dedup-paragraphs", "normalize-url",
    "normalize-unicode", "remove-accents",
    "decontaminate", "contamination-hits", "contamination-hits-scale",
    "decontaminate-spans",
    "chunk-text", "select-budget",
    "lang-id", "token-count", "quality-score", "fingerprint",
    "bpe-token-count", "bpe-encode",
    "redact-pii", "repetition-ratio", "surprisal-score", "bm25-score",
    "quantize-embedding", "dequantize-embedding", "normalize-embedding",
    "hashing-tf",
    "split-sentences",
    "cluster-embeddings", "pool-embeddings", "clean-lines-c4", "gopher-rules",
    "pack-sequences",
    "sample-by-hash", "sample-weighted", "hash-split", "repartition-output",
    "sample-temperature",
    "asof-join", "range-join",
    // session-3 surface: sketches, sessionization, layout, quality
    "sessionize", "profile-distinct", "profile-quantiles", "heavy-hitters",
    "topk-by", "drift-psi", "cluster-zorder", "bucket-quantiles",
    "sample-weighted-group", "quality-report", "sample-group",
    "dedup-exact-incremental", "dedup-minhash-incremental",
    // round-13 surface: multimodal dedup + encoding repair + site keys
    "dedup-images", "dedup-audio", "fix-mojibake", "url-domain",
    "threshold-sweep", "winsorize", "unigram-token-count", "unigram-encode", "corpus-report",
    "compression-ratio", "parse-as-tar", "parse-as-zip", "decompress",
    // round-14 surface: document/feed/mail ingestion + html mining +
    // robust QA signals
    "parse-as-pdf", "parse-as-feed", "parse-as-mbox", "parse-as-eml",
    "parse-as-eml-parts", "extract-html-tables", "extract-html-meta",
    "extract-html-jsonld", "char-entropy", "outlier-mad",
    "robots-sitemaps", "parse-as-subtitles", "parse-yaml-frontmatter",
    "parse-as-docx", "parse-as-pptx", "parse-as-epub", "extract-text",
    "detect-charset", "parse-as-odt", "parse-as-rtf", "strip-latex", "extract-md-tables")

  test("all curation/sampling directives resolve in the registry") {
    val missing = unresolved(curationDirectives)
    assert(missing.isEmpty, s"not registered: ${missing.mkString(", ")}")
  }

  /** Harness-compat gate: the driver's oracle comparator sorts the
    * result with pandas before hashing, and pandas `sort_values` dies
    * on array/map/struct cells (`unhashable type: numpy.ndarray`) —
    * the query then lands in the un-oracle-able bucket with an `err`
    * row instead of a green. Every QueryBank output schema must
    * therefore contain only driver-sortable (atomic) top-level types;
    * a query that needs to expose a vector serializes it (CSV-join for
    * ints, posexplode to scalars for floats) like quantize_embedding /
    * dequantize_embedding / hashing_tf do.
    */
  /** Every registered query must carry a DuckDB oracle — a query
    * without one silently downgrades to the driver's weak rows-only
    * check. The two allow-listed entries are structurally
    * un-oracle-able (random UUIDs; the flagship recipe is checked by
    * the rows>0 smoke plus its own per-directive oracle rows).
    */
  test("every QueryBank entry has an oracle (explicit allow-list aside)") {
    val allowNoOracle = Set("generate_uuid", "baseline_13_directive_recipe")
    val missing = QueryBank.queries.keySet -- QueryBank.oracleSql.keySet --
      allowNoOracle
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every QueryBank output schema is driver-sortable (atomic columns only)") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    val bad = QueryBank.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val nonAtomic = fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      nonAtomic
    }
    assert(bad.isEmpty,
      s"non-sortable top-level columns (driver oracle would error):\n  ${bad.mkString("\n  ")}")
  }
}
