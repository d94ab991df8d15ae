package graft.ops

import graft.api._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parser directives — expand a raw column into structure (SURVEY §2.1).
  *
  * Data-dependent schemas (headerless CSV arity, JSON shape) are
  * resolved by a bounded driver-side sample probe, mirroring the
  * reference service deriving schema from sampled rows
  * (reference: wrangler-service service/directive/DirectivesHandler.java:683-687).
  */
object ParserOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // (reference: wrangler-core directives/parser/CsvParser.java:131-199 —
    // appended col_1..col_n, or header names with cells trimmed and
    // spaces→'_'; the header row itself is dropped from the output)
    case "parse-as-csv" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        // v1 wrote the delimiter unquoted (`parse-as-csv body , true`),
        // which the lexer folds into a comma-list — unfold it here
        val (c, delim, header) = spec.tokens.headOption match {
          case Some(TList(items)) if items.size >= 2 =>
            (items.head.text, ",",
              items.last.text.equalsIgnoreCase("true"))
          case _ =>
            (spec.col(0), spec.optStr(1).getOrElse(","),
              spec.optBool(2, default = false))
        }
        val qd = java.util.regex.Pattern.quote(delim)
        // quote-aware parse for single-char delimiters (RFC-4180 style,
        // like the reference's commons-CSV); regex split otherwise.
        // The from_csv struct is aliased ONCE in its own projection —
        // CollapseProject keeps a multi-referenced non-cheap alias
        // un-inlined, so the CSV parse runs once per row. The previous
        // spelling inlined from_csv into every output column, and the
        // collapsed projection evaluated it n_cols^2 times per row
        // (measured: 25 parses/row on the 13-directive baseline
        // recipe — the recipe's entire hot cost).
        val single = delim.length == 1
        // lazy: the header+regex-split path derives its columns from
        // the header row and never needs the arity probe job
        lazy val n0 = ColumnOps.probeArity(df, split(col(c), qd))
        val structTmp = ColumnOps.freshName(df, "__graft_csv_struct")
        lazy val csvSchema = StructType((1 to n0).map(i =>
          StructField(s"_c$i", StringType)))
        def withParsed(d: DataFrame): DataFrame =
          if (single)
            d.withColumn(structTmp, from_csv(col(c), csvSchema,
              // RFC-4180: "" escapes a quote inside a quoted field
              Map("sep" -> delim, "quote" -> "\"", "escape" -> "\"")))
          else d
        def partCol(i: Int): Column =
          if (single) col(structTmp).getField(s"_c$i")
          else element_at(split(col(c), qd), i)
        def dropTmp(d: DataFrame): DataFrame =
          if (single) d.drop(structTmp) else d
        // reference isHeader heuristic (CsvParser.java:184-199): the
        // first row is a header only if every cell is non-empty and
        // none type-infers to a number/boolean — otherwise it is data
        def looksLikeHeader(cells: Array[String]): Boolean =
          cells.nonEmpty && cells.forall { cell =>
            val t = cell.trim
            t.nonEmpty && t.toDoubleOption.isEmpty &&
              !t.equalsIgnoreCase("true") && !t.equalsIgnoreCase("false")
          }
        // the header can only be the FIRST row (the reference checks
        // once per directive instance, CsvParser.java:146-156), so one
        // limit(1) probe fetches both its rid and its text — never a
        // full scan (the rid identifies the exact row to drop, so a
        // data row whose text equals the header line survives).
        // The probe job and the final filter job MUST see the same
        // physical row→rid assignment. When the upstream plan's layout
        // is stable across re-evaluation (file scan + narrow
        // deterministic ops — PlanStability), both jobs re-derive the
        // identical assignment and NOTHING is materialized: the probe
        // reads one split and the directive streams at any scale. Only
        // an unstable upstream (post-shuffle, sample, nondeterministic
        // expression) needs the pin; there localCheckpoint materializes
        // the whole input once (LocalRDDCheckpointData finalization
        // fills all partitions) — the price of a deterministic header
        // drop over a nondeterministic plan. header=false recipes (the
        // common at-scale path) never build withId and pay nothing.
        val rid = "__graft_hdr_rid"
        lazy val withId = {
          val tagged = df.withColumn(rid, monotonically_increasing_id())
          if (PlanStability.stableLayout(df)) tagged
          else PlanStability.pin(tagged)
        }
        val firstProbe =
          if (header) withId.select(col(rid), col(c).cast(StringType))
            .limit(1).collect().headOption.filter(!_.isNullAt(1))
            .map(r => (r.getLong(0), r.getString(1)))
          else None
        val firstRow = firstProbe.map(_._2)
        if (header && firstRow.exists(h => looksLikeHeader(h.split(qd)))) {
          val headerRaw = firstRow.get
          // header cell cleanup per reference (CsvParser.java:150):
          // trim + collapse internal whitespace runs to one underscore
          val names = headerRaw.split(qd).map(
            _.trim.replaceAll("\\s+", "_"))
          val noHeader = withParsed(
            withId.filter(col(rid) =!= lit(firstProbe.get._1)).drop(rid))
          dropTmp(names.zipWithIndex.foldLeft(noHeader) { case (d, (n, i)) =>
            d.withColumn(n, partCol(i + 1))
          })
        } else {
          // n0 already IS the max arity (one bounded probe job above);
          // the previous second probeArity over the parsed array was a
          // redundant probe job
          dropTmp((1 to n0).foldLeft(withParsed(df)) { (d, i) =>
            d.withColumn(s"${c}_$i", partCol(i))
          })
        }
      }
    }

    // (reference: wrangler-core directives/parser/JsParser.java:97-163 —
    // source col removed; object → flattened `col_key` columns to depth;
    // top-level array → one row per element; primitive → scalar)
    case "parse-as-json" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val depth = spec.optInt(1, default = 1)
        val spark = ctx.spark
        // sample-driven schema inference (bounded scan)
        import spark.implicits._
        val sample = df.select(col(c).cast(StringType)).limit(1000)
          .as[String].filter((s: String) => s != null)
        val inferred = spark.read.json(sample).schema
        if (inferred.isEmpty) df
        else {
          val parsedCol = "__graft_json"
          val parsed = df
            .withColumn(parsedCol, from_json(col(c).cast(StringType),
              // arrays at top level: infer element struct via wrapper
              jsonTopType(spark, df, c, inferred)))
          val isArray = parsed.schema(parsedCol).dataType.isInstanceOf[ArrayType]
          val exploded =
            if (isArray) parsed.withColumn(parsedCol, explode_outer(col(parsedCol)))
            else parsed
          flattenStruct(exploded.drop(c), parsedCol, c, depth)
        }
      }
    }

    // Jayway-style JsonPath extraction (reference: wrangler-core
    // directives/parser/JsPath.java:90). The common `$.a.b[0]` subset
    // maps to native (codegen'd) get_json_object; recursive descent,
    // wildcards, and predicates route to the JsonPathLite interpreter.
    case "json-path" => ColumnOps.simple(spec) { df =>
      val (src, dest) = (spec.col(0), spec.col(1))
      val path0 = spec.str(2)
      val path = if (path0.startsWith("$")) path0 else "$." + path0
      val extracted =
        if (graft.functions.JsonPathLite.needsLite(path))
          graft.functions.JsonPathLite.evalUdf(
            col(src).cast(StringType), lit(path))
        else get_json_object(col(src).cast(StringType), path)
      df.withColumn(dest, extracted)
    }

    // XML → JSON string then same flatten as parse-as-json (reference:
    // wrangler-core directives/xml/XmlToJson.java:84). Conversion uses
    // scala-xml (ships with Spark) in a small deterministic UDF.
    case "parse-xml-to-json" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn(c, XmlSupport.xmlToJsonUdf(col(c).cast(StringType)))
      }
    }

    // v1 parse-as-xml kept the column as a parsed XML handle for the
    // xpath directives (reference: wrangler-core parser/MigrateToV2.java:437-441);
    // our xpath functions evaluate directly on the XML string, so this
    // validates well-formedness (malformed → null) and passes through.
    case "parse-as-xml" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, XmlSupport.xmlValidUdf(col(c).cast(StringType)))
    }

    // native xpath functions (reference v1 ops: wrangler-core
    // parser/MigrateToV2.java:444-460).
    // COST NOTE: each native xpath/xpath-array call re-parses the XML
    // string into a DOM per row per directive. A run of >= 2
    // consecutive xpath pulls from the SAME column is fused by the
    // compiler (Registry.compileAll -> fusedXpaths below) into ONE
    // parse per row; a lone pull keeps the codegen'd native function.
    case "xpath" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(1), xpath_string(col(spec.col(0)), lit(spec.str(2))))
    }
    case "xpath-array" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(1), xpath(col(spec.col(0)), lit(spec.str(2))))
    }

    // fixed widths → col_1..col_n, pure substring math (reference:
    // wrangler-core directives/parser/FixedLengthParser.java:93)
    case "parse-as-fixed-length" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val widths = spec.str(1).split(",").map(_.trim.toInt)
      val offsets = widths.scanLeft(1)(_ + _)
      widths.indices.foldLeft(df) { (d, i) =>
        d.withColumn(s"${c}_${i + 1}", col(c).substr(offsets(i), widths(i)))
      }
    }

    // `parse-as-warc :col` — WARC/WET records (Common Crawl container,
    // ISO 28500): one output row per record, HTTP envelope unwrapped
    // for response records. Gzipped blobs (per-record gzip members)
    // handled transparently. Column holds one shard / record / any
    // concatenation as binary or string.
    case "parse-as-warc" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__warc",
            explode(graft.sources.Warc.parseAllUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_warc_type", col("__warc.warc_type"))
          .withColumn(s"${c}_target_uri", col("__warc.target_uri"))
          .withColumn(s"${c}_date", col("__warc.date"))
          .withColumn(s"${c}_record_id", col("__warc.record_id"))
          .withColumn(s"${c}_content_type", col("__warc.content_type"))
          .withColumn(s"${c}_content_length", col("__warc.content_length"))
          .withColumn(s"${c}_http_status", col("__warc.http_status"))
          .withColumn(s"${c}_http_content_type",
            col("__warc.http_content_type"))
          .withColumn(s"${c}_payload", col("__warc.payload"))
          .withColumn(s"${c}_payload_bytes", col("__warc.payload_bytes"))
          .drop("__warc")
      }
    }

    // `parse-as-tar :col` — POSIX ustar / WebDataset shard members:
    // one output row per regular file (`<col>_name/_size/_payload`).
    // Group downstream by the basename stem to reassemble WebDataset
    // samples (img.jpg + img.cls + img.json).
    case "parse-as-tar" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__tar", explode(graft.sources.Tar.entriesUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_name", col("__tar._1"))
          .withColumn(s"${c}_size", col("__tar._2"))
          .withColumn(s"${c}_payload", col("__tar._3"))
          .drop("__tar")
      }
    }

    // `parse-as-zip :col` — ZIP archive members (JDK inflater): one
    // output row per regular member (`<col>_name/_size/_payload`).
    case "parse-as-zip" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__zip", explode(graft.sources.Zip.entriesUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_name", col("__zip._1"))
          .withColumn(s"${c}_size", col("__zip._2"))
          .withColumn(s"${c}_payload", col("__zip._3"))
          .drop("__zip")
      }
    }

    // `parse-as-7z :col` — 7z archive members (commons-compress sevenz
    // over the bundled tukaani LZMA): one output row per regular
    // member (`<col>_name/_size/_payload`). Copy/LZMA/LZMA2/bzip2
    // coders, encoded headers, solid folders; encrypted or malformed
    // archives degrade to the members decoded so far.
    case "parse-as-7z" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__sz", explode(graft.sources.SevenZip.entriesUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_name", col("__sz._1"))
          .withColumn(s"${c}_size", col("__sz._2"))
          .withColumn(s"${c}_payload", col("__sz._3"))
          .drop("__sz")
      }
    }

    // `parse-as-pdf :col` — PDF page text (pure ISO 32000 object
    // decode + Flate/ASCIIHex/ASCII85 filters + BT/ET text
    // operators): one output row per page (`<col>_page/_text`).
    // Total on garbage — undecodable documents yield zero rows.
    case "parse-as-pdf" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__pdf", explode(graft.sources.Pdf.pagesUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_page", col("__pdf._1"))
          .withColumn(s"${c}_text", col("__pdf._2"))
          .drop("__pdf")
      }
    }

    // `parse-as-sitemap :col` — sitemaps.org urlset/sitemapindex XML
    // to one row per entry (crawl-frontier companion to robots.txt).
    case "parse-as-sitemap" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__sm",
            explode(graft.sources.Warc.parseSitemapUdf(
              col(c).cast(StringType))))
          .drop(c)
          .withColumn(s"${c}_loc", col("__sm.loc"))
          .withColumn(s"${c}_lastmod", col("__sm.lastmod"))
          .withColumn(s"${c}_changefreq", col("__sm.changefreq"))
          .withColumn(s"${c}_priority", col("__sm.priority"))
          .withColumn(s"${c}_is_index", col("__sm.is_index"))
          .drop("__sm")
      }
    }

    // `parse-as-feed :col` — RSS 2.0 / RSS 1.0 / Atom syndication
    // feeds to one row per item (the crawl-frontier companion to
    // parse-as-sitemap; feeds surface new urls fastest).
    case "parse-as-feed" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__fd",
            explode(graft.sources.Warc.parseFeedUdf(
              col(c).cast(StringType))))
          .drop(c)
          .withColumn(s"${c}_feed_type", col("__fd.feed_type"))
          .withColumn(s"${c}_feed_title", col("__fd.feed_title"))
          .withColumn(s"${c}_title", col("__fd.title"))
          .withColumn(s"${c}_link", col("__fd.link"))
          .withColumn(s"${c}_published", col("__fd.published"))
          .withColumn(s"${c}_id", col("__fd.id"))
          .withColumn(s"${c}_summary", col("__fd.summary"))
          .drop("__fd")
      }
    }

    // `parse-as-mbox :col` — RFC 4155 mailbox stream split on From_
    // separator lines (mboxrd unstuffed): one row per raw message in
    // `<col>_message`; chain parse-as-eml for the decoded view.
    case "parse-as-mbox" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn(s"${c}_message",
            explode(graft.sources.Eml.splitMboxUdf(col(c).cast(StringType))))
          .drop(c)
      }
    }

    // `parse-as-eml :col` — RFC 5322/MIME message decode: unfolded
    // headers with RFC 2047 subjects, multipart walk, base64/QP
    // transfer decode. One row per message
    // (`<col>_from/_to/_subject/_date/_text/_html/_n_parts/_attachments`);
    // undecodable messages drop (explode of an empty struct list).
    case "parse-as-eml" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__eml",
            graft.sources.Eml.parseUdf(col(c).cast(StringType)))
          .filter(col("__eml").isNotNull)
          .drop(c)
          .withColumn(s"${c}_from", col("__eml._1"))
          .withColumn(s"${c}_to", col("__eml._2"))
          .withColumn(s"${c}_subject", col("__eml._3"))
          .withColumn(s"${c}_date", col("__eml._4"))
          .withColumn(s"${c}_text", col("__eml._5"))
          .withColumn(s"${c}_html", col("__eml._6"))
          .withColumn(s"${c}_n_parts", col("__eml._7"))
          .withColumn(s"${c}_attachments", col("__eml._8"))
          .drop("__eml")
      }
    }

    // `parse-as-eml-parts :col` — the leaf-part view (one row per
    // MIME part, payload bytes in `<col>_data`): chain parse-as-pdf /
    // parse-as-zip on attachment payloads downstream.
    case "parse-as-eml-parts" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__pt",
            explode(graft.sources.Eml.partsUdf(col(c).cast(StringType))))
          .drop(c)
          .withColumn(s"${c}_content_type", col("__pt._1"))
          .withColumn(s"${c}_filename", col("__pt._2"))
          .withColumn(s"${c}_data", col("__pt._3"))
          .withColumn(s"${c}_text", col("__pt._4"))
          .drop("__pt")
      }
    }

    // `parse-as-docx :col` — Office Open XML word-processing text
    // (ZIP + word/document.xml runs): one row per paragraph
    // (`<col>_para/_text`). No POI; total on garbage.
    case "parse-as-docx" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__dx", explode(graft.sources.Docx.docxUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_para", col("__dx._1"))
          .withColumn(s"${c}_text", col("__dx._2"))
          .drop("__dx")
      }
    }

    // `parse-as-odt :col` — OpenDocument text paragraphs
    // (content.xml text:p/text:h character data): one row per
    // paragraph (`<col>_para/_text`).
    case "parse-as-odt" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__od", explode(graft.sources.Docx.odtUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_para", col("__od._1"))
          .withColumn(s"${c}_text", col("__od._2"))
          .drop("__od")
      }
    }

    // `parse-as-pptx :col` — slide text out of PPTX
    // (ppt/slides/slideN.xml runs, numeric slide order): one row per
    // paragraph (`<col>_slide/_text`).
    case "parse-as-pptx" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__px", explode(graft.sources.Docx.pptxUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_slide", col("__px._1"))
          .withColumn(s"${c}_text", col("__px._2"))
          .drop("__px")
      }
    }

    // `parse-as-epub :col` — e-book chapters in SPINE order (OCF zip
    // → container.xml → OPF manifest/spine → XHTML chapters through
    // the HtmlText extractor): one row per chapter
    // (`<col>_chapter/_title/_text`).
    case "parse-as-epub" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__ep", explode(graft.sources.Epub.extractUdf(bin)))
          .drop(c)
          .withColumn(s"${c}_chapter", col("__ep._1"))
          .withColumn(s"${c}_title", col("__ep._2"))
          .withColumn(s"${c}_text", col("__ep._3"))
          .drop("__ep")
      }
    }

    // `extract-text :col` — the mixed-corpus front door: sniff the
    // binary by magic bytes / container members and route to the
    // right extractor (pdf/docx/pptx/epub/html/text). Appends
    // `<col>_format` + `<col>_text`; unroutable binaries get nulls.
    case "extract-text" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val bin =
          if (df.schema(c).dataType == BinaryType) col(c)
          else col(c).cast(StringType).cast(BinaryType)
        df.withColumn("__xt", graft.sources.Extract.extractAnyUdf(bin))
          .withColumn(s"${c}_format", col("__xt._1"))
          .withColumn(s"${c}_text", col("__xt._2"))
          .drop("__xt", c)
      }
    }

    // (reference: wrangler-core directives/language/SetCharset.java:77)
    case "set-charset" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, decode(col(c), spec.str(1)))
    }

    // Apache/nginx access logs via regexp_extract. The stock
    // common/combined formats use a tuned regex that also splits the
    // request line into method+uri; any OTHER format string is treated
    // as an Apache LogFormat %-directive string and compiled to a
    // generated regex (HttpdLogFormat), matching the reference
    // accepting arbitrary httpdlog formats (reference: wrangler-core
    // directives/parser/ParseLog.java:67,83 — nl.basjes httpdlog)
    case "parse-as-log" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val fmt = spec.optStr(1).getOrElse("combined")
      fmt.toLowerCase match {
        case "common" | "clf" | "combined" =>
          val re = "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"(\\S+) (\\S+)[^\"]*\" " +
            "(\\d{3}) (\\S+)(?: \"([^\"]*)\" \"([^\"]*)\")?.*$"
          val fields = Seq("remote_host", "ident", "auth", "time", "method",
            "uri", "status", "bytes", "referrer", "user_agent")
          // one regex execution per row (native all-groups expression +
          // codegen CSE), not one full match per field
          val groups = org.apache.spark.sql.graftx.functions
            .regex_groups_all(col(c).cast(StringType), re)
          fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
            d.withColumn(s"${c}_$f", groups.getItem(i))
          }
        // the agent log is ONLY an unquoted user-agent, which contains
        // spaces — no %-directive pattern can express capture-to-EOL,
        // so it gets a dedicated regex
        case "agent" =>
          df.withColumn(s"${c}_request_header_user_agent",
            regexp_extract(col(c), "^(.*)$", 1))
        case other =>
          // remaining Apache nicknames expand to their documented
          // format strings; anything else IS a format string
          val resolved = other match {
            case "combinedio" =>
              "%h %l %u %t \"%r\" %>s %b \"%{Referer}i\" \"%{User-Agent}i\" %I %O"
            case "referer" => "%{Referer}i -> %U"
            case _         => fmt
          }
          val (re, fields) = HttpdLogFormat.compile(resolved)
          val groups = org.apache.spark.sql.graftx.functions
            .regex_groups_all(col(c).cast(StringType), re)
          fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
            d.withColumn(s"${c}_$f", groups.getItem(i))
          }
      }
    }

    case _ => null
  })

  /** If the sampled JSON is a top-level array, wrap the inferred struct
    * in an ArrayType so from_json explodes correctly.
    */
  private def jsonTopType(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, c: String, inferred: StructType): DataType = {
    val firstNonNull = df.select(col(c).cast(StringType))
      .filter(col(c).isNotNull).limit(1).collect()
    val isArr = firstNonNull.headOption
      .exists(r => r.getString(0).trim.startsWith("["))
    if (isArr) ArrayType(inferred) else inferred
  }

  /** Flatten a struct column into `prefix_key` scalar columns to `depth`
    * levels; deeper levels stay as struct/array columns.
    */
  def flattenStruct(df: DataFrame, structCol: String, prefix: String,
      depth: Int): DataFrame = {
    df.schema(structCol).dataType match {
      case st: StructType =>
        val cols = df.columns.filterNot(_ == structCol).map(col) ++
          st.fields.map(f => col(structCol).getField(f.name).as(s"${prefix}_${f.name}"))
        val flat = df.select(cols.toSeq: _*)
        if (depth <= 1) flat
        else st.fields.filter(_.dataType.isInstanceOf[StructType]).foldLeft(flat) {
          (d, f) => flattenStruct(d, s"${prefix}_${f.name}", s"${prefix}_${f.name}", depth - 1)
        }
      case _ => // primitive: value back into the source column name
        df.withColumnRenamed(structCol, prefix)
    }
  }

  /** Compiler fusion for a run of >= 2 consecutive xpath/xpath-array
    * directives on the same source column: ONE XpathBundle UDF parses
    * the DOM once per row and evaluates every expression; each
    * directive's output column extracts from the array result. The UDF
    * is marked non-deterministic ONLY to stop projection collapse from
    * inlining it into N copies (one per output) — the plan must carry
    * exactly one parse call. Trade-off: a non-deterministic node also
    * makes PlanStability classify downstream layout as unstable, so a
    * later header-probe/increment-variable would pin — an xpath run
    * feeding those is rare and correctness-safe either way.
    */
  def fusedXpaths(specs: Seq[DirectiveSpec]): PipeOp = new PipeOp {
    def name = s"xpath×${specs.size}(fused)"
    def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
      val src = specs.head.col(0)
      val kinds = specs.map(_.name == "xpath-array")
      val bundle = new XmlSupport.XpathBundle(specs.map(_.str(2)), kinds)
      val u = udf((s: String) => bundle.eval(s)).asNondeterministic()
      val tmp = "__xpath_fused"
      val withTmp = df.withColumn(tmp, u(col(src).cast(StringType)))
      specs.zipWithIndex.foldLeft(withTmp) { case (d, (sp, i)) =>
        val entry = col(tmp).getItem(i)
        d.withColumn(sp.col(1),
          if (kinds(i)) entry else entry.getItem(0))
      }.drop(tmp)
    }
  }
}

/** XML→JSON conversion on scala-xml — a deterministic scalar UDF. */
object XmlSupport {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  def xmlToJson(s: String): String = {
    if (s == null) return null
    try {
      val root = scala.xml.XML.loadString(s)
      s"""{"${root.label}":${nodeToJson(root)}}"""
    } catch { case _: Exception => null }
  }

  private def nodeToJson(n: scala.xml.Node): String = {
    val children = n.child.collect { case e: scala.xml.Elem => e }
    val attrs = n.attributes.asAttrMap.map { case (k, v) =>
      s""""@$k":${quote(v)}""" }
    if (children.isEmpty && attrs.isEmpty) quote(n.text)
    else {
      val grouped = children.groupBy(_.label).map { case (label, ns) =>
        if (ns.size == 1) s""""$label":${nodeToJson(ns.head)}"""
        else s""""$label":[${ns.map(nodeToJson).mkString(",")}]"""
      }
      val content =
        if (children.isEmpty && n.text.nonEmpty) Seq(s""""#text":${quote(n.text)}""")
        else Seq.empty
      (attrs ++ grouped ++ content).mkString("{", ",", "}")
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  val xmlToJsonUdf: UserDefinedFunction = udf(xmlToJson _)

  /** Pass through well-formed XML, null otherwise (Spark's xpath
    * expressions raise fatal parse errors on malformed input, so
    * validation happens here first).
    */
  def xmlValid(s: String): String =
    if (s == null) null
    else try { scala.xml.XML.loadString(s); s }
    catch { case _: Exception => null }

  val xmlValidUdf: UserDefinedFunction = udf(xmlValid _)

  /** One-DOM-parse evaluation of several XPath expressions — the fused
    * kernel behind the compiler's xpath-run fusion (Registry.compileAll).
    * Replicates the per-expression semantics of Spark's native
    * xpath_string / xpath functions (Hive UDFXPathUtil lineage, which
    * re-parses the XML string on EVERY expression evaluation):
    * scalar = XPathConstants.STRING (string-value of the first match,
    * "" when nothing matches), array = NODESET mapped through
    * getNodeValue (text/attribute nodes yield their text, element nodes
    * yield null — evaluate text()/@attr paths, like the native fn);
    * malformed XML propagates a parse error like the native
    * expressions; null input yields null for every output. Parity is
    * asserted against the native functions in OpsSpec.
    *
    * Per-task state (builder, compiled expressions) is rebuilt lazily
    * after deserialization; a task is single-threaded so the shared
    * DocumentBuilder is safe.
    *
    * PERF: the DOM parse is ~6us/row, but a javax.xml.xpath
    * evaluate() costs ~40us/row (Xalan rebuilds its DTM view of the
    * document per call). Simple absolute location paths — /a/b,
    * /a/b/@attr, /a/b/text(); by far the common case — are therefore
    * compiled to a direct depth-first DOM walk with the same data
    * model (adjacent text/CDATA chunks merge into one logical text
    * node, as XPath requires). Anything else (predicates, //, *, ':',
    * functions) falls back to the compiled javax expression. Parity of
    * both paths is asserted against the native functions in OpsSpec.
    */
  final class XpathBundle(paths: Seq[String], arrayKind: Seq[Boolean])
      extends Serializable {
    @transient private lazy val compiled = {
      val xp = javax.xml.xpath.XPathFactory.newInstance().newXPath()
      paths.map(xp.compile).toIndexedSeq
    }
    // element steps + terminal kind per path; None = not simple
    private val simple: IndexedSeq[Option[(Array[String], String)]] =
      paths.map(XmlSupport.parseSimplePath).toIndexedSeq
    @transient private lazy val builder = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      // the native functions match element names LITERALLY inside a
      // default-xmlns document ('/r/v' hits <r xmlns=...><v>) — i.e.
      // their internal parse is NOT namespace-aware; asserted against
      // the native functions in the OpsSpec parity test
      f.setNamespaceAware(false)
      f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
      // hardened like the native util: DTDs rejected, no entity fetches
      try f.setFeature(
        "http://apache.org/xml/features/disallow-doctype-decl", true)
      catch { case _: Exception => () }
      val b = f.newDocumentBuilder()
      b.setErrorHandler(null) // no [Fatal Error] stderr spam; throw only
      b
    }
    def eval(xml: String): Seq[Seq[String]] = {
      if (xml == null) return null
      builder.reset()
      val doc = builder.parse(
        new org.xml.sax.InputSource(new java.io.StringReader(xml)))
      paths.indices.map { i =>
        simple(i) match {
          case Some((elems, term)) =>
            val hits = XmlSupport.walkSimple(doc, elems, term,
              all = arrayKind(i))
            if (arrayKind(i))
              hits.map {
                case e: org.w3c.dom.Element => null
                case s: String => s
              }
            else Seq(hits.headOption.map {
              case e: org.w3c.dom.Element => e.getTextContent
              case s: String => s
            }.getOrElse(""))
          case None =>
            if (arrayKind(i)) {
              val nl = compiled(i)
                .evaluate(doc, javax.xml.xpath.XPathConstants.NODESET)
                .asInstanceOf[org.w3c.dom.NodeList]
              (0 until nl.getLength).map(j => nl.item(j).getNodeValue)
            } else {
              Seq(compiled(i)
                .evaluate(doc, javax.xml.xpath.XPathConstants.STRING)
                .asInstanceOf[String])
            }
        }
      }
    }
  }

  /** Recognize a simple absolute location path: /e1/e2/.../en with an
    * optional terminal `@attr` or `text()`. Returns the element steps
    * and terminal kind ("elem" | "text" | attr name prefixed "@").
    * Steps with predicates, wildcards, '//', namespace prefixes, or
    * functions return None (javax XPath fallback).
    */
  private[graft] def parseSimplePath(path: String): Option[(Array[String], String)] = {
    if (path == null || !path.startsWith("/") || path.contains("//"))
      return None
    val parts = path.stripPrefix("/").split("/", -1)
    if (parts.isEmpty || parts.exists(_.isEmpty)) return None
    val name = "^[A-Za-z_][A-Za-z0-9_.\\-]*$".r
    val (steps, term) = parts.last match {
      case "text()" => (parts.dropRight(1), "text")
      case a if a.startsWith("@") => (parts.dropRight(1), a)
      case _ => (parts, "elem")
    }
    if (steps.isEmpty) return None
    if (term.startsWith("@") &&
        !name.pattern.matcher(term.substring(1)).matches()) return None
    if (steps.forall(s => name.pattern.matcher(s).matches()))
      Some((steps, term))
    else None
  }

  /** Depth-first walk matching a simple path against the DOM, in
    * document order. Yields, per XPath data model: matched Elements
    * (terminal "elem"), attribute value Strings ("@attr"), or merged
    * adjacent text/CDATA run Strings ("text"). `all=false` stops at
    * the first hit (STRING semantics).
    */
  private[graft] def walkSimple(doc: org.w3c.dom.Document,
      elems: Array[String], term: String,
      all: Boolean): Seq[AnyRef] = {
    import org.w3c.dom.{Element, Node}
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    def emit(el: Element): Boolean = { // true = stop traversal
      term match {
        case "elem" => out += el; !all
        case "text" =>
          // XPath data model: adjacent text/CDATA chunks form one
          // logical text node; a comment or child element ends the run.
          // Replicating the native functions exactly (probed):
          // NODESET getNodeValue yields only the FIRST chunk of a run,
          // STRING yields the whole merged run
          var c = el.getFirstChild
          val run = new java.lang.StringBuilder
          var firstChunk: String = null
          var inRun = false
          var stop = false
          def endRun(): Unit = if (inRun) {
            out += (if (all) firstChunk else run.toString)
            run.setLength(0); firstChunk = null; inRun = false
            if (!all) stop = true
          }
          while (c != null && !stop) {
            c.getNodeType match {
              case Node.TEXT_NODE | Node.CDATA_SECTION_NODE =>
                if (!inRun) firstChunk = c.getNodeValue
                run.append(c.getNodeValue); inRun = true
              case _ => endRun()
            }
            c = c.getNextSibling
          }
          endRun()
          stop
        case attr =>
          val a = el.getAttributeNode(attr.substring(1))
          if (a != null) { out += a.getValue; !all } else false
      }
    }
    def rec(el: Element, idx: Int): Boolean = {
      if (el.getTagName != elems(idx)) false
      else if (idx == elems.length - 1) emit(el)
      else {
        var c = el.getFirstChild
        var stop = false
        while (c != null && !stop) {
          c match {
            case e: Element => stop = rec(e, idx + 1)
            case _ => ()
          }
          c = c.getNextSibling
        }
        stop
      }
    }
    val root = doc.getDocumentElement
    if (root != null) rec(root, 0)
    out.toSeq
  }
}
