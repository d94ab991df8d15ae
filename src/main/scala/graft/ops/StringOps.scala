package graft.ops

import graft.api._
import graft.functions.Udfs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String / masking / encoding directives (SURVEY §2.5).
  * Native `Column` expressions wherever Spark has the semantics; the
  * UDF island ([[graft.functions.Udfs]]) only for mask/distance/stemmer/
  * base32 — exactly the reference's library-bound set.
  */
object StringOps {

  /** The reference trims an explicit 24-char Unicode whitespace set, not
    * just ASCII space (reference: wrangler-core
    * directives/transformation/Trimmer.java:29-56).
    */
  private val WS =
    "[\\t\\n\\x0B\\f\\r \\u0085\\u00A0\\u1680\\u180E\\u2000-\\u200A" +
      "\\u2028\\u2029\\u202F\\u205F\\u3000]"

  def trimBoth(c: Column): Column =
    regexp_replace(regexp_replace(c, s"^$WS+", ""), s"$WS+$$", "")

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {
    case "uppercase" => inPlace(spec)(upper)
    case "lowercase" => inPlace(spec)(lower)
    case "titlecase" => inPlace(spec)(initcap)
    case "trim"      => inPlace(spec)(trimBoth)
    case "ltrim"     => inPlace(spec)(c => regexp_replace(c, s"^$WS+", ""))
    case "rtrim"     => inPlace(spec)(c => regexp_replace(c, s"$WS+$$", ""))

    // UNIX `cut -c`-style ranges (reference: wrangler-core
    // directives/transformation/CharacterCut.java:75)
    case "cut-character" => ColumnOps.simple(spec) { df =>
      val src = col(spec.col(0))
      val ranges = parseCutRanges(spec.str(2))
      val pieces = ranges.map {
        case (start, Some(end)) => src.substr(start, end - start + 1)
        case (start, None)      => src.substr(lit(start), length(src))
      }
      df.withColumn(spec.col(1),
        if (pieces.size == 1) pieces.head else concat(pieces: _*))
    }

    // deprecated v1 split: first/rest on first delimiter occurrence
    // (reference: wrangler-core directives/transformation/Split.java:80)
    case "split" => ColumnOps.simple(spec) { df =>
      val src = col(spec.col(0))
      val d = spec.str(1)
      val qd = java.util.regex.Pattern.quote(d)
      df.withColumn(spec.col(2),
          when(src.contains(d), substring_index(src, d, 1)).otherwise(src))
        .withColumn(spec.col(3),
          when(src.contains(d),
            expr(s"substring(${fq(spec.col(0))}, " +
              s"instr(${fq(spec.col(0))}, '${d.replace("'", "\\'")}') + ${d.length})"))
            .otherwise(lit(null).cast(StringType)))
    }

    // (reference: wrangler-core directives/transformation/IndexSplit.java:82)
    case "indexsplit" => ColumnOps.simple(spec) { df =>
      val (start, end) = (spec.int(1), spec.int(2))
      df.withColumn(spec.col(3), col(spec.col(0)).substr(start, end - start + 1))
    }

    // (reference: wrangler-core directives/transformation/SplitEmail.java:72)
    case "split-email" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val src = col(c)
      val valid = src.isNotNull && src.contains("@")
      df.withColumn(s"${c}_account",
          when(valid, substring_index(src, "@", 1)))
        .withColumn(s"${c}_domain",
          when(valid, substring_index(src, "@", -1)))
    }

    // appends 7 parts; null input → all null
    // (reference: wrangler-core directives/transformation/SplitURL.java:89-108)
    // One URI parse per row: url_parts is a native struct expression;
    // codegen CSE computes it once and the seven GetStructField reads
    // are free (was: 8 independent parse_url calls re-parsing the URL).
    case "split-url" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val parts = org.apache.spark.sql.graftx.functions.url_parts(col(c))
      df.withColumn(s"${c}_protocol", parts.getField("protocol"))
        .withColumn(s"${c}_authority", parts.getField("authority"))
        .withColumn(s"${c}_host", parts.getField("host"))
        .withColumn(s"${c}_port", parts.getField("port"))
        .withColumn(s"${c}_path", parts.getField("path"))
        .withColumn(s"${c}_file", parts.getField("file"))
        .withColumn(s"${c}_query", parts.getField("query"))
    }

    case "url-encode" => inPlace(spec)(url_encode)
    case "url-decode" => inPlace(spec)(url_decode)

    // `normalize-unicode :col [NFC|NFD|NFKC|NFKD]` — canonical Unicode
    // normalization (default NFC): composed vs decomposed spellings of
    // the same text ("é" as one codepoint vs e+combining-acute) become
    // one byte sequence, the prerequisite for exact/hash dedup keys on
    // multilingual corpora. Map-only UDF over java.text.Normalizer.
    case "normalize-unicode" => ColumnOps.simple(spec) { df =>
      val form = spec.optStr(1).getOrElse("NFC").toUpperCase
      require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
        s"normalize-unicode: unknown form '$form' (NFC|NFD|NFKC|NFKD)")
      df.withColumn(spec.col(0),
        Udfs.normalizeUnicodeUdf(col(spec.col(0)).cast(StringType), lit(form)))
    }

    // `remove-accents :col` — strip combining diacritical marks after
    // NFD decomposition ("café" -> "cafe"); the standard
    // accent-insensitive matching/dedup-key transform. Map-only.
    case "remove-accents" => inPlace(spec)(c =>
      Udfs.removeAccentsUdf(c.cast(StringType)))

    // `detect-charset :col` — sniff raw text bytes (BOM → strict
    // UTF-8 → BOM-less UTF-16 shape → windows-1252 fallback) into
    // `<col>_charset`; compose with set-charset for the decode.
    case "detect-charset" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val bin =
        if (df.schema(c).dataType == org.apache.spark.sql.types.BinaryType)
          col(c)
        else col(c).cast(org.apache.spark.sql.types.StringType)
          .cast(org.apache.spark.sql.types.BinaryType)
      df.withColumn(s"${c}_charset",
        graft.functions.Udfs.detectCharsetUdf(bin))
    }

    // `fix-mojibake :col` — repair UTF-8 text misdecoded as
    // cp1252/Latin-1 ("cafÃ©" -> "café", "donâ€™t" -> "don’t"), to a
    // fixed point for double-encoded crawls; clean text, pure ASCII
    // and genuine Latin-1 prose pass through unchanged (a repair is
    // only accepted when the re-encoded bytes form valid multi-byte
    // UTF-8). Map-only.
    case "fix-mojibake" => inPlace(spec)(c =>
      Udfs.fixMojibakeUdf(c.cast(StringType)))

    // appends `<col>_encode_<method>` (reference: wrangler-core
    // directives/transformation/Encode.java:104)
    case "encode" => ColumnOps.simple(spec) { df =>
      val method = spec.str(0).toLowerCase
      val c = spec.col(1)
      val enc = method match {
        case "base64" => base64(col(c).cast(BinaryType))
        case "base32" => Udfs.base32EncodeUdf(col(c).cast(BinaryType))
        case "hex"    => lower(hex(col(c).cast(BinaryType)))
        case other    => throw new RecipeException(s"encode: unknown method $other")
      }
      df.withColumn(s"${c}_encode_$method", enc)
    }

    case "decode" => ColumnOps.simple(spec) { df =>
      val method = spec.str(0).toLowerCase
      val c = spec.col(1)
      val dec = method match {
        case "base64" => unbase64(col(c))
        case "base32" => Udfs.base32DecodeUdf(col(c))
        case "hex"    => unhex(col(c))
        case other    => throw new RecipeException(s"decode: unknown method $other")
      }
      // decoded bytes surfaced as UTF-8 text, the common downstream use
      df.withColumn(s"${c}_decode_$method", dec.cast(StringType))
    }

    // `decompress :col [gzip|zlib|deflate]` — inflate a compressed
    // binary column through the JDK inflater (total: malformed input
    // and over-budget bombs yield null). Crawl payloads and log dumps
    // often arrive per-row compressed; appends `<col>_inflated`.
    case "decompress" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val method = spec.optStr(1).getOrElse("gzip").toLowerCase
      require(Set("gzip", "zlib", "deflate", "zstd", "bzip2", "lz4",
          "snappy")(method),
        s"decompress: unknown method '$method' " +
          "(gzip|zlib|deflate|zstd|bzip2|lz4|snappy)")
      df.withColumn(s"${c}_inflated",
        Udfs.decompressUdf(col(c).cast(BinaryType), lit(method)))
    }

    // full sed s/…/…/flags over one or more columns (reference:
    // wrangler-core directives/transformation/FindAndReplace.java:74)
    case "find-and-replace" | "sed" => ColumnOps.simple(spec) { df =>
      val cols = spec.cols(0)
      val (pat, rep, flags) = ColumnOps.splitSed(spec.rawFrom(1))
      val rx = if (flags.contains('i')) "(?i)" + pat else pat
      // sed backrefs \1 → Java $1
      val javaRep = rep.replaceAll("\\\\(\\d)", "\\$$1")
      cols.foldLeft(df) { (d, c) =>
        d.withColumn(c, regexp_replace(col(c), rx, javaRep))
      }
    }

    // appends one column per regex group (reference: wrangler-core
    // directives/transformation/ExtractRegexGroups.java:75)
    case "extract-regex-groups" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val re = spec.str(1)
      val n = java.util.regex.Pattern.compile(re).matcher("").groupCount()
      // one regex execution per row for all n groups (CSE'd native expr)
      val groups = org.apache.spark.sql.graftx.functions
        .regex_groups_all(col(c).cast(StringType), re)
      (1 to n).foldLeft(df) { (d, i) =>
        d.withColumn(s"${c}_$i", groups.getItem(i - 1))
      }
    }

    // (reference: wrangler-core directives/transformation/FillNullOrEmpty.java:74)
    case "fill-null-or-empty" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val v = spec.str(1)
      df.withColumn(c,
        when(col(c).isNull || col(c).cast(StringType) === "", lit(v))
          .otherwise(col(c)))
    }

    // replaces col with digest; encode=true → hex string (reference:
    // wrangler-core directives/transformation/MessageHash.java:157)
    case "hash" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val algo = spec.str(1).toUpperCase
      val hexed = algo match {
        case "MD5"     => md5(col(c).cast(BinaryType))
        case "SHA-1" | "SHA1" | "SHA" => sha1(col(c).cast(BinaryType))
        case "SHA-224" => sha2(col(c).cast(BinaryType), 224)
        case "SHA-256" => sha2(col(c).cast(BinaryType), 256)
        case "SHA-384" => sha2(col(c).cast(BinaryType), 384)
        case "SHA-512" => sha2(col(c).cast(BinaryType), 512)
        case other     => Udfs.digestHexUdf(col(c).cast(StringType), lit(other))
      }
      val encodeHex = spec.optBool(2, default = true)
      df.withColumn(c, if (encodeHex) hexed else unhex(hexed))
    }

    // native codegen'd expression (not a UDF) — keeps masking-heavy
    // recipes inside whole-stage codegen
    case "mask-number" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, org.apache.spark.sql.graftx.functions.mask_number(
        col(c).cast(StringType), lit(spec.str(1))))
    }

    case "mask-shuffle" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, Udfs.maskShuffleUdf(col(c).cast(StringType)))
    }

    // (reference: wrangler-core directives/transformation/GenerateUUID.java:70)
    case "generate-uuid" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(0), uuid())
    }

    case "text-distance" => ColumnOps.simple(spec) { df =>
      val method = spec.str(0)
      val out = method.toLowerCase match {
        case "levenshtein" => // native, codegen'd
          levenshtein(col(spec.col(1)).cast(StringType),
            col(spec.col(2)).cast(StringType)).cast(DoubleType)
        case _ => Udfs.textDistanceUdf(lit(method),
          col(spec.col(1)).cast(StringType), col(spec.col(2)).cast(StringType))
      }
      df.withColumn(spec.col(3), out)
    }

    case "text-metric" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(3), Udfs.textMetricUdf(lit(spec.str(0)),
        col(spec.col(1)).cast(StringType), col(spec.col(2)).cast(StringType)))
    }

    // Porter-stem whitespace tokens → `<col>_porter` array (reference:
    // wrangler-core directives/nlp/Stemming.java:75)
    case "stemming" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(s"${c}_porter", Udfs.stemUdf(col(c).cast(StringType)))
    }

    // numeric ranges lo:hi=label (reference: wrangler-core
    // directives/transformation/Quantization.java:84-129)
    case "quantize" => ColumnOps.simple(spec) { df =>
      val src = col(spec.col(0)).cast(DoubleType)
      val ranges = parseQuantRanges(spec.rawFrom(2))
      val out = ranges.foldLeft(lit(null).cast(StringType)) {
        case (acc, (lo, hi, label)) =>
          when(src >= lo && src < hi, lit(label)).otherwise(acc)
      }
      df.withColumn(spec.col(1), out)
    }

    case _ => null
  })

  // -- helpers --------------------------------------------------------

  private def inPlace(spec: DirectiveSpec)(f: Column => Column): PipeOp =
    ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, f(col(c)))
    }

  private def fq(c: String): String = s"`$c`"

  /** `1-3,5,7-9,12-` cut ranges → (start, endOpt) list (1-based). */
  private[ops] def parseCutRanges(rangesTxt: String): Seq[(Int, Option[Int])] =
    rangesTxt.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { r =>
      if (r.contains("-")) {
        val Array(a, b) = r.split("-", 2)
        val start = if (a.isEmpty) 1 else a.toInt
        (start, if (b.isEmpty) None else Some(b.toInt))
      } else (r.toInt, Some(r.toInt))
    }

  /** `lo:hi=label,lo:hi=label,…` quantize ranges. */
  private[ops] def parseQuantRanges(txt: String): Seq[(Double, Double, String)] =
    txt.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { r =>
      val eq = r.lastIndexOf('=')
      if (eq < 0) throw new RecipeException(s"quantize: bad range '$r'")
      val label = stripQ(r.drop(eq + 1).trim)
      val Array(lo, hi) = r.take(eq).split(":", 2)
      (lo.trim.toDouble, hi.trim.toDouble, label)
    }

  private def stripQ(s: String): String =
    if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
      s.substring(1, s.length - 1) else s
}
