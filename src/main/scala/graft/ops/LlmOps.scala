package graft.ops

import graft.api._
import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-pipeline directives: the dedup/text-analysis surface exposed in
  * recipe syntax, so cleaning recipes can mix classic wrangling with
  * training-data curation (`dedup-exact :text :doc_id; lang-id :text;`).
  */
object LlmOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // optional third column = numeric priority: keep the HIGHEST
    // priority copy per content group (ties -> smallest id) instead of
    // the smallest id — the keep-longest/keep-best-quality policy
    case "dedup-exact" => ColumnOps.simple(spec) { df =>
      spec.optCol(2) match {
        case Some(prio) => Dedup.exactKeepBest(df, spec.col(0), spec.col(1), prio)
        case None => Dedup.exact(df, spec.col(0), spec.col(1))
      }
    }

    // `dedup-report :text :group1[,:group2...]` — per-group duplication
    // telemetry (n_docs, n_distinct, dup_frac) using the exact-dedup
    // normalize kernel; the cost estimate before paying for a dedup.
    case "dedup-report" => ColumnOps.simple(spec) { df =>
      Dedup.dupReport(df, spec.col(0), spec.cols(1))
    }

    // `dedup-lines :text :id [minChars]` — corpus-wide exact line
    // dedup: any line >= minChars chars repeated anywhere keeps only
    // its global first occurrence (CCNet/Dolma-style line dedup)
    case "dedup-lines" => ColumnOps.simple(spec) { df =>
      graft.llm.SpanDedup.removeDuplicatedLines(df, spec.col(0), spec.col(1),
        minChars = spec.optStr(2).map(_.toInt).getOrElse(30))
    }

    // `dedup-paragraphs :text :id [minChars]` — same global keep-first
    // exact dedup, but the unit is a blank-line-separated paragraph
    case "dedup-paragraphs" => ColumnOps.simple(spec) { df =>
      graft.llm.SpanDedup.removeDuplicatedLines(df, spec.col(0), spec.col(1),
        minChars = spec.optStr(2).map(_.toInt).getOrElse(30), delim = "\n\n")
    }

    // `normalize-url :col [extra,params]` — canonical URL dedup key:
    // lowercase scheme/host, strip www./default port/fragment/tracking
    // params, sort query pairs, collapse slashes (in place). The
    // optional second argument is a CSV of additional query-param names
    // to drop (e.g. `ref` on corpora where it is attribution, not
    // content selection).
    case "normalize-url" => ColumnOps.simple(spec) { df =>
      val src = col(spec.col(0)).cast(org.apache.spark.sql.types.StringType)
      val normed = spec.optStr(1) match {
        case Some(extra) =>
          graft.functions.Udfs.normalizeUrlDropUdf(src, lit(extra))
        case None => graft.functions.Udfs.normalizeUrlUdf(src)
      }
      df.withColumn(spec.col(0), normed)
    }

    // `url-domain :col` — append `<col>_domain` = the registrable
    // domain (eTLD+1) of a URL or bare host, by the publicsuffix.org
    // algorithm over a bundled rule snapshot: the per-SITE aggregation
    // key crawl curation groups on (domain quotas via sample-group,
    // per-site dedup, spam-domain blocklists). Map-only.
    case "url-domain" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(s"${c}_domain", graft.functions.Udfs
        .registrableDomainUdf(col(c).cast(org.apache.spark.sql.types.StringType)))
    }

    // optional fourth column = numeric priority: cluster verified
    // near-dup pairs into connected components and keep the HIGHEST
    // priority copy per component (ties -> smallest id) — the same
    // keep-longest/keep-best policy dedup-exact offers, lifted to
    // near-duplicates
    case "dedup-minhash" => ColumnOps.simple(spec) { df =>
      val threshold = spec.optStr(2).map(_.toDouble).getOrElse(0.7)
      spec.optCol(3) match {
        case Some(prio) => Dedup.minhashDedupKeepBest(df, spec.col(0),
          spec.col(1), prio, threshold = threshold)
        case None =>
          Dedup.minhashDedup(df, spec.col(0), spec.col(1), threshold = threshold)
      }
    }

    case "dedup-simhash" => ColumnOps.simple(spec) { df =>
      Dedup.simhashDedup(df, spec.col(0), spec.col(1),
        maxHamming = spec.optStr(2).map(_.toInt).getOrElse(3))
    }

    // `dedup-images :payload :id [maxHamming]` — perceptual near-dup
    // image dedup over a binary column: dHash from the real decodes,
    // banded-Hamming pairs, keep smallest id (undecodable payloads
    // can't match anything and always survive)
    case "dedup-images" => ColumnOps.simple(spec) { df =>
      graft.llm.ImageHash.imageDedup(df, spec.col(0), spec.col(1),
        maxHamming = spec.optStr(2).map(_.toInt).getOrElse(3))
    }

    // `dedup-audio :payload :id [maxHamming]` — perceptual near-dup
    // audio dedup over a binary column: gain-invariant envelope hash
    // from the real PCM decode, the same banded-Hamming machinery as
    // dedup-images, keep smallest id (undecodable payloads can't match
    // anything and always survive)
    case "dedup-audio" => ColumnOps.simple(spec) { df =>
      graft.llm.AudioHash.audioDedup(df, spec.col(0), spec.col(1),
        maxHamming = spec.optStr(2).map(_.toInt).getOrElse(3))
    }

    // content col first, id second — same order as the other dedup-*
    case "dedup-embedding" => ColumnOps.simple(spec) { df =>
      Dedup.embeddingDedup(df, idCol = spec.col(1), vecCol = spec.col(0),
        threshold = spec.optStr(2).map(_.toDouble).getOrElse(0.9))
    }

    // `clean-lines-c4 :text [minWords] [minSentences]` — C4-style line
    // retention (terminal punctuation, >=minWords words, no
    // "javascript") + page blanking (lorem ipsum / '{' / too few
    // sentences -> ''); compose with filter-empty-or-null
    // `extract-html-text :col` — boilerplate-stripping HTML -> text
    // (the WET-conversion step for web corpora): drops script/style/
    // head subtrees, block tags become line boundaries, entities
    // decoded, whitespace collapsed. Appends <col>_title, <col>_text.
    case "extract-html-text" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val ex = graft.llm.HtmlText.extractUdf(
        col(c).cast(org.apache.spark.sql.types.StringType))
      df.withColumn("__html", ex)
        .withColumn(s"${c}_title", col("__html.title"))
        .withColumn(s"${c}_text", col("__html.text"))
        .drop("__html")
    }

    // `blocklist :col 'p1,p2,...'` — Aho-Corasick multi-pattern scan
    // (case-insensitive): appends <col>_blocklist_hits (ALL occurrence
    // positions, overlapping included) and <col>_blocked. O(text+hits)
    // regardless of pattern count — the shape a thousands-strong term
    // list needs; the automaton builds once and ships in the closure.
    case "blocklist" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val patterns = spec.str(1).split(",").map(_.trim).filter(_.nonEmpty)
      require(patterns.nonEmpty, "blocklist: empty pattern list")
      val ac = graft.llm.MultiMatch.build(patterns.toSeq)
      val hitsUdf = org.apache.spark.sql.functions.udf(
        (t: String) => ac.countHits(t))
      df.withColumn(s"${c}_blocklist_hits",
          hitsUdf(col(c).cast(org.apache.spark.sql.types.StringType)))
        .withColumn(s"${c}_blocked", col(s"${c}_blocklist_hits") > 0)
    }

    // `code-features :col` — per-file code-corpus curation signals
    // (line shape, comment-line fraction, alphanumeric density, the
    // generated-file marker), appended as <col>_<feature>. Pure
    // Catalyst Columns, no UDF, no shuffle.
    case "code-features" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val t = col(c).cast(org.apache.spark.sql.types.StringType)
      graft.llm.TextAnalysis.codeFeatures(t).foldLeft(df) {
        case (d, (n2, cc)) => d.withColumn(s"${c}_$n2", cc)
      }
    }

    // `repetition-signals :col` — the Gopher repetition-filter
    // signals (duplicate line/paragraph instances and chars, top
    // 2/3-gram mass, duplicate 5-grams, bullet/ellipsis lines) as
    // exact integer columns <col>_<field>
    case "repetition-signals" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val sig = graft.llm.TextAnalysis.repetitionSignalsUdf(
        col(c).cast(org.apache.spark.sql.types.StringType))
      df.withColumn("__rep", sig)
        .select(col("*") +: Seq("n_chars", "n_lines", "n_dup_lines",
          "dup_line_chars", "n_paras", "n_dup_paras", "dup_para_chars",
          "n_words", "n_alpha_words", "n_bullet_lines",
          "n_ellipsis_lines", "top2gram_count", "top2gram_chars",
          "top3gram_count", "top3gram_chars", "dup5gram_count",
          "n_5grams").map(f => col("__rep")(f).as(s"${c}_$f")): _*)
        .drop("__rep")
    }

    // `filter-repetitive :col` — apply the Gopher repetition gate:
    // keep rows whose text passes every published threshold (integer
    // cross-multiplied, no float compares); null text keeps
    case "filter-repetitive" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val sig = graft.llm.TextAnalysis.repetitionSignalsUdf(
        col(c).cast(org.apache.spark.sql.types.StringType))
      df.withColumn("__rep", sig)
        .where(graft.llm.TextAnalysis.repetitionKeep(col("__rep")))
        .drop("__rep")
    }

    // `strip-markdown :col` — markdown to plain text as <col>_plain:
    // fenced code walled off verbatim (split on ```), the prose
    // regexp_replace chain on the outside segments. Pure Catalyst,
    // no UDF.
    case "strip-markdown" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(s"${c}_plain", graft.llm.TextAnalysis.stripMarkdown(
        col(c).cast(org.apache.spark.sql.types.StringType)))
    }

    // `robots-allowed :robotsCol :pathCol [agent]` — RFC 9309 verdict
    // as a boolean column <pathCol>_allowed (crawl politeness gate).
    case "robots-allowed" => ColumnOps.simple(spec) { df =>
      val robots = spec.col(0)
      val path = spec.col(1)
      val agent = spec.optStr(2).getOrElse("*")
      df.withColumn(s"${path}_allowed", graft.llm.Robots.allowedUdf(
        col(robots).cast(org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.functions.lit(agent),
        col(path).cast(org.apache.spark.sql.types.StringType)))
    }

    // `extract-html-links :col` — all <a href> targets as an array
    // column (crawl frontier / link-graph input).
    case "extract-html-links" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(s"${c}_links", graft.llm.HtmlText.extractLinksUdf(
        col(c).cast(org.apache.spark.sql.types.StringType)))
    }

    // `extract-html-tables :col` — every <table> cell as a row
    // (`<col>_table/_row/_col/_is_header/_cell`): relational data
    // mining from crawl HTML.
    case "extract-html-tables" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__tc", explode(graft.llm.HtmlText.extractTablesUdf(
            col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
          .withColumn(s"${c}_table", col("__tc._1"))
          .withColumn(s"${c}_row", col("__tc._2"))
          .withColumn(s"${c}_col", col("__tc._3"))
          .withColumn(s"${c}_is_header", col("__tc._4"))
          .withColumn(s"${c}_cell", col("__tc._5"))
          .drop("__tc")
      }
    }

    // `extract-html-meta :col` — <meta name|property → content> pairs
    // as rows (`<col>_key/_value`): og:/article:/robots metadata.
    case "extract-html-meta" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__mt", explode(graft.llm.HtmlText.extractMetaUdf(
            col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
          .withColumn(s"${c}_key", col("__mt._1"))
          .withColumn(s"${c}_value", col("__mt._2"))
          .drop("__mt")
      }
    }

    // `extract-html-jsonld :col` — raw application/ld+json script
    // payloads, one row each (`<col>_jsonld`; chain json-path).
    case "extract-html-jsonld" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn(s"${c}_jsonld",
            explode(graft.llm.HtmlText.extractJsonLdUdf(
              col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
      }
    }

    case "clean-lines-c4" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(0), graft.functions.Udfs.c4CleanLinesUdf(
        col(spec.col(0)),
        lit(spec.optStr(1).map(_.toInt).getOrElse(3)),
        lit(spec.optStr(2).map(_.toInt).getOrElse(5))))
    }

    // `gopher-rules :text` — Gopher/MassiveText document-quality gate;
    // appends boolean `<col>_gopher_keep`
    case "gopher-rules" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_gopher_keep",
        graft.functions.Udfs.gopherKeepUdf(col(spec.col(0))))
    }

    // `pack-sequences :tok :id ctx [buckets]` — greedy context-window
    // packing (llm/Packing); appends pack_bucket/pack_bin/pack_offset
    case "pack-sequences" => ColumnOps.simple(spec) { df =>
      graft.llm.Packing.packSequences(df, spec.col(0), spec.col(1),
        spec.str(2).toInt,
        buckets = spec.optStr(3).map(_.toInt).getOrElse(64))
    }

    case "lang-id" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_lang", TextAnalysis.langId(col(spec.col(0))))
    }

    case "token-count" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_tokens",
        TextAnalysis.tokenCount(col(spec.col(0))))
    }

    case "quality-score" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_quality",
        TextAnalysis.qualityScore(col(spec.col(0))))
    }

    // `surprisal-score :text` — corpus-relative mean -ln p(token)
    // (unigram LM-perplexity proxy; appends `<col>_surprisal`)
    case "surprisal-score" => ColumnOps.simple(spec) { df =>
      TextAnalysis.surprisalScore(df, spec.col(0))
    }

    // `bm25-score :text 'query' [k1] [b]` — Okapi BM25 relevance to a
    // fixed query (domain-relevance slicing; appends `<col>_bm25`)
    case "bm25-score" => ColumnOps.simple(spec) { df =>
      TextAnalysis.bm25Score(df, spec.col(0), spec.str(1),
        k1 = spec.optStr(2).map(_.toDouble).getOrElse(1.2),
        b = spec.optStr(3).map(_.toDouble).getOrElse(0.75))
    }

    // `quantize-embedding :vec` — per-vector symmetric int8 codes
    // (replaces :vec, appends `<vec>_scale`)
    case "quantize-embedding" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.quantizeEmbedding(df, spec.col(0))
    }

    // `dequantize-embedding :vec` — codes x scale back to float32
    // (drops `<vec>_scale`)
    case "dequantize-embedding" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.dequantizeEmbedding(df, spec.col(0))
    }

    // `normalize-embedding :vec` — L2 unit vectors in place (the ANN
    // precompute: unit-vector dot = cosine); map-only Catalyst
    case "normalize-embedding" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.normalizeEmbedding(df, spec.col(0))
    }

    // `split-sentences :text` — one row per sentence (text replaced,
    // `sentence_id` appended; map-only generator)
    case "split-sentences" => ColumnOps.simple(spec) { df =>
      TextAnalysis.splitSentences(df, spec.col(0))
    }

    // `classifier-score :text exp:{ target } [dim] [iters] [lr]` —
    // model-based quality filtering: train a hashed-TF logistic
    // classifier with rows matching the target expression as the
    // positive seed set (bounded per-iteration gradient aggregates,
    // driver-held weights), score EVERY row into `<col>_clf_score`
    case "classifier-score" => ColumnOps.simple(spec) { df =>
      val target = graft.expr.ExprCompiler.compile(spec.expr(1))
      graft.llm.Classifier.qualityScore(df, spec.col(0), target,
        dim = spec.optInt(2, 16), iterations = spec.optInt(3, 3),
        lr = spec.optStr(4).map(_.toDouble).getOrElse(0.5),
        outCol = s"${spec.col(0)}_clf_score")
    }

    // `dsir-weights :text exp:{ target } [dim]` — DSIR importance
    // log-weights vs the target-expression distribution; feed
    // `sample-weighted` with exp(weight) to complete the recipe
    case "dsir-weights" => ColumnOps.simple(spec) { df =>
      val target = graft.expr.ExprCompiler.compile(spec.expr(1))
      graft.llm.Classifier.dsirLogWeights(df, spec.col(0), target,
        dim = spec.optInt(2, 16),
        outCol = s"${spec.col(0)}_dsir_logweight")
    }

    // `lm-perplexity :text :id exp:{ ref } [maxVocab] [minBigram]
    // [lambda]` — interpolated-bigram LM perplexity trained on the
    // reference-expression slice (the CCNet/KenLM-style quality
    // signal); appends lm_tokens / lm_logprob / lm_ppl
    case "lm-perplexity" => ColumnOps.simple(spec) { df =>
      val ref = graft.expr.ExprCompiler.compile(spec.expr(2))
      graft.llm.NgramLm.perplexity(df, spec.col(0), spec.col(1), ref,
        maxVocab = spec.optInt(3, 65536),
        minBigramCount = spec.optInt(4, 2),
        lambda = spec.optStr(5).map(_.toDouble).getOrElse(0.7))
    }

    // `hashing-tf :text [k]` — fixed-width hashed term-frequency
    // vector (no vocabulary, map-only; appends `<col>_tf`)
    case "hashing-tf" => ColumnOps.simple(spec) { df =>
      val k = spec.optStr(1).map(_.toInt).getOrElse(1024)
      require(k >= 1, s"hashing-tf: k must be >= 1, got $k")
      df.withColumn(s"${spec.col(0)}_tf",
        graft.functions.Udfs.hashingTfUdf(
          col(spec.col(0)).cast(org.apache.spark.sql.types.StringType),
          lit(k)))
    }

    case "fingerprint" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_fingerprint",
        TextAnalysis.fingerprint(col(spec.col(0))))
    }

    // `redact-pii :col [email,ssn,...]` — in-place scrub with typed
    // placeholders; no types argument = all patterns
    case "redact-pii" => ColumnOps.simple(spec) { df =>
      val types = spec.optStr(1)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val unknown = types.filterNot(t => TextAnalysis.piiPatterns.exists(_._1 == t))
      require(unknown.isEmpty, s"redact-pii: unknown type(s) ${unknown.mkString(",")}; " +
        s"supported: ${TextAnalysis.piiPatterns.map(_._1).mkString(",")}")
      df.withColumn(spec.col(0), TextAnalysis.redactPii(col(spec.col(0)), types))
    }

    // `redact-secrets :col [aws_key,jwt,...]` — the code-corpus
    // sibling of redact-pii: mask credential shapes in place
    case "redact-secrets" => ColumnOps.simple(spec) { df =>
      val types = spec.optStr(1)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val unknown = types.filterNot(t =>
        TextAnalysis.secretPatterns.exists(_._1 == t))
      require(unknown.isEmpty,
        s"redact-secrets: unknown type(s) ${unknown.mkString(",")}; " +
          s"supported: ${TextAnalysis.secretPatterns.map(_._1).mkString(",")}")
      df.withColumn(spec.col(0),
        TextAnalysis.redactSecrets(col(spec.col(0)), types))
    }

    // `secret-hits :col` — per-type credential counts as
    // <col>_<type>_hits columns (audit first, then drop or redact)
    case "secret-hits" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val withS = df.withColumn("__sh", TextAnalysis.secretHits(col(c)))
      TextAnalysis.secretPatterns.map(_._1).foldLeft(withS) { (d, t) =>
        d.withColumn(s"${c}_${t}_hits", col(s"__sh.$t"))
      }.drop("__sh")
    }

    // `detect-generated :col` — machine-generated-source gate:
    // <col>_generated_marker (tool banner phrase or 'minified') +
    // <col>_is_generated
    case "detect-generated" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn("__gen", TextAnalysis.detectGenerated(col(c)))
        .withColumn(s"${c}_generated_marker", col("__gen.marker"))
        .withColumn(s"${c}_is_generated", col("__gen.is_generated"))
        .drop("__gen")
    }

    // `detect-license :col` — SPDX tag or distinctive-phrase license
    // id from the file header as <col>_license / <col>_license_via
    case "detect-license" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn("__lic", TextAnalysis.detectLicense(col(c)))
        .withColumn(s"${c}_license", col("__lic.license"))
        .withColumn(s"${c}_license_via", col("__lic.via"))
        .drop("__lic")
    }

    // `validate-embeddings :vec :dim [loNormSq] [hiNormSq]` — per-row
    // QA label for a vector dump (null/dim/nan/zero/norm bounds)
    case "validate-embeddings" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.validateEmbeddings(df, spec.col(0),
        expectedDim = spec.int(1),
        loNormSq = spec.optStr(2).map(_.toDouble).getOrElse(0.25),
        hiNormSq = spec.optStr(3).map(_.toDouble).getOrElse(4.0))
    }

    // `reduce-dim :vec :inDim :outDim [seed]` — Johnson-Lindenstrauss
    // random projection (seeded ±1 signs): the dimensionality cut
    // before LSH/IVF indexing at corpus scale; appends `<vec>_jl`
    case "reduce-dim" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.randomProject(df, spec.col(0),
        inDim = spec.int(1), outDim = spec.int(2),
        seed = spec.optStr(3).map(_.toLong).getOrElse(7L))
    }

    // `cluster-embeddings :vec [k]` — seeded-k-means cell per row
    // (corpus composition / diversity mixing / ANN layout precompute)
    case "cluster-embeddings" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.clusterAssign(df, spec.col(0),
        k = spec.optStr(1).map(_.toInt).getOrElse(16))
    }

    // `pool-embeddings :vec :group` — element-wise mean of all vectors
    // per group (chunk embeddings -> one document vector); output one
    // row per group with `<vec>_pooled`
    case "pool-embeddings" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.meanPoolEmbeddings(df, spec.col(1), spec.col(0))
    }

    // `dedup-semantic :vec :id [k] [threshold]` — SemDeDup-style
    // within-cluster semantic dedup: coarse-quantizer cells bound the
    // pairwise comparison, larger id of each >=threshold-cosine pair
    // drops (Similarity.semanticDedup)
    case "dedup-semantic" => ColumnOps.simple(spec) { df =>
      graft.llm.Similarity.semanticDedup(df, spec.col(1), spec.col(0),
        k = spec.optStr(2).map(_.toInt).getOrElse(16),
        threshold = spec.optStr(3).map(_.toDouble).getOrElse(0.7))
    }

    // `chunk-text :text size [overlap]` — one row per sliding token
    // window (context-window chunking for embedding/RAG/seq-len prep)
    case "chunk-text" => ColumnOps.simple(spec) { df =>
      TextAnalysis.chunkText(df, spec.col(0), spec.str(1).toInt,
        overlap = spec.optStr(2).map(_.toInt).getOrElse(0))
    }

    // `chunk-cdc :text [window] [modulus]` — content-defined chunking:
    // hash-anchor boundaries (expected chunk ~modulus chars) that
    // re-align after edits, so chunk-level dedup survives insertions
    case "chunk-cdc" => ColumnOps.simple(spec) { df =>
      TextAnalysis.chunkCdc(df, spec.col(0),
        window = spec.optStr(1).map(_.toInt).getOrElse(16),
        modulus = spec.optStr(2).map(_.toInt).getOrElse(512))
    }

    // `dedup-spans :text :doc_id [minTokens]` — remove every non-first
    // occurrence of any >= minTokens-token run duplicated anywhere in
    // the corpus (exact-substring dedup, llm/SpanDedup)
    case "dedup-spans" => ColumnOps.simple(spec) { df =>
      graft.llm.SpanDedup.removeDuplicatedSpans(df, spec.col(0), spec.col(1),
        minTokens = spec.optStr(2).map(_.toInt).getOrElse(50))
    }

    // `decontaminate :text benchtable [n] [minHits]` — drop documents
    // sharing >= minHits word n-grams with the registered benchmark
    // table (train/test-leakage guard); `contamination-hits` is the
    // mark-only form, appending `<col>_contam_hits`
    case "decontaminate" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val bench = benchTable(spec, ctx)
        st.mapDf(df => graft.llm.Decontaminate.drop(df, spec.col(0),
          bench, bench.columns.head,
          n = spec.optStr(2).map(_.toInt).getOrElse(8),
          minHits = spec.optStr(3).map(_.toInt).getOrElse(1)))
      }
    }

    case "contamination-hits" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val bench = benchTable(spec, ctx)
        st.mapDf(df => graft.llm.Decontaminate.markHits(df, spec.col(0),
          bench, bench.columns.head,
          n = spec.optStr(2).map(_.toInt).getOrElse(8)))
      }
    }

    // `detect-script :col` — Unicode script mix of the letters
    // (table-exact per codepoint): appends `<col>_script`,
    // `<col>_script_frac`, `<col>_n_scripts` (TextAnalysis.scriptMix)
    case "detect-script" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn("__sm", graft.llm.TextAnalysis.scriptMixUdf(
          col(c).cast(org.apache.spark.sql.types.StringType)))
        .withColumn(s"${c}_script", col("__sm.script"))
        .withColumn(s"${c}_script_frac", col("__sm.script_frac"))
        .withColumn(s"${c}_n_scripts", col("__sm.n_scripts"))
        .drop("__sm")
    }

    // `dedup-against-bloom :text statetable [expected] [fpp]` —
    // membership-sketch incremental dedup: ONE partial-aggregated pass
    // builds a Bloom filter of the state table's normalized-content
    // keys (first column), then the batch filters map-only against the
    // broadcast bits — no join, no shuffle; fpp-bounded novel-row loss,
    // zero duplicate re-admission (IncrementalDedup.bloomState/
    // exactAgainstBloom)
    case "dedup-against-bloom" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val state = benchTable(spec, ctx)
        val bloom = graft.llm.IncrementalDedup.bloomState(state,
          state.columns.head,
          expectedItems = spec.optStr(2).map(_.toLong).getOrElse(1000000L),
          fpp = spec.optStr(3).map(_.toDouble).getOrElse(1e-6))
        st.mapDf(df =>
          graft.llm.IncrementalDedup.exactAgainstBloom(df, spec.col(0), bloom))
      }
    }

    // `bpe-token-count :text [numMerges] [maxWords]` — corpus-trained
    // byte-pair-encoding subword count (llm/Bpe): bounded word-freq
    // top-k -> driver merge loop -> broadcast ranks -> map-only encode
    case "bpe-token-count" => ColumnOps.simple(spec) { df =>
      graft.llm.Bpe.tokenCount(df, spec.col(0),
        numMerges = spec.optStr(1).map(_.toInt).getOrElse(200),
        maxWords = spec.optStr(2).map(_.toInt).getOrElse(50000))
    }

    // `bpe-encode :text [numMerges] [maxWords]` — same training, but
    // appends the subword token ARRAY as `<col>_bpe`
    case "bpe-encode" => ColumnOps.simple(spec) { df =>
      val merges = graft.llm.Bpe.train(df, spec.col(0),
        numMerges = spec.optStr(1).map(_.toInt).getOrElse(200),
        maxWords = spec.optStr(2).map(_.toInt).getOrElse(50000))
      df.withColumn(s"${spec.col(0)}_bpe",
        graft.llm.Bpe.encodeColumn(df, spec.col(0), merges))
    }

    // `unigram-token-count :text [vocabSize] [maxWords]` — SentencePiece
    // unigram-LM subword count (llm/UnigramLm): bounded word-freq top-k
    // -> driver hard-EM trainer -> broadcast model -> map-only Viterbi
    case "unigram-token-count" => ColumnOps.simple(spec) { df =>
      graft.llm.UnigramLm.tokenCount(df, spec.col(0),
        vocabSize = spec.optStr(1).map(_.toInt).getOrElse(2000),
        maxWords = spec.optStr(2).map(_.toInt).getOrElse(50000))
    }

    // `unigram-encode :text [vocabSize] [maxWords]` — same training,
    // appends the piece ARRAY as `<col>_unigram`
    case "unigram-encode" => ColumnOps.simple(spec) { df =>
      val model = graft.llm.UnigramLm.train(df, spec.col(0),
        vocabSize = spec.optStr(1).map(_.toInt).getOrElse(2000),
        maxWords = spec.optStr(2).map(_.toInt).getOrElse(50000))
      graft.llm.UnigramLm.encodeColumn(df, spec.col(0), model)
    }

    // `wordpiece-token-count :text [vocabSize] [maxWords]` — BERT-style
    // WordPiece subword count (llm/WordPiece): bounded word-freq top-k
    // -> driver likelihood-scored merge loop -> broadcast vocab ->
    // map-only greedy longest-match encode
    case "wordpiece-token-count" => ColumnOps.simple(spec) { df =>
      graft.llm.WordPiece.tokenCount(df, spec.col(0),
        vocabSize = spec.optStr(1).map(_.toInt).getOrElse(2000),
        maxWords = spec.optStr(2).map(_.toInt).getOrElse(50000))
    }

    // `wordpiece-encode :text [vocabSize] [maxWords]` — same training,
    // appends the piece ARRAY as `<col>_wordpiece`
    case "wordpiece-encode" => ColumnOps.simple(spec) { df =>
      val model = graft.llm.WordPiece.train(df, spec.col(0),
        vocabSize = spec.optStr(1).map(_.toInt).getOrElse(2000),
        maxWords = spec.optStr(2).map(_.toInt).getOrElse(50000))
      graft.llm.WordPiece.encodeColumn(df, spec.col(0), model)
    }

    // `select-budget :tokens :order :id budget` — quality-ordered
    // token-budget corpus subsetting: keep best-`order` rows while the
    // running token total stays ≤ budget (llm/Packing.selectBudget;
    // range-partitioned two-phase prefix sum, no global window)
    case "select-budget" => ColumnOps.simple(spec) { df =>
      graft.llm.Packing.selectBudget(df, spec.col(0), spec.col(1),
        spec.col(2), spec.str(3).toLong)
    }

    // `decontaminate-spans :text benchtable [n]` — surgical span
    // decontamination: cut only the n-token windows that appear in the
    // benchmark (case-insensitive), keep the rest of the document;
    // map-only kernel (Decontaminate.dropSpans)
    case "decontaminate-spans" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val bench = benchTable(spec, ctx)
        st.mapDf(df => graft.llm.Decontaminate.dropSpans(df, spec.col(0),
          bench, bench.columns.head,
          n = spec.optStr(2).map(_.toInt).getOrElse(8)))
      }
    }

    // `contamination-hits-scale :text :id benchtable [n] [fpp]` — the
    // huge-benchmark form of contamination-hits: Bloom pre-screen +
    // exact equi-join verify (bit-identical hits; see
    // Decontaminate.markHitsScalable). Needs a unique id column to
    // join the verified counts back.
    case "contamination-hits-scale" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val bench = ctx.lookups.getOrElse(spec.str(2),
          throw new RecipeException(
            s"${spec.name}: unknown benchmark table '${spec.str(2)}'"))
        st.mapDf(df => graft.llm.Decontaminate.markHitsScalable(
          df, spec.col(0), spec.col(1), bench, bench.columns.head,
          n = spec.optStr(3).map(_.toInt).getOrElse(8),
          fpp = spec.optStr(4).map(_.toDouble).getOrElse(0.01)))
      }
    }

    // duplicate-line and duplicate-3-gram fractions (Gopher-style
    // repetition quality signals)
    case "repetition-ratio" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn("__rep", graft.functions.Udfs.repetitionUdf(col(c)))
        .withColumn(s"${c}_dup_line_ratio", col("__rep._1"))
        .withColumn(s"${c}_dup_3gram_ratio", col("__rep._2"))
        .drop("__rep")
    }

    // `robots-sitemaps :col` — `Sitemap:` directive values out of
    // robots.txt bodies, one row each in `<col>_sitemap` (the crawl
    // frontier bootstrap; chain parse-as-sitemap on the fetched docs).
    case "robots-sitemaps" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn(s"${c}_sitemap",
            explode(graft.llm.Robots.sitemapsUdf(
              col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
      }
    }

    // `parse-as-subtitles :col` — SRT/WebVTT cues, one row each
    // (`<col>_index/_start_ms/_end_ms/_text`): the text half of
    // video-text pairs; join start_ms against sampled frame offsets.
    case "parse-as-subtitles" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__cue", explode(graft.sources.Subtitles.parseUdf(
            col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
          .withColumn(s"${c}_index", col("__cue._1"))
          .withColumn(s"${c}_start_ms", col("__cue._2"))
          .withColumn(s"${c}_end_ms", col("__cue._3"))
          .withColumn(s"${c}_text", col("__cue._4"))
          .drop("__cue")
      }
    }

    // `parse-yaml-frontmatter :col` — split a markdown document into
    // `<col>_body` + one row per flat front-matter scalar
    // (`<col>_key/_value`; explode_outer keeps fence-less docs as a
    // single null-key row).
    case "parse-yaml-frontmatter" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__fm", graft.llm.TextAnalysis.frontMatterUdf(
            col(c).cast(org.apache.spark.sql.types.StringType)))
          .drop(c)
          .withColumn(s"${c}_body", col("__fm._1"))
          .withColumn("__kv", explode_outer(col("__fm._2")))
          .withColumn(s"${c}_key", col("__kv._1"))
          .withColumn(s"${c}_value", col("__kv._2"))
          .drop("__fm", "__kv")
      }
    }

    // `parse-as-rtf :col` — RTF plain text (group-aware control-word
    // walk: destination skip, \'hh codepage bytes, \uN + \ucN) into
    // `<col>_text`. Non-RTF input yields empty text.
    case "parse-as-rtf" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(s"${c}_text", graft.sources.Rtf.extractUdf(
        col(c).cast(org.apache.spark.sql.types.StringType)))
    }

    // `split-sections :col` — heading-delimited markdown sections,
    // one row each, with the hierarchical breadcrumb path (the
    // curation/RAG chunking unit); the text column becomes the
    // section body
    case "split-sections" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__ms", explode(
            graft.llm.TextAnalysis.splitMdSectionsUdf(
              col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
          .withColumn(s"${c}_section", col("__ms._1"))
          .withColumn(s"${c}_level", col("__ms._2"))
          .withColumn(s"${c}_heading", col("__ms._3"))
          .withColumn(s"${c}_heading_path", col("__ms._4"))
          .withColumn(c, col("__ms._5"))
          .drop("__ms")
      }
    }

    // `extract-md-tables :col` — GitHub-flavored pipe tables to rows
    // (`<col>_table/_row/_col/_is_header/_cell`): the markdown
    // complement of extract-html-tables for README/docs corpora.
    case "extract-md-tables" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn("__mt", explode(
            graft.llm.TextAnalysis.extractMdTablesUdf(
              col(c).cast(org.apache.spark.sql.types.StringType))))
          .drop(c)
          .withColumn(s"${c}_table", col("__mt._1"))
          .withColumn(s"${c}_row", col("__mt._2"))
          .withColumn(s"${c}_col", col("__mt._3"))
          .withColumn(s"${c}_is_header", col("__mt._4"))
          .withColumn(s"${c}_cell", col("__mt._5"))
          .drop("__mt")
      }
    }

    // `strip-latex :col` — arXiv-style de-TeX (comments, math,
    // no-prose environments, command unwrap/drop, specials); the
    // LaTeX-source curation pass.
    case "strip-latex" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, graft.llm.TextAnalysis.stripLatexUdf(
        col(c).cast(org.apache.spark.sql.types.StringType)))
    }

    // `char-entropy :text` — Shannon entropy (log2) over code points:
    // templated/key-mash text scores far below prose. Map-only.
    case "char-entropy" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(s"${c}_entropy", graft.llm.TextAnalysis
        .charEntropyUdf(col(c).cast(org.apache.spark.sql.types.StringType)))
    }

    // `compression-ratio :text [level]` — deflate length / raw UTF-8
    // length (round-6; 0-byte text reads 0.0): the cheap
    // repetitiveness gate — boilerplate compresses far below natural
    // prose. Map-only UDF over the JDK's zlib.
    case "compression-ratio" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val level = spec.optStr(1).map(_.toInt).getOrElse(6)
      require(level >= 0 && level <= 9,
        s"compression-ratio: level must be 0..9, got $level")
      val text = col(c).cast(org.apache.spark.sql.types.StringType)
      val deflated = graft.llm.TextAnalysis
        .deflateLenUdf(text, lit(level))
      val rawLen = octet_length(text)
      df.withColumn(s"${c}_deflate_ratio",
        when(rawLen > 0, round(deflated.cast("double") / rawLen, 6))
          .otherwise(when(text.isNotNull, lit(0.0))))
    }

    case _ => null
  })

  // first column of the registered table is the benchmark text column,
  // same positional contract as table-lookup's key column
  private def benchTable(spec: DirectiveSpec, ctx: WrangleContext) =
    ctx.lookups.getOrElse(spec.str(1),
      throw new RecipeException(
        s"${spec.name}: unknown benchmark table '${spec.str(1)}'"))
}
