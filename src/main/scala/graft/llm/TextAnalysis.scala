package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data curation: token counting, language
  * ID, quality scoring, PII redaction, document fingerprinting.
  * Redaction and fingerprinting are native Column expressions; the
  * per-row token/language/quality analyses are JVM kernels (their
  * Column formulations need filter()/aggregate() HOFs, which are
  * CodegenFallback — interpreted per element; the kernels measured
  * ~5-40× faster and LlmSpec asserts value parity). All run in the
  * same projection as the rest of a cleaning recipe.
  */
object TextAnalysis {

  /** Deflate-compressed byte length of the UTF-8 text at the given
    * zlib level — the cheap repetitiveness signal curation pipelines
    * gate on (boilerplate and templated spam compress far below
    * natural prose; the published Gopher/C4-adjacent "compression
    * ratio" filter). Deterministic for a fixed JDK (the bundled zlib),
    * the same decoder-exact contract as the ImageIO JPEG path — the
    * correctness row pins a rollup rather than replaying zlib in SQL.
    * Null text → null.
    */
  /** Split a markdown/Jekyll-style document into (body, front-matter
    * pairs): a leading `---` fence opens the block, `---`/`...`
    * closes it, and FLAT SCALAR `key: value` lines inside become
    * pairs (surrounding quotes stripped, full-line comments ignored).
    * Nested structures and list items are out of the subset and
    * skipped — the curation uses (route by `lang:`, keep `title:`,
    * drop `draft: true`) read flat scalars. No fence, or an
    * unterminated one, means no front matter: the document IS the
    * body.
    */
  def frontMatter(s: String): (String, Seq[(String, String)]) = {
    if (s == null) return (null, Nil)
    val lines = s.split("\r\n|\n", -1)
    if (lines.isEmpty || lines(0).trim != "---") return (s, Nil)
    val pairs = Seq.newBuilder[(String, String)]
    var closed = -1
    var i = 1
    while (closed < 0 && i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (t == "---" || t == "...") closed = i
      else {
        // flat scalars only: skip nested (indented), list items, and
        // comment lines
        if (line.nonEmpty && !line(0).isWhitespace &&
          !t.startsWith("#") && !t.startsWith("- ")) {
          val c = line.indexOf(':')
          if (c > 0) {
            val key = line.substring(0, c).trim
            var value = line.substring(c + 1).trim
            if (value.length >= 2 &&
              ((value.head == '"' && value.last == '"') ||
                (value.head == '\'' && value.last == '\'')))
              value = value.substring(1, value.length - 1)
            if (key.nonEmpty && key.forall(ch =>
              ch.isLetterOrDigit || ch == '_' || ch == '-' || ch == '.'))
              pairs += key -> value
          }
        }
        i += 1
      }
    }
    if (closed < 0) return (s, Nil)
    (lines.drop(closed + 1).mkString("\n"), pairs.result())
  }

  val frontMatterUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) => {
      val (body, pairs) = frontMatter(s)
      (body, pairs)
    })

  /** One markdown pipe-table cell (the GitHub-flavored form): table
    * ordinal, row ordinal (0 = the header row), column ordinal,
    * header flag, trimmed cell text.
    */
  case class MdTableCell(table: Int, row: Int, col: Int,
      is_header: Boolean, text: String)

  /** Extract GitHub-flavored pipe tables from markdown: a table is a
    * header line of `|`-separated cells followed by a delimiter line
    * (dashes with optional alignment colons), then data rows until
    * the first non-table line. Escaped `\|` stays literal; leading/
    * trailing pipes are optional per cell row. The relational-mining
    * pass for README/docs corpora — the markdown complement of
    * extract-html-tables.
    */
  def extractMdTables(md: String): Seq[MdTableCell] = {
    if (md == null) return Seq.empty
    val out = Seq.newBuilder[MdTableCell]
    val lines = md.split("\r\n|\n", -1)
    def cells(line: String): Seq[String] = {
      // split on unescaped '|', dropping the empty edge cells the
      // leading/trailing pipes produce
      val parts = Seq.newBuilder[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < line.length &&
          line.charAt(i + 1) == '|') { sb.append('|'); i += 2 }
        else if (c == '|') { parts += sb.toString; sb.setLength(0); i += 1 }
        else { sb.append(c); i += 1 }
      }
      parts += sb.toString
      val all = parts.result().map(_.trim)
      all.drop(if (all.headOption.contains("")) 1 else 0)
        .dropRight(if (all.lastOption.contains("")) 1 else 0)
    }
    def isDelimiter(line: String): Boolean = {
      val cs = cells(line)
      cs.nonEmpty && cs.forall(c =>
        c.matches(":?-{3,}:?") || c.matches(":?-+:?") && c.length >= 3)
    }
    var table = -1
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.contains("|") && i + 1 < lines.length &&
        lines(i + 1).contains("|") && isDelimiter(lines(i + 1))) {
        val header = cells(line)
        if (header.nonEmpty) {
          table += 1
          header.zipWithIndex.foreach { case (t, c) =>
            out += MdTableCell(table, 0, c, is_header = true, t) }
          i += 2
          var row = 1
          while (i < lines.length && lines(i).contains("|")) {
            cells(lines(i)).zipWithIndex.foreach { case (t, c) =>
              out += MdTableCell(table, row, c, is_header = false, t) }
            row += 1
            i += 1
          }
        } else i += 1
      } else i += 1
    }
    out.result()
  }

  val extractMdTablesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      extractMdTables(s).map(t => (t.table, t.row, t.col, t.is_header, t.text)))

  /** One markdown section: the contiguous body under an ATX heading,
    * with the hierarchical breadcrumb (`H1 > H2 > ...`) that makes a
    * chunk self-describing when it travels without its document —
    * the curation/RAG chunking unit heading-blind splitters lose.
    * Section 0 is the pre-heading preamble (level 0, null heading)
    * when non-empty.
    */
  case class MdSection(section: Int, level: Int, heading: String,
      heading_path: String, text: String)

  private val AtxHeadingRe =
    java.util.regex.Pattern.compile("^(#{1,6})\\s+(.*?)\\s*#*\\s*$")

  /** Split markdown into heading-delimited sections. ATX headings
    * only (the GitHub-dominant form); fenced code blocks suppress
    * heading detection so a `# comment` inside ``` fences stays body
    * text. A heading with an empty body still yields its (empty-text)
    * section — the structure is the point. Total on arbitrary text.
    */
  def splitMdSections(md: String): Seq[MdSection] = {
    if (md == null) return Seq.empty
    val out = Seq.newBuilder[MdSection]
    var path = List.empty[(Int, String)] // heading stack, innermost first
    var curHeading: String = null
    var curLevel = 0
    var idx = 0
    // fence state tracks WHICH char opened it: a ~~~ line inside a
    // ``` block is body, and only a same-char 3+ line closes
    var fenceChar: Char = 0
    val buf = new java.lang.StringBuilder
    def flush(): Unit = {
      val text = buf.toString.replaceAll("\\s+$", "")
        .replaceAll("^\\n+", "")
      if (text.nonEmpty || curHeading != null) {
        out += MdSection(idx, curLevel, curHeading,
          path.reverse.map(_._2).mkString(" > "), text)
        idx += 1
      }
      buf.setLength(0)
    }
    md.split("\r\n|\n", -1).foreach { line =>
      val t = line.trim
      // CommonMark fences: open = 3+ of one char with an info string
      // that (for backticks) contains no further backtick — so a
      // one-line ```x``` snippet is inline code, NOT an open fence
      // that would swallow the rest of the document; close = 3+ of
      // the SAME char only
      val fenceOpen =
        if (fenceChar != 0) false
        else if (t.startsWith("```")) !t.drop(3).contains('`')
        else if (t.startsWith("~~~")) true
        else false
      val fenceClose = fenceChar != 0 &&
        t.length >= 3 && t.forall(_ == fenceChar)
      if (fenceOpen || fenceClose) {
        fenceChar = if (fenceOpen) t.charAt(0) else 0
        buf.append(line).append('\n')
      } else {
        val m = if (fenceChar != 0) null else AtxHeadingRe.matcher(line)
        if (m != null && m.matches()) {
          flush()
          curLevel = m.group(1).length
          curHeading = m.group(2)
          path = (curLevel, curHeading) ::
            path.dropWhile(_._1 >= curLevel)
        } else buf.append(line).append('\n')
      }
    }
    flush()
    out.result()
  }

  val splitMdSectionsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      splitMdSections(s).map(x =>
        (x.section, x.level, x.heading, x.heading_path, x.text)))

  /** De-TeX for arXiv-style corpora (the published heuristic the
    * LaTeX-source training pipelines use — not a TeX engine):
    * comments cut at the first unescaped `%`, display/float/verbatim
    * environments dropped wholesale, inline and display math
    * replaced by a space, text-carrying commands (`\emph`,
    * `\section`, `\textbf`, …) unwrap to their argument,
    * reference-machinery commands (`\cite`, `\ref`, `\label`,
    * `\url`, …) drop WITH their argument, unknown commands drop
    * bare, specials unescape (`\%` → %, `~` → space, `\\` →
    * newline, ``` `` '' ``` → quotes), and whitespace collapses with
    * paragraph breaks preserved as single newlines.
    */
  def stripLatex(s0: String): String = {
    if (s0 == null) return null
    // 1. comments: % to EOL unless escaped
    val noComments = {
      val sb = new java.lang.StringBuilder
      s0.split("\n", -1).foreach { line =>
        var cut = line.length
        var i = 0
        var found = false
        while (!found && i < line.length) {
          if (line.charAt(i) == '%' &&
            (i == 0 || line.charAt(i - 1) != '\\')) {
            cut = i; found = true
          }
          i += 1
        }
        sb.append(line.substring(0, cut)).append('\n')
      }
      sb.toString
    }
    // 2. drop environments that carry no prose
    val dropEnvs = Seq("equation", "align", "eqnarray", "displaymath",
      "math", "figure", "table", "tabular", "verbatim", "lstlisting",
      "tikzpicture", "algorithm", "algorithmic")
    var t = noComments
    dropEnvs.foreach { env =>
      t = t.replaceAll(
        "(?s)\\\\begin\\{" + env + "\\*?\\}.*?\\\\end\\{" + env +
          "\\*?\\}", " ")
    }
    // 3. math: $$..$$ first (else $..$ would split it), then $..$,
    // \[..\], \(..\)
    t = t.replaceAll("(?s)\\$\\$.*?\\$\\$", " ")
    t = t.replaceAll("(?s)(?<!\\\\)\\$[^$]*\\$", " ")
    t = t.replaceAll("(?s)\\\\\\[.*?\\\\\\]", " ")
    t = t.replaceAll("(?s)\\\\\\(.*?\\\\\\)", " ")
    // 4. commands: three passes unwrap reasonable nesting depth
    val keepArg = "emph|textbf|textit|texttt|textsc|textrm|textsf|" +
      "underline|mbox|section|subsection|subsubsection|paragraph|" +
      "chapter|title|author|caption|footnote|text"
    val dropWithArg = "cite|citep|citet|ref|eqref|autoref|label|url|" +
      "href|includegraphics|input|include|bibliography|" +
      "bibliographystyle|usepackage|documentclass|vspace|hspace"
    var pass = 0
    while (pass < 3) {
      t = t.replaceAll(
        "\\\\(?:" + keepArg + ")\\*?(?:\\[[^\\]]*\\])?\\{([^{}]*)\\}",
        "$1")
      t = t.replaceAll(
        "\\\\(?:" + dropWithArg + ")\\*?(?:\\[[^\\]]*\\])?" +
          "(?:\\{[^{}]*\\})+", " ")
      pass += 1
    }
    // \begin/\end of remaining (prose) environments drop bare
    t = t.replaceAll("\\\\(?:begin|end)\\{[^}]*\\}", " ")
    // specials BEFORE the generic command drop (\% is not a command)
    t = t.replaceAll("\\\\\\\\\\*?", "\n")
    t = t.replaceAll("\\\\([%&_#$])", "$1")
    t = t.replaceAll("\\\\[a-zA-Z]+\\*?", " ") // unknown commands
    t = t.replace("``", "“").replace("''", "”")
      .replace("~", " ")
    // leftover group braces are structure, not text
    t = t.replace("{", " ").replace("}", " ")
    // 5. whitespace: paragraph breaks to ONE newline, rest to spaces
    t = t.replaceAll("[ \\t]+", " ")
    t = t.replaceAll(" ?\\n ?", "\n")
    t = t.replaceAll("\\n{2,}", "\n")
    t.trim
  }

  val stripLatexUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(stripLatex _)

  /** Shannon entropy (log2) over CODE POINTS — the character-level
    * diversity signal: templated spam and key-mash filler sit far
    * below natural prose, binary-ish noise far above. Code points,
    * not Java chars, so astral-plane text scores like the
    * character-counting SQL engines (DuckDB substring/entropy) see
    * it. Null/empty → null.
    */
  def charEntropy(s: String): java.lang.Double = {
    if (s == null || s.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    java.lang.Double.valueOf(h)
  }

  val charEntropyUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(charEntropy _)

  def deflateLen(s: String, level: Int): java.lang.Integer = {
    if (s == null) return null
    val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      java.lang.Integer.valueOf(total)
    } finally d.end()
  }

  val deflateLenUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(deflateLen _)

  /** Whitespace token count (0 for empty/null-ish text). JVM kernel —
    * the filter() HOF is CodegenFallback (see Udfs kernel island);
    * [[tokenCountColumns]] keeps the Column formulation for the
    * parity test. */
  def tokenCount(text: Column): Column =
    graft.functions.Udfs.tokenCountUdf(text)

  private[graft] def tokenCountColumns(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: alphanumeric runs + single non-space
    * symbols, the usual cheap proxy for tokenizer token counts.
    * (regexp_count, not lookaround splits — RE2-compatible so the same
    * pattern works in the DuckDB oracle.)
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Stopword tables for the n-gram/stopword language heuristic. Small,
    * public, high-frequency function words per language.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was",
      "for", "on", "with", "as", "at", "by", "this", "from", "or", "an", "be"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den",
      "nicht", "ein", "eine", "auf", "für", "im", "dem", "sich", "des", "auch"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une",
      "dans", "que", "qui", "pour", "sur", "pas", "au", "plus", "par"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "un", "una",
      "en", "que", "no", "por", "con", "para", "del", "se", "su"))

  /** Per-language stopword-hit count over whitespace tokens. */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = stopwords(lang)
    val tokens = split(lower(text), "\\s+")
    size(filter(tokens, t => t.isin(sw: _*)))
  }

  /** Heuristic language id: argmax over per-language stopword hit
    * counts; 'und' (undetermined) when nothing matches. JVM kernel
    * (one tokenize + 4 set probes per row vs 4 interpreted HOF
    * chains); [[langIdColumns]] keeps the Column formulation for the
    * parity test.
    */
  def langId(text: Column): Column = graft.functions.Udfs.langIdUdf(text)

  private[graft] def langIdColumns(text: Column): Column = {
    val scores = stopwords.keys.toSeq.sorted.map(l => (l, stopwordHits(text, l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit("und")) { case (acc, (l, s)) =>
      // first (alphabetical) language wins ties, deterministic
      when(s === best && s > 0 && acc === "und", lit(l)).otherwise(acc)
    }
  }

  /** Quality features: length, token stats, punctuation/digit/upper
    * ratios, stopword density — the standard cheap quality signals.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast(DoubleType)
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val nTok = size(toks).cast(DoubleType)
    Seq(
      "n_chars" -> length(text),
      "n_tokens" -> size(toks),
      "mean_token_len" ->
        when(nTok > 0, aggregate(toks, lit(0.0), (a, t) => a + length(t)) / nTok)
          .otherwise(lit(0.0)),
      "punct_ratio" ->
        regexp_count(text, lit("[\\p{Punct}]")).cast(DoubleType) / greatest(n, lit(1.0)),
      "digit_ratio" ->
        regexp_count(text, lit("[0-9]")).cast(DoubleType) / greatest(n, lit(1.0)),
      "upper_ratio" ->
        regexp_count(text, lit("[A-Z]")).cast(DoubleType) / greatest(n, lit(1.0)),
      "stopword_ratio" ->
        when(nTok > 0, stopwordHits(text, "en").cast(DoubleType) / nTok)
          .otherwise(lit(0.0)))
  }

  /** Code-corpus curation signals — the per-file gates code-dataset
    * builds (Codex "average line length < 100 / max < 1000"-style
    * rules, alphanumeric-fraction and generated-file filters) apply
    * before anything heavier runs:
    *   - n_lines / max_line_len / avg_line_len (newline line shape;
    *     avg = (chars − newlines) / lines, exact integer inputs)
    *   - comment_line_frac: lines opening (mod leading whitespace)
    *     with a line-comment marker (slash-slash, #, --) or a
    *     block-comment opener/continuation (slash-star, star)
    *   - alnum_frac: [A-Za-z0-9] density (minified/binary-ish blobs
    *     sit at the extremes)
    *   - autogenerated: carries an "auto-generated" / "do not edit"
    *     marker (lowercased substring)
    * Pure Catalyst Columns — no UDF, no shuffle — and every formula is
    * replayable by an external SQL engine (the code_features oracle).
    */
  def codeFeatures(text: Column): Seq[(String, Column)] = {
    val lines = split(text, "\n", -1)
    val nLines = size(lines)
    val low = lower(text)
    Seq(
      "n_lines" -> nLines,
      // no null-coalesce: non-null text always has >= 1 line, so a 0
      // here could only ever be a disguised NULL — and a curation rule
      // like "drop max_line_len = 0" must not swallow null docs as
      // empty ones. Null in, null out, like every sibling feature.
      "max_line_len" -> array_max(transform(lines, l => length(l))),
      "avg_line_len" ->
        (length(text) - (nLines - 1)).cast(DoubleType) /
          greatest(nLines, lit(1)).cast(DoubleType),
      "comment_line_frac" ->
        size(filter(lines, l => l.rlike("^\\s*(//|#|--|/\\*|\\*)")))
          .cast(DoubleType) / greatest(nLines, lit(1)).cast(DoubleType),
      "alnum_frac" ->
        regexp_count(text, lit("[A-Za-z0-9]")).cast(DoubleType) /
          greatest(length(text), lit(1)).cast(DoubleType),
      "autogenerated" ->
        (low.contains("auto-generated") || low.contains("do not edit")))
  }

  /** Markdown → plain text for curation (READMEs, wiki dumps, forum
    * exports arrive markdown-formatted; dedup keys and quality
    * features want the prose). Pure Catalyst — a split on ``` walls
    * off fenced-code regions, the prose chain runs ONLY on the
    * outside segments, and everything re-joins — so an external SQL
    * engine replays the exact output (the strip_markdown oracle):
    *   - fenced code: content preserved VERBATIM (a code-and-prose
    *     corpus must not have its `__init__`s and `a * b`s mangled by
    *     emphasis rules); only the fence markers and the info string
    *     (the opening fence's language line) are dropped. Unbalanced
    *     fences deterministically treat the trailing segment as code.
    *   - prose segments: images → alt text, links → anchor text, ATX
    *     headers / blockquote markers / horizontal rules / list
    *     bullets stripped at line starts, then PAIRED emphasis
    *     unwrapped — `**x**`/`__x__`/`~~x~~`/`*x*` → `x` only when the
    *     content starts with non-space (so prose `2 * 3` keeps its
    *     asterisk), and inline-code backticks dropped. Single
    *     underscores survive (snake_case stays intact).
    */
  def stripMarkdown(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "!\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",  // images -> alt text
      "\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",   // links -> anchor text
      "(?m)^#{1,6}\\s*" -> "",                // ATX headers
      "(?m)^>\\s?" -> "",                     // blockquotes
      "(?m)^-{3,}\\s*$" -> "",                // horizontal rules
      "(?m)^(\\s*)[-*+]\\s+" -> "$1",         // list bullets
      "\\*\\*(\\S[^\\n]*?)\\*\\*" -> "$1",    // paired bold
      "__(\\S[^\\n]*?)__" -> "$1",            // paired bold (underscore)
      "~~(\\S[^\\n]*?)~~" -> "$1",            // strikethrough
      "\\*(\\S[^*\\n]*?)\\*" -> "$1",         // paired italics
      "`" -> "")                              // inline-code markers
    def prose(c: Column): Column =
      steps.foldLeft(c)((acc, sr) => regexp_replace(acc, sr._1, sr._2))
    // even segments (0-based) are outside fences; odd segments are
    // fenced code, kept verbatim minus the info-string line
    val segs = split(text, "```", -1)
    array_join(
      zip_with(segs, sequence(lit(0), size(segs) - 1), (s, i) =>
        when(i % 2 === 0, prose(s))
          .otherwise(regexp_replace(s, "^[^\\n]*\\n?", ""))),
      "")
  }

  /** Composite quality score in [0,1]: penalizes extreme lengths, high
    * punctuation/digit density, missing stopwords. JVM kernel (same
    * factors/thresholds/HALF_UP rounding); [[qualityScoreColumns]]
    * keeps the Column formulation for the parity test.
    */
  def qualityScore(text: Column): Column =
    graft.functions.Udfs.qualityScoreUdf(text)

  private[graft] def qualityScoreColumns(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_tokens") >= 5 && f("n_tokens") <= 100000, 1.0)
      .otherwise(0.3)
    val punctOk = when(f("punct_ratio") < 0.2, 1.0).otherwise(0.5)
    val digitOk = when(f("digit_ratio") < 0.3, 1.0).otherwise(0.5)
    val swOk = when(f("stopword_ratio") > 0.05, 1.0).otherwise(0.7)
    round(lenOk * punctOk * digitOk * swOk, 4)
  }

  /** PII redaction patterns, applied in this order (card before phone
    * so a spaced card number is not half-eaten by the phone pattern).
    * RE2-compatible (no lookaround) so the DuckDB oracle can run the
    * SAME patterns; all are find-anywhere, replace-all.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "[SSN]"),
    ("card", """\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b""", "[CARD]"),
    // no leading \b: it cannot match before '(' or '+' (non-word
    // chars), which would strand the paren/country prefix
    ("phone", """(?:\+?\d{1,2}[ .-])?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b""",
      "[PHONE]"),
    ("ip", """\b(?:\d{1,3}\.){3}\d{1,3}\b""", "[IP]"))

  /** Mask PII spans in free text with typed placeholders — the
    * standard pre-training scrub pass. `types` selects a subset of
    * [[piiPatterns]] (all by default). Pure regexp_replace chain:
    * stays in whole-stage codegen.
    */
  def redactPii(text: Column, types: Seq[String] = Nil): Column = {
    val selected =
      if (types.isEmpty) piiPatterns
      else piiPatterns.filter(p => types.contains(p._1))
    selected.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }
  }

  /** High-precision credential shapes for code corpora (the published
    * open code-dataset pipelines scrub these before training): AWS
    * access-key ids, GitHub/Slack tokens, PEM private-key blocks,
    * JWTs, Google API keys. Deliberately NO low-precision patterns
    * (`password = ...` assignments) — a scrub pass that mangles
    * ordinary code does more harm than the secret it might catch.
    */
  val secretPatterns: Seq[(String, String, String)] = Seq(
    ("aws_key", """\bAKIA[0-9A-Z]{16}\b""", "[AWS_KEY]"),
    ("github_token", """\bgh[pousr]_[A-Za-z0-9]{36,255}\b""",
      "[GITHUB_TOKEN]"),
    ("slack_token", """\bxox[baprs]-[A-Za-z0-9-]{10,72}\b""",
      "[SLACK_TOKEN]"),
    // BEGIN ... PRIVATE KEY through the matching END fence (DOTALL via
    // [\s\S]; lazy so adjacent blocks redact separately)
    ("private_key",
      """-----BEGIN [A-Z ]*PRIVATE KEY-----[\s\S]*?-----END [A-Z ]*PRIVATE KEY-----""",
      "[PRIVATE_KEY]"),
    ("jwt",
      """\beyJ[A-Za-z0-9_-]{8,}\.[A-Za-z0-9_-]{8,}\.[A-Za-z0-9_-]{8,}\b""",
      "[JWT]"),
    ("gcp_key", """\bAIza[0-9A-Za-z_-]{35}\b""", "[GCP_KEY]"))

  /** Mask credential spans with typed placeholders — the code-corpus
    * sibling of [[redactPii]]. Pure regexp_replace chain: stays in
    * whole-stage codegen.
    */
  def redactSecrets(text: Column, types: Seq[String] = Nil): Column = {
    val selected =
      if (types.isEmpty) secretPatterns
      else secretPatterns.filter(p => types.contains(p._1))
    selected.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }
  }

  /** Per-type credential hit counts (struct column) — the audit view:
    * count first, decide to drop or redact after.
    */
  def secretHits(text: Column): Column =
    struct(secretPatterns.map { case (name, re, _) =>
      size(regexp_extract_all(text, lit(re), lit(0))).as(name)
    }: _*)

  /** License of a source file from its header region (first 2 KB):
    * an SPDX-License-Identifier tag wins verbatim (via = 'spdx');
    * otherwise the distinctive phrases of the common licenses match
    * case-insensitively (via = 'phrase'); else (null, null). Native
    * when-chain — codegen'd, no UDF.
    */
  def detectLicense(text: Column): Column = {
    val header = substring(text, 1, 2048)
    val low = lower(header)
    val spdx = regexp_extract(header,
      """(?i)SPDX-License-Identifier:\s*([A-Za-z0-9.+\-]+)""", 1)
    val phrase = when(low.contains(
        "permission is hereby granted, free of charge"), "MIT")
      .when(low.contains("apache license") &&
        low.contains("version 2.0"), "Apache-2.0")
      .when(low.contains("gnu affero general public license"), "AGPL-3.0")
      .when(low.contains("gnu lesser general public license") &&
        low.contains("version 2.1"), "LGPL-2.1")
      .when(low.contains("gnu lesser general public license"), "LGPL-3.0")
      .when(low.contains("gnu general public license") &&
        low.contains("version 3"), "GPL-3.0")
      .when(low.contains("gnu general public license") &&
        low.contains("version 2"), "GPL-2.0")
      // BSD clause count: the no-endorsement clause ("neither the
      // name") is what distinguishes 3-clause from 2-clause — both
      // share the "redistribution and use" preamble
      .when(low.contains(
          "redistribution and use in source and binary forms") &&
        low.contains("neither the name"), "BSD-3-Clause")
      .when(low.contains(
        "redistribution and use in source and binary forms"), "BSD-2-Clause")
      .when(low.contains("mozilla public license") &&
        low.contains("2.0"), "MPL-2.0")
      .when(low.contains(
        "permission to use, copy, modify, and/or distribute"), "ISC")
      .when(low.contains(
        "this is free and unencumbered software"), "Unlicense")
      .otherwise(lit(null))
    when(length(spdx) > 0,
        struct(spdx.as("license"), lit("spdx").as("via")))
      .when(phrase.isNotNull,
        struct(phrase.as("license"), lit("phrase").as("via")))
      .otherwise(struct(lit(null).cast("string").as("license"),
        lit(null).cast("string").as("via")))
  }

  /** Generated-file markers, checked over the 1 KB header the way
    * tools actually emit them. Order = report priority.
    */
  private val GeneratedMarkers = Seq(
    "do not edit", "@generated", "code generated by", "auto-generated",
    "autogenerated", "automatically generated", "generated automatically")

  /** Detect machine-generated source files — the published code-corpus
    * pipelines drop them (training on generated boilerplate teaches
    * the generator, not the language). (marker, is_generated) from
    * the 1 KB header: the tool banner phrase when present; else a
    * minified-file heuristic (a single line, or lines averaging
    * >200 chars, with at least 1 KB of content) flags with marker
    * 'minified'. Native when-chain — codegen'd, no UDF.
    */
  def detectGenerated(text: Column): Column = {
    val header = lower(substring(text, 1, 1024))
    val marker = GeneratedMarkers.tail.foldLeft(
        when(header.contains(GeneratedMarkers.head),
          GeneratedMarkers.head)) { (c, m) =>
      c.when(header.contains(m), m)
    } // no otherwise: non-match is null
    val lines = split(text, "\n", -1)
    val minified = length(text) >= 1024 &&
      (size(lines) === 1 ||
        length(text).cast(DoubleType) /
          greatest(size(lines), lit(1)).cast(DoubleType) > 200.0)
    val m = when(marker.isNotNull, marker)
      .when(minified, lit("minified"))
      .otherwise(lit(null).cast("string"))
    struct(m.as("marker"), m.isNotNull.as("is_generated"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 Table A1, the
    * filter set RefinedWeb/Dolma reuse) as EXACT INTEGER counts — the
    * fractions the published thresholds compare against are one
    * integer division away, and integer outputs keep every field
    * SQL-oracle-able with no float-hash hazard:
    *
    *  - lines/paragraphs: instances in duplicate groups (count > 1)
    *    and the characters they carry. Lines split on '\n', paragraphs
    *    on '\n\n', blank entries dropped after trim; duplicate keys
    *    are EXACT strings.
    *  - words: whitespace-split; alpha words contain [A-Za-z].
    *  - bullet lines ("- ", "* ", "•" after trim) and
    *    ellipsis-terminated lines ("..." / "…") — the Gopher layout
    *    gates.
    *  - top n-gram (n=2,3): occurrence count of the most frequent
    *    space-joined word n-gram, and count × gram length (ties break
    *    to the LONGEST gram among the tied — deterministic both here
    *    and in the SQL oracle).
    *  - duplicate 5-grams: instances whose gram occurs more than once
    *    (an instance-count variant of Gopher's char-coverage form —
    *    coverage dedup is order-dependent; instances are exactly
    *    replayable).
    */
  case class RepSignals(
      n_chars: Long,
      n_lines: Int, n_dup_lines: Int, dup_line_chars: Long,
      n_paras: Int, n_dup_paras: Int, dup_para_chars: Long,
      n_words: Int, n_alpha_words: Int,
      n_bullet_lines: Int, n_ellipsis_lines: Int,
      top2gram_count: Int, top2gram_chars: Long,
      top3gram_count: Int, top3gram_chars: Long,
      dup5gram_count: Int, n_5grams: Int)

  def repetitionSignals(s: String): RepSignals = {
    if (s == null) return null
    def dupStats(items: Array[String]): (Int, Long) = {
      val m = new java.util.HashMap[String, Integer]()
      items.foreach(l => m.merge(l, Integer.valueOf(1), (a, b) =>
        Integer.valueOf(a.intValue + b.intValue)))
      var cnt = 0; var chars = 0L
      m.forEach { (k, c) =>
        if (c > 1) { cnt += c; chars += c.toLong * k.length }
      }
      (cnt, chars)
    }
    val lines = s.split("\n", -1).filter(_.trim.nonEmpty)
    val (dl, dlc) = dupStats(lines)
    val paras = s.split("\n\n", -1).filter(_.trim.nonEmpty)
    val (dp, dpc) = dupStats(paras)
    val words = s.split("\\s+").filter(_.nonEmpty)
    val alpha = words.count(_.exists(ch =>
      (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')))
    val trimmed = lines.map(_.trim)
    val bullets = trimmed.count(l => l.startsWith("- ") ||
      l.startsWith("* ") || l.startsWith("•"))
    val ellipsis = trimmed.count(l => l.endsWith("...") ||
      l.endsWith("…"))
    def gramCounts(n: Int): java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i + n <= words.length) {
        m.merge(words.slice(i, i + n).mkString(" "), Integer.valueOf(1),
          (a, b) => Integer.valueOf(a.intValue + b.intValue))
        i += 1
      }
      m
    }
    def topGram(n: Int): (Int, Long) = {
      if (words.length < n) return (0, 0L)
      var topc = 0; var maxLen = 0
      gramCounts(n).forEach { (g, c) =>
        if (c > topc) { topc = c; maxLen = g.length }
        else if (c == topc && g.length > maxLen) maxLen = g.length
      }
      (topc, topc.toLong * maxLen)
    }
    val (t2c, t2ch) = topGram(2)
    val (t3c, t3ch) = topGram(3)
    val (d5, n5) =
      if (words.length < 5) (0, 0)
      else {
        var dup = 0
        gramCounts(5).forEach { (_, c) => if (c > 1) dup += c }
        (dup, words.length - 4)
      }
    RepSignals(s.length.toLong, lines.length, dl, dlc,
      paras.length, dp, dpc, words.length, alpha, bullets, ellipsis,
      t2c, t2ch, t3c, t3ch, d5, n5)
  }

  val repetitionSignalsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(repetitionSignals _)

  /** The Gopher repetition GATE over [[repetitionSignals]] output,
    * expressed in integer cross-multiplications (no float thresholds):
    * keep when duplicate-line instances ≤30% of lines, duplicate-para
    * instances ≤30%, duplicate-line chars ≤20% of chars, duplicate-
    * para chars ≤20%, top-2-gram chars ≤20%, top-3-gram chars ≤18%,
    * duplicate-5-gram instances ≤15% of 5-grams (instance-count
    * variant). The top-gram gates apply only when the top gram
    * actually REPEATS (count > 1): with all-unique grams the "top"
    * gram is just the longest one, and on a short document its length
    * alone can exceed 20% of the chars — that is length, not
    * repetition (on Gopher-scale documents a count-1 gram is far
    * under every threshold, so the published behavior is unchanged).
    * Null signals (null text) keep — undecidable is not droppable,
    * matching the dedup/decontamination convention.
    */
  def repetitionKeep(sig: Column): Column =
    sig.isNull || (
      sig("n_dup_lines") * 10 <= sig("n_lines") * 3 &&
      sig("n_dup_paras") * 10 <= sig("n_paras") * 3 &&
      sig("dup_line_chars") * 10 <= sig("n_chars") * 2 &&
      sig("dup_para_chars") * 10 <= sig("n_chars") * 2 &&
      (sig("top2gram_count") <= 1 ||
        sig("top2gram_chars") * 10 <= sig("n_chars") * 2) &&
      (sig("top3gram_count") <= 1 ||
        sig("top3gram_chars") * 100 <= sig("n_chars") * 18) &&
      sig("dup5gram_count") * 100 <= sig("n_5grams") * 15)

  /** Stable document fingerprint (md5 hex of normalized content). */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)

  /** Corpus-relative surprisal: mean -ln(p(token)) per document, with
    * unigram probabilities estimated from THIS corpus — the
    * self-contained stand-in for the LM-perplexity quality filters of
    * published web-corpus pipelines (CCNet-style: boilerplate and
    * in-domain text scores low, anomalous token soup scores high).
    *
    * Two linear passes: one token-keyed groupBy builds the unigram
    * table (map-side combined; the top `maxVocab` entries broadcast as
    * one map), then scoring is a map-only kernel over the scan — no
    * join, no second shuffle. With the vocab under `maxVocab` (any
    * test SF; most real corpora after normalization) the score is
    * exact; beyond it, rare tail tokens fall back to count 1, a
    * documented approximation that only sharpens the high-surprisal
    * signal they already carry. Empty/null documents yield null.
    */
  def surprisalScore(df: DataFrame, textCol: String,
      maxVocab: Int = 1 << 20, outCol: String = ""): DataFrame = {
    val out = if (outCol.nonEmpty) outCol else s"${textCol}_surprisal"
    val grouped = df
      .select(explode(graft.functions.Udfs.normTokensUdf(col(textCol))).as("__t"))
      .groupBy("__t").count()
    // one stats action: when the vocab fits the cap (the common case)
    // the grand total is the local sum of the collected counts; only a
    // TRUNCATED collect needs the extra distributed sum for exactness
    val collected = grouped.orderBy(col("count").desc, col("__t"))
      .limit(maxVocab).collect().map(r => r.getString(0) -> r.getLong(1))
    if (collected.isEmpty) // zero-token corpus (all null/empty docs)
      return df.withColumn(out, lit(null).cast("double"))
    val total =
      if (collected.length < maxVocab) collected.map(_._2).sum
      else Option(grouped.agg(sum("count")).head()
        .getAs[java.lang.Long](0)).map(_.longValue).getOrElse(0L)
    if (total == 0L)
      return df.withColumn(out, lit(null).cast("double"))
    val vocab = collected.toMap
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    val totD = total.toDouble
    val scoreUdf = udf((s: String) => {
      val toks = graft.functions.Udfs.normTokens(s)
      if (toks.isEmpty) null
      else {
        val m = bc.value
        var acc = 0.0
        var i = 0
        while (i < toks.length) {
          acc += -math.log(m.getOrElse(toks(i), 1L) / totD)
          i += 1
        }
        java.lang.Double.valueOf(acc / toks.length)
      }
    })
    df.withColumn(out, scoreUdf(col(textCol)))
  }

  /** Okapi BM25 relevance of every document to a fixed `query` string
    * (Robertson et al., TREC-3; idf in the log(1+x) form modern search
    * engines use, which never goes negative). The domain-relevance
    * scorer of a curation pipeline: score a 100 TB corpus against
    * "physics lecture notes" and keep the top slice, without training
    * anything.
    *
    * Scale shape: ONE aggregation action computes N, avgdl, and the
    * per-query-term document frequencies as |Q|+2 map-side-combined
    * aggregates over a single scan (query terms are driver-side
    * constants, so document frequencies are conditional sums — no
    * token explode, no join); scoring is then a map-only kernel with
    * the tiny idf table in the closure. Appends `<textCol>_bm25`
    * (0.0 for docs sharing no terms with the query).
    */
  def bm25Score(df: DataFrame, textCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75, outCol: String = ""): DataFrame = {
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"bm25-score: need k1 >= 0 and 0 <= b <= 1, got k1=$k1 b=$b")
    val out = if (outCol.nonEmpty) outCol else s"${textCol}_bm25"
    val terms = graft.functions.Udfs.normTokens(query).distinct.toSeq
    require(terms.nonEmpty,
      "bm25-score: query has no tokens after normalization")
    val toks = graft.functions.Udfs.normTokensUdf(col(textCol))
    val aggs = avg(size(col("__t"))).as("__avgdl") +:
      terms.map(t =>
        sum(when(array_contains(col("__t"), t), 1L).otherwise(0L)))
    val statsRow = df.select(toks.as("__t"))
      .agg(count(lit(1)).as("__n"), aggs: _*).head()
    val n = statsRow.getLong(0)
    if (n == 0L) return df.withColumn(out, lit(null).cast("double"))
    val avgdl = statsRow.getDouble(1)
    val idf = terms.zipWithIndex.map { case (t, i) =>
      val dft = statsRow.getLong(2 + i)
      t -> math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
    }
    val termArr = idf.map(_._1).toArray
    val idfArr = idf.map(_._2).toArray
    val scoreUdf = udf((s: String) => {
      val tk = graft.functions.Udfs.normTokens(s)
      val dl = tk.length.toDouble
      var acc = 0.0
      var i = 0
      while (i < termArr.length) {
        var tf = 0
        var j = 0
        while (j < tk.length) { if (tk(j) == termArr(i)) tf += 1; j += 1 }
        if (tf > 0) // fixed term order: deterministic double accumulation
          acc += idfArr(i) * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * dl / avgdl))
        i += 1
      }
      acc
    })
    df.withColumn(out, scoreUdf(col(textCol)))
  }

  /** Context-window chunking: one output row per sliding token window
    * (`size` tokens, `overlap` shared with the previous chunk) — the
    * prep step for embedding/RAG indexing and max-sequence-length
    * training shards. The text column is REPLACED by the chunk and a
    * 0-based `chunk_id` column is appended; empty/null documents
    * disappear (no chunks). Pure projection + generator: chunking a
    * 100 TB corpus is one map-side pass, no shuffle.
    */
  def chunkText(df: DataFrame, textCol: String, size: Int,
      overlap: Int = 0, chunkIdCol: String = "chunk_id"): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap")
    require(!df.columns.contains(chunkIdCol),
      s"chunkText: column '$chunkIdCol' already exists (re-chunking " +
        "chunks? pass a different chunkIdCol or drop the old one)")
    val others = df.columns.filter(_ != textCol).map(col).toSeq
    df.select(others :+
      posexplode(graft.functions.Udfs.chunkTokensUdf(
        col(textCol), lit(size), lit(overlap)))
        .as(Seq(chunkIdCol, textCol)): _*)
  }

  /** Content-defined chunking: boundaries at k-gram HASH ANCHORS
    * instead of fixed offsets, so an insertion near the top of a
    * document shifts only the one chunk it lands in — every later
    * chunk re-aligns on the same anchors and dedups against the
    * unedited copy (fixed-size chunking re-cuts the whole tail). The
    * anchor rule is a rolling-window polynomial over Unicode code
    * points ((a*257 + cp) mod 2^40, window chars, boundary when
    * h % modulus == 0 → expected chunk length ≈ modulus chars) —
    * exact integer arithmetic any engine replays. Map-only explode,
    * same shape as [[chunkText]].
    */
  def chunkCdc(df: DataFrame, textCol: String, window: Int = 16,
      modulus: Int = 512, chunkIdCol: String = "chunk_id"): DataFrame = {
    require(window >= 2 && window <= 1024, s"chunkCdc: window $window")
    require(modulus >= 2, s"chunkCdc: modulus $modulus")
    require(!df.columns.contains(chunkIdCol),
      s"chunkCdc: column '$chunkIdCol' already exists")
    val others = df.columns.filter(_ != textCol).map(col).toSeq
    df.select(others :+
      posexplode(graft.functions.Udfs.cdcChunksUdf(
        col(textCol), lit(window), lit(modulus)))
        .as(Seq(chunkIdCol, textCol)): _*)
  }

  /** Terminal-punctuation sentence pattern — deliberately restricted
    * to a regex both Java and RE2 dialects evaluate identically (no
    * lookbehind): a run of non-terminal chars, then either terminal
    * punctuation (keeping attached closing quotes/brackets) or end of
    * input (the tail fragment without terminal punctuation).
    */
  private[graft] val SentencePattern = """[^.!?]+(?:[.!?]+["')\]]*|$)"""

  /** Sentence segmentation: one output row per sentence (trimmed,
    * empties dropped), the text column REPLACED by the sentence and a
    * 0-based `sentence_id` appended — the precursor to sentence-level
    * dedup/scoring and a finer-grained chunking unit. Pure projection
    * + generator (native regexp_extract_all + posexplode): map-only,
    * no shuffle at any scale.
    */
  def splitSentences(df: DataFrame, textCol: String,
      idxCol: String = "sentence_id"): DataFrame = {
    require(!df.columns.contains(idxCol),
      s"splitSentences: column '$idxCol' already exists")
    val others = df.columns.filter(_ != textCol).map(col).toSeq
    val sents = filter(
      transform(
        regexp_extract_all(col(textCol), lit(SentencePattern), lit(0)),
        s => trim(s)),
      s => length(s) > 0)
    df.select(others :+
      posexplode(sents).as(Seq(idxCol, textCol)): _*)
  }

  /** (dominant script, its letter fraction, distinct scripts, letter
    * count) for [[scriptMixUdf]].
    */
  final case class ScriptMix(script: String, script_frac: java.lang.Double,
      n_scripts: Integer, letters: java.lang.Long)

  /** Unicode script mix of a document's LETTERS (the writing-system
    * complement of [[langId]]'s n-gram guess: script is table-exact
    * per codepoint — JDK Character.UnicodeScript, i.e. the Unicode
    * Scripts.txt property — so it routes multilingual corpora even
    * where short-text n-gram stats are ambiguous). Non-letters and the
    * COMMON/INHERITED classes (digits, punctuation, combining marks)
    * don't vote. Dominant ties break toward the alphabetically first
    * script name; a letterless document maps to (null, null, 0, 0).
    */
  def scriptMix(s: String): ScriptMix = {
    if (s == null) return ScriptMix(null, null, 0, 0L)
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    var letters = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        val sc = Character.UnicodeScript.of(cp)
        if (sc != Character.UnicodeScript.COMMON &&
          sc != Character.UnicodeScript.INHERITED &&
          sc != Character.UnicodeScript.UNKNOWN) {
          val name = sc.name.toLowerCase(java.util.Locale.ROOT)
          counts.merge(name, 1L, (a, b) => a + b)
          letters += 1
        }
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return ScriptMix(null, null, 0, 0L)
    var bestName: String = null
    var bestCount = -1L
    counts.forEach { (name, c) =>
      if (c > bestCount || (c == bestCount && name < bestName)) {
        bestName = name; bestCount = c
      }
    }
    ScriptMix(bestName,
      BigDecimal(bestCount.toDouble / letters)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      counts.size, letters)
  }

  val scriptMixUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(scriptMix _)

  /** One-call profile: appends all analysis columns. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val withFeatures = qualityFeatures(t).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withFeatures
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
