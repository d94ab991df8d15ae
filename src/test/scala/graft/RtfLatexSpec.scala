package graft

import org.apache.spark.sql.Row
import graft.sources.Rtf
import graft.llm.TextAnalysis

/** RTF extraction and LaTeX stripping. */
class RtfLatexSpec extends SparkSpec {

  test("rtf: destinations skipped, escapes, unicode, par/tab") {
    val rtf = Seq(
      "{\\rtf1\\ansi\\deff0",
      "{\\fonttbl{\\f0 Times New Roman;}}",
      "{\\colortbl;\\red0\\green0\\blue0;}",
      "{\\*\\generator Riched20}",
      "First line\\par",
      "Caf\\'e9 and \\u8212?dash\\tab end\\par",
      "Braces \\{x\\} and 50\\% done",
      "}").mkString("\r\n")
    val text = Rtf.extract(rtf)
    assert(text.contains("First line\n"))
    assert(text.contains("Café and —dash\tend"))
    assert(text.contains("Braces {x} and 50% done"))
    assert(!text.contains("Times New Roman")) // fonttbl skipped
    assert(!text.contains("Riched20")) // starred destination skipped
    // \ucN fallback skipping: \uc2 means two fallback chars drop
    assert(Rtf.extract("{\\rtf1\\uc2\\u934 FF after}") == "\u03a6 after")
    // negative \u is codepoint-65536
    assert(Rtf.extract("{\\rtf1\\uc0\\u-3812 }") == "\uf11c")
    // non-RTF and garbage: empty, never throws
    assert(Rtf.extract("plain text") == "")
    assert(Rtf.extract(null) == "")
    assert(Rtf.extract("{\\rtf1 trailing\\") == "trailing")
  }

  test("rtf: Word-style escape fallbacks consumed as one unit (r14 advice)") {
    // Word writes the \uN fallback as a \'hh escape, e.g. \u8212\'97 —
    // before the fix the escape decoded and APPENDED after the
    // Unicode char, duplicating every non-ASCII char in
    // Word-authored RTF (em-dash became two dashes)
    assert(Rtf.extract("{\\rtf1\\ansi a\\u8212\\'97b}") == "a—b")
    // \uc2 with two escape fallbacks
    assert(Rtf.extract("{\\rtf1\\uc2\\u934\\'46\\'46 after}") == "Φ after")
    // mixed escape + plain fallback
    assert(Rtf.extract("{\\rtf1\\uc2\\u934\\'46F after}") == "Φ after")
    // a control-symbol escape is one fallback unit too
    assert(Rtf.extract("{\\rtf1 a\\u8212\\~x}") == "a—x")
    // truncated escape at EOF: total
    assert(Rtf.extract("{\\rtf1 a\\u8212\\'9") == "a—")
    // a control WORD ends the fallback run: the tab renders once and
    // the following real character is NOT eaten as "fallback"
    assert(Rtf.extract("{\\rtf1 \\u945\\tab abc}") == "α\tabc")
    // consecutive \uN with omitted fallbacks: both render (the second
    // escape is not eaten as the first one's fallback); the char after
    // the delimiter IS \u946's fallback and is skipped
    assert(Rtf.extract("{\\rtf1 \\u945\\u946 x}") == "αβ")
    assert(Rtf.extract("{\\rtf1 \\u945\\u946}") == "αβ")
  }

  test("rtf: totality fuzz on mutated documents") {
    val base = "{\\rtf1{\\fonttbl{\\f0 X;}}Hello \\'e9 \\u934?F world\\par}"
    val rnd = new scala.util.Random(23)
    (0 until 400).foreach { _ =>
      val chars = base.toCharArray
      (0 until 4).foreach { _ =>
        chars(rnd.nextInt(chars.length)) = rnd.nextPrintableChar() }
      Rtf.extract(new String(chars)) // must not throw
    }
  }

  test("latex: comments, math, environments, commands, specials") {
    val tex =
      """\documentclass{article}
        |% a full-line comment
        |\begin{document}
        |\section{Intro}
        |We study \emph{large} models % trailing comment
        |with loss $L = \sum_i \ell_i$ and 50\% gains~here.
        |\begin{equation}
        |E = mc^2
        |\end{equation}
        |As shown in \cite{smith2020}, the \textbf{key} result
        |\footnote{a note} holds.
        |
        |New paragraph with ``quotes'' and \mystery text.
        |\end{document}""".stripMargin
    val out = TextAnalysis.stripLatex(tex)
    assert(!out.contains("%") || out.contains("50%"))
    assert(out.contains("Intro"))
    assert(out.contains("We study large models"))
    assert(!out.contains("mc^2")) // equation env dropped
    assert(!out.contains("smith2020")) // cite dropped with arg
    assert(out.contains("key result"))
    assert(out.contains("a note")) // footnote text kept
    assert(out.contains("50% gains here"))
    assert(out.contains("“quotes”"))
    assert(out.contains("New paragraph"))
    assert(!out.contains("\\")) // no commands survive
    assert(TextAnalysis.stripLatex(null) == null)
    assert(TextAnalysis.stripLatex("plain prose stays") == "plain prose stays")
  }

  test("markdown tables: header/delimiter detection, escapes, multiple tables") {
    val md = Seq(
      "Intro prose | with a stray pipe but no delimiter line below",
      "",
      "| Name | Value |",
      "| --- | ---: |",
      "| a | 1 |",
      "b | pipe \\| kept",
      "",
      "not a table anymore",
      "Col1|Col2",
      ":---|----",
      "x|y").mkString("\n")
    val cells = TextAnalysis.extractMdTables(md)
    assert(cells.map(c => (c.table, c.row, c.col, c.is_header, c.text)) ==
      Seq(
        (0, 0, 0, true, "Name"), (0, 0, 1, true, "Value"),
        (0, 1, 0, false, "a"), (0, 1, 1, false, "1"),
        (0, 2, 0, false, "b"), (0, 2, 1, false, "pipe | kept"),
        (1, 0, 0, true, "Col1"), (1, 0, 1, true, "Col2"),
        (1, 1, 0, false, "x"), (1, 1, 1, false, "y")))
    assert(TextAnalysis.extractMdTables(null).isEmpty)
    assert(TextAnalysis.extractMdTables("no tables | here").isEmpty)
    // directive
    val in = df("id LONG, t STRING",
      Seq(Row(1L, "| H |\n| --- |\n| v |")))
    val rows = wrangle("extract-md-tables :t", in)
      .select("t_row", "t_is_header", "t_cell").collect()
      .map(r => (r.getInt(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(rows == Seq((0, true, "H"), (1, false, "v")))
  }

  test("markdown sections: breadcrumbs, stack pops, fences, preamble") {
    val md = Seq(
      "intro text",
      "# One",
      "alpha",
      "```",
      "# not a heading",
      "```",
      "## A",
      "beta",
      "### deep",
      "x",
      "## B  ##", // trailing closing hashes stripped
      "gamma",
      "# Two",
      "").mkString("\n")
    val ss = TextAnalysis.splitMdSections(md)
    assert(ss.map(s => (s.section, s.level, s.heading, s.heading_path)) ==
      Seq(
        (0, 0, null, ""),
        (1, 1, "One", "One"),
        (2, 2, "A", "One > A"),
        (3, 3, "deep", "One > A > deep"),
        (4, 2, "B", "One > B"),
        (5, 1, "Two", "Two")))
    assert(ss(0).text == "intro text")
    assert(ss(1).text == "alpha\n```\n# not a heading\n```")
    assert(ss(3).text == "x")
    assert(ss(5).text == "") // heading with empty body keeps its row
    // no headings at all: one level-0 section
    assert(TextAnalysis.splitMdSections("plain\nprose").map(_.text) ==
      Seq("plain\nprose"))
    // a one-line ```x``` snippet is inline code, not an open fence —
    // headings after it must still split
    val inline = TextAnalysis.splitMdSections(
      "```js console.log(1)```\n# H\nbody")
    assert(inline.map(_.heading) == Seq(null, "H"))
    // a ~~~ line inside a ``` block is body; only ``` closes
    val mixed = TextAnalysis.splitMdSections(
      "```\n~~~\n# not heading\n```\n# H2\nx")
    assert(mixed.map(_.heading) == Seq(null, "H2"))
    assert(mixed(0).text.contains("~~~"))
    // totality
    assert(TextAnalysis.splitMdSections(null).isEmpty)
    assert(TextAnalysis.splitMdSections("").isEmpty)
    // directive
    val in = df("id LONG, t STRING", Seq(Row(1L, "# H\nbody")))
    val rows = wrangle("split-sections :t", in)
      .select("t_heading", "t_heading_path", "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("H", "H", "body")))
  }

  test("directives: parse-as-rtf and strip-latex") {
    val in = df("id LONG, doc STRING", Seq(
      Row(1L, "{\\rtf1 Hello\\par world}"),
      Row(2L, "\\section{T} Body $x$ end.")))
    val rtf = wrangle("parse-as-rtf :doc", in).filter("id = 1")
      .select("doc_text").head().getString(0)
    assert(rtf == "Hello\nworld")
    val tex = wrangle("strip-latex :doc", in).filter("id = 2")
      .select("doc").head().getString(0)
    assert(tex == "T Body end.")
  }
}
