package graft

import org.apache.spark.sql.Row
import graft.sources.Eml

/** RFC 5322 / MIME email decode + mbox splitting. */
class EmlSpec extends SparkSpec {

  private val simple =
    """From: Alice <alice@example.com>
      |To: bob@example.com
      |Subject: plain subject
      |Date: Mon, 01 Jan 2024 10:00:00 +0000
      |
      |Hello Bob,
      |line two.""".stripMargin

  test("simple message: headers and plain body") {
    val m = Eml.parse(simple).get
    assert(m.from == "Alice <alice@example.com>")
    assert(m.to == "bob@example.com")
    assert(m.subject == "plain subject")
    assert(m.date == "Mon, 01 Jan 2024 10:00:00 +0000")
    assert(m.text == "Hello Bob,\nline two.")
    assert(m.html == null && m.n_parts == 1 && m.attachments.isEmpty)
  }

  test("header unfolding joins continuation lines") {
    val hs = Eml.parseHeaders(
      "Subject: a very\r\n long subject\r\nX-Other: v")
    assert(hs == Seq("Subject" -> "a very long subject", "X-Other" -> "v"))
  }

  test("RFC 2047 encoded words: B, Q, adjacency, broken kept raw") {
    assert(Eml.decodeWord("=?UTF-8?B?Q2Fmw6k=?=") == "Café")
    assert(Eml.decodeWord("=?utf-8?Q?Caf=C3=A9_x?=") == "Café x")
    // whitespace between two encoded words is transparent
    assert(Eml.decodeWord("=?UTF-8?B?YWI=?= =?UTF-8?B?Y2Q=?=") == "abcd")
    // but real text between words survives
    assert(Eml.decodeWord("=?UTF-8?B?YWI=?= and =?UTF-8?B?Y2Q=?=")
      == "ab and cd")
    // broken payload keeps the raw token
    assert(Eml.decodeWord("=?UTF-8?B?!!!notb64?=") == "=?UTF-8?B?!!!notb64?=")
    assert(Eml.decodeWord("no words here") == "no words here")
  }

  test("quoted-printable: hex escapes, soft breaks, malformed passthrough") {
    def qp(s: String) = new String(
      Eml.qpDecode(s.getBytes("ISO-8859-1")), "UTF-8")
    assert(qp("Caf=C3=A9") == "Café")
    assert(qp("long=\r\nline") == "longline") // soft break
    assert(qp("long=\nline") == "longline")
    assert(qp("broken=Zq") == "broken=Zq") // malformed escape literal
    assert(qp("trail=") == "trail=")
  }

  test("multipart: QP text, html alternative, base64 attachment") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "PDFBYTES".getBytes("UTF-8"))
    val msg =
      s"""From: x@e.com
         |Subject: =?UTF-8?B?${java.util.Base64.getEncoder
        .encodeToString("Sübject".getBytes("UTF-8"))}?=
         |MIME-Version: 1.0
         |Content-Type: multipart/mixed; boundary="outer"
         |
         |preamble is ignored
         |--outer
         |Content-Type: multipart/alternative; boundary=inner
         |
         |--inner
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: quoted-printable
         |
         |Body Caf=C3=A9 (1)
         |--inner
         |Content-Type: text/html; charset=utf-8
         |
         |<p>Body</p>
         |--inner--
         |--outer
         |Content-Type: application/pdf; name="doc.pdf"
         |Content-Transfer-Encoding: base64
         |Content-Disposition: attachment; filename="doc.pdf"
         |
         |$b64
         |--outer--
         |epilogue""".stripMargin
    val m = Eml.parse(msg).get
    assert(m.subject == "Sübject")
    assert(m.text == "Body Café (1)")
    assert(m.html == "<p>Body</p>")
    assert(m.n_parts == 3)
    assert(m.attachments == Seq("doc.pdf"))
    val parts = Eml.parts(msg)
    val pdf = parts.find(_.content_type == "application/pdf").get
    assert(new String(pdf.data, "UTF-8") == "PDFBYTES")
    assert(pdf.filename == "doc.pdf")
  }

  test("mbox split: From_ separators, mboxrd unstuffing, preamble dropped") {
    val mbox =
      """junk before first message
        |From alice@e.com Mon Jan  1 10:00:00 2024
        |From: a@e.com
        |
        |body one
        |>From quoted line
        |From bob@e.com Tue Jan  2 10:00:00 2024
        |From: b@e.com
        |
        |body two""".stripMargin
    val msgs = Eml.splitMbox(mbox)
    assert(msgs.length == 2)
    assert(msgs(0).contains("From: a@e.com"))
    assert(msgs(0).contains("\nFrom quoted line")) // one '>' removed
    assert(msgs(1).endsWith("body two"))
    assert(Eml.splitMbox(null).isEmpty)
    assert(Eml.splitMbox("no separators at all").isEmpty)
  }

  test("directives: parse-as-mbox then parse-as-eml chain") {
    val mbox = "From a Mon Jan 1\n" + simple.replace("\r", "") +
      "\nFrom b Tue Jan 2\n" +
      "From: carol@e.com\nSubject: second\n\nsecond body"
    val in = df("id LONG, raw STRING", Seq(Row(1L, mbox)))
    val out = wrangle(
      "parse-as-mbox :raw; parse-as-eml :raw_message", in)
      .select("id", "raw_message_from", "raw_message_subject",
        "raw_message_text")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq.sorted
    assert(out == Seq(
      ("Alice <alice@example.com>", "plain subject"),
      ("carol@e.com", "second")))
  }

  test("totality: garbage, truncations, random mutations never throw") {
    assert(Eml.parse(null).isEmpty)
    assert(Eml.parse("").isEmpty)
    assert(Eml.parse("no colon lines\nat all\n\nbody").isEmpty)
    val rnd = new scala.util.Random(17)
    val base = ("From: a@e.com\nContent-Type: multipart/mixed; " +
      "boundary=b\n\n--b\nContent-Type: text/plain\n\nx\n--b--")
    (0 until 300).foreach { _ =>
      val chars = base.toCharArray
      (0 until 4).foreach { _ =>
        chars(rnd.nextInt(chars.length)) = rnd.nextPrintableChar() }
      Eml.parse(new String(chars)) // must not throw
      Eml.parts(new String(chars))
      Eml.splitMbox(new String(chars))
    }
  }
}
