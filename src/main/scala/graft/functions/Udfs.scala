package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The small UDF island: deterministic scalar functions with no native
  * Catalyst equivalent (SURVEY §4.2 — "UDF only for the library-bound
  * ops"). Everything else in the engine is native `Column` expressions.
  * All functions here are pure and null-safe.
  */
object Udfs {

  // ---- base32 (RFC 4648) — commons-codec equivalent, self-contained --
  // (reference behavior: wrangler-core directives/transformation/Encode.java:104)
  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  def base32Encode(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    for (b <- bytes) {
      buffer = (buffer << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) {
        sb.append(B32.charAt(((buffer >> (bits - 5)) & 31).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(B32.charAt(((buffer << (5 - bits)) & 31).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    if (s == null) return null
    val clean = s.toUpperCase.replaceAll("=+$", "")
    val out = new java.io.ByteArrayOutputStream
    var buffer = 0L
    var bits = 0
    for (c <- clean) {
      val v = B32.indexOf(c)
      if (v >= 0) {
        buffer = (buffer << 5) | v
        bits += 5
        if (bits >= 8) { out.write(((buffer >> (bits - 8)) & 0xff).toInt); bits -= 8 }
      }
    }
    out.toByteArray
  }

  val base32EncodeUdf: UserDefinedFunction = udf(base32Encode _)
  val base32DecodeUdf: UserDefinedFunction = udf(base32Decode _)

  // ---- mask-number: '#'=keep digit, 'x'=mask, literal passes through --
  // (reference: wrangler-core directives/transformation/MaskNumber.java:121-146)
  def maskNumber(value: String, pattern: String): String = {
    if (value == null) return null
    val sb = new StringBuilder
    var vi = 0
    var pi = 0
    while (pi < pattern.length && vi < value.length) {
      val p = pattern.charAt(pi)
      p match {
        case '#' => sb.append(value.charAt(vi)); vi += 1
        case 'x' => sb.append('x'); vi += 1
        case other =>
          // literal: emit it; consume the input char only if it equals the
          // literal (the reference's consume-if-equal quirk)
          sb.append(other)
          if (value.charAt(vi) == other) vi += 1
      }
      pi += 1
    }
    sb.toString
  }
  val maskNumberUdf: UserDefinedFunction = udf(maskNumber _)

  // ---- mask-shuffle: per-char shuffle preserving char classes ---------
  // (reference: wrangler-core directives/transformation/MaskShuffle.java:80)
  // Deterministic here (seeded by the value) so results are reproducible.
  def maskShuffle(value: String): String = {
    if (value == null) return null
    // inline xorshift64* seeded by the value — no Random allocation.
    // splitmix-style seed mixing: a bare `hashCode | 1` collapses
    // adjacent even/odd hashCodes ("NATION_0"/"NATION_1") to one seed
    var s = value.hashCode.toLong * 0x9E3779B97F4A7C15L
    s ^= (s >>> 32)
    if (s == 0) s = 0x5DEECE66DL
    def next(bound: Int): Int = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (((s * 0x2545F4914F6CDD1DL) >>> 33) % bound).toInt
    }
    val sb = new StringBuilder(value.length)
    var i = 0
    while (i < value.length) {
      val c = value.charAt(i)
      sb.append(
        if (c.isUpper) ('A' + next(26)).toChar
        else if (c.isLower) ('a' + next(26)).toChar
        else if (c.isDigit) ('0' + next(10)).toChar
        else c)
      i += 1
    }
    sb.toString
  }
  val maskShuffleUdf: UserDefinedFunction = udf(maskShuffle _)

  // ---- generic MessageDigest hash (hex) for non-native algorithms -----
  // (reference: wrangler-core directives/transformation/MessageHash.java:54-107;
  //  JDK-provided algorithms only — no external JCE provider here)
  def digestHex(value: String, algo: String): String = {
    if (value == null) return null
    val bytes = value.getBytes("UTF-8")
    // pure-JVM algorithms first (BLAKE2b/RIPEMD/MD4/SM3/KECCAK —
    // Digests), then whatever the JDK's MessageDigest provides
    // (incl. SHA3-*, SHA-512/224, SHA-512/256)
    val custom = Digests.digest(algo, bytes)
    if (custom != null) Digests.hex(custom)
    else {
      val up = algo.toUpperCase
      // every name in the reference's BouncyCastle list is implemented
      // (Digests.digest above); an UNKNOWN GOST/Skein spelling (or a
      // non-byte-multiple Skein output) still gets this precise error
      // rather than the JDK's NoSuchAlgorithmException
      if (up.startsWith("GOST") || up.startsWith("SKEIN"))
        throw new IllegalArgumentException(
          s"hash: unknown algorithm spelling '$algo'; supported " +
            "beyond the JDK set: BLAKE2B-*, RIPEMD-128/160/256/320, " +
            "MD4, SM3, KECCAK-224/256/288/384/512, WHIRLPOOL, TIGER, " +
            "TIGER2, GOST3411, GOST3411-2012-256, GOST3411-2012-512, " +
            "SKEIN-{256,512,1024}-<bits>, SHA-512/224, SHA-512/256")
      Digests.hex(java.security.MessageDigest.getInstance(algo)
        .digest(bytes))
    }
  }
  val digestHexUdf: UserDefinedFunction = udf(digestHex _)

  // ---- text distance / similarity -------------------------------------
  // (reference: wrangler-core directives/transformation/TextDistanceMeasure.java:72-133,
  //  TextMetricMeasure.java — simmetrics StringDistances/StringMetrics;
  //  re-implemented from the published metric definitions)
  def levenshtein(a: String, b: String): Int = {
    val (m, n) = (a.length, b.length)
    if (m == 0) return n
    if (n == 0) return m
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    for (i <- 1 to m) {
      cur(0) = i
      for (j <- 1 to n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(n)
  }

  private def bigrams(s: String): Map[String, Int] =
    if (s.length < 2) Map(s -> 1)
    else s.sliding(2).toSeq.groupBy(identity).map { case (k, v) => k -> v.size }

  private def tokens(s: String): Set[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet

  /** Jaro similarity (published definition: match window, matches m,
    * transpositions t → (m/|a| + m/|b| + (m-t)/m) / 3).
    */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var m = 0
    for (i <- a.indices) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    for (i <- a.indices if aM(i)) {
      while (!bM(j)) j += 1
      if (a.charAt(i) != b.charAt(j)) t += 1
      j += 1
    }
    (m.toDouble / a.length + m.toDouble / b.length +
      (m - t / 2.0) / m) / 3.0
  }

  /** Optimal-string-alignment Damerau-Levenshtein (adjacent
    * transposition counts as one edit). */
  def damerauLevenshtein(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
          a.charAt(i - 2) == b.charAt(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(a.length)(b.length)
  }

  /** Simon White / Sørensen-Dice over per-word character bigram
    * multisets ("How to Strike a Match": Healed/Sealed = 0.8). */
  def simonWhite(a: String, b: String): Double = {
    def pairs(s: String): Seq[String] =
      s.toLowerCase.split("\\s+").filter(_.length > 1)
        .flatMap(w => w.sliding(2)).toSeq
    val (pa, pb) = (pairs(a), pairs(b))
    if (pa.isEmpty && pb.isEmpty) return 1.0
    if (pa.isEmpty || pb.isEmpty) return 0.0
    // multiset intersection
    val counts = scala.collection.mutable.Map.empty[String, Int]
    pa.foreach(p => counts(p) = counts.getOrElse(p, 0) + 1)
    var inter = 0
    pb.foreach { p =>
      val c = counts.getOrElse(p, 0)
      if (c > 0) { inter += 1; counts(p) = c - 1 }
    }
    2.0 * inter / (pa.size + pb.size)
  }

  /** similarity ∈ [0,1] per published metric definitions */
  def textMetric(method: String, a0: String, b0: String): Double = {
    if (a0 == null || b0 == null) return 0.0
    val (a, b) = (a0, b0)
    method.toLowerCase match {
      case "levenshtein" =>
        val d = levenshtein(a, b)
        if (math.max(a.length, b.length) == 0) 1.0
        else 1.0 - d.toDouble / math.max(a.length, b.length)
      case "damerau-levenshtein" =>
        val d = damerauLevenshtein(a, b)
        if (math.max(a.length, b.length) == 0) 1.0
        else 1.0 - d.toDouble / math.max(a.length, b.length)
      case "jaro" => jaro(a, b)
      case "simon-white" => simonWhite(a, b)
      case "jaccard" | "generalized-jaccard" =>
        val (ta, tb) = (tokens(a), tokens(b))
        if (ta.isEmpty && tb.isEmpty) 1.0
        else ta.intersect(tb).size.toDouble / ta.union(tb).size
      case "dice" =>
        val (ta, tb) = (tokens(a), tokens(b))
        if (ta.isEmpty && tb.isEmpty) 1.0
        else 2.0 * ta.intersect(tb).size / (ta.size + tb.size)
      case "overlap" | "overlap-cofficient" | "overlap-coefficient" =>
        val (ta, tb) = (tokens(a), tokens(b))
        if (ta.isEmpty || tb.isEmpty) 0.0
        else ta.intersect(tb).size.toDouble / math.min(ta.size, tb.size)
      case "cosine" =>
        val (ba, bb) = (bigrams(a), bigrams(b))
        val dot = ba.keySet.intersect(bb.keySet).iterator
          .map(k => ba(k).toDouble * bb(k)).sum
        val na = math.sqrt(ba.values.map(v => v.toDouble * v).sum)
        val nb = math.sqrt(bb.values.map(v => v.toDouble * v).sum)
        if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      case "identity" => if (a == b) 1.0 else 0.0
      case "longest-common-subsequence" =>
        val l = lcsLen(a, b)
        if (math.max(a.length, b.length) == 0) 1.0
        else l.toDouble / math.max(a.length, b.length)
      case "longest-common-substring" =>
        val l = lcSubstrLen(a, b)
        if (math.max(a.length, b.length) == 0) 1.0
        else l.toDouble / math.max(a.length, b.length)
      case "block" | "block-distance" | "euclidean" =>
        val (ba, bb) = (bigrams(a), bigrams(b))
        val keys = ba.keySet.union(bb.keySet)
        val dist = method.toLowerCase match {
          case "euclidean" =>
            math.sqrt(keys.iterator.map { k =>
              val d = ba.getOrElse(k, 0) - bb.getOrElse(k, 0); d.toDouble * d
            }.sum)
          case _ => keys.iterator.map(k =>
            math.abs(ba.getOrElse(k, 0) - bb.getOrElse(k, 0)).toDouble).sum
        }
        val total = ba.values.sum + bb.values.sum
        if (total == 0) 1.0 else math.max(0.0, 1.0 - dist / total)
      case other => throw new IllegalArgumentException(s"text metric: $other")
    }
  }

  /** raw distance flavor (higher = more different) */
  def textDistance(method: String, a: String, b: String): Double = {
    if (a == null || b == null) return Double.MaxValue
    method.toLowerCase match {
      case "levenshtein" => levenshtein(a, b).toDouble
      case "damerau-levenshtein" => damerauLevenshtein(a, b).toDouble
      case "longest-common-subsequence" => (a.length + b.length - 2 * lcsLen(a, b)).toDouble
      case "longest-common-substring" =>
        (math.max(a.length, b.length) - lcSubstrLen(a, b)).toDouble
      case m => 1.0 - textMetric(m, a, b)
    }
  }

  private def lcsLen(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a.charAt(i - 1) == b.charAt(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  private def lcSubstrLen(a: String, b: String): Int = {
    var best = 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a.charAt(i - 1) == b.charAt(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    dp(a.length)(b.length)
    best
  }

  val textMetricUdf: UserDefinedFunction = udf(textMetric _)
  val textDistanceUdf: UserDefinedFunction = udf(textDistance _)

  // ---- Porter stemmer ---------------------------------------------------
  // Implementation of the published Porter (1980) algorithm, the same
  // algorithm behind the reference's nlp/internal/PorterStemmer.java.
  def porterStem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word.toLowerCase

    def isVowel(s: String, i: Int): Boolean = {
      val c = s.charAt(i)
      "aeiou".indexOf(c) >= 0 ||
        (c == 'y' && i > 0 && !isVowel(s, i - 1))
    }
    def measure(s: String): Int = {
      var m = 0
      var i = 0
      while (i < s.length && !isVowel(s, i)) i += 1
      while (i < s.length) {
        while (i < s.length && isVowel(s, i)) i += 1
        if (i < s.length) { m += 1; while (i < s.length && !isVowel(s, i)) i += 1 }
      }
      m
    }
    def hasVowel(s: String): Boolean = (0 until s.length).exists(isVowel(s, _))
    def endsCVC(s: String): Boolean =
      s.length >= 3 && !isVowel(s, s.length - 3) && isVowel(s, s.length - 2) &&
        !isVowel(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))
    def doubleC(s: String): Boolean =
      s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
        !isVowel(s, s.length - 1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)
    // step 1b
    var step1bFlag = false
    if (w.endsWith("eed")) { if (measure(w.dropRight(3)) > 0) w = w.dropRight(1) }
    else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) { w = w.dropRight(2); step1bFlag = true }
    else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) { w = w.dropRight(3); step1bFlag = true }
    if (step1bFlag) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (doubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCVC(w)) w += "e"
    }
    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"
    // step 2
    val step2 = List(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + rep
    }
    // step 3
    val step3 = List("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + rep
    }
    // step 4
    val step4 = List("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(w.endsWith).foreach { suf =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 1) w = stem
      else if (suf == "ion" && stem.nonEmpty && "st".contains(stem.last) &&
        measure(stem) > 1) w = stem
    }
    if (w.endsWith("ion") && w.length > 3 && "st".contains(w.charAt(w.length - 4)) &&
      measure(w.dropRight(3)) > 1) w = w.dropRight(3)
    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      if (measure(stem) > 1 || (measure(stem) == 1 && !endsCVC(stem))) w = stem
    }
    // step 5b
    if (doubleC(w) && w.endsWith("l") && measure(w) > 1) w = w.dropRight(1)
    w
  }

  def stemTokens(text: String): Array[String] =
    if (text == null) Array.empty
    else text.split("\\s+").filter(_.nonEmpty).map(porterStem)

  val stemUdf: UserDefinedFunction = udf(stemTokens _)

  // ---- currency parse/format (locale-aware) ---------------------------
  // (reference: wrangler-core directives/currency/ParseAsCurrency.java:92,
  //  FormatAsCurrency.java:88 — java.text.NumberFormat per locale)
  def parseCurrency(value: String, locale: String): java.lang.Double = {
    if (value == null) return null
    val loc = java.util.Locale.forLanguageTag(
      Option(locale).getOrElse("en-US").replace('_', '-'))
    val nf = java.text.NumberFormat.getCurrencyInstance(loc)
    try java.lang.Double.valueOf(nf.parse(value.trim).doubleValue)
    catch {
      case _: java.text.ParseException =>
        try java.lang.Double.valueOf(
          value.replaceAll("[^0-9.,-]", "").replace(",", "").toDouble)
        catch { case _: NumberFormatException => null }
    }
  }
  def formatCurrency(value: java.lang.Double, locale: String): String = {
    if (value == null) return null
    val loc = java.util.Locale.forLanguageTag(
      Option(locale).getOrElse("en-US").replace('_', '-'))
    java.text.NumberFormat.getCurrencyInstance(loc).format(value.doubleValue)
  }
  val parseCurrencyUdf: UserDefinedFunction = udf(parseCurrency _)
  val formatCurrencyUdf: UserDefinedFunction = udf(formatCurrency _)

  // ---- dedup kernels ---------------------------------------------------
  // Per-row MinHash/SimHash signatures as tight JIT'd loops. The
  // relational parts of dedup (banding, bucket shuffles, candidate
  // joins, Jaccard verification) stay native DataFrame ops; only the
  // per-document kernel lives here, because Catalyst higher-order
  // functions are CodegenFallback (interpreted per element) and
  // re-evaluate captured subexpressions per element — a 100x slowdown
  // measured against this implementation.

  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  // ---- text-analysis kernels -------------------------------------------
  // lang-id / quality-score / token-count are the per-row hot path of a
  // curation run; their Column formulations lean on filter()/aggregate()
  // HOFs, which are CodegenFallback. Same trade as the dedup kernels:
  // tight JVM loops, with LlmSpec asserting value parity against the
  // Column versions (incl. null/empty/punctuation edges).

  private lazy val langTables: Seq[(String, java.util.HashSet[String])] =
    graft.llm.TextAnalysis.stopwords.toSeq.sortBy(_._1).map {
      case (l, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        (l, s)
    }

  // hoisted: one lookup per JVM, not one linear scan per row
  private lazy val enStopwords: java.util.HashSet[String] =
    langTables.find(_._1 == "en").get._2

  /** Whitespace tokens, empties dropped (shared token definition). */
  private def wsTokens(text: String): Array[String] =
    wsRun.split(text).filter(_.nonEmpty)

  def tokenCountKernel(text: String): Integer =
    if (text == null) null else Integer.valueOf(wsTokens(text).length)

  /** Argmax over per-language stopword hits on lowercased tokens;
    * alphabetical tie-break; no hits (or null) → "und" — exactly the
    * Column version's semantics. */
  def langIdKernel(text: String): String = {
    if (text == null) return "und"
    // Locale.ROOT: Spark's lower() is locale-independent — a tr_TR
    // default locale would otherwise dot-shift 'I' and break parity
    val toks = wsTokens(text.toLowerCase(java.util.Locale.ROOT))
    var bestLang = "und"
    var best = 0
    langTables.foreach { case (l, set) =>
      var hits = 0
      var i = 0
      while (i < toks.length) { if (set.contains(toks(i))) hits += 1; i += 1 }
      if (hits > best) { best = hits; bestLang = l } // '>' keeps first at tie
    }
    bestLang
  }

  /** Composite quality score — same factors, thresholds and HALF_UP
    * 4-digit rounding as the Column version / DuckDB oracle. */
  def qualityScoreKernel(text: String): java.lang.Double = {
    // null text: every null comparison in the Column/oracle version
    // falls through to its otherwise() factor → 0.3·0.5·0.5·0.7
    if (text == null) return java.lang.Double.valueOf(0.0525)
    // denominator counts CODEPOINTS — Spark length() and DuckDB len()
    // both do; UTF-16 units would double-count astral chars (emoji)
    // and silently shift the ratios off the oracle
    val n = math.max(text.codePointCount(0, text.length), 1).toDouble
    val toks = wsTokens(text)
    val nTok = toks.length
    var punct = 0; var digit = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') digit += 1
      else if (c >= '!' && c <= '~' && !Character.isLetterOrDigit(c)) punct += 1
      i += 1
    }
    val en = enStopwords
    var sw = 0
    val lower = wsTokens(text.toLowerCase(java.util.Locale.ROOT))
    i = 0
    while (i < lower.length) { if (en.contains(lower(i))) sw += 1; i += 1 }
    val lenOk = if (nTok >= 5 && nTok <= 100000) 1.0 else 0.3
    val punctOk = if (punct / n < 0.2) 1.0 else 0.5
    val digitOk = if (digit / n < 0.3) 1.0 else 0.5
    val swRatio = if (nTok > 0) sw.toDouble / nTok else 0.0
    val swOk = if (swRatio > 0.05) 1.0 else 0.7
    java.lang.Double.valueOf(
      math.floor(lenOk * punctOk * digitOk * swOk * 1e4 + 0.5) / 1e4)
  }

  val tokenCountUdf: UserDefinedFunction = udf(tokenCountKernel _)
  val langIdUdf: UserDefinedFunction = udf(langIdKernel _)
  val qualityScoreUdf: UserDefinedFunction = udf(qualityScoreKernel _)

  /** Gopher-style within-document repetition signals: duplicate-line
    * fraction and duplicate word-3-gram fraction. A JVM kernel, not
    * Catalyst HOFs (CodegenFallback — see the island note above). The
    * DuckDB oracle recomputes both with list functions.
    */
  def repetitionRatios(text: String): (Double, Double) = {
    if (text == null) return (0.0, 0.0)
    // half-UP at 1e-6 (not rint's half-even) — matches DuckDB round()
    def r6(d: Double) = math.floor(d * 1e6 + 0.5) / 1e6
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toArray
    val dupLine =
      if (lines.isEmpty) 0.0
      else {
        val distinct = new java.util.HashSet[String]()
        lines.foreach(distinct.add)
        r6((lines.length - distinct.size).toDouble / lines.length)
      }
    val toks = wsRun.split(text).filter(_.nonEmpty)
    val tri = toks.length - 2
    val dupTri =
      if (tri <= 0) 0.0
      else {
        val distinct = new java.util.HashSet[String]()
        var i = 0
        while (i < tri) {
          distinct.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
          i += 1
        }
        r6((tri - distinct.size).toDouble / tri)
      }
    (dupLine, dupTri)
  }

  // null text maps to (0.0, 0.0) — the kernel's own contract AND what
  // the DuckDB oracle's CASE...ELSE 0.0 emits (a null struct here
  // would hash-mismatch the oracle on any corpus with null documents)
  val repetitionUdf: UserDefinedFunction = udf(repetitionRatios _)

  /** Word n-gram Jaccard over distinct gram hash sets — tight loop,
    * no per-window array/json allocation beyond the gram join.
    */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    def grams(s: String): java.util.HashSet[Long] = {
      val toks = normalizeText(s).split(" ").filter(_.nonEmpty)
      val out = new java.util.HashSet[Long]()
      val windows = math.max(toks.length - n + 1, 1)
      var i = 0
      while (i < windows) {
        var h = 0xcbf29ce484222325L
        var j = i
        val end = math.min(i + n, toks.length)
        while (j < end) {
          val t = toks(j)
          var p = 0
          while (p < t.length) { h ^= t.charAt(p); h *= 0x100000001b3L; p += 1 }
          h ^= 0x1f; h *= 0x100000001b3L // token boundary
          j += 1
        }
        out.add(h)
        i += 1
      }
      out
    }
    val (ga, gb) = (grams(a), grams(b))
    if (ga.isEmpty && gb.isEmpty) return 1.0
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    val union = ga.size + gb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
  val ngramJaccardUdf: UserDefinedFunction = udf(ngramJaccard _)

  /** Distinct FNV-1a hashes of the word n-grams of the normalized
    * text, for benchmark decontamination (llm/Decontaminate.scala).
    * Gram i (0-based) covers tokens [i, min(i+n, len)); i ranges over
    * [0, max(len-n+1, 1)) — a document shorter than n tokens yields
    * exactly ONE gram of all its tokens, and an empty document yields
    * NONE (unlike ngramJaccard's seed-gram-for-empty, where two empty
    * docs must compare equal). A 0x1f boundary marker between tokens
    * keeps the hash injective over token SEQUENCES ("ab c" vs "a bc"),
    * mirroring the to_json(list) gram identity the DuckDB oracle uses.
    */
  def tokenGramHashes(text: String, n: Int): Array[Long] = {
    val toks = normalizeText(text).split(" ").filter(_.nonEmpty)
    if (toks.isEmpty) return Array.empty
    val windows = math.max(toks.length - n + 1, 1)
    val set = new java.util.HashSet[Long](windows * 2)
    var i = 0
    while (i < windows) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        val t = toks(j)
        var p = 0
        while (p < t.length) { h ^= t.charAt(p); h *= 0x100000001b3L; p += 1 }
        h ^= 0x1f; h *= 0x100000001b3L // token boundary
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
  val tokenGramHashesUdf: UserDefinedFunction = udf(tokenGramHashes _)

  /** FNV-1a hash of every length-n window of the RAW whitespace tokens
    * (case-sensitive, no normalization — exact-substring semantics for
    * llm/SpanDedup), in token order: element i (0-based) is the hash
    * of tokens [i, i+n). A document with fewer than n tokens yields an
    * EMPTY array — it cannot contain a full-length duplicated span.
    * Unlike tokenGramHashes (one FNV stream with a 0x1f boundary byte),
    * each token hashes once and a window folds its n token hashes with
    * an order-sensitive xor-multiply — token boundaries are preserved
    * by the per-token fold itself, so the window hash stays injective
    * over token sequences modulo 64-bit collisions.
    */
  def wsGramHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val toks = wsRun.split(text.trim).filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    // each token hashes ONCE (chars touched once per doc, not once per
    // covering window); a window combines its n token hashes with the
    // same order-sensitive xor-multiply fold, so the window hash stays
    // injective over token sequences modulo 64-bit collisions
    val th = new Array[Long](toks.length)
    var t = 0
    while (t < toks.length) {
      var h = 0xcbf29ce484222325L
      val tok = toks(t)
      var p = 0
      while (p < tok.length) { h ^= tok.charAt(p); h *= 0x100000001b3L; p += 1 }
      th(t) = h
      t += 1
    }
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + n) { h = (h ^ th(j)) * 0x100000001b3L; j += 1 }
      out(i) = h
      i += 1
    }
    out
  }
  val wsGramHashesUdf: UserDefinedFunction = udf(wsGramHashes _)

  // lowercased-token window hashes: same positional fold as
  // wsGramHashes, but each token hashes its lowercase form — the
  // case-insensitive gram identity used by span decontamination
  // (positions must still map to the RAW tokens for cutting)
  private def lowerTokenHashes(toks: Array[String]): Array[Long] = {
    val th = new Array[Long](toks.length)
    var t = 0
    while (t < toks.length) {
      var h = 0xcbf29ce484222325L
      val tok = toks(t)
      var p = 0
      while (p < tok.length) {
        h ^= Character.toLowerCase(tok.charAt(p)); h *= 0x100000001b3L
        p += 1
      }
      th(t) = h
      t += 1
    }
    th
  }
  private def windowFold(th: Array[Long], n: Int): Array[Long] = {
    val out = new Array[Long](th.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + n) { h = (h ^ th(j)) * 0x100000001b3L; j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Case-insensitive positional window hashes — [[wsGramHashes]] over
    * lowercased tokens. Benchmark side of span decontamination.
    */
  def wsGramHashesLower(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val toks = wsRun.split(text.trim).filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    windowFold(lowerTokenHashes(toks), n)
  }
  val wsGramHashesLowerUdf: UserDefinedFunction = udf(wsGramHashesLower _)

  /** Surgical span decontamination, fused into ONE map-only kernel:
    * every length-`n` token window whose case-insensitive hash is in
    * `sorted` (the broadcast benchmark gram set) marks its n tokens
    * covered; covered tokens are cut and survivors rejoin with single
    * spaces (same whitespace normalization as [[cutTokenSpans]]).
    * Documents with NO contaminated window return byte-identical.
    */
  def cutContaminatedSpans(text: String, n: Int,
      sorted: Array[Long]): String = {
    if (text == null) return null
    val toks = wsRun.split(text.trim).filter(_.nonEmpty)
    if (toks.length < n) return text
    val wh = windowFold(lowerTokenHashes(toks), n)
    var covered: Array[Boolean] = null
    var i = 0
    while (i < wh.length) {
      if (java.util.Arrays.binarySearch(sorted, wh(i)) >= 0) {
        if (covered == null) covered = new Array[Boolean](toks.length)
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    if (covered == null) return text
    val sb = new StringBuilder(text.length)
    var t = 0
    while (t < toks.length) {
      if (!covered(t)) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(toks(t))
      }
      t += 1
    }
    sb.toString
  }

  /** Sliding token windows for context-window chunking: windows of
    * `size` whitespace tokens stepping by `size - overlap`, starts
    * emitted while start <= max(len - overlap, 1) — so the final
    * (possibly short) chunk still covers the document tail without a
    * degenerate fully-contained window. Empty/null documents yield no
    * chunks. Chunk i = element i of the returned array (the caller's
    * posexplode index IS the chunk id).
    */
  def chunkTokens(text: String, size: Int, overlap: Int): Array[String] = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap")
    if (text == null) return Array.empty
    val toks = wsRun.split(text.trim).filter(_.nonEmpty)
    if (toks.isEmpty) return Array.empty
    val step = size - overlap
    val lastStart = math.max(toks.length - overlap, 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var s = 1
    while (s <= lastStart) {
      out += toks.slice(s - 1, math.min(s - 1 + size, toks.length))
        .mkString(" ")
      s += step
    }
    out.toArray
  }
  val chunkTokensUdf: UserDefinedFunction = udf(chunkTokens _)

  /** Content-defined chunk splitter (see TextAnalysis.chunkCdc for the
    * semantics): boundary after code point i when the window-gram
    * polynomial hash ((a*257 + cp) mod 2^40, fold in order) ending at
    * i satisfies h % modulus == 0. Text shorter than the window is one
    * chunk; null/empty yields no chunks.
    */
  def cdcChunks(text: String, window: Int, modulus: Int): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val M = 1099511627776L // 2^40
    val cps = text.codePoints().toArray
    val n = cps.length
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    if (n >= window) {
      // 257^window mod 2^40, for evicting the outgoing code point —
      // a TRUE rolling update: O(1) per position, identical values to
      // the per-window fold (all arithmetic mod 2^40; floorMod keeps
      // the representative canonical after the subtraction)
      var pw = 1L
      var e = 0
      while (e < window) { pw = pw * 257 % M; e += 1 }
      var h = 0L
      var j = 0
      while (j < window) { h = (h * 257 + cps(j)) % M; j += 1 }
      var i = window
      while (i <= n) {
        if (h % modulus == 0) bounds += i
        if (i < n) {
          h = Math.floorMod(h * 257 + cps(i) - cps(i - window) * pw % M, M)
        }
        i += 1
      }
    }
    if (bounds.last != n) bounds += n
    // code-point bounds -> UTF-16 offsets (one cumulative pass)
    val off = new Array[Int](bounds.length)
    var k = 1
    var cpDone = bounds(0)
    var charOff = text.offsetByCodePoints(0, cpDone)
    off(0) = charOff
    while (k < bounds.length) {
      charOff = text.offsetByCodePoints(charOff, bounds(k) - cpDone)
      cpDone = bounds(k)
      off(k) = charOff
      k += 1
    }
    val out = new Array[String](bounds.length - 1)
    var c = 0
    while (c < out.length) {
      out(c) = text.substring(off(c), off(c + 1))
      c += 1
    }
    out
  }
  val cdcChunksUdf: UserDefinedFunction = udf(cdcChunks _)

  /** Rebuild `text` with the 1-based token index ranges in `spans`
    * removed (whitespace-tokenized like wsGramHashes; kept tokens
    * rejoin with single spaces). Spans are inclusive [start, end].
    */
  def cutTokenSpans(text: String, spans: Seq[(Long, Long)]): String = {
    if (text == null) return null
    val toks = wsRun.split(text.trim).filter(_.nonEmpty)
    if (spans == null || spans.isEmpty) return toks.mkString(" ")
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < toks.length) {
      val p = i + 1L
      val covered = spans.exists { case (s, e) => p >= s && p <= e }
      if (!covered) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(toks(i))
      }
      i += 1
    }
    sb.toString
  }
  val cutTokenSpansUdf: UserDefinedFunction = udf(cutTokenSpans _)

  /** Rebuild `text` with the 0-based block indices in `drop` removed,
    * where blocks are the split on the LITERAL `delim` and survivors
    * rejoin with the same delimiter — the reassembly step of
    * corpus-wide line dedup ("\n") and paragraph dedup (the blank line
    * "\n\n"); SpanDedup.removeDuplicatedLines. Null/empty drop list
    * passes the text through byte-identical. */
  def cutBlocks(text: String, drop: Seq[Long], delim: String): String = {
    if (text == null) return null
    if (drop == null || drop.isEmpty) return text
    val blocks = text.split(java.util.regex.Pattern.quote(delim), -1)
    val dropSet = drop.toSet
    val sb = new StringBuilder(text.length)
    var i = 0
    var first = true
    while (i < blocks.length) {
      if (!dropSet.contains(i.toLong)) {
        if (!first) sb.append(delim)
        sb.append(blocks(i))
        first = false
      }
      i += 1
    }
    sb.toString
  }
  val cutBlocksUdf: UserDefinedFunction = udf(cutBlocks _)

  // ---- URL canonicalization (dedup-key normalization) -----------------
  // The form Common-Crawl-derived curation pipelines reduce URLs to
  // before URL-level dedup: lowercase scheme/host, strip a leading www.,
  // drop default ports, drop the fragment, drop tracking parameters,
  // sort the surviving query pairs, collapse duplicate slashes and the
  // trailing slash. Unparseable input passes through trimmed (a dedup
  // KEY must never silently become null).

  // Unambiguous click/campaign identifiers only. Bare `ref` is NOT in
  // the default list: on many sites it is semantic (?ref=branch selects
  // different content) and stripping it would collapse distinct
  // resources to one dedup key; callers that know their corpus uses it
  // for attribution pass it via `extraDrop` (`normalize-url :url ref`).
  private val trackingParams = Set("gclid", "fbclid", "msclkid", "mc_cid",
    "mc_eid", "igshid", "ref_src", "yclid", "twclid")
  private def isTrackingParam(k: String, extraDrop: Set[String]): Boolean = {
    val lk = k.toLowerCase
    lk.startsWith("utm_") || trackingParams(lk) || extraDrop(lk)
  }

  def normalizeUrl(url: String): String = normalizeUrl(url, Set.empty[String])

  def normalizeUrl(url: String, extraDrop: Set[String]): String = {
    if (url == null) return null
    val s = url.trim
    try {
      val u = new java.net.URI(s)
      if (u.getScheme == null || u.getHost == null) return s
      val scheme = u.getScheme.toLowerCase
      var host = u.getHost.toLowerCase
      if (host.startsWith("www.")) host = host.substring(4)
      val port = u.getPort
      val keepPort = port >= 0 &&
        !((scheme == "http" && port == 80) || (scheme == "https" && port == 443))
      var path = Option(u.getRawPath).getOrElse("")
      if (path.isEmpty) path = "/"
      path = path.replaceAll("/{2,}", "/")
      if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
      val query = Option(u.getRawQuery)
        .map(_.split("&").filter(_.nonEmpty)
          .filterNot(kv => isTrackingParam(kv.takeWhile(_ != '='), extraDrop))
          .sorted)
        .filter(_.nonEmpty)
        .map(_.mkString("&"))
      scheme + "://" + host + (if (keepPort) s":$port" else "") + path +
        query.map("?" + _).getOrElse("")
    } catch { case _: Exception => s }
  }
  val normalizeUrlUdf: UserDefinedFunction = udf((u: String) => normalizeUrl(u))

  /** Same normalization with a caller-supplied extra drop-list (CSV of
    * lowercase query-param names) — the configurable face of the
    * `normalize-url` directive.
    */
  val normalizeUrlDropUdf: UserDefinedFunction =
    udf((u: String, extraCsv: String) => normalizeUrl(u,
      Option(extraCsv).map(_.split(",").map(_.trim.toLowerCase)
        .filter(_.nonEmpty).toSet).getOrElse(Set.empty)))

  // ---- Unicode normalization / accent stripping -----------------------

  /** Canonical Unicode normalization (java.text.Normalizer). */
  def normalizeUnicode(s: String, form: String): String = {
    if (s == null) return null
    java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.valueOf(form))
  }
  val normalizeUnicodeUdf: UserDefinedFunction = udf(normalizeUnicode _)

  private val combiningMarks =
    java.util.regex.Pattern.compile("\\p{M}+")

  /** NFD-decompose then drop combining marks: "café" -> "cafe". */
  def removeAccents(s: String): String = {
    if (s == null) return null
    combiningMarks.matcher(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFD)).replaceAll("")
  }
  val removeAccentsUdf: UserDefinedFunction = udf(removeAccents _)

  // ---- Mojibake repair -------------------------------------------------

  /** The 27 printable cp1252 characters that live in the 0x80–0x9F
    * block — the tell-tale glyphs of UTF-8 text misdecoded as Windows
    * cp1252 ("â€™" for a right single quote, "â‚¬" for €).
    */
  private val cp1252High: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** One mojibake repair step: re-encode the string through "sloppy
    * cp1252" (chars < U+0100 map to their own byte — covering both
    * Latin-1 decodes and the C1 controls cp1252 leaves undefined —
    * plus the 27 cp1252-specific glyphs above) and strictly re-decode
    * as UTF-8. The repair is REJECTED (input returned unchanged) when
    * any character has no cp1252 byte, the byte run is not valid
    * UTF-8, or no multi-byte sequence was consumed — so already-clean
    * text, pure ASCII, and genuine Latin-1 prose all pass through
    * untouched. This is the core transform of the published ftfy
    * "fix encoding" step, re-implemented from the codec tables.
    */
  /** Charset sniff for raw text bytes — the decode router ahead of
    * set-charset on crawled/legacy corpora. BOMs win; then a STRICT
    * UTF-8 decode (pure ASCII reports us-ascii); then the
    * alternating-null shape of BOM-less UTF-16 (≥40% zero bytes on
    * one parity and almost none on the other); windows-1252 is the
    * web-default fallback for everything else (a superset of
    * iso-8859-1 in the bytes browsers actually see). Null/empty →
    * null.
    */
  def detectCharset(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return null
    def at(i: Int): Int = b(i) & 0xff
    if (b.length >= 3 && at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf)
      return "utf-8"
    if (b.length >= 4 && at(0) == 0xff && at(1) == 0xfe &&
      at(2) == 0 && at(3) == 0) return "utf-32le"
    if (b.length >= 4 && at(0) == 0 && at(1) == 0 &&
      at(2) == 0xfe && at(3) == 0xff) return "utf-32be"
    if (b.length >= 2 && at(0) == 0xff && at(1) == 0xfe) return "utf-16le"
    if (b.length >= 2 && at(0) == 0xfe && at(1) == 0xff) return "utf-16be"
    // BOM-less UTF-16 FIRST: NUL bytes are technically valid UTF-8
    // (U+0000), so a strict-UTF-8 check would misread Latin UTF-16 as
    // NUL-riddled ASCII; real text never carries NULs, the parity
    // shape is decisive
    var zeroEven = 0; var zeroOdd = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == 0) { if (i % 2 == 0) zeroEven += 1 else zeroOdd += 1 }
      i += 1
    }
    val half = math.max(1, b.length / 2)
    if (b.length >= 8) {
      if (zeroEven * 10 >= half * 4 && zeroOdd * 10 < half)
        return "utf-16be" // high bytes (even positions) are zero
      if (zeroOdd * 10 >= half * 4 && zeroEven * 10 < half)
        return "utf-16le"
    }
    val strictUtf8 =
      try {
        java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .decode(java.nio.ByteBuffer.wrap(b))
        true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    if (strictUtf8) {
      var ascii = true
      var j = 0
      while (ascii && j < b.length) { if (at(j) >= 0x80) ascii = false; j += 1 }
      if (ascii) "us-ascii" else "utf-8"
    } else "windows-1252"
  }

  val detectCharsetUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(detectCharset _)

  private def fixMojibakeOnce(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var hasHigh = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val b =
        if (c < 0x100) c.toInt
        else cp1252High.getOrElse(c, -1)
      if (b < 0) return s
      if (b >= 0x80) hasHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!hasHigh) return s
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < n) out else s
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }

  /** Mojibake repair to a fixed point (double-encoded text like
    * "ÃƒÂ©" needs two rounds): "cafÃ©" → "café", "donâ€™t" → "don’t",
    * clean text unchanged. Terminates because every accepted round
    * STRICTLY shrinks the string (a multi-byte UTF-8 sequence was
    * consumed), so the round count is bounded by the input length.
    */
  def fixMojibake(s: String): String = {
    if (s == null) return null
    var cur = s
    var done = false
    while (!done) {
      val next = fixMojibakeOnce(cur)
      if (next == cur) done = true
      else cur = next
    }
    cur
  }
  val fixMojibakeUdf: UserDefinedFunction = udf(fixMojibake _)

  // ---- Decompression ---------------------------------------------------

  /** Inflate one compressed payload: gzip / zlib / raw deflate (JDK
    * inflater) plus the codecs Spark itself ships — zstd (zstd-jni;
    * the modern crawl-dump compression), bzip2 (commons-compress),
    * lz4 frame, framed snappy, and xz (tukaani; arXiv/HF dump
    * shards). Total: malformed input yields null; output grows with
    * bytes ACTUALLY inflated under a hard budget so a decompression
    * bomb cannot expand past it (over-budget → null); the xz decoder
    * additionally runs under a 256 MiB memory limit (hostile
    * dictionary-size headers throw inside the IOException contract).
    */
  def decompress(b: Array[Byte], method: String): Array[Byte] = {
    if (b == null) return null
    val maxOut = 1 << 28
    val in: java.io.InputStream =
      try method match {
        case "gzip" => new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b))
        case "zlib" => new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b))
        case "deflate" => new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b),
          new java.util.zip.Inflater(true))
        // ZstdFrames consumes leading skippable frames and honors a
        // dictionary slot (the warc-zstd layout) before streaming
        case "zstd" => graft.sources.ZstdFrames.open(
          new java.io.ByteArrayInputStream(b), continuous = false)
        // BasicArrayCache: LZMA2 allocates its full declared dict
        // (8-64 MB on default-encoded files) per stream — pooling the
        // buffers across rows keeps a many-small-docs decode from
        // becoming a GC storm (measured: the r16 mixed-corpus rung)
        case "xz" => new org.tukaani.xz.XZInputStream(
          new java.io.ByteArrayInputStream(b), 1 << 18,
          org.tukaani.xz.BasicArrayCache.getInstance())
        case "bzip2" => new org.apache.commons.compress.compressors
          .bzip2.BZip2CompressorInputStream(
            new java.io.ByteArrayInputStream(b))
        case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(b))
        case "snappy" => new org.xerial.snappy.SnappyFramedInputStream(
          new java.io.ByteArrayInputStream(b))
        case other => throw new graft.api.RecipeException(
          s"decompress: unknown method '$other' " +
            "(gzip|zlib|deflate|zstd|bzip2|lz4|snappy|xz)")
      } catch {
        case _: java.io.IOException => return null
        // zstd-jni/snappy native wrappers can surface malformed input
        // as runtime exceptions — same totality contract
        case e: RuntimeException
          if !e.isInstanceOf[graft.api.RecipeException] => return null
      }
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 12)
      val chunk = new Array[Byte](1 << 16)
      var n = in.read(chunk)
      while (n >= 0) {
        out.write(chunk, 0, n)
        if (out.size > maxOut) return null // bomb budget
        n = in.read(chunk)
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null
      case _: RuntimeException => null // corrupt zstd/snappy frames
    } finally {
      try in.close() catch { case _: java.io.IOException => () }
    }
  }
  val decompressUdf: UserDefinedFunction = udf(decompress _)

  /** Deterministic compressors for fixtures/tests (the decode side is
    * what production uses; DuckDB oracles state the ORIGINAL text, so
    * compressed-form stability across codec versions is not load-
    * bearing).
    */
  def compress(b: Array[Byte], method: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out: java.io.OutputStream = method match {
      case "gzip" => new java.util.zip.GZIPOutputStream(bos)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(bos)
      case "bzip2" => new org.apache.commons.compress.compressors
        .bzip2.BZip2CompressorOutputStream(bos)
      case "lz4" => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      case "snappy" => new org.xerial.snappy.SnappyFramedOutputStream(bos)
      case "xz" =>
        // 64 KiB dict: fixture payloads are small documents; the
        // declared dict size is what the DECODER allocates per
        // stream, so an 8 MB default would make every decode of our
        // own fixtures allocate 8 MB for a 2 KB doc
        val opts = new org.tukaani.xz.LZMA2Options()
        opts.setDictSize(1 << 16)
        new org.tukaani.xz.XZOutputStream(bos, opts,
          org.tukaani.xz.BasicArrayCache.getInstance())
      case other => throw new graft.api.RecipeException(
        s"compress: unknown method '$other'")
    }
    out.write(b); out.close()
    bos.toByteArray
  }
  val compressUdf: UserDefinedFunction = udf((s: String, m: String) =>
    if (s == null) null
    else compress(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), m))

  // ---- Registrable domain (eTLD+1) -------------------------------------

  /** Multi-label public-suffix rules — a bundled SNAPSHOT SUBSET of
    * the publicsuffix.org list (the ~70 highest-traffic ccTLD
    * second-level registries plus the major user-content private
    * registries). The PSL *algorithm* below is complete — longest
    * match, wildcard and exception rules, and the default rule that
    * makes every unlisted TLD its own suffix — so unlisted multi-label
    * registries degrade to the TLD default rather than failing;
    * swap in the full list as data to upgrade fidelity.
    */
  private val pslRules: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
    "com.mx", "net.mx", "org.mx",
    "com.tr", "net.tr", "org.tr",
    "com.ar", "net.ar", "org.ar",
    "co.za", "net.za", "org.za", "web.za",
    "co.nz", "net.nz", "org.nz", "ac.nz",
    "com.sg", "net.sg", "org.sg",
    "com.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw",
    "co.il", "net.il", "org.il",
    "com.ua", "net.ua",
    "co.th", "ac.th", "in.th",
    "com.vn", "net.vn",
    "com.my", "net.my",
    "com.ph", "net.ph",
    "co.id", "or.id", "web.id",
    "com.eg", "com.sa", "com.pk", "com.ng", "com.gh",
    // private registries: per-user subdomains are separate sites
    "github.io", "gitlab.io", "pages.dev", "netlify.app", "vercel.app",
    "herokuapp.com", "appspot.com", "blogspot.com", "wordpress.com",
    "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
    "firebaseapp.com", "web.app", "repl.co", "neocities.org")

  /** TLDs under a `*.tld` wildcard rule (every second-level label is
    * itself a registry) — PSL snapshot.
    */
  private val pslWildcards: Set[String] =
    Set("ck", "er", "fj", "kh", "mm", "np", "pg")

  /** `!exception` rules: hosts carved OUT of a wildcard (the public
    * suffix is the rule minus its leftmost label) — PSL snapshot.
    */
  private val pslExceptions: Set[String] = Set("www.ck")

  /** Registrable domain (eTLD+1) of a URL or bare host, by the
    * publicsuffix.org algorithm: the public suffix is the longest
    * matching rule (exceptions beat wildcards beat the TLD default),
    * and the registrable domain is that suffix plus one label —
    * "blog.shop.example.co.uk" → "example.co.uk",
    * "user.github.io" → "user.github.io" (private registry). Null for
    * IP literals, single-label hosts, and hosts that ARE a public
    * suffix. The per-site aggregation key for crawl curation: domain
    * quotas, per-site dedup, spam-site blocklists.
    */
  def registrableDomain(urlOrHost: String): String = {
    if (urlOrHost == null) return null
    var h = urlOrHost.trim.toLowerCase(java.util.Locale.ROOT)
    val schemeIdx = h.indexOf("://")
    if (schemeIdx >= 0) h = h.substring(schemeIdx + 3)
    h = h.takeWhile(c => c != '/' && c != '?' && c != '#')
    val at = h.lastIndexOf('@')
    if (at >= 0) h = h.substring(at + 1)
    if (h.startsWith("[")) return null // IPv6 literal
    val colon = h.indexOf(':')
    if (colon >= 0) h = h.substring(0, colon)
    if (h.endsWith(".")) h = h.dropRight(1)
    if (h.isEmpty) return null
    if (h.forall(c => c.isDigit || c == '.')) return null // IPv4 literal
    val labels = h.split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return null
    val suffixLen: Int = {
      val exc = (labels.length to 2 by -1).find(k =>
        pslExceptions(labels.takeRight(k).mkString(".")))
      exc match {
        case Some(k) => k - 1
        case None =>
          (labels.length to 2 by -1).find(k =>
              pslRules(labels.takeRight(k).mkString("."))) match {
            case Some(k) => k
            case None => if (pslWildcards(labels.last)) 2 else 1
          }
      }
    }
    if (labels.length <= suffixLen) null
    else labels.takeRight(suffixLen + 1).mkString(".")
  }
  val registrableDomainUdf: UserDefinedFunction = udf(registrableDomain _)

  /** Normalized word tokens (normalizeText split on single spaces). */
  def normTokens(text: String): Array[String] = {
    val n = normalizeText(text)
    if (n.isEmpty) Array.empty else n.split(" ")
  }
  val normTokensUdf: UserDefinedFunction = udf(normTokens _)

  /** Unsigned first 32 bits of MD5(s) — the engine-side twin of the
    * DuckDB spelling ('0x' || substr(md5(s), 1, 8))::BIGINT, shared by
    * every oracle that re-derives a hash assignment (hashing-tf
    * buckets, JL projection signs).
    */
  def md5Bucket32(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Feature-hashing term frequencies ("hashing trick"): a fixed-width
    * count vector with each normalized token bucketed by [[md5Bucket32]]
    * mod k — no vocabulary, no shuffle, any engine reproduces the
    * bucket assignment exactly. Null/empty text yields the zero vector.
    */
  def hashingTf(text: String, k: Int): Array[Int] =
    hashingTfFromToks(normTokens(text), k)

  /** [[hashingTf]] over ALREADY-normalized tokens — the shared-
    * featurization path: a pipeline that caches one normTokens pass
    * derives the TF vector from it instead of re-normalizing the text
    * (same MD5 bucketing, bit-identical counts).
    */
  def hashingTfFromToks(toks: Seq[String], k: Int): Array[Int] = {
    val counts = new Array[Int](k)
    if (toks == null || toks.isEmpty) return counts
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      counts((md5Bucket32(md, toks(i)) % k).toInt) += 1
      i += 1
    }
    counts
  }
  val hashingTfUdf: UserDefinedFunction = udf(hashingTf _)
  val hashingTfFromToksUdf: UserDefinedFunction = udf(hashingTfFromToks _)

  /** Same normalization as graft.llm.Dedup.normalized (keep in sync). */
  def normalizeText(text: String): String = {
    if (text == null) return ""
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        Character.isWhitespace(c)) sb.append(c)
      i += 1
    }
    wsRun.matcher(sb.toString.trim).replaceAll(" ")
  }

  /** 64-bit hashes of the k-char shingles of the normalized text,
    * distinct. FNV-1a rolling over the window (public-domain hash).
    */
  def shingleHashSet(text: String, k: Int): Array[Long] = {
    val norm = normalizeText(text)
    if (norm.isEmpty) return Array.empty
    val n = math.max(norm.length - k + 1, 1)
    val set = new java.util.HashSet[Long](n * 2)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      val end = math.min(i + k, norm.length)
      var p = i
      while (p < end) {
        h ^= norm.charAt(p)
        h *= 0x100000001b3L
        p += 1; j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    java.util.Arrays.sort(out)
    out
  }

  // the (a,b) affine coefficients are a pure function of (numHashes,
  // seed) — derive once per executor, not 2*numHashes Random draws per
  // ROW (measured: a visible slice of the signature kernel at 128 hashes)
  private val minhashCoeffs =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()
  private def coeffsFor(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    minhashCoeffs.computeIfAbsent((numHashes, seed), { key =>
      val rnd = new java.util.Random(key._2)
      val as = Array.fill(key._1)(rnd.nextLong() | 1L)
      val bs = Array.fill(key._1)(rnd.nextLong())
      (as, bs)
    })

  private def sigFromShingles(sh: Array[Long], numHashes: Int,
      seed: Long): Array[Long] = {
    val (as, bs) = coeffsFor(numHashes, seed)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var si = 0
    while (si < sh.length) {
      val h = sh(si)
      var i = 0
      while (i < numHashes) {
        val v = as(i) * h + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      si += 1
    }
    sig
  }

  /** Dev-only observability: rows that actually ran a MinHash signature
    * kernel (detects cache-miss recompute of the persisted signature
    * frame — each row SHOULD be computed exactly once per query).
    */
  val shingleKernelCalls = new java.util.concurrent.atomic.LongAdder()

  /** Shingle set AND MinHash signature from ONE normalization+shingling
    * pass. Note: for an empty shingle set the signature is the
    * numHashes-long MaxValue array (unlike [[minhashSig]], which
    * signals emptiness with an empty array).
    */
  def shingleAndSig(text: String, numHashes: Int, shingleK: Int,
      seed: Long): (Array[Long], Array[Long]) = {
    shingleKernelCalls.increment()
    val sh = shingleHashSet(text, shingleK)
    (sh, sigFromShingles(sh, numHashes, seed))
  }

  /** MinHash signature ONLY — the shingle set stays kernel-local and is
    * never returned, cached, or shuffled (it is text-sized: one 64-bit
    * hash per character; carrying it through a persist or an exchange
    * costs more than the whole signature pass — measured 2-3x the
    * dedup_minhash wall at sf0.1). Returns an EMPTY array when the
    * normalized text yields no shingles, so emptiness survives as a
    * filterable signal (`size(sig) > 0`).
    */
  def minhashSig(text: String, numHashes: Int, shingleK: Int,
      seed: Long): Array[Long] = {
    shingleKernelCalls.increment()
    val sh = shingleHashSet(text, shingleK)
    if (sh.isEmpty) Array.emptyLongArray
    else sigFromShingles(sh, numHashes, seed)
  }
  val minhashSigUdf: UserDefinedFunction = udf(minhashSig _)

  /** MinHash banded into per-band bucket hashes, fused in-kernel: the
    * numHashes-long signature never leaves the JVM — only `bands`
    * bucket longs are returned (8x smaller cached/decoded column, and
    * the downstream band explode becomes a trivial posexplode instead
    * of `bands` x `r` element_at + xxhash64 Catalyst calls per row,
    * measured as the dominant CPU of the banded stages at the 100x
    * ladder). Bucket values are BIT-IDENTICAL to the previous Column
    * formulation `xxhash64(element_at(sig, b*r+1) ... element_at(sig,
    * (b+1)*r))`: Spark's xxhash64 folds its long arguments left to
    * right with XXH64.hashLong from seed 42, which is exactly what
    * this loop does (property-tested in LlmSpec).
    */
  def minhashBandBuckets(text: String, numHashes: Int, bands: Int,
      shingleK: Int, seed: Long): Array[Long] = {
    val sig = minhashSig(text, numHashes, shingleK, seed)
    if (sig.isEmpty) return Array.emptyLongArray
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var j = b * r
      while (j < (b + 1) * r) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sig(j), h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    out
  }
  val minhashBandBucketsUdf: UserDefinedFunction = udf(minhashBandBuckets _)

  /** Exact shingle-set Jaccard of two texts, recomputed from the raw
    * text — the candidate-verify kernel. shingleHashSet returns SORTED
    * distinct hashes, so the intersection is one linear merge; the
    * union size is |A|+|B|-|A∩B|. Identical value to the former
    * array_intersect/array_union formulation (both operate on the same
    * distinct-hash sets). Empty-or-empty pairs score 0.0.
    */
  def shingleJaccard(a: String, b: String, k: Int): Double = {
    val sa = shingleHashSet(a, k)
    val sb = shingleHashSet(b, k)
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      val x = sa(i); val y = sb(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (sa.length + sb.length - inter)
  }
  val shingleJaccardUdf: UserDefinedFunction = udf(shingleJaccard _)

  /** 64-bit SimHash over whitespace tokens of the normalized text. */
  def simhashSig(text: String): Long = {
    val norm = normalizeText(text)
    if (norm.isEmpty) return 0L
    val votes = new Array[Int](64)
    for (tok <- norm.split(" ") if tok.nonEmpty) {
      var h = 0xcbf29ce484222325L
      var p = 0
      while (p < tok.length) { h ^= tok.charAt(p); h *= 0x100000001b3L; p += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  val shingleAndSigUdf: UserDefinedFunction = udf(shingleAndSig _)
  val simhashSigUdf: UserDefinedFunction = udf(simhashSig _)

  // ---- published-recipe document filters (C4, Gopher) -----------------

  private val c4Terminal = java.util.regex.Pattern.compile("[.!?\"]\\s*$")

  /** C4-style line cleaning (Raffel et al. 2020 §2.2, re-expressed):
    * keep only lines that end in terminal punctuation [.!?"], carry at
    * least `minWords` whitespace words, and don't mention
    * "javascript"; then blank the whole page to '' when it contains
    * "lorem ipsum" or "{" or the kept text has fewer than
    * `minSentences` sentence-ending marks [.!?]. Blanked pages compose
    * with filter-empty-or-null. The DuckDB oracle (clean_lines_c4)
    * re-implements the SAME rules as list lambdas, so every branch is
    * hash-compared, not pinned.
    */
  def c4CleanLines(text: String, minWords: Int, minSentences: Int): String = {
    if (text == null) return null
    val kept = text.split("\n", -1).filter { line =>
      val t = line.trim
      val wc = if (t.isEmpty) 0 else wsRun.split(t).count(_.nonEmpty)
      wc >= minWords && c4Terminal.matcher(line).find() &&
        !line.toLowerCase.contains("javascript")
    }.mkString("\n")
    var sentences = 0
    var i = 0
    while (i < kept.length) {
      val c = kept.charAt(i)
      if (c == '.' || c == '!' || c == '?') sentences += 1
      i += 1
    }
    if (text.toLowerCase.contains("lorem ipsum") || text.contains("{") ||
      sentences < minSentences) ""
    else kept
  }
  val c4CleanLinesUdf: UserDefinedFunction = udf(c4CleanLines _)

  private val gopherStops =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, MassiveText
    * filtering): keep a document iff word count is in [50, 100000],
    * mean word length in [3, 10], symbol-to-word ratio ('#' chars +
    * ellipses) <= 0.1, <= 90% of non-blank lines bullet-led ([-•*]),
    * <= 30% of non-blank lines ellipsis-ended, >= 80% of words contain
    * an alphabetic character, and >= 2 distinct required stopwords
    * appear as exact lowercase tokens. Same-rule DuckDB oracle
    * (gopher_rules) hash-compares each branch.
    */
  def gopherKeep(text: String): Boolean = {
    if (text == null) return false
    val t = text.trim
    if (t.isEmpty) return false
    val words = wsRun.split(t).filter(_.nonEmpty)
    val wc = words.length
    if (wc < 50 || wc > 100000) return false
    var lenSum = 0L
    var alpha = 0
    val seen = new Array[Boolean](gopherStops.length)
    for (w <- words) {
      lenSum += w.length
      var hasAlpha = false
      var i = 0
      while (i < w.length && !hasAlpha) {
        val c = w.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        i += 1
      }
      if (hasAlpha) alpha += 1
      val lw = w.toLowerCase
      var j = 0
      while (j < gopherStops.length) {
        if (lw == gopherStops(j)) seen(j) = true
        j += 1
      }
    }
    val meanLen = lenSum.toDouble / wc
    var hashes = 0
    var ellChar = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '#') hashes += 1
      if (c == '…') ellChar += 1
      i += 1
    }
    // non-overlapping "..." occurrences (mirrors the oracle's
    // len - len(replace(text,'...',''))/3 formulation)
    var ellDots = 0
    var p = text.indexOf("...")
    while (p >= 0) { ellDots += 1; p = text.indexOf("...", p + 3) }
    val symRatio = (hashes + ellChar + ellDots).toDouble / wc
    val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
    val lc = lines.length
    val bullets = lines.count { l =>
      val c = l.charAt(0); c == '-' || c == '•' || c == '*'
    }
    val ellEnded = lines.count(l => l.endsWith("...") || l.endsWith("…"))
    val bulletOk = lc == 0 || bullets.toDouble / lc <= 0.9
    val ellOk = lc == 0 || ellEnded.toDouble / lc <= 0.3
    var stopHits = 0
    var j = 0
    while (j < seen.length) { if (seen(j)) stopHits += 1; j += 1 }
    meanLen >= 3.0 && meanLen <= 10.0 && symRatio <= 0.1 &&
      bulletOk && ellOk && alpha.toDouble / wc >= 0.8 && stopHits >= 2
  }
  val gopherKeepUdf: UserDefinedFunction = udf(gopherKeep _)

  // ---- dedup-key normalization kernel --------------------------------
  // Single-scan equivalent of the Column formulation
  //   trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9\\s]", ""),
  //        "\\s+", " "))
  // (Dedup.normalized — the exact-dedup/fingerprint key). Regex
  // replacement costs ~1.26 ms per 2 KB document (measured: 629 s CPU
  // for 500 K docs at the 100x ladder, the dominant cost of exact dedup
  // at scale); this kernel is one lowercase pass + one char scan.
  // Lowercasing delegates to UTF8String so the mapping is BIT-IDENTICAL
  // to Spark's lower() on every input (full Unicode case mapping
  // included); the scan then keeps [a-z0-9], folds Java-\s runs
  // ([ \t\n\f\r]) to a single space, drops everything else
  // WITHOUT breaking a pending whitespace run ("a .. b" -> "a b", like
  // the regex form), and skips leading/trailing space (trim).
  // Equivalence with the Column formulation is property-tested in
  // LlmSpec over adversarial inputs (punctuation runs, Unicode case
  // edges, all-junk strings).
  def normalizeDedupKey(s: String): String = {
    if (s == null) return null
    val lower = org.apache.spark.unsafe.types.UTF8String
      .fromString(s).toLowerCase.toString
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
                 c == '\f' || c == '\r') {
        pendingSpace = true
      }
      // any other character: dropped, pending whitespace unaffected
      i += 1
    }
    sb.toString
  }
  val normalizeDedupKeyUdf: UserDefinedFunction = udf(normalizeDedupKey _)
}
