package graft.llm

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the politeness gate a crawl-derived corpus applies before fetching
  * or retro-filtering URLs.
  *
  * Semantics implemented from the RFC:
  *  - groups = runs of `User-agent:` lines followed by rules; the
  *    group whose user-agent token is the LONGEST case-insensitive
  *    match for the product token wins, `*` is the fallback group;
  *    multiple groups for the same agent merge.
  *  - rule matching: `*` matches any char sequence, `$` anchors the
  *    end; the LONGEST matching pattern wins across allow+disallow,
  *    ties break to allow ("least restrictive" rule).
  *  - no group / no matching rule / empty disallow value -> allowed.
  */
object Robots {

  private case class Rule(pattern: String, allow: Boolean) {
    // compiled once at parse: '*' -> '.*', '$' -> end anchor,
    // otherwise prefix semantics (lookingAt)
    val anchored: Boolean = pattern.endsWith("$")
    private val body = (if (anchored) pattern.dropRight(1) else pattern)
      .split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*")
    val re: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(if (anchored) body + "$" else body)
    def matches(path: String): Boolean = {
      val m = re.matcher(path)
      if (anchored) m.matches() else m.lookingAt()
    }
  }

  /** `Sitemap:` directive values in file order (RFC 9309 §2.2.4 —
    * sitemaps are group-independent, so every line counts regardless
    * of user-agent context): the crawl-frontier bootstrap, feeding
    * parse-as-sitemap. Comments stripped; values kept verbatim
    * (absolute URLs per the sitemaps.org protocol).
    */
  def sitemaps(robotsTxt: String): Seq[String] = {
    if (robotsTxt == null) return Seq.empty
    robotsTxt.split("\n").toSeq.flatMap { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim
          .equalsIgnoreCase("sitemap")) {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }
  }

  val sitemapsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(sitemaps _)

  /** Parse into (user-agent-token -> rules) preserving rule order. */
  private def parse(txt: String): Map[String, Vector[Rule]] = {
    val groups = scala.collection.mutable.Map
      .empty[String, Vector[Rule]].withDefaultValue(Vector.empty)
    var agents: List[String] = Nil
    var inRules = false // false while collecting consecutive UA lines
    for (line0 <- txt.split("\n")) {
      val line = line0.takeWhile(_ != '#').trim // strip comments
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { agents = Nil; inRules = false }
            agents = value.toLowerCase :: agents
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            val r = Rule(value, key == "allow")
            agents.foreach(a => groups(a) = groups(a) :+ r)
          case _ => () // sitemap/crawl-delay/unknown: ignored
        }
      }
    }
    groups.toMap
  }

  /** RFC 9309 verdict for (robots body, product token, url path). */
  def allowed(robotsTxt: String, userAgent: String, path0: String): Boolean = {
    if (robotsTxt == null) return true
    val path = if (path0 == null || path0.isEmpty) "/" else path0
    val groups = parse(robotsTxt)
    if (groups.isEmpty) return true
    val token = Option(userAgent).getOrElse("*").toLowerCase
    // longest UA key that is a prefix of (or equals) our token; '*' is
    // the fallback
    val key = groups.keys
      .filter(k => k != "*" && (token.startsWith(k) || k == token))
      .toSeq.sortBy(-_.length).headOption
      .orElse(if (groups.contains("*")) Some("*") else None)
    key match {
      case None => true
      case Some(k) =>
        var best = -1
        var bestAllow = true
        for (r <- groups(k); if r.pattern.nonEmpty; if r.matches(path)) {
          val m = r.pattern.length
          if (m > best || (m == best && r.allow && !bestAllow)) {
            best = m; bestAllow = r.allow
          }
        }
        best < 0 || bestAllow
    }
  }

  val allowedUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(allowed _)
}
