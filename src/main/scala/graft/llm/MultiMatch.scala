package graft.llm

/** Multi-pattern substring search via the Aho-Corasick automaton —
  * the blocklist/term-filter kernel for corpus curation. A regex
  * alternation of N patterns scans in O(text * N) worst case and
  * degrades fast past a few hundred terms; the automaton scans in
  * O(text + hits) regardless of pattern count, which is what a
  * thousands-strong blocklist over terabytes of text needs.
  *
  * The automaton builds ONCE on the driver from the pattern list and
  * ships to executors inside the UDF closure (a few MB for 100K
  * patterns) — the same broadcast shape as the decontamination gram
  * array.
  */
object MultiMatch {

  /** Immutable matcher: dense-array automaton over the pattern set.
    * `caseInsensitive` lowercases both patterns and text.
    */
  final class Automaton private[MultiMatch] (
      patterns: Array[String], caseInsensitive: Boolean)
      extends Serializable {

    // goto/fail/output tables built with the classic BFS construction
    private val gotoMap = new java.util.ArrayList[java.util.HashMap[Char, Int]]()
    private val fail = new java.util.ArrayList[Integer]()
    // output(state) = indices of patterns ending at this state
    private val outs = new java.util.ArrayList[java.util.ArrayList[Integer]]()

    private def newState(): Int = {
      gotoMap.add(new java.util.HashMap[Char, Int]())
      fail.add(0)
      outs.add(new java.util.ArrayList[Integer]())
      gotoMap.size - 1
    }

    newState() // root = 0
    locally {
      var pi = 0
      while (pi < patterns.length) {
        val p0 = patterns(pi)
        val p = if (caseInsensitive) p0.toLowerCase else p0
        if (p.nonEmpty) {
          var st = 0
          var i = 0
          while (i < p.length) {
            val c = p.charAt(i)
            st = if (gotoMap.get(st).containsKey(c)) gotoMap.get(st).get(c)
            else {
              val ns = newState()
              gotoMap.get(st).put(c, ns)
              ns
            }
            i += 1
          }
          outs.get(st).add(pi)
        }
        pi += 1
      }
      // BFS failure links
      val queue = new java.util.ArrayDeque[Integer]()
      gotoMap.get(0).forEach((_, s) => { fail.set(s, 0); queue.add(s) })
      while (!queue.isEmpty) {
        val r = queue.poll()
        gotoMap.get(r).forEach { (c, s) =>
          queue.add(s)
          var f = fail.get(r).intValue()
          while (f != 0 && !gotoMap.get(f).containsKey(c))
            f = fail.get(f).intValue()
          val link = if (gotoMap.get(f).containsKey(c) &&
            gotoMap.get(f).get(c) != s) gotoMap.get(f).get(c) else 0
          fail.set(s, link)
          outs.get(s).addAll(outs.get(link))
        }
      }
    }

    private def step(state0: Int, c: Char): Int = {
      var st = state0
      while (st != 0 && !gotoMap.get(st).containsKey(c))
        st = fail.get(st).intValue()
      if (gotoMap.get(st).containsKey(c)) gotoMap.get(st).get(c) else 0
    }

    /** Total number of pattern occurrences in `text`. */
    def countHits(text0: String): Long = {
      if (text0 == null) return 0L
      val text = if (caseInsensitive) text0.toLowerCase else text0
      var st = 0
      var hits = 0L
      var i = 0
      while (i < text.length) {
        st = step(st, text.charAt(i))
        hits += outs.get(st).size
        i += 1
      }
      hits
    }

    /** Distinct pattern indices present in `text`, ascending. */
    def matchedPatterns(text0: String): Array[Int] = {
      if (text0 == null) return Array.empty
      val text = if (caseInsensitive) text0.toLowerCase else text0
      val seen = new java.util.TreeSet[Integer]()
      var st = 0
      var i = 0
      while (i < text.length) {
        st = step(st, text.charAt(i))
        val o = outs.get(st)
        var j = 0
        while (j < o.size) { seen.add(o.get(j)); j += 1 }
        i += 1
      }
      val out = new Array[Int](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().intValue(); k += 1 }
      out
    }

    def anyMatch(text: String): Boolean = {
      if (text == null) return false
      val t = if (caseInsensitive) text.toLowerCase else text
      var st = 0
      var i = 0
      while (i < t.length) {
        st = step(st, t.charAt(i))
        if (!outs.get(st).isEmpty) return true
        i += 1
      }
      false
    }
  }

  def build(patterns: Seq[String], caseInsensitive: Boolean = true): Automaton =
    new Automaton(patterns.toArray, caseInsensitive)
}
