package graft

/** Throwaway: where does XpathBundle time go? */
object XpathProbe {
  def main(args: Array[String]): Unit = {
    val xml = """<r a="123"><v>BUILDING</v><w>fixed</w></r>"""
    val n = 15000

    // DOM parse only
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    val b = f.newDocumentBuilder()
    def parseOnly(): Unit = {
      var i = 0
      while (i < n) {
        b.reset()
        b.parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
        i += 1
      }
    }
    // full bundle
    val bundle = new graft.ops.XmlSupport.XpathBundle(
      Seq("/r/v", "/r/@a", "/r/w"), Seq(false, false, false))
    def full(): Unit = {
      var i = 0
      while (i < n) { bundle.eval(xml); i += 1 }
    }
    // StAX pull parse only
    val xf = javax.xml.stream.XMLInputFactory.newInstance()
    xf.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    def stax(): Unit = {
      var i = 0
      while (i < n) {
        val r = xf.createXMLStreamReader(new java.io.StringReader(xml))
        while (r.hasNext) r.next()
        r.close()
        i += 1
      }
    }
    for (w <- 0 to 1) {
      var t0 = System.nanoTime(); parseOnly()
      val tp = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); full()
      val tf = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); stax()
      val ts = (System.nanoTime() - t0) / 1e9
      if (w == 1) println(f"[probe] domparse=$tp%.3f bundle(parse+3eval)=$tf%.3f stax=$ts%.3f for $n rows")
    }
  }
}
