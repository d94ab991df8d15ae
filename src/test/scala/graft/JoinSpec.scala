package graft

import org.apache.spark.sql.Row
import graft.ops.JoinOps

class JoinSpec extends SparkSpec {

  private def trades = df("sym STRING, t DOUBLE, qty INT", Seq(
    Row("A", 10.0, 1), Row("A", 20.0, 2), Row("A", 25.0, 3),
    Row("B", 5.0, 4), Row("B", 50.0, 5),
    Row("C", 7.0, 6))) // C has no quotes at all

  private def quotes = df("qsym STRING, qt DOUBLE, px DOUBLE, seq INT", Seq(
    Row("A", 8.0, 1.0, 1), Row("A", 20.0, 2.0, 1), Row("A", 22.0, 3.0, 1),
    Row("B", 6.0, 4.0, 1), Row("B", 40.0, 5.0, 1),
    // (key, time) collision: largest tiebreak must win deterministically
    Row("B", 40.0, 6.0, 2)))

  private def collectAsof(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
      Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

  test("asofJoin backward: latest at-or-before, nulls when none precede") {
    val out = JoinOps.asofJoin(trades, quotes,
      "sym", "qsym", "t", "qt", Seq("px"),
      rightTiebreak = Some("seq"))
    assert(out.columns.toSeq == Seq("sym", "t", "qty", "asof_px"))
    assert(collectAsof(out) == Set(
      ("A", 10.0, 1, Some(1.0)),  // quote at 8
      ("A", 20.0, 2, Some(2.0)),  // equal time matches
      ("A", 25.0, 3, Some(3.0)),  // quote at 22
      ("B", 5.0, 4, None),        // nothing at-or-before 5
      ("B", 50.0, 5, Some(6.0)),  // tie at qt=40 -> seq=2 row wins
      ("C", 7.0, 6, None)))       // key with no right rows
  }

  test("asofJoin forward: earliest at-or-after") {
    val out = JoinOps.asofJoin(trades, quotes,
      "sym", "qsym", "t", "qt", Seq("px"),
      direction = "forward", rightTiebreak = Some("seq"))
    assert(collectAsof(out) == Set(
      ("A", 10.0, 1, Some(2.0)),  // next quote at 20
      ("A", 20.0, 2, Some(2.0)),  // equal time matches
      ("A", 25.0, 3, None),       // no quote at-or-after 25
      ("B", 5.0, 4, Some(4.0)),   // next quote at 6
      ("B", 50.0, 5, None),
      ("C", 7.0, 6, None)))
  }

  test("asofJoin tolerance masks far matches; inner drops them") {
    val out = JoinOps.asofJoin(trades, quotes,
      "sym", "qsym", "t", "qt", Seq("px"),
      rightTiebreak = Some("seq"), tolerance = Some(3.0))
    assert(collectAsof(out) == Set(
      ("A", 10.0, 1, Some(1.0)),  // |10-8|=2 <= 3
      ("A", 20.0, 2, Some(2.0)),
      ("A", 25.0, 3, Some(3.0)),  // |25-22|=3 <= 3
      ("B", 5.0, 4, None),
      ("B", 50.0, 5, None),       // |50-40|=10 masked
      ("C", 7.0, 6, None)))
    val inner = JoinOps.asofJoin(trades, quotes,
      "sym", "qsym", "t", "qt", Seq("px"),
      rightTiebreak = Some("seq"), tolerance = Some(3.0), inner = true)
    assert(inner.count() == 3)
  }

  test("asofJoin matches the naive window-max oracle on random data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val l = df("k STRING, t DOUBLE, id INT",
      (1 to 300).map(i => Row(s"k${rnd.nextInt(5)}", rnd.nextInt(100).toDouble, i)))
    val r = df("rk STRING, rt DOUBLE, v DOUBLE",
      (1 to 200).map(i => Row(s"k${rnd.nextInt(6)}", rnd.nextInt(100).toDouble,
        i.toDouble)))
    // naive quadratic oracle: per left row, the max-(rt, v) right row
    // with rt <= t — v doubles as the tiebreak
    val naive = l.join(r, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("k", "t", "id")
      .agg(max(struct(col("rt"), col("v"))).as("m"))
      .select(col("id"), col("m.v").as("expect"))
    val got = JoinOps.asofJoin(l, r, "k", "rk", "t", "rt", Seq("v"),
      rightTiebreak = Some("v"))
      .select(col("id"), col("asof_v"))
    val joined = got.join(naive, "id")
      .where(not(col("asof_v") <=> col("expect")))
    assert(joined.count() == 0)
  }

  test("asofJoin plan: one key shuffle, no BNLJ/cartesian, window partitioned") {
    val out = JoinOps.asofJoin(trades, quotes,
      "sym", "qsym", "t", "qt", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // union-merge: exactly one exchange on the key feeds the window
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 key exchange, plan:\n$plan")
  }

  test("rangeJoin: containment via grid cells, exact post-filter") {
    val pts = df("v DOUBLE, pid INT",
      Seq(Row(0.5, 1), Row(10.0, 2), Row(19.99, 3), Row(20.0, 4),
        Row(35.0, 5), Row(-3.0, 6)))
    val iv = df("lo DOUBLE, hi DOUBLE, band STRING", Seq(
      Row(0.0, 20.0, "low"), Row(20.0, 40.0, "high"),
      Row(-10.0, 1.0, "neg"),      // overlaps "low" on [0,1)
      Row(30.0, 30.0, "empty")))   // degenerate: matches nothing
    val out = JoinOps.rangeJoin(pts, iv, "v", "lo", "hi", cellWidth = 7.0)
    val got = out.collect().map(r => (r.getInt(1), r.getString(4))).toSet
    assert(got == Set(
      (1, "low"), (1, "neg"), (2, "low"), (3, "low"),
      (4, "high"), (5, "high"), (6, "neg")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("asofJoin nearest: closer side wins, ties to backward, one-sided ok") {
    val l = df("sym STRING, t DOUBLE, qty INT", Seq(
      Row("A", 10.0, 1),  // quotes at 8 (d=2) and 11 (d=1): forward wins
      Row("A", 9.0, 2),   // equidistant 8/11? d=1 vs 2 -> backward (8)
      Row("A", 9.5, 3),   // exact tie d=1.5 both -> backward (8)
      Row("B", 5.0, 4),   // only a future quote exists -> forward side
      Row("C", 7.0, 5)))  // no quotes at all -> null
    val r = df("qsym STRING, qt DOUBLE, px DOUBLE, seq INT", Seq(
      Row("A", 8.0, 1.0, 1), Row("A", 11.0, 2.0, 1),
      Row("B", 50.0, 3.0, 1)))
    val out = JoinOps.asofJoin(l, r, "sym", "qsym", "t", "qt", Seq("px"),
      direction = "nearest", rightTiebreak = Some("seq"))
    assert(collectAsof(out) == Set(
      ("A", 10.0, 1, Some(2.0)),
      ("A", 9.0, 2, Some(1.0)),
      ("A", 9.5, 3, Some(1.0)),
      ("B", 5.0, 4, Some(3.0)),
      ("C", 7.0, 5, None)))
    // tolerance applies to the CHOSEN side's distance
    val tol = JoinOps.asofJoin(l, r, "sym", "qsym", "t", "qt", Seq("px"),
      direction = "nearest", rightTiebreak = Some("seq"),
      tolerance = Some(1.0))
    assert(collectAsof(tol) == Set(
      ("A", 10.0, 1, Some(2.0)),  // d=1 within
      ("A", 9.0, 2, Some(1.0)),   // d=1 within
      ("A", 9.5, 3, None),        // d=1.5 masked
      ("B", 5.0, 4, None),        // d=45 masked
      ("C", 7.0, 5, None)))
  }

  test("asofJoin carries the matched ROW: a null payload value stays null") {
    // regression: carrying payload columns individually through
    // last(ignoreNulls) surfaced a STALE value from an older right row
    // when the true as-of match held a null payload (and multi-payload
    // columns could each come from a different row)
    val l = df("sym STRING, t DOUBLE, qty INT", Seq(Row("A", 10.0, 1)))
    val r = df("qsym STRING, qt DOUBLE, px DOUBLE, sz DOUBLE", Seq(
      Row("A", 8.0, 1.0, 100.0),
      Row("A", 9.0, null, 200.0))) // the true match: px null, sz 200
    val out = JoinOps.asofJoin(l, r, "sym", "qsym", "t", "qt",
      Seq("px", "sz")).collect()(0)
    assert(Option(out.get(3)).isEmpty, "stale px carried from t=8")
    assert(out.getDouble(4) == 200.0)
    // tolerance must validate the matched row's time, not an older one
    val tight = JoinOps.asofJoin(l, r, "sym", "qsym", "t", "qt",
      Seq("px", "sz"), tolerance = Some(1.5)).collect()(0)
    assert(Option(tight.get(3)).isEmpty && tight.getDouble(4) == 200.0)
  }

  test("asofJoin null semantics: null keys/times never match, either side") {
    val l = df("sym STRING, t DOUBLE, qty INT", Seq(
      Row("A", 10.0, 1), Row(null, 10.0, 2), Row("A", null, 3)))
    val r = df("qsym STRING, qt DOUBLE, px DOUBLE, seq INT", Seq(
      Row("A", 8.0, 1.0, 1),
      Row("A", null, 99.0, 2),   // null-time right row must be ignored,
      Row(null, 9.0, 98.0, 3)))  // not half-matched via the payload carry
    for (dir <- Seq("backward", "forward")) {
      val out = JoinOps.asofJoin(l, r, "sym", "qsym", "t", "qt", Seq("px"),
        direction = dir, rightTiebreak = Some("seq"))
      val m = out.collect().map(x => x.getInt(2) -> Option(x.get(3))).toMap
      assert(m(2) == None, s"null left key matched under $dir")
      assert(m(3) == None, s"null left time matched under $dir")
      if (dir == "backward") assert(m(1) == Some(1.0)) // real match intact
    }
  }

  test("rangeJoin null semantics: null points and null bounds drop out") {
    val pts = df("v DOUBLE, pid INT", Seq(Row(5.0, 1), Row(null, 2)))
    val iv = df("lo DOUBLE, hi DOUBLE, band STRING", Seq(
      Row(0.0, 10.0, "ok"), Row(null, 10.0, "nulllo"), Row(0.0, null, "nullhi")))
    val got = JoinOps.rangeJoin(pts, iv, "v", "lo", "hi", cellWidth = 5.0)
      .collect().map(r => (r.getInt(1), r.getString(4))).toSet
    assert(got == Set((1, "ok")))
  }

  test("asof-join / range-join directive spellings against registered tables") {
    val out = Wrangle
      .recipe("asof-join :sym :t quotes :qsym :qt px backward none seq")
      .withLookup("quotes", quotes)
      .apply(trades)
    assert(collectAsof(out) == Set(
      ("A", 10.0, 1, Some(1.0)), ("A", 20.0, 2, Some(2.0)),
      ("A", 25.0, 3, Some(3.0)), ("B", 5.0, 4, None),
      ("B", 50.0, 5, Some(6.0)), ("C", 7.0, 6, None)))

    val iv = df("lo DOUBLE, hi DOUBLE, band STRING",
      Seq(Row(0.0, 20.0, "low"), Row(20.0, 60.0, "high")))
    val ranged = Wrangle
      .recipe("range-join :t bands :lo :hi 20")
      .withLookup("bands", iv)
      .apply(trades)
    assert(ranged.collect().map(r => (r.getInt(2), r.getString(5))).toSet ==
      Set((1, "low"), (2, "high"), (3, "high"), (4, "low"),
        (5, "high"), (6, "low")))
  }

  test("rangeJoin matches naive non-equi join on random intervals") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val pts = df("v DOUBLE, pid INT",
      (1 to 500).map(i => Row(rnd.nextDouble() * 100 - 20, i)))
    val iv = df("lo DOUBLE, hi DOUBLE, iid INT",
      (1 to 60).map { i =>
        val lo = rnd.nextDouble() * 90 - 20
        Row(lo, lo + rnd.nextDouble() * 15, i)
      })
    val naive = pts.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid")
    val got = JoinOps.rangeJoin(pts, iv, "v", "lo", "hi", cellWidth = 5.0)
      .select("pid", "iid")
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }

  test("intervalJoin: overlap semantics, cell dedup, directive") {
    val a = df("lo_a DOUBLE, hi_a DOUBLE, aid INT", Seq(
      Row(0.0, 10.0, 1),    // overlaps b1 [5,15) and b3 [-5,1)
      Row(10.0, 20.0, 2),   // touches b1 at 10 exactly: NOT overlap (half-open)
      Row(14.9, 50.0, 3),   // overlaps b2 [30,31); spans many cells
      Row(60.0, 60.0, 4)))  // degenerate hi <= lo: matches nothing
    val b = df("lo_b DOUBLE, hi_b DOUBLE, bid INT", Seq(
      Row(5.0, 10.0, 1), Row(30.0, 31.0, 2), Row(-5.0, 1.0, 3)))
    val out = JoinOps.intervalJoin(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
      cellWidth = 4.0)
    // each overlapping pair appears exactly ONCE despite shared cells
    val got = out.select("aid", "bid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got.sorted == Seq((1, 1), (1, 3), (3, 2)).sorted, s"got $got")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // matches the naive non-equi join on random intervals
    val rnd = new scala.util.Random(13)
    val ra = df("lo_a DOUBLE, hi_a DOUBLE, aid INT",
      (1 to 300).map { i =>
        val lo = rnd.nextDouble() * 90 - 20
        Row(lo, lo + rnd.nextDouble() * 12, i)
      })
    val rb = df("lo_b DOUBLE, hi_b DOUBLE, bid INT",
      (1 to 80).map { i =>
        val lo = rnd.nextDouble() * 90 - 20
        Row(lo, lo + rnd.nextDouble() * 8, i)
      })
    import org.apache.spark.sql.functions.col
    val naive = ra.join(rb,
        col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
      .select("aid", "bid")
    val fast = JoinOps.intervalJoin(ra, rb, "lo_a", "hi_a", "lo_b", "hi_b",
      cellWidth = 6.0).select("aid", "bid")
    assert(fast.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(fast).count() == 0)
    // directive spelling against a registered table
    val viaDirective = Wrangle
      .recipe("interval-join :lo_a :hi_a windows :lo_b :hi_b 4")
      .withLookup("windows", b)
      .apply(a)
      .select("aid", "bid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(viaDirective.sorted == got.sorted)
  }

  test("interval/range join generator guard trips on pathological spans") {
    // one outlier interval x a mis-sized cellWidth would explode to a
    // billion cell rows; the guard fails fast with an actionable message
    val a = df("lo_a DOUBLE, hi_a DOUBLE, aid INT",
      Seq(Row(0.0, 1.0e9, 1)))
    val b = df("lo_b DOUBLE, hi_b DOUBLE, bid INT", Seq(Row(1.0, 2.0, 1)))
    val e = intercept[Exception] {
      JoinOps.intervalJoin(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
        cellWidth = 1.0).collect()
    }
    assert(e.getMessage.contains("widen cellWidth"), e.getMessage)
    val pts = df("v DOUBLE, pid INT", Seq(Row(5.0, 1)))
    val iv = df("lo DOUBLE, hi DOUBLE, band STRING",
      Seq(Row(0.0, 1.0e9, "wide")))
    val e2 = intercept[Exception] {
      JoinOps.rangeJoin(pts, iv, "v", "lo", "hi", cellWidth = 1.0).collect()
    }
    assert(e2.getMessage.contains("widen cellWidth"), e2.getMessage)
  }

  test("saltedJoin: identical rows to the plain join under skew") {
    import graft.ops.JoinOps
    // one hot key (0) carrying most of the left side, plus null keys
    val left = df("k BIGINT, lv INT", (1 to 60).map(i =>
      Row(if (i <= 40) 0L else (i % 7).toLong, i)) :+ Row(null, 999))
    val right = df("rk BIGINT, rv STRING", Seq(
      Row(0L, "hot"), Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(99L, "unmatched")))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    for (how <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = left.join(right, left("k") === right("rk"), how)
      val plainCols = plain.columns
      val salted = JoinOps.saltedJoin(left, right, "k", "rk", salt = 4,
        how = how).select(plainCols.map(org.apache.spark.sql.functions.col): _*)
      assert(canon(salted) == canon(plain), s"rows differ for $how")
    }
    // the join keys really carry the salt (hot key spread over tasks)
    val plan = JoinOps.saltedJoin(left, right, "k", "rk", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__sj_salt"), s"salt not in the join keys:\n$plan")
    // right-side-replicating outer types are refused
    intercept[IllegalArgumentException] {
      JoinOps.saltedJoin(left, right, "k", "rk", 4, how = "full_outer")
    }
  }

  test("saltedJoin: map-typed columns are excluded from the salt basis") {
    import graft.ops.JoinOps
    import org.apache.spark.sql.functions._
    // xxhash64 rejects MapType — the salt must come from hash-safe
    // columns only, and the join must still run (the crash case)
    val left = df("k BIGINT, lv INT", (1 to 20).map(i =>
      Row((i % 3).toLong, i)))
      .withColumn("attrs", map(lit("a"), col("lv").cast("string")))
    val right = df("rk BIGINT, rv STRING", Seq(
      Row(0L, "x"), Row(1L, "y"), Row(2L, "z")))
    val out = JoinOps.saltedJoin(left, right, "k", "rk", salt = 4)
    assert(out.count() == 20)
    // a frame with ONLY map payloads beyond the key still salts (the
    // key itself is hash-safe), and an all-map frame cannot exist
    // since the join key must be hashable to join at all
    val keyOnly = left.select(col("k"), col("attrs"))
    assert(JoinOps.saltedJoin(keyOnly, right, "k", "rk", 4).count() == 20)
  }
}
