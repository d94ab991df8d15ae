package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{Hll, KllBuf, Sketches, SpaceSavingBuf}

/** Mergeable sketch aggregates: accuracy bounds, merge laws, serde,
  * and partial-vs-single-partition equivalence under Spark's real
  * partial-aggregation path.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  // ---- HLL kernel ---------------------------------------------------

  test("hll kernel: estimate within 3 sigma across cardinality sweep") {
    for (n <- Seq(100, 5000, 200000)) {
      val regs = Hll.emptyRegs(12)
      val rnd = new scala.util.Random(7)
      // distinct longs hashed through the same path as the aggregate
      (0 until n).foreach { i =>
        Hll.add(regs, 12,
          org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(i.toLong * 2654435761L + rnd.nextInt(3), // dups allowed
              org.apache.spark.sql.types.LongType, Hll.Seed))
      }
      val distinct = (0 until n).map(i => i.toLong * 2654435761L).distinct.size
      val est = Hll.estimate(regs)
      val sigma = 1.04 / math.sqrt(4096)
      // dups from nextInt(3) perturb at most tiny amounts; bound on n
      assert(math.abs(est.toDouble / distinct - 1.0) < 3 * sigma + 0.01,
        s"n=$n est=$est")
    }
  }

  test("hll kernel: merge equals union of streams") {
    val a = Hll.emptyRegs(10)
    val b = Hll.emptyRegs(10)
    val all = Hll.emptyRegs(10)
    def h(i: Int) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(i.toLong, org.apache.spark.sql.types.LongType, Hll.Seed)
    (0 until 10000).foreach { i =>
      if (i % 2 == 0) Hll.add(a, 10, h(i)) else Hll.add(b, 10, h(i))
      Hll.add(all, 10, h(i))
    }
    assert(Hll.merge(a.clone(), b).toSeq == all.toSeq)
  }

  test("hll serde roundtrip preserves registers") {
    val regs = Hll.emptyRegs(8)
    (0 until 500).foreach(i => Hll.add(regs, 8,
      org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(i.toLong, org.apache.spark.sql.types.LongType, Hll.Seed)))
    assert(Hll.deserialize(Hll.serialize(regs)).toSeq == regs.toSeq)
  }

  // ---- HLL through Spark aggregation --------------------------------

  test("hll aggregate: small cardinality is near-exact (linear counting)") {
    val data = (1 to 3000).map(i => (i % 7, s"u${i % 500}"))
    val exact = data.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val out = data.toDF("g", "u").repartition(8)
      .groupBy($"g")
      .agg(Sketches.hllDistinct($"u").as("est"))
      .collect()
    out.foreach { r =>
      // a few hundred distincts at p=12 is deep linear-counting regime
      assert(math.abs(r.getLong(1) - exact(r.getInt(0))) <= 15, r.toString)
    }
  }

  test("hll aggregate: sketch-then-union equals one-shot sketch") {
    val df = (1 to 20000).map(i => (i % 5, i % 3777)).toDF("part", "v")
      .repartition(16)
    val perPart = df.groupBy($"part").agg(Sketches.hllSketch($"v").as("sk"))
    val unioned = perPart.agg(
      Sketches.hllEstimate(Sketches.hllUnion($"sk")).as("est"))
      .head().getLong(0)
    val oneShot = df.agg(Sketches.hllDistinct($"v").as("est"))
      .head().getLong(0)
    assert(unioned == oneShot, s"union=$unioned oneShot=$oneShot")
    assert(math.abs(unioned - 3777.0) / 3777.0 < 0.05)
  }

  test("hll aggregate: nulls skipped, empty input estimates zero") {
    val df = Seq[(Integer, String)]((1, null), (2, null)).toDF("id", "v")
    assert(df.agg(Sketches.hllDistinct($"v")).head().getLong(0) == 0L)
  }

  // ---- KLL ----------------------------------------------------------

  test("kll kernel: rank error bounded on sorted, reversed, shuffled input") {
    val n = 100000
    val orders = Seq(
      (0 until n).map(_.toDouble),
      (0 until n).reverse.map(_.toDouble),
      new scala.util.Random(11).shuffle((0 until n).toVector).map(_.toDouble))
    for (data <- orders) {
      val buf = new KllBuf(200)
      data.foreach(buf.update)
      for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
        val est = buf.quantile(q)
        val rank = est / n // data is 0..n-1 uniform
        assert(math.abs(rank - q) < 0.025, s"q=$q est=$est rank=$rank")
      }
    }
  }

  test("kll kernel: merge keeps count and rank error") {
    val a = new KllBuf(200)
    val b = new KllBuf(200)
    (0 until 50000).foreach(i => a.update(i.toDouble))
    (50000 until 100000).foreach(i => b.update(i.toDouble))
    a.mergeIn(b)
    assert(a.n == 100000)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val rank = a.quantile(q) / 100000
      assert(math.abs(rank - q) < 0.025, s"q=$q rank=$rank")
    }
  }

  test("kll serde roundtrip preserves quantiles and count") {
    val buf = new KllBuf(128)
    (0 until 20000).foreach(i => buf.update((i * 37 % 20000).toDouble))
    val back = KllBuf.deserialize(buf.serialize())
    assert(back.n == buf.n)
    Seq(0.1, 0.5, 0.9).foreach(q =>
      assert(back.quantile(q) == buf.quantile(q)))
  }

  test("kll aggregate: distributed quantiles within rank tolerance") {
    val df = (0 until 60000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .repartition(16)
    val out = df.agg(
      Sketches.kllQuantiles($"v", Seq(0.25, 0.5, 0.75)).as("qs"))
      .head().getSeq[Double](0)
    Seq(0.25, 0.5, 0.75).zip(out).foreach { case (q, est) =>
      assert(math.abs(est / 60000 - q) < 0.025, s"q=$q est=$est")
    }
  }

  test("kll aggregate: all-null group returns null") {
    val df = Seq[(Int, java.lang.Double)]((1, null), (1, null)).toDF("g", "v")
    assert(df.groupBy($"g").agg(Sketches.kllQuantiles($"v", Seq(0.5)))
      .head().isNullAt(1))
  }

  // ---- SpaceSaving --------------------------------------------------

  test("spacesaving kernel: guarantees on a skewed stream") {
    val buf = new SpaceSavingBuf(20)
    val rnd = new scala.util.Random(5)
    // zipf-ish: item j appears ~ n / (j+1)^1.2 times, interleaved
    val stream = rnd.shuffle(
      (0 until 200).flatMap(j =>
        Seq.fill(math.max(1, (5000 / math.pow(j + 1, 1.2)).toInt))(s"w$j")))
    stream.foreach(buf.update)
    val n = stream.size
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size).toMap
    val inSketch = buf.result.map(_._1).toSet
    // every item with true count > n/k must be present
    trueCounts.filter(_._2 > n / 20).keys.foreach(it =>
      assert(inSketch.contains(it), s"$it missing"))
    // counts overestimate by at most the recorded err, err <= n/k
    buf.result.foreach { case (it, c, e) =>
      val t = trueCounts(it)
      assert(c >= t && c - t <= e && e <= n / 20, s"$it c=$c t=$t e=$e")
    }
  }

  test("spacesaving kernel: merge respects additive error bound") {
    val a = new SpaceSavingBuf(16)
    val b = new SpaceSavingBuf(16)
    val sa = (0 until 5000).map(i => s"x${i % 40}")
    val sb = (0 until 5000).map(i => s"x${(i * 7) % 60}")
    sa.foreach(a.update); sb.foreach(b.update)
    a.mergeIn(b)
    val trueCounts = (sa ++ sb).groupBy(identity).view.mapValues(_.size).toMap
    a.result.foreach { case (it, c, e) =>
      val t = trueCounts(it)
      assert(c >= t && c - t <= e, s"$it c=$c t=$t e=$e")
    }
    assert(a.counters.size <= 16)
  }

  test("spacesaving aggregate: exact when capacity exceeds distincts") {
    val df = (1 to 9000).map(i => s"t${i % 9}").toDF("v").repartition(12)
    val rows = df.agg(Sketches.heavyHitters($"v", 64).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.count", $"e.err")
      .collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      assert(r.getLong(1) == 1000L, r.toString)
      assert(r.getLong(2) == 0L, r.toString)
    }
  }

  // ---- TopKBy -------------------------------------------------------

  test("topk_by aggregate matches a window over every partitioning") {
    val rnd = new scala.util.Random(3)
    val data = (1 to 5000).map(i => (i % 7, rnd.nextDouble() * 1000, s"id$i"))
    val df = data.toDF("g", "v", "id").repartition(16)
    val viaAgg = df.groupBy($"g")
      .agg(Sketches.topKBy($"v", $"id", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("rank", "e")))
      .select($"g", $"rank", $"e.item".as("id"), $"e.value".as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val expected = data.groupBy(_._1).flatMap { case (g, rows) =>
      rows.sortBy { case (_, v, id) => (-v, id) }.take(5).zipWithIndex
        .map { case ((_, _, id), rank) => (g, rank, id) }
    }.toSet
    assert(viaAgg == expected)
  }

  test("topk_by handles ties deterministically (item asc)") {
    val df = Seq((1, 5.0, "b"), (1, 5.0, "a"), (1, 5.0, "c"), (1, 4.0, "d"))
      .toDF("g", "v", "id").repartition(4)
    val top = df.groupBy($"g").agg(Sketches.topKBy($"v", $"id", 2).as("t"))
      .select(explode($"t.item").as("item")).as[String].collect().toSeq
    assert(top == Seq("a", "b"))
  }

  test("topk_by with k larger than group returns whole group sorted") {
    val df = Seq((1, 2.0, "x"), (1, 9.0, "y"), (1, 5.0, "z"))
      .toDF("g", "v", "id")
    val top = df.groupBy($"g").agg(Sketches.topKBy($"v", $"id", 10).as("t"))
      .select(explode($"t.item").as("item")).as[String].collect().toSeq
    assert(top == Seq("y", "z", "x"))
  }

  // ---- recipe directives -------------------------------------------

  test("profile-distinct directive: one pass, near-exact at low cardinality") {
    val d = (1 to 4000).map(i => (s"seg${i % 5}", i % 800)).toDF("seg", "k")
    val prof = wrangle("profile-distinct :seg,:k", d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof("seg") == 5L)
    assert(math.abs(prof("k") - 800) <= 20)
  }

  test("profile-quantiles directive emits (prob, value) rows in order") {
    val d = (0 until 10000).map(_.toDouble).toDF("v")
    val rows = wrangle("profile-quantiles :v 0.1,0.5,0.9", d).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.1, 0.5, 0.9))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) / 10000 - r.getDouble(0)) < 0.025)
    }
  }

  test("topk-by directive matches groupwise sort") {
    val d = Seq(("a", 1.0, "x"), ("a", 3.0, "y"), ("a", 2.0, "z"),
      ("b", 9.0, "w")).toDF("g", "v", "id")
    val out = wrangle("topk-by :g :v :id 2", d)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq(("a", 0, "y"), ("a", 1, "z"), ("b", 0, "w")))
  }

  test("sessionize directive groups events by inactivity gap") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val d = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 11:30:00"), 3.0), // > 30 min gap → new session
      (2L, ts("2024-01-01 09:00:00"), 4.0)).toDF("user_id", "ts", "value")
    val out = wrangle("sessionize :user_id :ts 1800 :value", d)
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 0L, 2L, 3.0), (1L, 1L, 1L, 3.0),
      (2L, 0L, 1L, 4.0)))
  }

  test("hll sketches survive a parquet round trip and re-aggregate") {
    // the lake contract: write per-group sketch tables today, union
    // them next week without the raw rows
    val df = (1 to 8000).map(i => (i % 4, i % 1337)).toDF("part", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch_rt").toString
    df.groupBy($"part").agg(Sketches.hllSketch($"v").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
      .agg(Sketches.hllEstimate(Sketches.hllUnion($"sk")).as("est"))
      .head().getLong(0)
    val oneShot = df.agg(Sketches.hllDistinct($"v")).head().getLong(0)
    assert(reloaded == oneShot, s"reloaded=$reloaded oneShot=$oneShot")
  }

  // ---- sketch profiles ---------------------------------------------

  test("sketchProfile halves merge to the whole-frame profile") {
    val df = (0 until 12000)
      .map(i => (i % 900, s"u${i % 777}", (i % 500).toDouble))
      .toDF("a", "b", "c")
    def prof(d: org.apache.spark.sql.DataFrame) =
      graft.session.Profiler.sketchProfile(d)
    val whole = graft.session.Profiler.mergeSketchProfiles(prof(df))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getSeq[Double](2)).map(_.toSeq))).toMap
    val halves = prof(df.where($"a" % 2 === 0))
      .unionAll(prof(df.where($"a" % 2 =!= 0)))
    val merged = graft.session.Profiler.mergeSketchProfiles(halves)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getSeq[Double](2)).map(_.toSeq))).toMap
    // HLL union is register-max: half-profiles merge EXACTLY to the
    // whole-frame registers
    assert(whole.keySet == Set("a", "b", "c"))
    assert(merged("a")._1 == whole("a")._1)
    assert(merged("b")._1 == whole("b")._1)
    assert(math.abs(merged("a")._1 - 900) <= 20)
    // string column has no KLL sketch
    assert(whole("b")._2.isEmpty && merged("b")._2.isEmpty)
    // merged KLL quantiles stay within rank tolerance of uniform 0..499
    val qs = merged("c")._2.get
    Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (p, est) =>
      assert(math.abs(est / 500 - p) < 0.03, s"p=$p est=$est")
    }
  }

  // ---- KMV bottom-k ------------------------------------------------

  test("kmv kernel: exact below capacity, estimate within 10% above") {
    import org.apache.spark.sql.graftx.Kmv
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    def sketchOf(vals: Range, k: Int): Array[Byte] = {
      val b = new Kmv.Buf(k)
      vals.foreach(i => b.add(
        XxHash64Function.hash(i.toLong, LongType, org.apache.spark.sql.graftx.Hll.Seed)))
      Kmv.serialize(b)
    }
    assert(Kmv.estimate(sketchOf(0 until 500, 1024)) == 500L)
    val est = Kmv.estimate(sketchOf(0 until 100000, 1024))
    assert(math.abs(est / 100000.0 - 1.0) < 0.10, s"est=$est")
  }

  test("kmv kernel: jaccard and intersection track known overlap") {
    import org.apache.spark.sql.graftx.Kmv
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    def sk(r: Range, k: Int): Array[Byte] = {
      val b = new Kmv.Buf(k)
      r.foreach(i => b.add(
        XxHash64Function.hash(i.toLong, LongType, org.apache.spark.sql.graftx.Hll.Seed)))
      Kmv.serialize(b)
    }
    // |A|=|B|=20000, overlap 10000 -> jaccard = 1/3
    val a = sk(0 until 20000, 512)
    val b = sk(10000 until 30000, 512)
    val j = Kmv.jaccard(a, b)
    assert(math.abs(j - 1.0 / 3) < 0.08, s"jaccard=$j")
    val inter = Kmv.intersectEstimate(a, b)
    assert(math.abs(inter / 10000.0 - 1.0) < 0.25, s"inter=$inter")
    // below capacity both estimates are exact
    val ax = sk(0 until 300, 1024)
    val bx = sk(200 until 500, 1024)
    assert(Kmv.jaccard(ax, bx) == 100.0 / 500)
    assert(Kmv.intersectEstimate(ax, bx) == 100L)
  }

  test("kmv aggregate: per-source sketches give exact pairwise overlap below capacity") {
    val df = (0 until 3000).map { i =>
      val src = i % 3
      // source s covers ids [s*800, s*800+1000): adjacent overlap 200
      (s"src$src", (src * 800 + i / 3 % 1000).toLong)
    }.toDF("source", "id").repartition(8)
    val sk = df.groupBy($"source")
      .agg(Sketches.kmvSketch($"id", 4096).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    import org.apache.spark.sql.graftx.Kmv
    assert(Kmv.estimate(sk("src0")) == 1000L)
    assert(Kmv.intersectEstimate(sk("src0"), sk("src1")) == 200L)
    assert(Kmv.intersectEstimate(sk("src1"), sk("src2")) == 200L)
    assert(Kmv.intersectEstimate(sk("src0"), sk("src2")) == 0L)
  }

  // ---- PSI drift ---------------------------------------------------

  test("psiDrift: identical distributions score ~0, shifted scores high") {
    val base = (0 until 10000).map(i => (i % 100).toDouble).toDF("v")
    val same = (0 until 5000).map(i => (i % 100).toDouble).toDF("v")
    val shifted = (0 until 5000).map(i => 50.0 + (i % 50)).toDF("v")
    val psiSame = graft.session.Profiler.psiDrift(same, base, "v", bins = 10)
      .agg(sum($"psi_term")).head().getDouble(0)
    val psiShift = graft.session.Profiler.psiDrift(shifted, base, "v", bins = 10)
      .agg(sum($"psi_term")).head().getDouble(0)
    assert(math.abs(psiSame) < 0.001, s"same-dist psi=$psiSame")
    assert(psiShift > 1.0, s"shifted psi=$psiShift") // half the bins empty
  }

  test("psiDrift: out-of-range current values clamp into edge bins") {
    val base = (0 until 1000).map(_.toDouble).toDF("v")
    val cur = Seq(-500.0, 2000.0).toDF("v")
    val rows = graft.session.Profiler.psiDrift(cur, base, "v", bins = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rows(0) == 0.5 && rows(3) == 0.5)
    assert(rows(1) == 1e-6 && rows(2) == 1e-6) // eps floor, not zero
  }

  test("drift-psi directive reads the baseline from a registered table") {
    val base = (0 until 2000).map(i => (i % 40).toDouble).toDF("v")
    val cur = (0 until 1000).map(i => (i % 40).toDouble).toDF("v")
    val out = Wrangle.recipe("drift-psi :v baseline 8")
      .withLookup("baseline", base)
      .apply(cur)
    assert(out.count() == 8)
    val total = out.agg(sum($"psi_term")).head().getDouble(0)
    assert(math.abs(total) < 0.001)
  }

  // ---- edge cases ----------------------------------------------------

  test("sessionize: empty frame and single event") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(graft.ops.SessionOps.sessionize(
      empty, "user_id", "ts", 1800).count() == 0)
    val one = Seq((7L, ts("2024-01-01 00:00:00"), 1.5))
      .toDF("user_id", "ts", "value")
    val r = graft.ops.SessionOps.sessionize(
      one, "user_id", "ts", 1800, Some("value")).collect()
    assert(r.length == 1 && r(0).getLong(1) == 0L && r(0).getLong(4) == 1L)
  }

  test("kmv sketches survive a parquet round trip") {
    import org.apache.spark.sql.graftx.Kmv
    // consecutive pairs share v, so both groups see the full 0..1199 set
    val df = (0 until 4800).map(i => (i % 2, (i / 2) % 1200)).toDF("g", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kmv_rt").toString
    df.groupBy($"g").agg(Sketches.kmvSketch($"v", 4096).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val sks = spark.read.parquet(dir).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    // groups see identical value sets -> jaccard exactly 1
    assert(Kmv.jaccard(sks(0), sks(1)) == 1.0)
    assert(Kmv.estimate(sks(0)) == 1200L)
  }

  test("topk_by: NaN handling is deterministic (retained as largest, listed last)") {
    // TotalOrdering ranks NaN above +Inf, so a NaN row WINS retention
    // against real values but sorts to the END of the output array
    // (eval sorts by -v, and -NaN == NaN is TotalOrdering-largest).
    // Deterministic either way; callers who don't want NaN rows at all
    // should filter upstream.
    val df = Seq((1, Double.NaN, "n"), (1, 5.0, "a"), (1, 7.0, "b"))
      .toDF("g", "v", "id")
    val items = df.groupBy($"g").agg(Sketches.topKBy($"v", $"id", 2).as("t"))
      .select(explode($"t.item").as("i")).as[String].collect().toSeq
    assert(items == Seq("b", "n"))
  }

  test("weighted group sampling biases toward heavy rows and stays deterministic") {
    // weight 100 vs 1: heavy ids should dominate the per-group sample
    val df = (0 until 2000).map { i =>
      val heavy = i % 10 < 2 // 100 heavy rows in EACH parity group
      (i % 2, if (heavy) 100.0 else 1.0, s"id$i")
    }.toDF("g", "w", "id")
    val pick = graft.session.Sampler
      .weightedTopKByGroup(df, "g", "w", "id", 50)
    val heavyFrac = pick.collect().count { r =>
      r.getString(2).stripPrefix("id").toInt % 10 < 2
    } / 100.0
    // heavy rows are 10% of the population but ~100x weight: expect
    // the sample to be mostly heavy (analytically >90%; assert loosely)
    assert(heavyFrac > 0.7, s"heavyFrac=$heavyFrac")
    // pure function of ids: a repartitioned rerun picks identically
    val again = graft.session.Sampler
      .weightedTopKByGroup(df.repartition(13), "g", "w", "id", 50)
    assert(pick.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet)
  }

  test("snapshotDiff covers all four statuses including removed and null-safe compares") {
    val cur = Seq((1L, "a"), (2L, "b2"), (4L, null))
      .toDF("k", "v")
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "gone"), (4L, null))
      .toDF("k", "v")
    val got = graft.ops.JoinOps.snapshotDiff(cur, prev, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged"))
  }

  test("scd2: intervals chain, duplicates collapse, last state is current") {
    val changes = Seq(
      (1L, "bronze", 10L), (1L, "bronze", 20L), // duplicate state: collapse
      (1L, "silver", 30L), (1L, "gold", 40L),
      (2L, "gold", 5L))
      .toDF("k", "tier", "v")
    val got = graft.ops.JoinOps.scd2(changes, Seq("k"), "v")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "gold", 5L, None, true)))
  }

  test("applyChanges: latest-wins upserts, deletes, inserts of new keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "upsert", 1L),  // update
      (2L, "b3", "upsert", 3L),  // later update wins
      (3L, "x", "delete", 1L),   // delete
      (4L, "d", "upsert", 1L),   // brand-new key
      (4L, "dead", "delete", 2L), // ...then deleted
      (5L, "e", "upsert", 9L))   // new key survives
      .toDF("k", "v", "op", "ver")
    val next = graft.ops.JoinOps.applyChanges(
      base, changes, Seq("k"), "op", "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(next == Map(1L -> "a", 2L -> "b3", 5L -> "e"))
  }

  test("quality-report: failing rules report pass=false with observed values") {
    val df = Seq(("a", 1.0), ("b", -5.0), (null, 3.0))
      .toDF("s", "v")
    val rep = wrangle(
      "quality-report 'rowcount >= 10; null_frac(:s) <= 0.1; min(:v) >= 0; in(:s: a,b)'",
      df).collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(rep("rowcount >= 10") == ((3.0, false)))
    assert(rep("null_frac(s) <= 0.1")._2 == false)
    assert(rep("min(v) >= 0") == ((-5.0, false)))
    assert(rep("in(s)") == ((0.0, true))) // nulls don't violate the set
  }

  test("threshold-sweep: exact confusion counts, null exclusion, zero-denominator nulls") {
    // scores 0.05..0.95 step 0.1; label = score > 0.5 with one flip
    // the NaN row must be EXCLUDED by the op itself (Spark orders NaN
    // above every double, so it would otherwise inflate tp at all Ts)
    val df = Seq(
      (0.05, false), (0.15, false), (0.25, false), (0.35, true), // flip
      (0.45, false), (0.55, true), (0.65, true), (0.75, true),
      (0.85, true), (0.95, true),
      (Double.NaN, true)).toDF("score", "label")
    val rows = wrangle("threshold-sweep :score :label 0.1 0.2 5", df)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // T=0.5: scores >= 0.5 are the five 0.55..0.95 (all true) -> tp=5,
    // fp=0; below: 0.35 is a true label -> fn=1, tn=4
    assert(rows(0.5) == ((5L, 0L, 1L, 4L)))
    // T=0.1: everything >= 0.1 except 0.05 -> tp=6, fp=3, fn=0, tn=1
    assert(rows(0.1) == ((6L, 3L, 0L, 1L)))
    // degenerate frame: all-negative labels -> recall is null, not 0/0
    val neg = Seq((0.9, false)).toDF("score", "label")
    val r0 = wrangle("threshold-sweep :score :label 0.5 0.1 1", neg).head()
    assert(r0.getLong(1) == 0L && r0.isNullAt(6), "recall should be null")
    // null scores and labels are excluded, not counted anywhere
    val withNulls = Seq((Some(0.9), Some(true)), (None, Some(true)),
      (Some(0.9), None)).toDF("score", "label")
    val r1 = wrangle("threshold-sweep :score :label 0.5 0.1 1", withNulls).head()
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) ==
      ((1L, 0L, 0L, 0L)))
  }

  test("winsorize: clamps to exact percentile bounds; approx and all-null paths") {
    // 1..100: p05/p95 interpolated over sorted index = 5.95 / 95.05
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = wrangle("winsorize :v", df).collect().map(_.getDouble(0))
    assert(math.abs(w.min - 5.95) < 1e-9 && math.abs(w.max - 95.05) < 1e-9)
    // interior values pass through untouched
    assert(w.count(x => x == 50.0) == 1)
    // approx mode still brackets the distribution
    val wa = wrangle("winsorize :v 0.05 0.95 approx", df)
      .collect().map(_.getDouble(0))
    assert(wa.min >= 1.0 && wa.max <= 100.0 && wa.min > 1.0 + 1e-9)
    // an all-null column is a no-op, not a crash
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    assert(wrangle("winsorize :v", nulls).collect().forall(_.isNullAt(0)))
    // NaN: excluded from the bounds (one NaN must not drag the upper
    // percentile to NaN and disable the clamp) and passes through
    val withNan = ((1 to 100).map(_.toDouble) :+ Double.NaN).toDF("v")
    val wn = wrangle("winsorize :v", withNan).collect().map(_.getDouble(0))
    assert(wn.count(_.isNaN) == 1)
    val clean = wn.filterNot(_.isNaN)
    assert(math.abs(clean.min - 5.95) < 1e-9 &&
      math.abs(clean.max - 95.05) < 1e-9)
  }

  test("outlier-mad: robust flag, NaN/null policy, all-equal column") {
    // 1..99 with one wild point: med=50, MAD=25 -> |x-50|>75 flags 1000
    val df = ((1 to 99).map(_.toDouble) :+ 1000.0).toDF("v")
    val out = wrangle("outlier-mad :v 3.0", df).collect()
      .map(r => r.getDouble(0) -> r.getBoolean(1)).toMap
    assert(out(1000.0) && !out(50.0) && !out(1.0) && !out(99.0))
    // the mean/stddev z-score would be dragged by the outlier itself;
    // MAD is not: k=2.5 still keeps the bulk clean
    assert(out.count(_._2) == 1)
    // NaN rows: excluded from the statistics, flag null
    import org.apache.spark.sql.Row
    val withNan = ((1 to 9).map(_.toDouble) :+ Double.NaN :+ 500.0).toDF("v")
    val wn = wrangle("outlier-mad :v", withNan).collect()
    assert(wn.count(r => !r.isNullAt(1) && r.getBoolean(1)) == 1) // 500
    assert(wn.count(r => r.isNullAt(1)) == 1) // the NaN row
    // all-equal column: MAD 0, any deviation flags
    val eq = Seq(5.0, 5.0, 5.0, 7.0).toDF("v")
    val we = wrangle("outlier-mad :v", eq).collect()
      .map(r => r.getDouble(0) -> r.getBoolean(1))
    assert(we.toMap.apply(7.0) && !we.toMap.apply(5.0))
    // all-null column: null flags, no crash
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    assert(wrangle("outlier-mad :v", nulls).collect()
      .forall(_.isNullAt(1)))
  }

  test("char-entropy: uniform/degenerate/code-point cases") {
    import org.apache.spark.sql.Row
    val in = df("id LONG, t STRING", Seq(
      Row(1L, "abab"), Row(2L, "aaaa"), Row(3L, "abcd"),
      Row(4L, ""), Row(5L, null), Row(6L, "😀😀🚀🚀")))
    val out = wrangle("char-entropy :t", in).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out(1L) == 1.0) // two symbols, uniform
    assert(out(2L) == 0.0) // one symbol
    assert(out(3L) == 2.0) // four symbols, uniform
    assert(out(4L) == null && out(5L) == null)
    assert(out(6L) == 1.0) // astral-plane pairs count as code points
  }

  test("threshold-sweep: an all-filtered input yields zero counts, not nulls") {
    val empty = Seq[(Option[Double], Option[Boolean])]((None, Some(true)))
      .toDF("score", "label")
    val rows = wrangle("threshold-sweep :score :label 0.1 0.2 3", empty)
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("quality-report: approx mode swaps exact distinct for the HLL sketch") {
    val df = (1 to 5000).map(i => s"k${i % 321}").toDF("k")
    val rep = wrangle("quality-report 'distinct(:k) >= 300' approx", df)
      .head()
    assert(rep.getBoolean(3))
    assert(math.abs(rep.getDouble(1) - 321) <= 10)
  }

  test("sketch aggregates plan map-side partials: the shuffle carries buffers") {
    // the scale contract: partial_<agg> must sit BELOW the exchange so
    // only serialized sketch buffers (KB) cross the wire, never rows
    for ((label, aggCol) <- Seq(
        "hll" -> Sketches.hllDistinct($"v"),
        "kmv" -> Sketches.kmvSketch($"v"),
        "topk" -> Sketches.topKBy($"v".cast("double"), $"v".cast("string"), 3),
        "heavy" -> Sketches.heavyHitters($"v".cast("string")),
        "kll" -> Sketches.kllQuantiles($"v".cast("double"), Seq(0.5)))) {
      val plan = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
        .repartition(4)
        .groupBy($"g").agg(aggCol)
        .queryExecution.executedPlan.toString
      val partialIdx = plan.indexOf("partial_")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning(g")
      assert(partialIdx > 0, s"$label: no partial aggregation\n$plan")
      assert(exchangeIdx > 0 && exchangeIdx < partialIdx,
        s"$label: partial is not below the exchange\n$plan")
    }
  }

  // ---- SQL registration --------------------------------------------

  test("sketch functions callable from SQL after register()") {
    org.apache.spark.sql.graftx.GraftExtensions.register(spark)
    (1 to 1000).map(i => i % 123).toDF("v").createOrReplaceTempView("sk_sql")
    val est = spark.sql("SELECT hll_estimate(hll_sketch(v)) FROM sk_sql")
      .head().getLong(0)
    assert(math.abs(est - 123) <= 6)
    val hh = spark.sql("SELECT heavy_hitters(CAST(v AS STRING), 200) FROM sk_sql")
      .head().getSeq[Row](0)
    assert(hh.length == 123)
    // plain decimal literals must work (SQL parses 0.25 as DECIMAL;
    // the builder converts elementwise instead of toDoubleArray)
    val qs = spark.sql(
      "SELECT kll_quantiles(CAST(v AS DOUBLE), array(0.25, 0.75)) FROM sk_sql")
      .head().getSeq[Double](0)
    assert(qs.length == 2 && qs(0) < qs(1))
    val kmv = spark.sql("SELECT kmv_estimate(kmv_sketch(v)) FROM sk_sql")
      .head().getLong(0)
    assert(kmv == 123L)
  }

  test("incremental dedup directives wire through registered state tables") {
    val corpus = Seq((1L, "shared doc content here"), (2L, "unique old"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "shared doc content here"), (11L, "brand new"),
      (12L, "brand new")).toDF("doc_id", "text")
    val exactOut = Wrangle.recipe("dedup-exact-incremental :text :doc_id seen")
      .withLookup("seen", graft.llm.IncrementalDedup.exactState(corpus, "text"))
      .apply(batch).select("doc_id").as[Long].collect().toSet
    assert(exactOut == Set(11L)) // 10 matches corpus; 12 loses in-batch
    val nearOut = Wrangle.recipe(
        "dedup-minhash-incremental :text :doc_id state corpus 0.8")
      .withLookup("state",
        graft.llm.IncrementalDedup.minhashState(corpus, "text", "doc_id"))
      .withLookup("corpus", corpus)
      .apply(batch).select("doc_id").as[Long].collect().toSet
    assert(nearOut == Set(11L))
  }

  test("new directives fail fast with clear errors on bad input") {
    val d = Seq((1, 2.0)).toDF("a", "b")
    val e1 = intercept[graft.api.RecipeException](
      wrangle("quality-report 'frobnicate(a) >= 1'", d).collect())
    assert(e1.getMessage.contains("cannot parse rule"))
    val e2 = intercept[graft.api.RecipeException](
      wrangle("drift-psi :b missing_table", d).collect())
    assert(e2.getMessage.contains("unknown table"))
    val e3 = intercept[IllegalArgumentException](
      graft.ops.LayoutOps.equiDepthBuckets(d, "b", 1))
    assert(e3.getMessage.contains("outside"))
    val base = Seq(1.0, 2.0, 3.0).toDF("b") // non-degenerate baseline
    val e4 = intercept[IllegalArgumentException](
      graft.session.Profiler.psiDrift(
        base.where(org.apache.spark.sql.functions.lit(false)), base, "b")
        .collect())
    assert(e4.getMessage.contains("current side"))
  }

  test("resample fills gaps with zero counts and forward-filled values") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val d = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10.0),
      (1L, ts("2024-01-01 03:10:00"), 30.0), // 2 empty hours between
      (2L, ts("2024-01-01 01:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val out = graft.ops.SessionOps
      .resample(d, "user_id", "ts", "value", 3600)
      .orderBy("user_id", "slot").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
    // user 1: 4 slots; gap slots carry 0 events and the ffilled 10.0
    assert(out.toSeq == Seq(
      (1L, 1L, 10.0), (1L, 0L, 10.0), (1L, 0L, 10.0), (1L, 1L, 30.0),
      (2L, 1L, 5.0)))
    // the cap guard is IN-PLAN (raise_error — no eager extra scan), so
    // it surfaces at execution time as a Spark runtime failure
    val e = intercept[Exception](
      graft.ops.SessionOps.resample(d, "user_id", "ts", "value", 1,
        maxSlotsPerKey = 100).collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("slots at step")), chain(e).toString)
  }

  test("rollingAgg: trailing window includes self, drops expired, per key") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val d = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),
      (1L, ts("2024-01-01 11:15:00"), 4.0), // 10:00 expired (>1h back)
      (2L, ts("2024-01-01 10:10:00"), 8.0))
      .toDF("user_id", "ts", "value")
    val got = graft.ops.SessionOps
      .rollingAgg(d, "user_id", "ts", "value", 3600)
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1.0), (1L, 2L, 3.0), (1L, 2L, 6.0), (2L, 1L, 8.0)))
  }

  test("sessionize gap fires on numeric epoch-second columns too") {
    // regression: unix_timestamp(bigint) parses via string format,
    // yields null, and silently collapsed everything into one session
    val d = Seq((1L, 1000L), (1L, 1100L), (1L, 9000L))
      .toDF("user_id", "ts")
    val sessions = graft.ops.SessionOps.sessionize(d, "user_id", "ts", 1800)
    assert(sessions.count() == 2)
  }

  test("cms: never undercounts, exact at low load, merge law, reagg") {
    import org.apache.spark.sql.graftx.Cms
    val rows = (1 to 500).map(i => s"key${i % 7}") ++ Seq.fill(100)("hot")
    val df = rows.toDF("k")
    val sk = df.agg(Sketches.cmsSketch(col("k")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val estOf = udf((key: String) => Cms.estimate(sk,
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType, Cms.Seed1),
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType, Cms.Seed2)))
    val got = df.distinct().select(col("k"), estOf(col("k")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 8 distinct keys in 5x2048 counters: collision-free => EXACT
    exact.foreach { case (k, c) => assert(got(k) == c, s"$k: ${got(k)} != $c") }
    // absent key estimates 0 at this load
    val none = df.agg(Sketches.cmsEstimate(
      Sketches.cmsSketch(col("k")), lit("never-seen")).as("e"))
      .head().getLong(0)
    assert(none == 0L)
    // merge law: per-partition sketches merged == one-pass sketch bytes
    val onePass = sk
    val merged = df.repartition(8)
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(Sketches.cmsSketch(col("k")).as("sk"))
      .agg(Sketches.cmsMerge(col("sk")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(onePass, merged))
    // estimate through the Column surface matches the kernel
    val viaCol = df.agg(Sketches.cmsEstimate(
      Sketches.cmsSketch(col("k")), lit("hot")).as("e")).head().getLong(0)
    assert(viaCol == exact("hot"))
    // nulls are skipped like count
    val withNulls = (rows.map(Option(_)) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("k")
    val viaNull = withNulls.agg(Sketches.cmsEstimate(
      Sketches.cmsSketch(col("k")), lit("hot")).as("e")).head().getLong(0)
    assert(viaNull == exact("hot"))
  }
}
