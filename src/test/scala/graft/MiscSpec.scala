package graft

import graft.api._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MiscSpec extends SparkSpec {

  test("profiler: one-pass null/empty/semantic-type stats") {
    val d = df("email STRING, v STRING", Seq(
      Row("a@b.com", null), Row("not-an-email", ""), Row(null, "x")))
    val p = graft.session.Profiler.profile(d)
    val m = p.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("email", "total")) == 3)
    assert(m(("email", "null")) == 1)
    assert(m(("email", "email")) == 1)
    assert(m(("v", "empty")) == 1)
    assert(m(("v", "null")) == 1)
  }

  test("samplers produce bounded deterministic-seeded samples") {
    val d = spark.range(1000).toDF("id")
    assert(graft.session.Sampler.first(d, 10).count() == 10)
    val b = graft.session.Sampler.bernoulli(d, 0.1, seed = 1).count()
    assert(b > 50 && b < 200)
    assert(graft.session.Sampler.reservoir(d, 25, seed = 1).count() == 25)
  }

  test("keyed samplers: partition-independent, seed-isolated, exact multiplicity") {
    import graft.session.Sampler
    import org.apache.spark.sql.functions._
    val d = spark.range(2000).toDF("id")

    // bernoulliByKey = consistent + seed salt: stable under repartition,
    // different seeds draw different samples
    val bk = Sampler.bernoulliByKey(d, "id", 0.1, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bk.size > 120 && bk.size < 280, s"got ${bk.size}")
    val bkShuffled = Sampler.bernoulliByKey(d.repartition(7), "id", 0.1, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bk == bkShuffled)
    assert(Sampler.bernoulliByKey(d, "id", 0.1, seed = 8)
      .select("id").collect().map(_.getLong(0)).toSet != bk)

    // poissonByKey: multiplicity replays from the public CDF thresholds
    // (the exact contract the DuckDB oracle's CASE ladder uses)
    val lam = 0.5
    val ts = Sampler.poissonCdfThresholds(lam)
    assert(ts == ts.sorted && ts.distinct == ts) // a valid CDF ladder
    val counts = Sampler.poissonByKey(d, "id", lam, seed = 3)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 2000L).flatMap { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#pois3".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val m = ts.count(t => h >= t)
      if (m > 0) Some(id -> m.toLong) else None
    }.toMap
    assert(counts == expected)
    assert(counts.valuesIterator.exists(_ >= 2), "lambda=0.5 over 2000 " +
      "keys should produce at least one multiplicity>=2 draw")

    // reservoirByKey: exactly n rows, stable under repartition, and
    // equal to the n smallest hash points (the ORDER BY/LIMIT oracle)
    val rk = Sampler.reservoirByKey(d, "id", 25, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rk.size == 25)
    val rkShuffled = Sampler.reservoirByKey(d.repartition(7), "id", 25, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rk == rkShuffled)
    val smallest = (0L until 2000L).sortBy { id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#resv7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.take(25).toSet
    assert(rk == smallest)
  }

  test("lineage relations derived from recipe AST") {
    val specs = Wrangle.specs(
      "rename :a :b; set-column :c exp:{ b * 2 }; drop :d; merge :b :c :e '-';")
    val rel = graft.session.Lineage.toRows(specs)
    assert(rel.contains(("rename", "rename", "a", "b")))
    assert(rel.contains(("set-column", "create", "c", "")))
    assert(rel.contains(("drop", "drop", "d", "")))
    assert(rel.contains(("merge", "create", "e", "")))
  }

  test("UDD: user-registered directive plugs into the recipe language") {
    Registry.register { spec =>
      if (spec.name == "exclaim")
        Some(graft.ops.ColumnOps.simple(spec) { d =>
          d.withColumn(spec.col(0), concat(col(spec.col(0)), lit("!")))
        })
      else None
    }
    val d = df("s STRING", Seq(Row("hey")))
    assert(strings(wrangle("exclaim :s", d), "s") == Seq("hey!"))
  }

  test("precondition filters rows before the recipe (skip-if-true)") {
    val d = df("v INT", Seq(Row(1), Row(100)))
    val out = Wrangle.recipe("set-column :w exp:{ v * 2 };")
      .withPrecondition("v > 50")
      .apply(d)
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 2L)))
  }

  test("parse-as-avro decodes binary records via schema json") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    val schemaJson =
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":"int"},{"name":"s","type":"string"}]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("x", 7); rec.put("s", "ok")
    val bos = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    val d = df("payload BINARY", Seq(Row(bos.toByteArray)))
    val out = wrangle(
      s"parse-as-avro :payload '${schemaJson.replaceAll("\\s", "")}'; " +
        "parse-as-json :payload 1;", d)
    val row = out.collect().head
    assert(row.getAs[Long]("payload_x") == 7L)
    assert(row.getAs[String]("payload_s") == "ok")
  }

  test("invoke-http posts row JSON and merges the response") {
    // local loopback server — no egress
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/echo", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val resp = s"""{"echoed":$body,"status":"ok"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val d = df("a INT, b STRING", Seq(Row(1, "x")))
      val out = wrangle(
        s"invoke-http 'http://127.0.0.1:$port/echo' :a,:b", d)
      val resp = out.select("http_response").collect().head.getString(0)
      assert(resp.contains("\"status\":\"ok\"") && resp.contains("\"a\":1"))
    } finally server.stop(0)
  }

  test("Http.post: retries transient 5xx, returns 4xx body, nulls on bad URL") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val clientErrHits = new java.util.concurrent.atomic.AtomicInteger(0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    // 503 twice, then 200 — within the MaxAttempts=3 retry budget
    server.createContext("/flaky",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        if (flakyHits.incrementAndGet() <= 2) respond(ex, 503, "busy")
        else respond(ex, 200, """{"ok":true}"""))
    // terminal 4xx: the body is the answer, no retry burned on it
    server.createContext("/badreq",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        clientErrHits.incrementAndGet()
        respond(ex, 400, """{"error":"bad request"}""")
      })
    // always-5xx: retries exhaust, last body returned (not null) so the
    // caller can see the server's final word
    server.createContext("/down",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 503, "still busy"))
    server.start()
    try {
      val port = server.getAddress.getPort
      assert(graft.ops.Http.post(s"http://127.0.0.1:$port/flaky", "{}", "")
        == """{"ok":true}""")
      assert(flakyHits.get() == 3, s"expected 3 attempts, ${flakyHits.get()}")
      assert(graft.ops.Http.post(s"http://127.0.0.1:$port/badreq", "{}", "")
        == """{"error":"bad request"}""")
      assert(clientErrHits.get() == 1, "4xx must not retry")
      assert(graft.ops.Http.post(s"http://127.0.0.1:$port/down", "{}", "")
        == "still busy")
      assert(graft.ops.Http.post("not a url", "{}", "") == null)
      // connection refused (nothing listens on the reserved port 9):
      // retries then null, never throws
      assert(graft.ops.Http.post("http://127.0.0.1:9/x", "{}", "") == null)
    } finally server.stop(0)
  }

  test("validate-standard routes bad JSON to the error channel") {
    val d = df("j STRING", Seq(Row("""{"a":1}"""), Row("nope")))
    val res = Wrangle.recipe("validate-standard :j;").run(d)
    assert(res.output.count() == 1)
    assert(res.errors.count() == 1)
  }

  test("geo:InFence point-in-polygon") {
    val fence =
      """{"type":"Polygon","coordinates":[[[-1.0,-1.0],[1.0,-1.0],[1.0,1.0],[-1.0,1.0],[-1.0,-1.0]]]}"""
    val d = df("lat DOUBLE, lon DOUBLE", Seq(Row(0.0, 0.0), Row(5.0, 5.0)))
    val out = d.withColumn("in",
      graft.expr.ExprCompiler.compile(s"geo:InFence(lat, lon, '${fence.replace("\"", "\\\"")}')"))
    assert(out.select("in").collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("escape namespace: html escape/unescape round-trip") {
    val d = df("s STRING", Seq(Row("""a<b>&"c"""")))
    val out = d.withColumn("e",
        graft.expr.ExprCompiler.compile("escape:escapeHtml(s)"))
      .withColumn("u", graft.expr.ExprCompiler.compile("escape:unescapeHtml(e)"))
    val r = out.collect().head
    assert(r.getAs[String]("e") == "a&lt;b&gt;&amp;&quot;c&quot;")
    assert(r.getAs[String]("u") == """a<b>&"c"""")
  }

  test("parse-as-xml validates well-formedness, malformed becomes null") {
    val d = df("x STRING", Seq(Row("<a><b>1</b></a>"), Row("<broken")))
    val out = wrangle("parse-as-xml :x", d)
    val vals = strings(out, "x")
    assert(vals.head == "<a><b>1</b></a>" && vals(1) == null)
  }

  test("builtin icd-9 catalog ships the full CMS code list") {
    val cat = graft.ops.BuiltinCatalogs.load(spark, "icd-9").get
    assert(cat.count() > 14000, "full ICD-9-CM list expected, not a subset")
    // spot checks across the file: numeric, V and E code ranges
    val got = cat.filter(col("code").isin("0010", "4019", "V700", "E9950"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("0010") == "Cholera due to vibrio cholerae")
    assert(got("4019") == "Unspecified essential hypertension")
    assert(got("V700") ==
      "Routine general medical examination at a health care facility")
    assert(got("E9950") ==
      "Injury due to war operations by unarmed hand-to-hand combat")
    // end-to-end through the directive, including a miss -> null
    val d = df("code STRING", Seq(Row("25000"), Row("NOPE")))
    val out = wrangle("catalog-lookup icd-9 :code", d)
    val descs = strings(out, "code_icd-9_description")
    assert(descs.head.toString.startsWith("Diabetes mellitus without mention"))
    assert(descs(1) == null)
    // the alias routes to the icd-9 data like the reference's ICDCatalog
    assert(graft.ops.BuiltinCatalogs.load(spark, "icd9").get.count() ==
      cat.count())
  }

  test("consistent hash sampling is key-stable and partition-independent") {
    import graft.session.Sampler
    val rows = (1L to 2000L).map(i => Row(i, s"name_$i"))
    val d = df("id BIGINT, name STRING", rows)
    val kept = Sampler.consistent(d, "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    // roughly the asked fraction (md5 is uniform; 2000 draws)
    assert(kept.size > 300 && kept.size < 500, s"got ${kept.size}")
    // identical decision after an arbitrary repartition — the property
    // seeded rand() sampling does NOT have
    val keptShuffled = Sampler.consistent(d.repartition(7), "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == keptShuffled)
    // growing the fraction only ADDS rows (nested samples)
    val kept30 = Sampler.consistent(d, "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(kept30))
    // a different salt re-draws
    val salted = Sampler.consistent(d, "id", 0.2, salt = "v2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(salted != kept)
    // null keys: deterministic, never dropped by a null comparison
    val withNull = df("id BIGINT, name STRING",
      Seq(Row(null, "a"), Row(2L, "b")))
    assert(Sampler.consistent(withNull, "id", 1.0).count() == 2)

    // hashSplit: total, disjoint, stable, and consistent with the
    // single-fraction form (same hash, same thresholds)
    val split = Sampler.hashSplit(d, "id",
      Seq("train" -> 0.2, "val" -> 0.3, "test" -> 0.5))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.values.sum == 2000)
    assert(split.keySet == Set("train", "val", "test"))
    val trainIds = Sampler.hashSplit(d, "id",
      Seq("train" -> 0.2, "val" -> 0.3, "test" -> 0.5))
      .filter(col("split") === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(trainIds == kept, "hashSplit train bucket == consistent(0.2)")

    // directive surface
    val viaRecipe = wrangle(
      "hash-split :id 'train:0.2,val:0.3,test:0.5'; filter-row exp:{ split != 'train' } true", d)
    assert(viaRecipe.select("id").collect().map(_.getLong(0)).toSet == kept)
    assert(wrangle("sample-by-hash :id 0.2", d).count() == kept.size)

    // weighted-by-group (data mixing): group A whole, group B at the
    // 0.2 rate — B's kept set is exactly the id-sample intersected
    // with B's rows, because the hash point ignores the group
    val grouped = df("id BIGINT, grp STRING",
      (1L to 2000L).map(i => Row(i, if (i % 2 == 0) "a" else "b")))
    val mixed = Sampler.weightedByGroup(grouped, "id", "grp",
      Seq("a" -> 1.0, "b" -> 0.2))
      .select("id").collect().map(_.getLong(0)).toSet
    assert((1L to 2000L).filter(_ % 2 == 0).forall(mixed.contains))
    assert(mixed.filter(_ % 2 == 1) == kept.filter(_ % 2 == 1))
    // unknown group takes the default rate
    val defaulted = Sampler.weightedByGroup(grouped, "id", "grp",
      Seq("zzz" -> 0.5), default = 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(defaulted == kept)
    // directive form
    assert(wrangle("sample-weighted :id :grp 'a:1.0,b:0.2'", grouped)
      .count() == mixed.size)
  }

  test("repartition-output sizes the layout without touching rows") {
    import graft.sources.Sources
    val d = df("id BIGINT, pad STRING",
      (1L to 5000L).map(i => Row(i, "x" * 200)))
    // ~1MB of data at a 64KB target: partition count grows toward the
    // estimate; at a huge target it coalesces to 1; rows never change
    val grown = Sources.repartitionForOutput(d, targetBytes = 16 * 1024)
    assert(grown.rdd.getNumPartitions > d.rdd.getNumPartitions)
    val one = Sources.repartitionForOutput(d, targetBytes = 10L << 30)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 5000 && grown.count() == 5000)
    assert(grown.agg(sum("id")).head().getLong(0) == 5000L * 5001 / 2)
    // shrink path is a narrow coalesce, not a shuffle
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce") && !plan.contains("Exchange"),
      s"shrink should be narrow:\n$plan")
    // directive surface
    assert(wrangle("repartition-output 1", d).count() == 5000)
  }

  test("temperature mixing: n^alpha rates hit the target, alpha shapes them") {
    import graft.session.Sampler
    // skewed sources: big=1600, mid=300, small=100
    val rows = (1L to 2000L).map { i =>
      Row(i, if (i <= 1600) "big" else if (i <= 1900) "mid" else "small")
    }
    val d = df("id BIGINT, src STRING", rows)

    // alpha=1: natural proportions — every group keeps ~frac
    val t1 = Sampler.temperatureThresholds(d, "src", alpha = 1.0,
      targetFrac = 0.5).toMap
    val half = (0.5 * (1L << 60).toDouble).toLong
    assert(t1.values.forall(v => math.abs(v - half) < (1L << 40)), s"got $t1")

    // alpha=0.5: small sources up-weighted, big down-weighted,
    // expected kept count still ~frac*N
    val t05 = Sampler.temperatureThresholds(d, "src", alpha = 0.5,
      targetFrac = 0.5).toMap
    assert(t05("small") > t05("mid") && t05("mid") > t05("big"), s"got $t05")
    val kept = Sampler.temperatureMix(d, "id", "src", alpha = 0.5,
      targetFrac = 0.5).count()
    assert(kept > 800 && kept < 1200, s"kept $kept of 2000 at frac 0.5")

    // keep decision is key-pure: stable under repartition
    val a = Sampler.temperatureMix(d, "id", "src", 0.5, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampler.temperatureMix(d.repartition(7), "id", "src", 0.5, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)

    // alpha=0 equalizes expected PER-GROUP counts: rate_g = c/n_g
    // (small group saturates toward 1 first)
    // c = 0.3*2000/3 = 200 expected per group: small (100 rows)
    // saturates at rate 1, big keeps 200/1600 = 0.125 — ratio 8
    val t0 = Sampler.temperatureThresholds(d, "src", alpha = 0.0,
      targetFrac = 0.3).toMap
    assert(t0("small") == (1L << 60) && t0("small") > t0("big") * 7,
      s"got $t0")

    // null groups drop; directive surface wires through
    val withNull = df("id BIGINT, src STRING",
      Seq(Row(1L, "a"), Row(2L, null)))
    assert(Sampler.temperatureMix(withNull, "id", "src", 0.5, 1.0)
      .count() == 1)
    assert(wrangle("sample-temperature :id :src 0.5 0.5", d).count() == kept)
  }

  test("mixtureByBudget: rates, epochs, cap, stability, drops") {
    import graft.session.Sampler
    // a: 800 rows x 10 tokens = 8000 supply; b: 200 x 10 = 2000
    val rows = (1L to 1000L).map { i =>
      Row(i, if (i <= 800) "a" else "b", 10L)
    }
    val d = df("id BIGINT, grp STRING, tok BIGINT", rows)

    // equal weights over an 8000-token budget: a targets 4000 of its
    // 8000 (rate .5, downsample), b targets 4000 of its 2000 (rate 2.0
    // EXACTLY — integer epochs, no fractional draw)
    val rates = Sampler.mixtureRates(d, "grp",
      Seq("a" -> 0.5, "b" -> 0.5), 8000L, "tok", maxEpochs = 4.0)
      .map { case (g, base, thr) => g -> ((base, thr)) }.toMap
    assert(rates("a") == ((0, (0.5 * (1L << 60).toDouble).toLong)), s"got $rates")
    assert(rates("b") == ((2, 0L)), s"got $rates")

    val out = Sampler.mixtureByBudget(d, "id", "grp",
      Seq("a" -> 0.5, "b" -> 0.5), 8000L, "tok")
    // every b key appears exactly twice, epochs 1 and 2
    val bEpochs = out.filter(col("grp") === "b")
      .groupBy(col("id")).agg(collect_list(col("epoch")).as("es"))
    assert(bEpochs.count() == 200)
    assert(out.filter(col("grp") === "b").count() == 400)
    // a keeps ~half its keys, each exactly once (epoch 1)
    val aKept = out.filter(col("grp") === "a")
    assert(aKept.agg(max(col("epoch"))).head.getInt(0) == 1)
    val aN = aKept.count()
    assert(aN > 320 && aN < 480, s"a kept $aN of 800 at rate 0.5")
    // expected token total ~ budget
    val tokTotal = out.agg(sum(col("tok"))).head.getLong(0)
    assert(math.abs(tokTotal - 8000L) < 1200, s"token total $tokTotal")

    // maxEpochs caps runaway oversampling: rate 40000/2000 = 20 -> 4
    val capped = Sampler.mixtureByBudget(d, "id", "grp",
      Seq("b" -> 1.0), 40000L, "tok")
    assert(capped.count() == 800 &&
      capped.agg(max(col("epoch"))).head.getInt(0) == 4)

    // key-pure: the kept MULTISET is stable under repartition
    def multiset(x: org.apache.spark.sql.DataFrame) =
      x.select("id", "epoch").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(multiset(out) == multiset(Sampler.mixtureByBudget(
      d.repartition(7), "id", "grp",
      Seq("a" -> 0.5, "b" -> 0.5), 8000L, "tok")))

    // null group, null tokens, and unweighted group all drop
    val withNull = df("id BIGINT, grp STRING, tok BIGINT",
      Seq(Row(1L, "a", 5L), Row(2L, null, 5L), Row(3L, "c", 5L),
        Row(4L, "a", null)))
    assert(Sampler.mixtureByBudget(withNull, "id", "grp",
      Seq("a" -> 1.0), 100L, "tok").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L))

    // directive surface wires through
    assert(wrangle("sample-mixture :id :grp 'a:0.5,b:0.5' 8000 :tok", d)
      .count() == out.count())
  }

  test("Sources.footprint: files and bytes match the filesystem") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.sources.Sources.footprint(spark, Map(
      "nation" -> s"$dir/nation.parquet",
      "orders" -> s"$dir/orders.parquet"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (t <- Seq("nation", "orders")) {
      val f = new java.io.File(s"$dir/$t.parquet")
      val files: Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else f.listFiles().filter(x => x.isFile &&
          x.getName.endsWith(".parquet")).toSeq
      assert(out(t)._1 == files.size, s"$t file count")
      assert(out(t)._2 == files.map(_.length).sum, s"$t byte sum")
      assert(out(t)._3 ==
        spark.read.parquet(s"$dir/$t.parquet").count(), s"$t rows")
    }
  }
}
