package graft

import graft.session.{Usage, WrangleSession}

class SessionSpec extends SparkSpec {

  test("workspace lifecycle: create, execute, schema, summary") {
    val sess = new WrangleSession(spark)
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    sess.createWorkspace("w1", cust, method = "first", n = 100)

    val res = sess.execute("w1",
      "set-column :bal2 exp:{ c_acctbal * 2 }; send-to-error exp:{ c_acctbal < 0 };")
    assert(res.rows.nonEmpty)
    assert(res.rows.head.contains("bal2"))
    assert(res.schemaDdl.contains("bal2"))
    assert(res.errorCount >= 0)

    // schema derivation without execution
    val ddl = sess.schema("w1", "keep :c_custkey,:c_name; rename :c_name :nm;")
    assert(ddl.contains("nm") && !ddl.contains("c_acctbal"))

    // profile of the wrangled sample
    val prof = sess.summary("w1", "keep :c_name;")
    assert(prof.filter("column = 'c_name' AND measure = 'total'").count() == 1)
    sess.dropWorkspace("w1")
  }

  test("keyed workspace sampling: position-independent draws, stable " +
      "under repartitioning") {
    val sess = new WrangleSession(spark)
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // keyed forms: the draw is a pure function of (key, seed), so the
    // SAME workspace contents arrive regardless of input layout
    sess.createWorkspace("kb", cust, "bernoulli",
      fraction = 0.2, seed = 7L, keyCol = "c_custkey")
    sess.createWorkspace("kb2", cust.repartition(7), "bernoulli",
      fraction = 0.2, seed = 7L, keyCol = "c_custkey")
    val ids1 = sess.workspace("kb").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val ids2 = sess.workspace("kb2").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2 && ids1.nonEmpty)
    sess.createWorkspace("kr", cust, "reservoir",
      n = 10, seed = 7L, keyCol = "c_custkey")
    assert(sess.workspace("kr").count() == 10)
    sess.createWorkspace("kp", cust, "poisson",
      fraction = 0.1, seed = 7L, keyCol = "c_custkey")
    assert(sess.workspace("kp").count() > 0)
    // unknown method still fails fast
    intercept[IllegalArgumentException] {
      sess.createWorkspace("bad", cust, "stratified")
    }
    Seq("kb", "kb2", "kr", "kp").foreach(sess.dropWorkspace)
  }

  test("usage registry lists every registered directive") {
    assert(Usage.directives.size > 80)
    // every listed directive must actually resolve in the engine
    // (compile may fail on missing args, but never on unknown name)
    Usage.directives.foreach { case (name, _) =>
      val known =
        try { graft.Registry.compile(api.DirectiveSpec(name, Vector.empty, "")); true }
        catch {
          case e: api.RecipeException => !e.getMessage.contains("unknown directive")
          case _: Exception => true
        }
      assert(known, s"usage lists unknown directive: $name")
    }
  }

  test("approx numeric profile: sketch-based quantiles and distinct counts") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .selectExpr("c_acctbal", "c_custkey")
    val prof = graft.session.Profiler.approxNumericProfile(cust)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("c_acctbal", "c_custkey"))
    val keyRow = prof("c_custkey")
    val n = cust.count()
    // approx distinct within 10% of exact
    val approx = keyRow.getLong(1)
    assert(math.abs(approx - n).toDouble / n < 0.1, s"approx=$approx n=$n")
    // median of 1..n near n/2
    val qs = keyRow.getSeq[Double](2)
    assert(qs.size == 3 && math.abs(qs(1) - n / 2.0) / n < 0.05)
  }

}
