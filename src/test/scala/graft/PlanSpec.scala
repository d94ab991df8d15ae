package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB design contract:
  * filters reach the parquet scan, lookups broadcast, recipes collapse
  * into a single projection (no per-directive barriers).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filter-row predicate is pushed to the parquet scan") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val out = wrangle("filter-row exp:{ l_quantity > 25 } false; keep :l_orderkey,:l_quantity", li)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity"), s"no pushdown in plan:\n$plan")
  }

  test("column pruning: keep reduces the parquet ReadSchema") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val out = wrangle("keep :l_orderkey,:l_quantity", li)
    val scan = out.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan not pruned:\n$scan")
  }

  test("table-lookup compiles to a broadcast hash join") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val nat = spark.read.parquet(s"$dir/nation.parquet")
    val out = Wrangle.recipe("table-lookup :c_nationkey nations;")
      .withLookup("nations", nat)
      .apply(cust)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("a 10-directive recipe stays in one whole-stage codegen projection") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val out = wrangle("""
      set-type :l_quantity long;
      set-column :rev exp:{ l_extendedprice * (1 - l_discount) };
      set-column :charge exp:{ rev * (1 + l_tax) };
      merge :l_returnflag :l_linestatus :fs '_';
      uppercase :fs;
      trim :fs;
      copy :rev :rev2;
      rename :rev2 :revenue_copy;
      drop :l_partkey;
      keep :l_orderkey,:rev,:charge,:fs,:revenue_copy;
    """, li)
    val exec = out.queryExecution.executedPlan.toString
    // exactly one WholeStageCodegen span and one scan — no shuffles
    assert(!exec.contains("Exchange"), s"unexpected shuffle:\n$exec")
    assert("\\(1\\)".r.findFirstIn(exec).isDefined ||
      exec.contains("WholeStageCodegen"), s"no codegen:\n$exec")
  }

  test("filters never trigger a shuffle") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val out = wrangle(
      "filter-by-regex if-matched :l_returnflag 'A'; filter-empty-or-null :l_orderkey;", li)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("increment-variable compiles without an unpartitioned window") {
    // the one shape that moves a whole dataset onto a single task: a
    // global Window.orderBy — every window in a compiled recipe must
    // carry a partitionSpec
    import org.apache.spark.sql.execution.window.WindowExec
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val out = wrangle("increment-variable counter 1 c_acctbal > 0;", cust)
    val unpartitioned = out.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"unpartitioned window found:\n${out.queryExecution.executedPlan}")
    // and the running count still matches the single-stream semantics
    val got = out.orderBy("c_custkey").select("counter")
      .collect().map(_.getLong(0)).toSeq
    val bals = cust.orderBy("c_custkey").select("c_acctbal")
      .collect().map(_.getDouble(0)).toSeq
    val want = bals.scanLeft(0L)((acc, b) => if (b > 0) acc + 1 else acc).tail
    assert(got == want)
  }

  test("mask-number compiles to a native codegen expression, not a UDF") {
    // parquet-backed (a local relation would be constant-folded away)
    val src = spark.read.parquet(s"$dir/customer.parquet")
    val out = wrangle("mask-number :c_name 'xxxxxxxx#'", src)
    assert(out.select("c_name").head().getString(0).startsWith("xxxxxxxx"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.toLowerCase.contains("masknumber"),
      s"expected native expression:\n$plan")
    // value agrees with the shared kernel
    val masked = out.select("c_name").head().getString(0)
    val raw = src.select("c_name").head().getString(0)
    assert(masked == graft.functions.Udfs.maskNumber(raw, "xxxxxxxx#"))
  }

  test("code-features and strip-markdown compile UDF-free") {
    // both kernels are pure Catalyst (native string functions + HOFs),
    // so the scan->project pipeline carries no ScalaUDF anywhere
    val src = spark.read.parquet(s"$dir/documents.parquet")
    val cf = wrangle("code-features :text", src)
    assert(!cf.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "code-features should not plan a UDF")
    val sm = wrangle("strip-markdown :text", src)
    val smPlan = sm.queryExecution.executedPlan.toString
    assert(!smPlan.contains("ScalaUDF"),
      "strip-markdown should not plan a UDF")
    // the regexp chain stays inside whole-stage codegen ("*(n)" is the
    // codegen-stage marker in the simple plan string)
    assert(smPlan.contains("*(1)"), smPlan)
  }

  test("fnv64 native expression matches the JVM kernel") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = spark.range(1).select(lit("hello world").as("s"))
    val got = d.select(org.apache.spark.sql.graftx.functions.fnv64(col("s")))
      .head().getLong(0)
    var h = 0xcbf29ce484222325L
    "hello world".foreach { c => h ^= c; h *= 0x100000001b3L }
    assert(got == h)
  }

  test("co-bucketed tables join with ZERO shuffle exchanges") {
    // pay the shuffle once at write time, reuse forever: two tables
    // bucketed on the same key must sort-merge-join without any
    // ShuffleExchange (broadcast disabled so the bucketed path, not a
    // broadcast, is what avoids the exchange)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_mktsegment")
    val ords = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    graft.sources.Sources.writeBucketed(cust, "b_cust", "c_custkey", 8,
      sortCol = "c_custkey")
    graft.sources.Sources.writeBucketed(ords, "b_ords", "o_custkey", 8,
      sortCol = "o_custkey")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_cust").join(spark.table("b_ords"),
        col("c_custkey") === col("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the data actually matches the plain-join result
      val expect = cust.join(ords, col("c_custkey") === col("o_custkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_ords")
    }
  }

  test("snapshotDiff over co-bucketed snapshots plans ZERO shuffle exchanges") {
    // the CDC-at-100TB contract: bucket both snapshot versions on the
    // key at write time and the full-outer diff join needs no exchange
    val cur = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val prev = cur.where(col("o_orderkey") % 2 === 0)
    graft.sources.Sources.writeBucketed(cur, "b_snap_cur", "o_orderkey", 8,
      sortCol = "o_orderkey")
    graft.sources.Sources.writeBucketed(prev, "b_snap_prev", "o_orderkey", 8,
      sortCol = "o_orderkey")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = graft.ops.JoinOps.snapshotDiff(
        spark.table("b_snap_cur"), spark.table("b_snap_prev"),
        Seq("o_orderkey"))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed snapshot diff still shuffles:\n$plan")
      val byStatus = diff.groupBy("diff_status").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byStatus("added") > 0 && byStatus("unchanged") > 0)
      assert(!byStatus.contains("changed"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_snap_cur")
      spark.sql("DROP TABLE IF EXISTS b_snap_prev")
    }
  }

  test("SQL surface: registered functions callable from spark.sql") {
    org.apache.spark.sql.graftx.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT mask_number('123-45-6789', 'xxx-xx-####') AS m, fnv64('abc') AS h")
      .head()
    val kern = spark.sql(
      "SELECT jaro('MARTHA','MARHTA') AS j, porter_stem('running') AS p, " +
        "digest_hex('SM3', 'abc') AS s").head()
    assert(math.abs(kern.getDouble(0) - 0.944444) < 1e-5)
    assert(kern.getString(1) == "run")
    assert(kern.getString(2).startsWith("66c7f0f4"))
    assert(r.getString(0) == "xxx-xx-6789")
    var h = 0xcbf29ce484222325L
    "abc".foreach { c => h ^= c; h *= 0x100000001b3L }
    assert(r.getLong(1) == h)
  }
  test("split-url plans ONE url-parts parse, not 8 parse_url calls") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val out = wrangle(
      "set-column :u exp:{ concat('https://ex.com/p/', c_custkey) }; split-url :u",
      cust)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("urlpartsexpr") || plan.contains("UrlPartsExpr"),
      s"native url-parts expression missing from plan:\n$plan")
    assert(!plan.contains("parse_url"),
      s"parse_url survived the split-url rework:\n$plan")
    assert(plan.contains("*("), "fell out of whole-stage codegen")
  }

  test("parse-as-log plans ONE all-groups regex, not 10 regexp_extract") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val out = wrangle(
      "set-column :line exp:{ concat(c_custkey, ' - - [01/Jan/2024:00:00:00 +0000] \\\"GET /x HTTP/1.1\\\" 200 10') }; parse-as-log :line combined",
      cust)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("regexgroupsallexpr") || plan.contains("RegexGroupsAllExpr"),
      s"native all-groups expression missing:\n$plan")
    assert(!plan.contains("regexp_extract"),
      s"per-field regexp_extract survived:\n$plan")
  }

  test("pageRank iteration: 2 shuffled-hash joins, no sort, ONE exchange " +
      "— the checkpointed ranks keep their hash(vertex) partitioning") {
    // The committed query plans for pagerank_links are checkpoint-
    // truncated stubs, so the per-iteration join strategy is asserted
    // here on the PRE-checkpoint frame, in the exact environment
    // pageRank runs its iterations in (it scope-disables AQE —
    // AdaptiveSparkPlanExec reports UnknownPartitioning and forced a
    // per-iteration re-shuffle of the ranks table).
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      // replicate pageRank's setup (edges cached partitioned by src,
      // vertices cached from the one-pass degree aggregation)
      val edges = li.select(
          concat(lit("o"), col("l_orderkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .repartition(col("src"))
        .persist()
      val vertices = edges
        .select(explode(array(
          struct(col("src").as("vertex"), lit(1L).as("__w")),
          struct(col("dst").as("vertex"), lit(0L).as("__w")))).as("e"))
        .groupBy(col("e.vertex").as("vertex"))
        .agg(sum(col("e.__w")).as("__outdeg"))
        .persist()
      val n = vertices.count().toDouble
      val ranks0 = vertices.withColumn("rank", lit(1.0 / n))
      val it1 = graph.Graph.pageRankIteration(edges, vertices, ranks0, n, 0.85)
      // iteration 2 reads a CHECKPOINTED ranks frame — the shape every
      // iteration after the first sees in production
      val ranks1 = it1.localCheckpoint(true)
      val it2 = graph.Graph.pageRankIteration(edges, vertices, ranks1, n, 0.85)
      val plan = it2.queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      val shj = plan.collect { case j: ShuffledHashJoinExec => j }
      val sorts = plan.collect { case s: SortExec => s }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(smj.isEmpty, s"sort-merge join crept back:\n$plan")
      assert(shj.size == 2, s"expected 2 shuffled-hash joins:\n$plan")
      assert(sorts.isEmpty,
        s"an iteration should never sort the edge list:\n$plan")
      // exactly ONE exchange: the contribution aggregation. The ranks
      // side must NOT re-shuffle (its checkpoint carries hash(vertex, P)
      // and the alias-aware rename satisfies the src join), and the
      // cached edge list must never move.
      assert(exchanges.size == 1,
        s"expected exactly 1 exchange (contrib agg), got " +
          s"${exchanges.size}:\n$plan")
      edges.unpersist()
      vertices.unpersist()
    } finally {
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }
}
