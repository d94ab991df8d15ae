package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics as plain DataFrame iterations — the quality
  * priors (PageRank-class centrality) web-curation pipelines join
  * against before sampling. No GraphX/graphframes dependency: each
  * iteration is one equi-join on src plus one aggregation on dst, the
  * exact shuffle pair a 100 TB edge list wants (AQE handles skewed
  * hubs; ranks re-partition by vertex between iterations).
  *
  * Determinism contract: per-edge contributions are IEEE-754 doubles
  * (identical on any engine given identical inputs), and the per-dst
  * accumulation is an exact DECIMAL(38,15) sum — so ranks are
  * bit-reproducible across partitionings AND recomputable by an
  * external SQL engine, the property every oracle in this repo leans
  * on (double summation order would differ per partitioning).
  */
object Graph {

  /** Standard damped PageRank over a directed edge list, fixed
    * iteration count. rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N +
    * d * Σ_{u→v} rank_t(u)/outDeg(u). Dangling-vertex mass is NOT
    * redistributed (documented choice — it only rescales ranks, and
    * the fixed-point shape stays identical); vertices = src ∪ dst.
    */
  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0 && iterations <= 100)
    // AQE is scope-disabled for the iteration chain (restored in the
    // finally): AdaptiveSparkPlanExec reports UnknownPartitioning, so
    // under AQE every checkpointed ranks frame (and every not-yet-
    // materialized cache) LOSES its hash(vertex, P) layout and the
    // next iteration re-SHUFFLES the ranks table before the src join
    // — 2 exchanges per iteration instead of the 1 fundamental one
    // (the contribution aggregation). AQE buys nothing unique here:
    // its skew-join split only applies when BOTH join sides are fresh
    // shuffle stages, and these joins always stream a cache/
    // checkpoint side; partition count stays the cluster-sized
    // spark.sql.shuffle.partitions either way. Interleaved A/B at
    // sf0.1/local[32]: AQE-off min 2.28 s vs AQE-on min 2.84 s.
    val session = edges0.sparkSession
    val prevAqe = session.conf.getOption("spark.sql.adaptive.enabled")
    session.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // pre-partition the edge list on src ONCE: the cache then satisfies
    // the per-iteration join's distribution, so iterations never move
    // edge bytes again — only the (much smaller) rank/contrib tables
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .persist() // scanned every iteration
    // one vertex-metadata table in ONE aggregation: each edge endpoint
    // contributes a weighted row (src:1, dst:0), sum(weight) = out-degree
    // (0 for dangling) — replaces the union+distinct+join (3 shuffles of
    // the full endpoint list) with a single map-side-combinable groupBy
    val vertices = edges
      .select(explode(array(
        struct(col("src").as("vertex"), lit(1L).as("__w")),
        struct(col("dst").as("vertex"), lit(0L).as("__w")))).as("e"))
      .groupBy(col("e.vertex").as("vertex"))
      .agg(sum(col("e.__w")).as("__outdeg"))
      .persist()
    val n = vertices.count().toDouble
    if (n == 0) {
      edges.unpersist()
      return vertices.select(col("vertex"), lit(0.0).as("rank"))
    }
    var ranks = vertices.withColumn("rank", lit(1.0 / n))
    for (it <- 0 until iterations) {
      // localCheckpoint TRUNCATES the lineage each iteration — chained
      // iteration plans otherwise grow without bound (plan rendering
      // alone OOMs past ~15 iterations). With AQE scope-disabled the
      // checkpoint's LogicalRDD KEEPS the hash(vertex, P) output
      // partitioning, which the alias-aware Project carries through
      // the vertex->src rename — so the next iteration's src join
      // needs NO exchange on the ranks side (asserted by PlanSpec;
      // plans/r18/pagerank_iteration_{before,after}.txt). Only the
      // LAST iteration checkpoints EAGERLY: intermediate lazy
      // checkpoints still truncate the SQL plan, but all iterations
      // materialize in ONE final job instead of one scheduler
      // round-trip per iteration (same math) — and the eager last
      // checkpoint means the caches unpersisted below are never
      // needed again. A cluster deployment uses reliable checkpoint()
      // to storage; same shape.
      ranks = pageRankIteration(edges, vertices, ranks, n, damping)
        .localCheckpoint(it == iterations - 1)
    }
    vertices.unpersist()
    edges.unpersist()
    ranks.select(col("vertex"), col("rank"))
    } finally {
      prevAqe match {
        case Some(v) => session.conf.set("spark.sql.adaptive.enabled", v)
        case None => session.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }

  /** One PageRank iteration's PRE-checkpoint frame (extracted so the
    * per-iteration plan shape is assertable — the committed plans of
    * the full query are checkpoint-truncated `Scan ExistingRDD` stubs
    * that hide the join strategy; PlanSpec explains this frame
    * directly). `edges` must be (src,dst) partitioned by src and
    * cached; `vertices` is (vertex,__outdeg) cached; `ranks` carries
    * (vertex,__outdeg,rank).
    *
    * SHUFFLE_HASH on the rank side: the checkpointed ranks frame has
    * no size stats (LogicalRDD defaults to "huge"), so the planner
    * falls back to sort-merge and re-SORTS the cached edge list
    * every iteration. Hash-building the per-partition rank slice
    * (|V|/partitions rows) streams the edges unsorted — the right
    * join shape for an edge list at any scale, and the edge cache's
    * src-partitioning still satisfies the join distribution.
    */
  private[graft] def pageRankIteration(edges: DataFrame,
      vertices: DataFrame, ranks: DataFrame, n: Double,
      damping: Double): DataFrame = {
    val contribs = edges
      .join(ranks.withColumnRenamed("vertex", "src")
        .where(col("__outdeg") > 0).hint("shuffle_hash"), Seq("src"))
      .select(col("dst").as("vertex"),
        (col("rank") / col("__outdeg")).as("__contrib"))
      .groupBy(col("vertex"))
      // exact decimal accumulation -> partitioning-independent ranks
      .agg(sum(col("__contrib").cast("decimal(38,15)"))
        .cast("double").as("__in"))
    vertices
      .join(contribs.hint("shuffle_hash"), Seq("vertex"), "left")
      .select(col("vertex"), col("__outdeg"),
        (lit((1.0 - damping) / n) +
          lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
  }

  /** Undirected connected components over an edge list — delegates to
    * the dedup pipeline's fixpoint machinery
    * ([[graft.llm.Dedup.connectedComponents]]: driver union-find under
    * a pair cap, distributed min-label propagation above it). Integral
    * vertex ids run directly; any other type is densified first via a
    * sorted row_number (documented cost: one global sort — at true
    * scale assign ids upstream or key vertices integrally), and the
    * returned component label is the MINIMUM vertex of the component
    * (deterministic regardless of the internal id assignment).
    */
  def connectedComponents(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val integral = Seq("src", "dst").forall { c =>
      edges.schema(edges.schema.fieldIndex(c)).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
    }
    if (integral) {
      val labels = graft.llm.Dedup.connectedComponents(
        edges.select(col("src").as("id_a"), col("dst").as("id_b")))
      labels.select(col("id").as("vertex"), col("component"))
    } else {
      // dense ids via distributed zipWithIndex — NOT a global-sort
      // row_number window (single-partition, the scale-killer shape
      // PlanGateSpec forbids). The id assignment varies with partition
      // layout, but the returned component label is the min ORIGINAL
      // vertex, so the output is layout-independent.
      val verts = edges.select(col("src").as("vertex"))
        .union(edges.select(col("dst").as("vertex")))
        .distinct()
      val spark = verts.sparkSession
      val vdt = verts.schema("vertex").dataType
      // Eager localCheckpoint, not persist: the zipWithIndex assignment
      // depends on the post-shuffle partition layout, so a cache miss
      // (eviction, task retry) recomputing `ids` could hand the three
      // downstream joins DIFFERENT vertex->__vid maps and silently
      // mislabel components. Checkpointing truncates the lineage — the
      // assignment physically cannot be recomputed, and there is no
      // unpersist-before-materialize window to get wrong.
      val ids = spark.createDataFrame(
        verts.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.get(0), i + 1L) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vertex", vdt),
          org.apache.spark.sql.types.StructField("__vid",
            org.apache.spark.sql.types.LongType))))
        .localCheckpoint()
      val pairs = edges
        .join(ids.withColumnRenamed("vertex", "src")
          .withColumnRenamed("__vid", "id_a"), Seq("src"))
        .join(ids.withColumnRenamed("vertex", "dst")
          .withColumnRenamed("__vid", "id_b"), Seq("dst"))
        .select("id_a", "id_b")
      val labels = graft.llm.Dedup.connectedComponents(pairs)
      val out = ids.join(labels.withColumnRenamed("id", "__vid"), Seq("__vid"))
        .select(col("vertex"), col("component").as("__comp"))
      // component label = min ORIGINAL vertex of the component
      val reps = out.groupBy(col("__comp"))
        .agg(min(col("vertex")).as("component"))
      out.join(reps, Seq("__comp")).select("vertex", "component")
    }
  }

  /** In-degree / out-degree profile of an edge list — the cheap
    * pre-flight before centrality work (hub detection, skew planning).
    */
  def degrees(edges0: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val out = edges.groupBy(col("src").as("vertex"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col("dst").as("vertex"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("vertex"), "full_outer")
      .select(col("vertex"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
