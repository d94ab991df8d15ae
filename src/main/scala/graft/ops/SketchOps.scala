package graft.ops

import graft.api._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Sketches

/** Recipe-surface for the mergeable sketch aggregates and batch
  * sessionization ([[org.apache.spark.sql.graftx.Sketches]],
  * [[SessionOps]]). These directives REPLACE the frame with their
  * result (like the profiling/sampling directives): a recipe ending in
  * `profile-distinct` is a profiling job, not a row transform.
  *
  * All of them aggregate with constant-size mergeable buffers, so the
  * shuffle carries sketches (KB), not rows — the only full-data cost is
  * the scan. That is the shape a 100 TB profiling pass needs.
  */
object SketchOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // `sessionize :user :ts <gapSeconds> [:valueCol]` — collapse an
    // event frame into one row per (user, session): gaps-and-islands
    // with sessions closing after gapSeconds of inactivity.
    case "sessionize" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => SessionOps.sessionize(df,
          spec.col(0), spec.col(1), spec.num(2).toLong,
          valueCol = spec.optStr(3).map(s => s.stripPrefix(":"))))
    }

    // `profile-distinct :c1[,:c2...] [precision]` — one row per column:
    // (column, approx_distinct). Every column's HLL builds in the SAME
    // single pass over the data.
    case "profile-distinct" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf { df =>
          val cs = spec.cols(0)
          val p = spec.optStr(1).map(_.toInt).getOrElse(12)
          val aggs = cs.map(c => Sketches.hllDistinct(col(c), p).as(s"__d_$c"))
          val one = df.agg(aggs.head, aggs.tail: _*)
          val pairs = cs.map(c =>
            struct(lit(c).as("column"), col(s"__d_$c").as("approx_distinct")))
          one.select(explode(array(pairs: _*)).as("e"))
            .select(col("e.column").as("column"),
              col("e.approx_distinct").as("approx_distinct"))
        }
    }

    // `profile-quantiles :col q1,q2,... [k]` — (prob, value) rows from
    // one KLL sketch pass.
    case "profile-quantiles" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf { df =>
          val c = spec.col(0)
          val probs = spec.str(1).split(",").map(_.trim.toDouble).toSeq
          val k = spec.optStr(2).map(_.toInt).getOrElse(200)
          df.agg(Sketches.kllQuantiles(col(c), probs, k).as("qs"))
            .select(posexplode(col("qs")).as(Seq("i", "value")))
            .select(element_at(array(probs.map(lit): _*), col("i") + 1).as("prob"),
              col("value"))
        }
    }

    // `heavy-hitters :col [k]` — (item, count, err) rows, count desc.
    case "heavy-hitters" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf { df =>
          val c = spec.col(0)
          val k = spec.optStr(1).map(_.toInt).getOrElse(64)
          df.agg(Sketches.heavyHitters(col(c), k).as("hh"))
            .select(explode(col("hh")).as("e"))
            .select(col("e.item").as("item"), col("e.count").as("count"),
              col("e.err").as("err"))
        }
    }

    // `topk-by :group :value :item <k>` — exact per-group top-k via the
    // bounded-heap aggregate: (group, rank, item, value) rows.
    case "topk-by" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf { df =>
          val g = spec.col(0)
          df.groupBy(col(g))
            .agg(Sketches.topKBy(col(spec.col(1)), col(spec.col(2)),
              spec.num(3).toInt).as("top"))
            .select(col(g), posexplode(col("top")).as(Seq("rank", "e")))
            .select(col(g), col("rank"), col("e.item").as("item"),
              col("e.value").as("value"))
        }
    }

    // `bucket-quantiles :col <n> [newcol]` — equi-depth bucket ids from
    // one KLL pass (no sort); nulls get a null bucket.
    case "bucket-quantiles" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => LayoutOps.equiDepthBuckets(df, spec.col(0),
          spec.num(1).toInt,
          bucketCol = spec.optCol(2).getOrElse("bucket")))
    }

    // `cluster-zorder :c1[,:c2...] [bits]` — physically re-cluster the
    // frame in Morton order over the named columns (write-layout
    // optimization: content identical, order/partitioning changed so
    // parquet row-group stats prune scans on any clustered dimension).
    case "cluster-zorder" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => LayoutOps.zorderBy(df, spec.cols(0),
          bits = spec.optStr(1).map(_.toInt).getOrElse(8)))
    }

    // `sample-weighted-group :group :weight :id <k>` — per-group
    // weighted sample without replacement (Efraimidis-Spirakis keys,
    // deterministic md5 uniforms, bounded-heap top-k).
    case "sample-weighted-group" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => graft.session.Sampler.weightedTopKByGroup(df,
          spec.col(0), spec.col(1), spec.col(2), spec.num(3).toInt))
    }

    // `dedup-exact-incremental :text :id stateTable` — drop batch rows
    // whose fingerprint is already in the registered state table
    // (column `fp`), after in-batch keep-smallest dedup.
    case "dedup-exact-incremental" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val state = ctx.lookups.getOrElse(spec.str(2),
          throw new RecipeException(
            s"dedup-exact-incremental: unknown table '${spec.str(2)}'"))
        st.mapDf(df => graft.llm.IncrementalDedup.exactAgainst(
          df, spec.col(0), spec.col(1), state))
      }
    }

    // `dedup-minhash-incremental :text :id stateTable corpusTable
    //  [threshold]` — fused in-batch + vs-stored-buckets near-dedup;
    // state = (id, band, bucket) rows, corpus = (id, text) for the
    // candidate-sliver verify.
    case "dedup-minhash-incremental" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        def tbl(i: Int) = ctx.lookups.getOrElse(spec.str(i),
          throw new RecipeException(
            s"dedup-minhash-incremental: unknown table '${spec.str(i)}'"))
        st.mapDf(df => graft.llm.IncrementalDedup.minhashDedupAgainst(
          df, spec.col(0), spec.col(1), tbl(2), tbl(3),
          threshold = spec.optStr(4).map(_.toDouble).getOrElse(0.7)))
      }
    }

    // `sample-group :group :id <k>` — uniform k rows per group: the
    // A-ES sampler with unit weights (key = u), same determinism.
    case "sample-group" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => graft.session.Sampler.weightedTopKByGroup(
          df.withColumn("__w1", org.apache.spark.sql.functions.lit(1.0)),
          spec.col(0), "__w1", spec.col(1), spec.num(2).toInt))
    }

    // `drift-psi :col table [bins]` — Population Stability Index of the
    // current frame against a registered baseline table: one
    // (bin, frac_current, frac_baseline, psi_term) row per bin.
    case "drift-psi" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val table = spec.str(1)
        val baseline = ctx.lookups.getOrElse(table,
          throw new RecipeException(s"drift-psi: unknown table '$table'"))
        st.mapDf(df => graft.session.Profiler.psiDrift(df, baseline,
          spec.col(0), bins = spec.optStr(2).map(_.toInt).getOrElse(10)))
      }
    }

    case _ => null
  })
}
