package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, FileTable}

/** Decides whether a DataFrame's physical row→partition layout is
  * stable across re-evaluation within one session.
  *
  * Several directives (parse-as-csv header=true, increment-variable)
  * run TWO jobs that must observe the same `spark_partition_id()` /
  * `monotonically_increasing_id()` assignment. That holds iff
  * re-evaluating the plan reproduces the same rows in the same
  * partitions in the same order. When it holds, no pin is needed; when
  * it does not (post-shuffle, nondeterministic expressions, samples),
  * the caller must materialize once (localCheckpoint / checkpoint).
  *
  * The stable set is deliberately conservative:
  *   - leaf scans over fixed data: file relations (split planning is a
  *     deterministic function of the file listing), LocalRelation,
  *     Range — all re-scan identically;
  *   - narrow, deterministic unary nodes above them (Project / Filter /
  *     Generate / aliases) — they never move rows between partitions
  *     and, being deterministic, never change which rows survive.
  * Everything else — shuffles (round-robin repartition is explicitly
  *   randomized; reduce-side row order within a partition is not
  *   guaranteed), joins, aggregates, limits, samples, unions (partition
  *   index depends on sibling partition counts), nondeterministic
  *   expressions — reports unstable.
  *
  * At 100 TB this is the difference between a directive that streams
  * (header probe reads one split, no materialization) and one that
  * writes a full non-replicated copy to executor-local disk first.
  */
object PlanStability {

  def stableLayout(df: DataFrame): Boolean =
    stable(df.queryExecution.analyzed)

  /** Materialize an UNSTABLE plan so two jobs observe one layout.
    * With a configured `spark.checkpoint.dir` this is a RELIABLE
    * checkpoint — written to the fault-tolerant store, so an executor
    * loss between the two jobs recomputes nothing (the cluster-scale
    * choice; see PERF.md). Without one it falls back to
    * localCheckpoint: executor-local, non-replicated, fine on a single
    * node, lossy on a real cluster.
    */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  // A LogicalRelation is stable only when it wraps a HadoopFsRelation —
  // file-split planning is a deterministic function of the file listing.
  // It also wraps JDBCRelation and other BaseRelations whose row order
  // across re-evaluation is NOT guaranteed; likewise DSv2 relations are
  // stable only for file-based tables (a Kafka or JDBC v2 scan is not).
  private def stableLeaf(leaf: LeafNode): Boolean = leaf match {
    case lr: LogicalRelation       => lr.relation.isInstanceOf[HadoopFsRelation]
    case r: DataSourceV2Relation   => r.table.isInstanceOf[FileTable]
    case r: DataSourceV2ScanRelation => r.relation.table.isInstanceOf[FileTable]
    case _: LocalRelation          => true // in-memory literal rows
    case _: OneRowRelation         => true
    case _: Range                  => true
    case _                         => false
  }

  private def stable(p: LogicalPlan): Boolean = p match {
    case leaf: LeafNode => stableLeaf(leaf)
    case _: Project | _: Filter | _: Generate | _: SubqueryAlias |
         _: GlobalLimit | _: LocalLimit =>
      // GlobalLimit is stable only in the degenerate single-partition
      // shapes Spark plans it into; a limit above a multi-partition
      // scan can pick different rows per run → only allow when the
      // child is a LocalRelation (eagerly evaluated, fixed order).
      val limitOk = p match {
        case _: GlobalLimit | _: LocalLimit =>
          p.collectLeaves().forall(_.isInstanceOf[LocalRelation])
        case _ => true
      }
      limitOk && p.expressions.forall(_.deterministic) &&
        p.children.forall(stable)
    case _ => false
  }
}
