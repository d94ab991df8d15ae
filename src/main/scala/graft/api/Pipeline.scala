package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Execution context threaded through the planner.
  *
  * Spark-native equivalent of the reference's ExecutorContext
  * (reference: wrangler-api api/ExecutorContext.java:35-40 — carries
  * environment, properties, TransientStore, LookupProvider): here it
  * carries the session, lookup tables for `table-lookup`, and named
  * catalogs for `catalog-lookup`.
  */
final case class WrangleContext(
    spark: SparkSession,
    lookups: Map[String, DataFrame] = Map.empty,
    catalogs: Map[String, DataFrame] = Map.empty)

/** Pipeline state folded through the directive chain.
  *
  * `df` is the main branch. `errors` accumulates error-channel splits
  * (each row = (directive, message, original input row as JSON)),
  * mirroring the reference's ErrorRecordCollector keeping the ORIGINAL
  * input record (reference: wrangler-core executor/RecipePipelineExecutor.java:133-137).
  * `hasOrig` marks whether the hidden original-row column was attached.
  */
final case class PipeState(
    df: DataFrame,
    errors: Vector[DataFrame],
    hasOrig: Boolean) {
  def mapDf(f: DataFrame => DataFrame): PipeState = copy(df = f(df))
}

object PipeState {
  /** Hidden column holding the original input row (JSON) for the error
    * channel. All schema-rebuilding ops must preserve columns with this
    * prefix.
    */
  val HiddenPrefix = "__graft"
  val OrigCol      = "__graft_orig"

  def userCols(df: DataFrame): Array[String] =
    df.columns.filterNot(_.startsWith(HiddenPrefix))

  def hiddenCols(df: DataFrame): Array[String] =
    df.columns.filter(_.startsWith(HiddenPrefix))

  def init(df: DataFrame, needsOrig: Boolean): PipeState =
    if (needsOrig)
      PipeState(
        df.withColumn(OrigCol, to_json(struct(df.columns.map(col).toSeq: _*))),
        Vector.empty, hasOrig = true)
    else PipeState(df, Vector.empty, hasOrig = false)
}

/** A compiled directive: DataFrame-level transformation over the state. */
trait PipeOp {
  def name: String
  def apply(st: PipeState, ctx: WrangleContext): PipeState
}
