package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Greedy sequence packing: assign documents to fixed-size context
  * windows ("bins") for training-batch construction — the standard
  * fill-the-context-window step of an LLM data pipeline.
  *
  * Semantics: rows are bucketed by `id mod buckets`; within a bucket,
  * docs are taken in ascending id order and packed first-fit-in-order:
  * a doc lands in the current bin at the current token offset unless
  * it would overflow `ctx` tokens, in which case it opens the next bin
  * at offset 0. A doc longer than `ctx` gets a bin of its own (and
  * overflows it — chunk-text first if that matters). Appends
  * `pack_bucket`, `pack_bin` (within its bucket), and `pack_offset`.
  *
  * Scale shape: ONE groupBy shuffle on the bucket key collects only
  * (id, tokens) pairs — ~12 bytes per doc — so executor memory bounds
  * the BUCKET size, not the corpus: pick buckets ≈ rows/64k. The
  * greedy scan is embarrassingly parallel across buckets, and the
  * result joins back to the input on id (plain shuffle join,
  * AQE-friendly). Packing sequentially WITHIN an explicit bucket is
  * what makes the output a pure function of (id, tokens) — stable
  * under repartition/retry, and exactly reproducible by the DuckDB
  * recursive-CTE oracle (QueryBank `pack_sequences`).
  */
object Packing {

  // public: the Dataset encoder's generated code constructs it — a
  // private ctor makes janino fail and fall back to interpreted
  // serialization every run
  case class Packed(id: Long, bin: Int, off: Int)

  private val packUdf = udf((ids: Seq[Long], toks: Seq[Int], ctx: Int) => {
    val out = new Array[Packed](ids.length)
    var bin = 0
    var fill = 0
    var i = 0
    while (i < ids.length) {
      val t = toks(i)
      if (i > 0 && fill + t > ctx) { bin += 1; fill = 0 }
      out(i) = Packed(ids(i), bin, fill)
      fill += t
      i += 1
    }
    out
  })

  def packSequences(df: DataFrame, tokCol: String, idCol: String,
      ctx: Int, buckets: Int): DataFrame = {
    require(ctx > 0, "pack-sequences: ctx must be positive")
    require(buckets > 0, "pack-sequences: buckets must be positive")
    val pairs = df.select(
      col(idCol).cast(LongType).as("__pid"),
      col(tokCol).cast(IntegerType).as("__ptok"))
      .withColumn("__pbucket", pmod(col("__pid"), lit(buckets.toLong)))
    val packed = pairs
      .groupBy("__pbucket")
      // sort_array on (id, tok) structs orders by id — the bucket's
      // packing order; only the two small fields travel through the
      // shuffle and the per-bucket list
      .agg(sort_array(collect_list(struct(col("__pid"), col("__ptok"))))
        .as("docs"))
      .select(col("__pbucket"),
        explode(packUdf(
          transform(col("docs"), d => d("__pid")),
          transform(col("docs"), d => d("__ptok")),
          lit(ctx))).as("p"))
      .select(col("__pbucket").cast(IntegerType).as("pack_bucket"),
        col("p.id").as("__jid"),
        col("p.bin").as("pack_bin"),
        col("p.off").as("pack_offset"))
    df.join(packed, col(idCol).cast(LongType) === col("__jid"), "left")
      .drop("__jid")
  }

  /** Quality-ordered token-budget corpus subsetting: keep the
    * best-`orderCol` rows (ties toward the smallest id) while the
    * running token total stays within `budget` — "give me the best
    * N-billion-token subset of this corpus", the final sizing step of
    * a training-data pipeline. A row is kept iff its INCLUSIVE
    * cumulative token count (in quality-desc, id-asc order) is
    * ≤ budget, so selection stops at the first row that would
    * overflow.
    *
    * Scale shape: NO global single-task window. The corpus is
    * range-partitioned on the selection order (so partition i holds
    * strictly better rows than partition i+1), pinned so the two
    * passes observe one layout (sampling-based range boundaries are
    * not re-derivable — PlanStability), then: one bounded job collects
    * per-partition token sums (one row per partition), the driver
    * turns them into exclusive prefix offsets, and a WITHIN-partition
    * cumulative window adds the offset — every task scans only its own
    * partition, the same two-phase prefix pattern as
    * increment-variable. Null token counts cost 0.
    */
  def selectBudget(df: DataFrame, tokCol: String, orderCol: String,
      idCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "select-budget: budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val cols = df.columns
    val t = coalesce(col(tokCol).cast(LongType), lit(0L))
    val ordering = Seq(col(orderCol).desc, col(idCol).asc)
    val pidC = "__graft_sb_pid"
    val ranged = graft.ops.PlanStability.pin(
      df.repartitionByRange(ordering: _*)
        .sortWithinPartitions(ordering: _*))
      .withColumn(pidC, spark_partition_id())
    val partials = ranged.groupBy(col(pidC)).agg(sum(t).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partials.map { case (pid, s) => val o = pid -> acc; acc += s; o }.toMap
    }
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col(pidC)), lit(0L))
    val w = Window.partitionBy(col(pidC)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__cum", sum(t).over(w) + offCol)
      .filter(col("__cum") <= budget)
      .select(cols.map(col).toSeq: _*)
  }
}
