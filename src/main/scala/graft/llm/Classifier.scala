package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-based corpus filtering — the classifier stage of a
  * training-data pipeline (the GPT-3/LLaMA-style "quality filter":
  * train a linear classifier on a labeled seed set, score the whole
  * corpus, keep by score; and DSIR-style hashed-n-gram importance
  * weights for distribution matching against a target corpus).
  *
  * Both are built Spark-first around the one shape that scales to
  * 100 TB: a BOUNDED per-iteration statistics aggregate (dim+1
  * map-side-combinable sums — kilobytes through the shuffle no matter
  * the corpus size) feeding driver-held weights that broadcast back
  * into a map-only codegen scoring projection. No MLlib, no UDF in
  * the hot path: features come from the same hashed-TF kernel as
  * `hashing-tf` ([[graft.functions.Udfs.hashingTf]], MD5-bucketed so
  * any engine reproduces the bucketing), and the dot product, sigmoid
  * and gradient terms are plain Catalyst expressions.
  *
  * Determinism contract (what makes these exactly oracle-able):
  * per-row arithmetic is IEEE-754 in a FIXED left-to-right bucket
  * order (an explicit fold, not a SQL aggregate, so any engine
  * evaluating the same expression tree bit-matches), and every
  * cross-row sum is accumulated as DECIMAL(38,15) — exact and
  * associative, so gradients are identical under any partitioning
  * and recomputable by an external SQL engine.
  */
object Classifier {

  /** Hashed-TF feature columns: tf = MD5-bucketed token counts
    * (length `dim`), total = token count. x_j = tf_j / total
    * (L1-normalized term frequency; the zero vector for empty text).
    */
  private def tfCol(textCol: String, dim: Int): Column =
    graft.functions.Udfs.hashingTfUdf(
      col(textCol).cast(org.apache.spark.sql.types.StringType), lit(dim))

  private def xj(tf: Column, total: Column, j: Int): Column =
    when(total === 0, lit(0.0))
      .otherwise(tf.getItem(j).cast("double") / total)

  /** w·x + b as an explicit left-associative fold in bucket order —
    * the fixed evaluation order the determinism contract needs.
    */
  private def dot(tf: Column, total: Column, weights: Array[Double],
      bias: Double): Column =
    weights.zipWithIndex.foldLeft(lit(bias): Column) {
      case (acc, (w, j)) => acc + lit(w) * xj(tf, total, j)
    }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Train a logistic-regression quality classifier on hashed-TF
    * features with plain batch gradient descent: per iteration ONE
    * aggregation computes the full gradient (dim+1 decimal sums,
    * partial-aggregated map-side), the driver applies
    * w -= lr * g / N, and the next iteration's expression tree embeds
    * the new weights as literals. Returns (weights, bias).
    *
    * The shape at 100 TB: `iterations` scans of the (cached)
    * featurized corpus, each shuffling only kilobytes of partial
    * sums — the exact profile of MLlib's treeAggregate-based
    * optimizers, with zero driver-side row materialization.
    */
  def trainLogistic(df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 16, iterations: Int = 3, lr: Double = 0.5)
      : (Array[Double], Double) =
    trainLogisticTf(df, tfCol(textCol, dim), labelCol, dim, iterations, lr)

  /** [[trainLogistic]] with a caller-supplied TF column — the
    * shared-featurization spelling: a pipeline that has already
    * materialized (cached) the hashed-TF vector passes `col("__tf")`
    * instead of paying a fresh tokenize+hash pass over the text.
    * Bit-identical weights (same features, same fold order).
    */
  def trainLogisticTf(df: DataFrame, tf: Column, labelCol: String,
      dim: Int = 16, iterations: Int = 3, lr: Double = 0.5)
      : (Array[Double], Double) = {
    require(dim >= 1 && dim <= 4096, s"trainLogistic: dim $dim")
    require(iterations >= 1 && iterations <= 1000,
      s"trainLogistic: iterations $iterations")
    // materialize the normalized features as flat double COLUMNS (not
    // the packed array): iterations then read cached doubles directly,
    // and each gradient term stays a tiny product — keeping the
    // per-iteration codegen unit small (the sigmoid/dot tree compiles
    // ONCE per iteration in the error projection, not once per sum)
    // null labels count as NEGATIVE (matching the SQL-oracle CASE
    // semantics) rather than silently vanishing from the gradient
    // while still inflating n
    val tfd = df.select(tf.as("__tf"),
      aggregate(tf, lit(0), (a, x) => a + x).as("__total"),
      coalesce(col(labelCol).cast("double"), lit(0.0)).as("__y"))
    val xCols = (0 until dim).map(j =>
      xj(col("__tf"), col("__total"), j).as(s"__x$j"))
    val feats = tfd.select(xCols :+ col("__y"): _*)
      .persist() // scanned once per iteration
    try {
      val w = new Array[Double](dim)
      var b = 0.0
      // n is fused into iteration 0's gradient aggregate (one more
      // bounded sum through the same map-side-combined shuffle) — a
      // separate count() job scanned the cached features a full extra
      // time and paid one more scheduler round-trip for a single long.
      // Identical math: iteration 0 always runs (iterations >= 1) and
      // its weights are zero regardless of n.
      var n = 0.0
      var it = 0
      while (it < iterations) {
        val dotc = w.zipWithIndex.foldLeft(lit(b): Column) {
          case (acc, (wj, j)) => acc + lit(wj) * col(s"__x$j")
        }
        val errDf = feats.select(
          (sigmoid(dotc) - col("__y")).as("__err") +:
            (0 until dim).map(j => col(s"__x$j")): _*)
        val gradCols = ((0 until dim).map { j =>
          sum((col("__err") * col(s"__x$j"))
            .cast(DecimalType(38, 15))).as(s"g$j")
        } :+ sum(col("__err").cast(DecimalType(38, 15))).as("gb")) ++
          (if (it == 0) Seq(count(lit(1)).as("__n")) else Nil)
        val row = errDf.agg(gradCols.head, gradCols.tail: _*).head()
        if (it == 0) {
          n = row.getLong(dim + 1).toDouble
          if (n == 0) return (w, b)
        }
        var j = 0
        while (j < dim) {
          w(j) -= lr * row.getDecimal(j).doubleValue() / n
          j += 1
        }
        b -= lr * row.getDecimal(dim).doubleValue() / n
        it += 1
      }
      (w, b)
    } finally feats.unpersist()
  }

  /** Score every row with a trained classifier: map-only, whole-stage
    * codegen (the weights ride in the expression tree as literals).
    * Adds `<outCol>` = sigmoid(w·x + b) in [0, 1].
    */
  def scoreLogistic(df: DataFrame, textCol: String,
      weights: Array[Double], bias: Double,
      outCol: String = "quality_score"): DataFrame =
    scoreLogisticTf(df, tfCol(textCol, weights.length), weights, bias,
      outCol)

  /** [[scoreLogistic]] with a caller-supplied TF column (see
    * [[trainLogisticTf]]). */
  def scoreLogisticTf(df: DataFrame, tf: Column,
      weights: Array[Double], bias: Double,
      outCol: String = "quality_score"): DataFrame = {
    // alias the hashed-TF array in its own projection: the scorer
    // references it 2·dim times, and CollapseProject keeps a
    // multi-referenced non-cheap alias un-inlined — so the UDF kernel
    // runs ONCE per row, not once per reference (measured 17x)
    df.withColumn("__clf_tf", tf)
      .withColumn(outCol,
        sigmoid(dot(col("__clf_tf"),
          aggregate(col("__clf_tf"), lit(0), (a, x) => a + x),
          weights, bias)))
      .drop("__clf_tf")
  }

  /** Train-then-score in one call (the usual pipeline spelling):
    * rows where `targetPred` holds are the positive seed set, the
    * classifier scores EVERY row.
    */
  def qualityScore(df: DataFrame, textCol: String, targetPred: Column,
      dim: Int = 16, iterations: Int = 3, lr: Double = 0.5,
      outCol: String = "quality_score"): DataFrame =
    qualityScoreTf(df, tfCol(textCol, dim), targetPred, dim, iterations,
      lr, outCol)

  /** [[qualityScore]] with a caller-supplied TF column (see
    * [[trainLogisticTf]]): train and score read the same (ideally
    * cached) feature vector instead of hashing the text twice.
    */
  def qualityScoreTf(df: DataFrame, tf: Column, targetPred: Column,
      dim: Int = 16, iterations: Int = 3, lr: Double = 0.5,
      outCol: String = "quality_score"): DataFrame = {
    val labeled = df.withColumn("__label", targetPred.cast("int"))
    val (w, b) = trainLogisticTf(labeled, tf, "__label", dim,
      iterations, lr)
    scoreLogisticTf(df, tf, w, b, outCol)
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"):
    * hashed-unigram bag likelihood ratio between a target
    * distribution (rows satisfying `targetPred` — the high-quality
    * seed corpus) and the raw distribution (all rows).
    *
    * log w(doc) = Σ_buckets tf_j · [ln p_target(j) − ln p_raw(j)]
    * with add-one smoothing on both distributions. Two bounded
    * actions: one aggregation for the 2·dim bucket counts (integer,
    * exact, map-side combined), then a map-only scoring projection
    * with the log-ratios as literals — nothing about the corpus size
    * ever reaches the driver beyond 2·dim longs.
    *
    * Sampling proportionally to exp(log-weight) (via
    * `sample-weighted`) completes the DSIR recipe.
    */
  def dsirLogWeights(df: DataFrame, textCol: String, targetPred: Column,
      dim: Int = 16, outCol: String = "dsir_logweight"): DataFrame =
    dsirLogWeightsTf(df, tfCol(textCol, dim), targetPred, dim, outCol)

  /** [[dsirLogWeights]] with a caller-supplied TF column (see
    * [[trainLogisticTf]]). */
  def dsirLogWeightsTf(df: DataFrame, tf: Column, targetPred: Column,
      dim: Int = 16, outCol: String = "dsir_logweight"): DataFrame =
    dsirApplyTf(df, tf, dsirLogRatiosTf(df, tf, targetPred, dim), outCol)

  /** The bounded-aggregate half of [[dsirLogWeightsTf]]: ONE job of
    * 2·dim exact integer sums → the per-bucket log-ratios. Split out
    * so a pipeline can run this action CONCURRENTLY with its other
    * bounded training jobs (guide §2.6 — independent driver actions
    * back-fill each other's stage tails) and attach the map-only
    * scoring projection later via [[dsirApplyTf]]. Values are
    * identical to the fused spelling: the counts read only `tf` and
    * `targetPred`, never the caller's other columns.
    */
  def dsirLogRatiosTf(df: DataFrame, tf: Column, targetPred: Column,
      dim: Int = 16): Array[Double] = {
    require(dim >= 1 && dim <= 4096, s"dsirLogWeights: dim $dim")
    val feats = df.select(tf.as("__tf"), targetPred.as("__t"))
    val cntCols = (0 until dim).flatMap { j =>
      Seq(
        sum(when(col("__t"), col("__tf").getItem(j)).otherwise(0))
          .as(s"t$j"),
        sum(col("__tf").getItem(j)).as(s"r$j"))
    }
    val row = feats.agg(cntCols.head, cntCols.tail: _*).head()
    // empty input: sum() aggregates come back null — zero counts give
    // identical smoothed distributions, so every log-ratio is 0
    def cnt(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    val tCnt = (0 until dim).map(j => cnt(2 * j)).toArray
    val rCnt = (0 until dim).map(j => cnt(2 * j + 1)).toArray
    val tTot = tCnt.sum.toDouble + dim
    val rTot = rCnt.sum.toDouble + dim
    // ln ratios from exact integer counts: any engine recomputes them
    (0 until dim).map { j =>
      math.log((tCnt(j) + 1).toDouble / tTot) -
        math.log((rCnt(j) + 1).toDouble / rTot)
    }.toArray
  }

  /** The map-only scoring half of [[dsirLogWeightsTf]]: appends
    * `outCol` = Σ_j tf_j · logRatio_j (codegen projection, the ratios
    * ride as literals). */
  def dsirApplyTf(df: DataFrame, tf: Column, logRatio: Array[Double],
      outCol: String = "dsir_logweight"): DataFrame = {
    // aliased tf projection — one UDF evaluation per row (see
    // scoreLogistic)
    val score = logRatio.indices.foldLeft(lit(0.0): Column) { (acc, j) =>
      acc + col("__dsir_tf").getItem(j).cast("double") * lit(logRatio(j))
    }
    df.withColumn("__dsir_tf", tf)
      .withColumn(outCol, score)
      .drop("__dsir_tf")
  }
}
