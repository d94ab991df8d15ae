package graft.ops

import graft.api._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the expectation-suite pattern: a
  * rule list evaluated in ONE aggregate pass over the frame, emitting
  * one (rule, observed, threshold, pass) row per expectation. The
  * pipeline reads `pass` and gates the write; nothing here shuffles
  * more than the aggregation's partial buffers.
  *
  * Rule grammar (directive form, ';'-separated):
  * {{{
  *   rowcount >= 100
  *   null_frac(col) <= 0.1
  *   distinct(col) >= 3         — exact by default; approx=true uses HLL
  *   min(col) >= 0 / max(col) <= 1e9 / mean(col) >= x
  *   in(col: A,B,C)             — every non-null value in the set
  * }}}
  */
object QualityOps {

  sealed trait Rule { def label: String }
  case class AggRule(label: String, agg: Column, op: String, threshold: Double)
    extends Rule
  case class InSetRule(label: String, column: String, values: Seq[String])
    extends Rule

  private val cmp: Map[String, (Column, Double) => Column] = Map(
    ">=" -> ((c, t) => c >= t), "<=" -> ((c, t) => c <= t),
    ">" -> ((c, t) => c > t), "<" -> ((c, t) => c < t),
    "==" -> ((c, t) => c === t), "=" -> ((c, t) => c === t))

  /** Evaluate the rules in one aggregation; returns
    * (rule, observed, threshold, pass) with observed rounded to 6 dp.
    * (The exact-vs-approx distinct choice is made when the rules are
    * built — see [[parse]]'s `approx` flag.)
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "quality-report: no rules")
    val aggs = rules.zipWithIndex.map {
      case (AggRule(_, agg, _, _), i) => agg.cast("double").as(s"__q_$i")
      case (InSetRule(_, c, vs), i) =>
        // observed = count of non-null values OUTSIDE the set
        sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L)
          .otherwise(0L)).cast("double").as(s"__q_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map {
      case (r @ AggRule(label, _, op, t), i) =>
        val obs = col(s"__q_$i")
        struct(lit(label).as("rule"), round(obs, 6).as("observed"),
          lit(t).as("threshold"),
          coalesce(cmp(op)(obs, t), lit(false)).as("pass"))
      case (InSetRule(label, _, _), i) =>
        val obs = col(s"__q_$i")
        struct(lit(label).as("rule"), round(obs, 6).as("observed"),
          lit(0.0).as("threshold"), (obs <= 0.0).as("pass"))
    }
    wide.select(explode(array(rows: _*)).as("e")).select("e.*")
  }

  private val RowCount = """rowcount\s*(>=|<=|==|=|>|<)\s*([-\d.eE]+)""".r
  private val FnRule = """(null_frac|distinct|min|max|mean)\(([^)]+)\)\s*(>=|<=|==|=|>|<)\s*([-\d.eE]+)""".r
  private val InRule = """in\(\s*:?([^:]+):([^)]+)\)""".r

  /** Parse the directive rule string into [[Rule]]s. */
  def parse(spec: String, approx: Boolean = false): Seq[Rule] =
    spec.split(";").map(_.trim).filter(_.nonEmpty).map {
      case RowCount(op, t) =>
        AggRule(s"rowcount $op $t", count(lit(1)), op, t.toDouble)
      case FnRule(fn, c0, op, t) =>
        val c = c0.trim.stripPrefix(":")
        val agg = fn match {
          case "null_frac" =>
            avg(when(col(c).isNull, 1.0).otherwise(0.0))
          case "distinct" =>
            if (approx)
              org.apache.spark.sql.graftx.Sketches.hllDistinct(col(c))
            else count_distinct(col(c))
          case "min" => min(col(c).cast("double"))
          case "max" => max(col(c).cast("double"))
          case "mean" => avg(col(c).cast("double"))
        }
        AggRule(s"$fn($c) $op $t", agg, op, t.toDouble)
      case InRule(c0, vals) =>
        val c = c0.trim.stripPrefix(":")
        InSetRule(s"in($c)", c, vals.split(",").map(_.trim).toSeq)
      case other =>
        throw new RecipeException(s"quality-report: cannot parse rule '$other'")
    }.toSeq

  /** Precision/recall sweep of a score column against a boolean label:
    * one row per threshold with EXACT integer confusion counts — the
    * table a quality-filter pipeline reads to choose its gate BEFORE
    * committing to a full filter pass over the corpus. ONE
    * partial-aggregated scan: all n×4 conditional counts aggregate in
    * a single pass (no per-threshold re-scan, no row multiplication —
    * an explode-by-threshold would push n copies of every row through
    * the exchange), then the 1-row result unpivots with `stack`.
    * Null scores/labels are excluded. precision/recall are
    * round-6 ratios (null when the denominator is 0).
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, labelCol: String,
      start: Double = 0.1, step: Double = 0.1, n: Int = 9): DataFrame = {
    require(n >= 1 && n <= 1000,
      s"threshold-sweep: n must be in [1, 1000], got $n")
    // decimal threshold arithmetic: 0.1 + 2*0.1 renders "0.3", not
    // 0.30000000000000004 — both engines then parse the SAME literal
    val ts = (0 until n).map(i =>
      (BigDecimal(start.toString) + BigDecimal(step.toString) * i).toString)
    val s = col(scoreCol).cast("double")
    val lab = col(labelCol).cast("boolean")
    // coalesce: an agg over ZERO surviving rows returns null sums —
    // the contract is exact INTEGER counts, so an all-null/empty input
    // yields n rows of zeros, not n rows of nulls
    val aggs = ts.zipWithIndex.flatMap { case (t, i) =>
      val ge = s >= lit(t).cast("double")
      Seq(
        coalesce(sum(when(ge && lab, 1L).otherwise(0L)), lit(0L)).as(s"tp_$i"),
        coalesce(sum(when(ge && !lab, 1L).otherwise(0L)), lit(0L)).as(s"fp_$i"),
        coalesce(sum(when(!ge && lab, 1L).otherwise(0L)), lit(0L)).as(s"fn_$i"),
        coalesce(sum(when(!ge && !lab, 1L).otherwise(0L)), lit(0L)).as(s"tn_$i"))
    }
    // NaN would otherwise count as >= every threshold (Spark orders
    // NaN above all doubles) — exclude it like null
    val one = df.where(s.isNotNull && !isnan(s) && lab.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = ts.zipWithIndex.map { case (t, i) =>
      s"CAST($t AS DOUBLE), tp_$i, fp_$i, fn_$i, tn_$i"
    }.mkString(", ")
    one.select(expr(
        s"stack($n, $stackArgs) AS (threshold, tp, fp, fn, tn)"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        round(col("tp") / (col("tp") + col("fp")), 6)))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        round(col("tp") / (col("tp") + col("fn")), 6)))
      .orderBy("threshold")
  }

  /** Winsorize a numeric column: clamp values outside the [pLow,
    * pHigh] percentile bounds to the bounds — the standard tabular-QA
    * outlier treatment before aggregation/training. Bounds come from
    * ONE aggregate pass (exact interpolated percentile by default —
    * the classic sorted-index definition both Spark's `percentile` and
    * external engines' `quantile_cont` implement; `approx = true`
    * swaps in `approx_percentile` for corpus scale, where an exact
    * percentile's full sort is the bottleneck), then the clamp itself
    * is map-only against two broadcast scalars.
    */
  def winsorize(df: DataFrame, colName: String, pLow: Double = 0.05,
      pHigh: Double = 0.95, approx: Boolean = false): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh,
      s"winsorize: need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val c = col(colName).cast("double")
    // NaN is excluded from the BOUNDS (Spark sorts it above every
    // double, so one NaN row would drag the upper percentile to NaN
    // and silently disable the clamp) and passes THROUGH the clamp
    // unchanged — the same treat-like-null policy as thresholdSweep.
    // The SQL column reference is backtick-quoted so names needing
    // quoting behave like every Column-API path.
    val q = "`" + colName.replace("`", "``") + "`"
    val fn = if (approx) "approx_percentile" else "percentile"
    val guarded =
      s"CASE WHEN isnan(CAST($q AS DOUBLE)) THEN NULL ELSE CAST($q AS DOUBLE) END"
    val bounds = df.agg(
      expr(s"$fn($guarded, $pLow)").as("lo"),
      expr(s"$fn($guarded, $pHigh)").as("hi")).head()
    if (bounds.isNullAt(0) || bounds.isNullAt(1)) return df // all-null col
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    df.withColumn(colName,
      when(isnan(c), c)
        .when(c < lo, lit(lo)).when(c > hi, lit(hi)).otherwise(c))
  }

  /** Robust outlier flag for tabular QA: `<col>_outlier` = |x − med|
    * > k·MAD, with median and MAD (median absolute deviation,
    * UNSCALED — fold the 1.4826 normal-consistency constant into `k`
    * if you want σ units) from exact interpolated percentiles. Two
    * bounded stats actions (MAD needs the median first), then a
    * map-only flag against two broadcast scalars — the winsorize
    * shape, robust where mean/stddev z-scores break under the very
    * outliers being hunted. NaN rows are excluded from the statistics
    * and flag null; an all-equal column (MAD 0) flags any deviation.
    */
  def madOutliers(df: DataFrame, colName: String,
      k: Double = 3.0, approx: Boolean = false): DataFrame = {
    require(k > 0, s"outlier-mad: k must be positive, got $k")
    val c = col(colName).cast("double")
    val q = "`" + colName.replace("`", "``") + "`"
    val fn = if (approx) "approx_percentile" else "percentile"
    val guarded =
      s"CASE WHEN isnan(CAST($q AS DOUBLE)) THEN NULL ELSE CAST($q AS DOUBLE) END"
    val medRow = df.agg(expr(s"$fn($guarded, 0.5)").as("med")).head()
    if (medRow.isNullAt(0))
      return df.withColumn(s"${colName}_outlier",
        lit(null).cast("boolean")) // all-null column
    val med = medRow.getDouble(0)
    val mad = df.agg(expr(
        s"$fn(CASE WHEN isnan(CAST($q AS DOUBLE)) THEN NULL " +
          s"ELSE abs(CAST($q AS DOUBLE) - $med) END, 0.5)").as("mad"))
      .head().getDouble(0)
    df.withColumn(s"${colName}_outlier",
      when(c.isNull || isnan(c), lit(null).cast("boolean"))
        .otherwise(abs(c - lit(med)) > lit(k) * lit(mad)))
  }

  /** One-stop corpus summary — the dataset-card numbers a curation run
    * reports before/after each stage: doc and empty-doc counts, word
    * totals, exact distinct-content count (the exact-dedup normalize
    * kernel) and duplicate fraction, plus language count when a lang
    * column is given. ONE aggregate pass over the corpus (all metrics
    * are partial-aggregable), unpivoted to tall (metric, value) rows.
    */
  def corpusReport(df: DataFrame, textCol: String,
      langCol: Option[String]): DataFrame = {
    import graft.llm.Dedup
    val text = col(textCol).cast(org.apache.spark.sql.types.StringType)
    val isEmpty = text.isNull || length(trim(text)) === 0
    val words = when(isEmpty, 0).otherwise(size(split(trim(text), "\\s+")))
    val base = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      sum(when(isEmpty, 1L).otherwise(0L)).cast("double").as("n_empty"),
      coalesce(sum(words), lit(0L)).cast("double").as("total_words"),
      // same null-group correction as [[Dedup.dupReport]]
      (countDistinct(Dedup.fingerprint(text)) +
        max(when(text.isNull, 1L).otherwise(0L))).cast("double")
        .as("n_distinct_content"))
    val aggs = base ++ langCol.map(lc =>
      countDistinct(col(lc)).cast("double").as("n_langs")).toSeq
    val one = df.agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_doc_words", when(col("n_docs") > 0,
        round(col("total_words") / col("n_docs"), 6)).otherwise(lit(0.0)))
      .withColumn("dup_frac", when(col("n_docs") > 0,
        round(lit(1.0) - col("n_distinct_content") / col("n_docs"), 6))
        .otherwise(lit(0.0)))
    val metrics = Seq("n_docs", "n_empty", "total_words",
      "n_distinct_content", "mean_doc_words", "dup_frac") ++
      langCol.map(_ => "n_langs").toSeq
    val stackArgs = metrics.map(m => s"'$m', $m").mkString(", ")
    one.select(expr(s"stack(${metrics.length}, $stackArgs) AS (metric, value)"))
      .orderBy("metric")
  }

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {
    // `quality-report 'rule; rule; ...' [approx]`
    case "quality-report" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val approx = spec.optStr(1).exists(_.equalsIgnoreCase("approx"))
        st.mapDf(df => report(df, parse(spec.str(0), approx)))
      }
    }
    // `corpus-report :text [:lang]` — the dataset-card summary
    // (see [[corpusReport]])
    case "corpus-report" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => corpusReport(df, spec.col(0), spec.optCol(1)))
    }
    // `winsorize :col [pLow pHigh] [approx]` — clamp outliers to the
    // percentile bounds (see [[winsorize]])
    case "winsorize" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => winsorize(df, spec.col(0),
          pLow = spec.optStr(1).map(_.toDouble).getOrElse(0.05),
          pHigh = spec.optStr(2).map(_.toDouble).getOrElse(0.95),
          approx = spec.optStr(3).exists(_.equalsIgnoreCase("approx"))))
    }
    // `outlier-mad :col [k] [approx]` — robust |x−med| > k·MAD flag
    // (see [[madOutliers]])
    case "outlier-mad" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => madOutliers(df, spec.col(0),
          k = spec.optStr(1).map(_.toDouble).getOrElse(3.0),
          approx = spec.optStr(2).exists(_.equalsIgnoreCase("approx"))))
    }
    // `threshold-sweep :score :label [start step n]` — the gate-picking
    // precision/recall table (see [[thresholdSweep]])
    case "threshold-sweep" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState =
        st.mapDf(df => thresholdSweep(df, spec.col(0), spec.col(1),
          start = spec.optStr(2).map(_.toDouble).getOrElse(0.1),
          step = spec.optStr(3).map(_.toDouble).getOrElse(0.1),
          n = spec.optStr(4).map(_.toInt).getOrElse(9)))
    }
    case _ => null
  })
}
