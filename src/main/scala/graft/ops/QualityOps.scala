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

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {
    // `quality-report 'rule; rule; ...' [approx]`
    case "quality-report" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val approx = spec.optStr(1).exists(_.equalsIgnoreCase("approx"))
        st.mapDf(df => report(df, parse(spec.str(0), approx)))
      }
    }
    case _ => null
  })
}
