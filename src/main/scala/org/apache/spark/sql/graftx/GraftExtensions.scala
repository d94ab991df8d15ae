package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing graft's native expressions into the SQL
  * function registry, so plain `spark.sql` can call them:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   spark.sql("SELECT mask_number(ssn, 'xxx-xx-####') FROM t")
  * }}}
  *
  * (For an existing session, [[GraftExtensions.register]] installs the
  * same functions through the session's registry.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injectables.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder))
    }
}

object GraftExtensions {
  private def litInt(e: Expression, what: String): Int = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal if l.foldable =>
      l.eval(null).asInstanceOf[Number].intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val injectables: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mask_number" -> (args => MaskNumberExpr(args(0), args(1))),
    "fnv64" -> (args => Fnv64Expr(args.head)),
    // mergeable sketches (the analyzer wraps AggregateFunctions in
    // AggregateExpression, same as built-in max/min registration)
    "hll_sketch" -> (args => args match {
      case Seq(c) => HllSketchAgg(c)
      case Seq(c, p) => HllSketchAgg(c, litInt(p, "hll_sketch precision"))
      case _ => throw new IllegalArgumentException("hll_sketch(col[, p])")
    }),
    "hll_union" -> (args => HllUnionAgg(args.head)),
    "hll_estimate" -> (args => HllEstimateExpr(args.head)),
    "kll_quantiles" -> (args => args match {
      case Seq(c, probs) if probs.foldable =>
        // SQL parses 0.25 as DECIMAL, so convert elementwise instead of
        // toDoubleArray (which casts and throws on Decimal elements)
        val arr = probs.eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val qs = arr.toObjectArray(
          probs.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType)
          .map {
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: Number => n.doubleValue()
            case other => throw new IllegalArgumentException(
              s"kll_quantiles: non-numeric probability $other")
          }.toSeq
        KllQuantileAgg(c, qs)
      case _ => throw new IllegalArgumentException(
        "kll_quantiles(col, array(<numeric literals>))")
    }),
    "heavy_hitters" -> (args => args match {
      case Seq(c) => HeavyHittersAgg(c)
      case Seq(c, k) => HeavyHittersAgg(c, litInt(k, "heavy_hitters k"))
      case _ => throw new IllegalArgumentException("heavy_hitters(col[, k])")
    }),
    "topk_by" -> (args => args match {
      case Seq(v, it, k) => TopKByAgg(v, it, litInt(k, "topk_by k"))
      case _ => throw new IllegalArgumentException("topk_by(value, item, k)")
    }),
    "kmv_sketch" -> (args => args match {
      case Seq(c) => KmvSketchAgg(c)
      case Seq(c, k) => KmvSketchAgg(c, litInt(k, "kmv_sketch k"))
      case _ => throw new IllegalArgumentException("kmv_sketch(col[, k])")
    }),
    "kmv_estimate" -> (args => KmvEstimateExpr(args.head)),
    "kmv_jaccard" -> (args => KmvJaccardExpr(args(0), args(1))),
    "kmv_intersect" -> (args => KmvIntersectExpr(args(0), args(1))))

  /** Install on an already-built session: native expressions plus the
    * JVM kernels (digests, text metrics, Porter) as SQL UDFs.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    injectables.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    import graft.functions.{Digests, Udfs}
    // NULL in ⇒ NULL out, like Spark built-ins (boxed returns so the
    // UDF schema stays nullable rather than throwing NPE mid-query)
    spark.udf.register("digest_hex",
      (algo: String, v: String) => Udfs.digestHex(v, algo))
    spark.udf.register("jaro", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(Udfs.jaro(a, b)))
    spark.udf.register("simon_white", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(Udfs.simonWhite(a, b)))
    spark.udf.register("damerau_levenshtein", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Integer.valueOf(Udfs.damerauLevenshtein(a, b)))
    spark.udf.register("porter_stem", (w: String) => Udfs.porterStem(w))
    spark.udf.register("blake2b256", (v: String) =>
      if (v == null) null
      else Digests.hex(Digests.blake2b(v.getBytes("UTF-8"), 32)))
  }
}
