package graft

import graft.api._
import graft.ops._
import graft.parser.RecipeParser
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Result of running a recipe: the main output plus the error
  * side-channel (rows diverted by `send-to-error` etc., each carrying
  * the ORIGINAL input row as JSON — reference: wrangler-core
  * executor/RecipePipelineExecutor.java:128-148).
  */
final case class WrangleResult(output: DataFrame, errors: DataFrame) {

  /** Plugin-level on-error policy (reference: wrangler-transform
    * Wrangler.java:389-410 — fail-pipeline / send-to-error-port /
    * skip-on-error): `fail` aborts when any row hit the error channel,
    * `skip` drops them silently, `error-port` (default) leaves both
    * branches available on this result.
    */
  def onError(policy: String): DataFrame = policy.toLowerCase match {
    case "fail" | "fail-pipeline" =>
      val bad = errors.limit(1).collect()
      if (bad.nonEmpty) throw new graft.api.RecipeException(
        s"on-error=fail: ${bad.head.getAs[String]("directive")}: " +
          bad.head.getAs[String]("message"))
      output
    case "skip" | "skip-on-error" | "error-port" | "send-to-error-port" =>
      output
    case other => throw new graft.api.RecipeException(s"on-error: $other")
  }
}

/** The public engine API — Spark-native equivalent of the reference's
  * TestingRig / RecipePipelineExecutor lifecycle (reference:
  * wrangler-test test/TestingRig.java:63-80): recipe text → typed
  * DirectiveSpec AST → chain of DataFrame transformations, all native
  * Catalyst expressions, so pruning/pushdown/codegen apply across the
  * whole recipe.
  *
  * {{{
  *   val out = Wrangle.recipe("""
  *     set-type :l_quantity long;
  *     filter-row exp:{ l_discount > 0.05 } false;
  *     set-column :revenue exp:{ l_extendedprice * (1 - l_discount) };
  *   """).apply(df)
  * }}}
  */
final class Wrangle private (
    specs: Vector[DirectiveSpec],
    lookups: Map[String, DataFrame],
    catalogs: Map[String, DataFrame],
    precondition: Option[String] = None) {

  def withLookup(name: String, df: DataFrame): Wrangle =
    new Wrangle(specs, lookups + (name -> df), catalogs, precondition)

  def withCatalog(name: String, df: DataFrame): Wrangle =
    new Wrangle(specs, lookups, catalogs + (name -> df), precondition)

  /** Rows matching the precondition are filtered out before the recipe
    * runs (reference: wrangler-transform Precondition.java +
    * Wrangler.java:365-372 — skip-record-if-true).
    */
  def withPrecondition(conditionExpr: String): Wrangle =
    new Wrangle(specs, lookups, catalogs, Some(conditionExpr))

  /** Main output only (errors dropped). */
  def apply(df: DataFrame): DataFrame = run(df).output

  /** Main output + error side-channel. */
  def run(df: DataFrame): WrangleResult = {
    // compile first: directive errors surface before any data is touched
    // (compileAll also fuses consecutive same-column xpath pulls)
    val ops = Registry.compileAll(specs)
    val spark = df.sparkSession
    val ctx = WrangleContext(spark, lookups, catalogs)
    val needsOrig = specs.exists(s => RowOps.needsOrig(s.name))
    val pre = precondition.fold(df)(p =>
      df.filter(!graft.expr.ExprCompiler.compile(p)))
    val init = PipeState.init(pre, needsOrig)
    val fin = ops.foldLeft(init) { (st, op) => op(st, ctx) }
    val out = PipeState.hiddenCols(fin.df)
      .foldLeft(fin.df)((d, c) => d.drop(c))
    val errors =
      if (fin.errors.isEmpty) Wrangle.emptyErrors(spark)
      else fin.errors.reduce(_ unionByName _)
    WrangleResult(out, errors)
  }
}

object Wrangle {
  def recipe(text: String): Wrangle =
    new Wrangle(RecipeParser.parse(text), Map.empty, Map.empty)

  /** Recipe with `$name$` macro substitution (reference: Directives.g4
    * macro rule): `Wrangle.recipe("filter-row exp:{ $cond$ } false;",
    * Map("cond" -> "l_quantity > 5"))`.
    */
  def recipe(text: String, macros: Map[String, String]): Wrangle =
    new Wrangle(RecipeParser.parse(text, macros), Map.empty, Map.empty)

  def specs(text: String): Vector[DirectiveSpec] = RecipeParser.parse(text)

  private[graft] def emptyErrors(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("directive", StringType),
        StructField("message", StringType),
        StructField("row", StringType))))
  }
}

/** Directive registry: name → builder. Spark-native counterpart of the
  * reference's SystemDirectiveRegistry (reference: wrangler-core
  * registry/SystemDirectiveRegistry.java:49). User-defined directives
  * plug in via [[Registry.register]] — the UDD path (reference:
  * wrangler-core registry/UserDirectiveRegistry.java:164-183).
  */
object Registry {
  type Builder = DirectiveSpec => Option[PipeOp]

  @volatile private var userBuilders: Vector[Builder] = Vector.empty
  // aliasing/exclusion config (reference: ConfigDirectiveContext +
  // wrangler-docs/exclusion-and-aliasing.md): alias → root name;
  // excluded names are rejected at compile time
  @volatile private var aliases: Map[String, String] = Map.empty
  @volatile private var excluded: Set[String] = Set.empty

  /** Register a user-defined directive builder (UDD SPI). */
  def register(b: Builder): Unit = synchronized { userBuilders :+= b }

  /** Install an alias/exclusion configuration (both maps lowercase). */
  def configure(aliasMap: Map[String, String] = Map.empty,
      exclusions: Set[String] = Set.empty): Unit = synchronized {
    aliases = aliasMap.map { case (k, v) => k.toLowerCase -> v.toLowerCase }
    excluded = exclusions.map(_.toLowerCase)
  }

  def resetConfig(): Unit = configure()

  /** Compile a whole recipe with peephole fusion: a run of >= 2
    * consecutive xpath/xpath-array directives pulling from the same
    * source column becomes ONE fused op (one DOM parse per row instead
    * of one per directive — ParserOps.fusedXpaths). Runs break when the
    * source column differs, an output overwrites the source, or a
    * user-defined builder claims any directive in the run (UDD
    * overrides win over fusion, like they win over system builders).
    */
  def compileAll(specs: Vector[DirectiveSpec]): Vector[PipeOp] = {
    def rootName(s: DirectiveSpec): String = aliases.getOrElse(s.name, s.name)
    def isXpath(s: DirectiveSpec): Boolean = {
      val n = rootName(s)
      (n == "xpath" || n == "xpath-array") &&
        !excluded(s.name) && !excluded(n) &&
        // malformed arg lists fall through to compile() for its error
        scala.util.Try { s.col(0); s.col(1); s.str(2) }.isSuccess &&
        userBuilders.forall(b => b(s.copy(name = n)).isEmpty)
    }
    val out = Vector.newBuilder[PipeOp]
    var i = 0
    while (i < specs.length) {
      val s = specs(i)
      if (isXpath(s)) {
        val src = s.col(0)
        var j = i
        while (j < specs.length && isXpath(specs(j)) &&
            specs(j).col(0) == src && specs(j).col(1) != src) j += 1
        if (j - i >= 2) {
          out += ParserOps.fusedXpaths(
            specs.slice(i, j).map(sp => sp.copy(name = rootName(sp))))
          i = j
        } else if (ops.XmlSupport.parseSimplePath(s.str(2)).isDefined) {
          // a LONE xpath with a simple location path also routes
          // through the kernel: the native function pays a ~40us/row
          // Xalan evaluate() where the walker pays ~5us (parity
          // asserted in OpsSpec); complex paths keep the native
          // codegen'd expression
          out += ParserOps.fusedXpaths(Seq(s.copy(name = rootName(s))))
          i += 1
        } else { out += compile(s); i += 1 }
      } else { out += compile(s); i += 1 }
    }
    out.result()
  }

  def compile(spec0: DirectiveSpec): PipeOp = {
    // root of an alias is subject to the exclusion list too, matching
    // the reference: excluding 'drop' also disables any alias of it
    val rootName = aliases.getOrElse(spec0.name, spec0.name)
    if (excluded(spec0.name) || excluded(rootName))
      throw new RecipeException(
        s"directive '${spec0.name}' is excluded by configuration")
    val spec = if (rootName == spec0.name) spec0
      else spec0.copy(name = rootName)
    (userBuilders ++ system).iterator
      .flatMap(b => b(spec))
      .nextOption()
      .getOrElse(throw new RecipeException(
        s"unknown directive '${spec.name}'"))
  }

  private val system: Vector[Builder] = Vector(
    ColumnOps.build, RowOps.build, StringOps.build,
    DateOps.build, ParserOps.build, WriterOps.build, LookupOps.build,
    LlmOps.build, ExternalOps.build, BinaryFormats.build, SketchOps.build,
    QualityOps.build)
}
