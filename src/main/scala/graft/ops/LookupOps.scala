package graft.ops

import graft.api._
import org.apache.spark.sql.functions._

/** Lookup + join directives (SURVEY §2.7, §2.11). The two lookups are
  * BROADCAST left joins: the lookup side is a small dimension by
  * construction (a catalog / reference table), so at 100 TB the fact
  * side never shuffles. `asof-join` / `range-join` expose
  * [[JoinOps]]' temporal/range joins to the recipe surface against a
  * registered table.
  */
object LookupOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // static dictionary lookup → `<col>_<catalog>_description`
    // (reference: wrangler-core directives/lookup/CatalogLookup.java:93).
    // Unregistered names fall back to the packaged catalogs
    // (iso3166, icd-10 — like the reference's bundled ICD code files,
    // executor/ICDCatalog.java:33-34), so the directive works out of
    // the box with no user-registered DataFrame.
    case "catalog-lookup" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val catalog = spec.str(0)
        val c = spec.col(1)
        val cat = ctx.catalogs.get(catalog)
          .orElse(BuiltinCatalogs.load(ctx.spark, catalog))
          .getOrElse(throw new RecipeException(
            s"catalog-lookup: unknown catalog '$catalog' (built-ins: " +
              s"${BuiltinCatalogs.names.mkString(", ")})"))
        // catalog schema contract: (code, description)
        val Array(codeCol, descCol) = cat.columns.take(2)
        val renamed = cat.select(
          col(codeCol).as("__graft_cat_code"),
          col(descCol).as(s"${c}_${catalog}_description"))
        st.mapDf(_.join(broadcast(renamed),
            col(c) === col("__graft_cat_code"), "left")
          .drop("__graft_cat_code"))
      }
    }

    // key lookup into a registered table — canonical broadcast hash join
    // (reference: wrangler-core directives/lookup/TableLookup.java:100)
    case "table-lookup" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val c = spec.col(0)
        val table = spec.str(1)
        val lk = ctx.lookups.getOrElse(table,
          throw new RecipeException(s"table-lookup: unknown table '$table'"))
        val keyCol = lk.columns.head
        val renamed = lk.columns.tail.foldLeft(
          lk.withColumnRenamed(keyCol, "__graft_lk_key")) { (d, cc) =>
          d.withColumnRenamed(cc, s"${c}_$cc")
        }
        st.mapDf(_.join(broadcast(renamed),
            col(c) === col("__graft_lk_key"), "left")
          .drop("__graft_lk_key"))
      }
    }

    // `asof-join :leftKey :leftTime table :rightKey :rightTime
    //  payload1[,payload2...] [backward|forward|nearest] [toleranceSeconds]
    //  [tiebreakCol]` — attach each row's most recent (or next)
    // registered-table row per key. Union-merge under the hood
    // (JoinOps.asofJoin): one key shuffle, no candidate explosion.
    case "asof-join" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val table = spec.str(2)
        val right = ctx.lookups.getOrElse(table,
          throw new RecipeException(s"asof-join: unknown table '$table'"))
        st.mapDf(df => JoinOps.asofJoin(df, right,
          spec.col(0), spec.col(3), spec.col(1), spec.col(4),
          payload = spec.str(5).split(",").map(_.trim).toSeq,
          direction = spec.optStr(6).getOrElse("backward"),
          // `-` / `none` skip tolerance while still allowing a
          // positional tiebreak argument after it
          tolerance = spec.optStr(7)
            .filter(s => s.nonEmpty && s != "-" && !s.equalsIgnoreCase("none"))
            .map(s => try s.toDouble catch {
              case _: NumberFormatException => throw new RecipeException(
                s"asof-join: tolerance '$s' is not numeric (use a number, " +
                  "'none', or '-')")
            }),
          rightTiebreak = spec.optStr(8)))
      }
    }

    // `range-join :pointCol table :loCol :hiCol cellWidth` — attach
    // every registered-table interval row containing the point value;
    // grid-bucketed equi-join (JoinOps.rangeJoin), never a
    // nested-loop plan.
    case "range-join" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val table = spec.str(1)
        val intervals = ctx.lookups.getOrElse(table,
          throw new RecipeException(s"range-join: unknown table '$table'"))
        st.mapDf(df => JoinOps.rangeJoin(df, intervals,
          spec.col(0), spec.col(2), spec.col(3),
          cellWidth = spec.num(4).toDouble))
      }
    }

    // `interval-join :leftLo :leftHi table :rightLo :rightHi cellWidth`
    // — attach every registered-table interval row whose [lo, hi)
    // OVERLAPS the current row's interval; grid-bucketed equi-join
    // with first-shared-cell dedup (JoinOps.intervalJoin), never a
    // nested-loop plan.
    case "interval-join" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val table = spec.str(2)
        val intervals = ctx.lookups.getOrElse(table,
          throw new RecipeException(s"interval-join: unknown table '$table'"))
        st.mapDf(df => JoinOps.intervalJoin(df, intervals,
          spec.col(0), spec.col(1), spec.col(3), spec.col(4),
          cellWidth = spec.num(5).toDouble))
      }
    }

    case _ => null
  })
}

/** Packaged (code, description) catalogs loaded from classpath
  * resources — public reference data shipped with the engine so
  * `catalog-lookup iso3166 :code` needs no registration step.
  */
object BuiltinCatalogs {
  val names: Seq[String] = Seq("iso3166", "icd-9", "icd-10")
  // the reference's CatalogLookup.java:73 accepts ICD-9 /
  // ICD-10-2016 / ICD-10-2017; year-suffixed names route to our
  // icd-10 data. Bare "icd" keeps its original icd-10 meaning (it has
  // aliased icd-10 since this catalog shipped — silently re-pointing
  // it would change existing recipes' results).
  private val aliasOf = Map(
    "icd" -> "icd-10", "icd9" -> "icd-9", "icd10" -> "icd-10",
    "icd-10-2016" -> "icd-10", "icd-10-2017" -> "icd-10")

  /** icd-9: the complete public-domain CMS ICD-9-CM diagnosis code list
    * (14 567 codes), the same data file the reference bundles
    * (wrangler-core resources icd-9_cm_codes.txt via
    * executor/ICDCatalog.java:76-90). Layout: code left-justified in a
    * 6-char field, description from column 7 — parsed as
    * first-token/rest so both this file and the 7-wide CMS ICD-10
    * order-file layout read correctly.
    */
  private def fixedWidth(lines: Vector[String]): Vector[(String, String)] =
    lines.filter(_.trim.nonEmpty).map { l =>
      val i = l.indexOf(' ')
      if (i < 0) (l.trim, "") else (l.take(i).trim, l.drop(i).trim)
    }

  def load(spark: org.apache.spark.sql.SparkSession,
      name: String): Option[org.apache.spark.sql.DataFrame] = {
    val resolved = aliasOf.getOrElse(name.toLowerCase, name.toLowerCase)
    def res(path: String) = Option(getClass.getResourceAsStream(path))
    def slurp(is: java.io.InputStream): Vector[String] =
      try scala.io.Source.fromInputStream(is, "UTF-8").getLines().toVector
      finally is.close()
    val pairs: Option[Vector[(String, String)]] =
      res(s"/graft/catalogs/${resolved}_cm_codes.txt").map(is => fixedWidth(slurp(is)))
        .orElse(res(s"/graft/catalogs/$resolved.csv").map { is =>
          slurp(is).tail.map { l =>
            val i = l.indexOf(',')
            (l.take(i), l.drop(i + 1))
          }
        })
    pairs.map { ps =>
      import org.apache.spark.sql.types._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(ps.map { case (c, d) =>
          org.apache.spark.sql.Row(c, d)
        }: _*)
      spark.createDataFrame(rows, StructType(Seq(
        StructField("code", StringType), StructField("description", StringType))))
    }
  }
}
