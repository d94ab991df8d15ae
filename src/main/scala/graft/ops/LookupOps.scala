package graft.ops

import graft.api._
import org.apache.spark.sql.functions._

/** Lookup directives — the only join-like operators in the surface
  * (SURVEY §2.7). Both are BROADCAST left joins: the lookup side is a
  * small dimension by construction (a catalog / reference table), so at
  * 100 TB the fact side never shuffles.
  */
object LookupOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // static dictionary lookup → `<col>_<catalog>_description`
    // (reference: wrangler-core directives/lookup/CatalogLookup.java:93)
    case "catalog-lookup" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val catalog = spec.str(0)
        val c = spec.col(1)
        val cat = ctx.catalogs.getOrElse(catalog,
          throw new RecipeException(s"catalog-lookup: unknown catalog '$catalog'"))
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

    case _ => null
  })
}
