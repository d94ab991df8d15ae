package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator (or a tight group) of the
  * engine end-to-end: recipe text → parser → planner → Catalyst, over
  * the driver's parquet tables; `oracleSql` holds the DuckDB-equivalent
  * SQL the driver hash-compares against.
  */
object SparkEntry {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A realistic multi-directive cleanse recipe over lineitem, all
    * compiled to native Columns (one projection + one pushed filter).
    */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    val dir = "/root/testdata/sf0.001"
    Wrangle.recipe("""
      set-type :l_quantity long;
      filter-row exp:{ l_discount > 0.01 } false;
      set-column :revenue exp:{ l_extendedprice * (1 - l_discount) };
      set-column :charge exp:{ revenue * (1 + l_tax) };
      merge :l_returnflag :l_linestatus :flag_status '_';
      uppercase :flag_status;
      keep :l_orderkey,:l_quantity,:revenue,:charge,:flag_status;
    """).apply(t(dir, "lineitem"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryBank.queries

  def oracleSql: Map[String, String] = QueryBank.oracleSql
}
