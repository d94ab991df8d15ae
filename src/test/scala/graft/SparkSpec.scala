package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed-table tests use saveAsTable; keep the warehouse out
      // of the repo tree
      .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row

  /** TestingRig-style helper: literal rows in, recipe, rows out
    * (reference: wrangler-test test/TestingRig.java:63-80).
    */
  def df(schema: String, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  def wrangle(recipe: String, input: DataFrame): DataFrame =
    Wrangle.recipe(recipe).apply(input)

  def strings(d: DataFrame, col: String): Seq[Any] =
    d.select(col).collect().map(r => r.get(0)).toSeq
}
