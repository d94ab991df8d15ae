package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink convenience surface — the Spark-native stand-in for the
  * reference's connection handlers + format detection
  * (reference: wrangler-service service/FileTypeDetector.java and the
  * s3/gcs/bigquery/kafka/... handlers — at-scale IO here is just
  * `spark.read/write` against whatever filesystem the cluster mounts).
  */
object Sources {

  /** Extension-based format detection, mirroring FileTypeDetector's
    * behavior of keying on the file suffix.
    */
  def detectFormat(path: String): String = {
    val lower = path.toLowerCase.stripSuffix("/")
    val name = lower.substring(lower.lastIndexOf('/') + 1)
    name.substring(name.lastIndexOf('.') + 1) match {
      case "csv"             => "csv"
      case "tsv"             => "tsv"
      case "json" | "jsonl" | "ndjson" => "json"
      case "parquet" | "pq"  => "parquet"
      case "orc"             => "orc"
      case "txt" | "log"     => "text"
      case "avro"            => "avro"
      case _                 => "parquet" // directories default to parquet
    }
  }

  /** Read with auto-detected format and sane defaults. */
  def auto(spark: SparkSession, path: String): DataFrame =
    detectFormat(path) match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "tsv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("sep", "\t").csv(path)
      case "json"    => spark.read.json(path)
      case "orc"     => spark.read.orc(path)
      case "text"    => spark.read.text(path)
      case "avro"    => spark.read.format("avro").load(path) // needs spark-avro module
      case _         => spark.read.parquet(path)
    }

  /** Write with format keyed on the target extension. */
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    detectFormat(path) match {
      case "csv"  => df.write.mode(mode).option("header", "true").csv(path)
      case "tsv"  => df.write.mode(mode).option("header", "true")
        .option("sep", "\t").csv(path)
      case "json" => df.write.mode(mode).json(path)
      case "orc"  => df.write.mode(mode).orc(path)
      case "text" => df.write.mode(mode).text(path)
      case _      => df.write.mode(mode).parquet(path)
    }
}
