package graft.ops

import graft.api._
import org.apache.spark.sql.functions._

/** Output-formatter directives (SURVEY §2.2) — serialize the row (or a
  * column subset) into a single string column, natively via
  * `to_csv`/`to_json` over `struct(*)`.
  */
object WriterOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // whole row → CSV line in col (reference: wrangler-core
    // directives/writer/WriteAsCSV.java:74)
    case "write-as-csv" => ColumnOps.simple(spec) { df =>
      val user = PipeState.userCols(df)
      df.withColumn(spec.col(0),
        to_csv(struct(user.map(col).toSeq: _*)))
    }

    // whole row → JSON object string (reference: wrangler-core
    // directives/writer/WriteAsJsonMap.java:73)
    case "write-as-json-map" => ColumnOps.simple(spec) { df =>
      val user = PipeState.userCols(df)
      df.withColumn(spec.col(0),
        to_json(struct(user.map(col).toSeq: _*)))
    }

    // selected cols → JSON object in dest (reference: wrangler-core
    // directives/writer/WriteAsJsonObject.java:78)
    case "write-as-json-object" => ColumnOps.simple(spec) { df =>
      val dest = spec.col(0)
      val src = spec.cols(1)
      df.withColumn(dest, to_json(struct(src.map(col): _*)))
    }

    case _ => null
  })
}
