package graft.ops

import graft.api._
import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-pipeline directives: the dedup/text-analysis surface exposed in
  * recipe syntax, so cleaning recipes can mix classic wrangling with
  * training-data curation (`dedup-exact :text :doc_id; lang-id :text;`).
  */
object LlmOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    case "dedup-exact" => ColumnOps.simple(spec) { df =>
      Dedup.exact(df, spec.col(0), spec.col(1))
    }

    case "dedup-minhash" => ColumnOps.simple(spec) { df =>
      Dedup.minhashDedup(df, spec.col(0), spec.col(1),
        threshold = spec.optStr(2).map(_.toDouble).getOrElse(0.7))
    }

    case "lang-id" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_lang", TextAnalysis.langId(col(spec.col(0))))
    }

    case "token-count" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_tokens",
        TextAnalysis.tokenCount(col(spec.col(0))))
    }

    case "quality-score" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_quality",
        TextAnalysis.qualityScore(col(spec.col(0))))
    }

    case "fingerprint" => ColumnOps.simple(spec) { df =>
      df.withColumn(s"${spec.col(0)}_fingerprint",
        TextAnalysis.fingerprint(col(spec.col(0))))
    }

    case _ => null
  })
}
