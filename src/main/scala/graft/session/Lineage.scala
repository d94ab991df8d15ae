package graft.session

import graft.api.{DirectiveSpec, TCol, TList}

/** Field-level lineage extracted from the compiled recipe AST —
  * Spark-native counterpart of the reference's per-directive `lineage()`
  * Mutations (reference: wrangler-api api/lineage/Mutation.java,
  * wrangler-core lineage/LineageOperations.java:63).
  *
  * Because our plan is declarative we derive relations from the
  * DirectiveSpec list statically; no executor involvement.
  */
object Lineage {

  sealed trait Relation
  final case class Creates(directive: String, column: String) extends Relation
  final case class Drops(directive: String, column: String) extends Relation
  final case class Modifies(directive: String, column: String) extends Relation
  final case class Renames(directive: String, from: String, to: String) extends Relation
  final case class Reads(directive: String, column: String) extends Relation

  /** Relations per directive, in recipe order. */
  def relations(specs: Seq[DirectiveSpec]): Seq[Relation] = specs.flatMap { s =>
    def c(i: Int) = s.col(i)
    s.name match {
      case "drop" => s.cols(0).map(Drops(s.name, _))
      case "keep" => s.cols(0).map(Reads(s.name, _))
      case "rename" | "swap" => Seq(Renames(s.name, c(0), c(1)))
      case "copy" => Seq(Reads(s.name, c(0)), Creates(s.name, c(1)))
      case "merge" => Seq(Reads(s.name, c(0)), Reads(s.name, c(1)), Creates(s.name, c(2)))
      case "set-column" | "set-variable" => Seq(Creates(s.name, c(0)))
      case "set-type" | "uppercase" | "lowercase" | "titlecase" | "trim" |
           "ltrim" | "rtrim" | "url-encode" | "url-decode" | "hash" |
           "mask-number" | "mask-shuffle" | "fill-null-or-empty" |
           "find-and-replace" | "format-date" | "format-datetime" |
           "parse-as-simple-date" | "parse-as-datetime" | "parse-timestamp" |
           "set-charset" =>
        Seq(Modifies(s.name, c(0)))
      case "split-to-columns" | "extract-regex-groups" | "parse-as-csv" |
           "parse-as-json" | "parse-as-fixed-length" | "split-email" |
           "split-url" | "stemming" =>
        Seq(Reads(s.name, c(0)))
      case "cut-character" | "json-path" | "xpath" | "xpath-array" =>
        Seq(Reads(s.name, c(0)), Creates(s.name, c(1)))
      case "quantize" | "parse-as-currency" | "format-as-currency" =>
        Seq(Reads(s.name, c(0)), Creates(s.name, c(1)))
      case "diff-date" | "text-distance" | "text-metric" =>
        Seq(Reads(s.name, c(0)), Reads(s.name, c(1)), Creates(s.name, c(2)))
      case _ => Seq.empty
    }
  }

  /** Render as rows (directive, relation, column, detail) for export. */
  def toRows(specs: Seq[DirectiveSpec]): Seq[(String, String, String, String)] =
    relations(specs).map {
      case Creates(d, col)     => (d, "create", col, "")
      case Drops(d, col)       => (d, "drop", col, "")
      case Modifies(d, col)    => (d, "modify", col, "")
      case Renames(d, f, t)    => (d, "rename", f, t)
      case Reads(d, col)       => (d, "read", col, "")
    }
}
