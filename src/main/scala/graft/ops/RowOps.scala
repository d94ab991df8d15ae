package graft.ops

import graft.api._
import graft.expr.ExprCompiler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level directives: filters, error channel, explodes (SURVEY §2.4).
  *
  * Filters compile to native predicates so Catalyst pushes them into the
  * parquet scan; the error channel is a DAG branch (filter + anti-filter)
  * rather than a per-row try/catch.
  */
object RowOps {

  /** Directives that need the hidden original-row column attached. */
  val needsOrig: Set[String] =
    Set("send-to-error", "send-to-error-and-continue")

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // `filter-row <cond> <true|false>`: true ⇒ DROP matching rows
    // (reference: wrangler-core directives/row/RecordConditionFilter.java:90-108
    //  — keeps the row when !result)
    case "filter-row" | "filter-row-if-true" | "filter-row-if-false" |
         "filter-rows-on" =>
      val (condSrc, dropWhenTrue) = spec.name match {
        case "filter-row"          => (spec.expr(0), spec.optBool(1, default = true))
        case "filter-row-if-true"  => (spec.rawFrom(0), true)
        case "filter-row-if-false" => (spec.rawFrom(0), false)
        case _ => // v1 `filter-rows-on condition-true <expr>` etc.
          spec.str(0).toLowerCase match {
            case "condition-true"  => (spec.rawFrom(1), true)
            case "condition-false" => (spec.rawFrom(1), false)
            case "regex-match" =>
              return Some(regexFilter(spec.col(1), spec.str(2), dropMatching = true, spec))
            case "regex-not-match" =>
              return Some(regexFilter(spec.col(1), spec.str(2), dropMatching = false, spec))
            case "empty-or-null-columns" =>
              return Some(emptyOrNullFilter(spec.cols(1), spec))
            case o => throw new RecipeException(s"filter-rows-on: unknown mode $o")
          }
      }
      val cond = ExprCompiler.compile(condSrc)
      // plain (un-coalesced) predicates so parquet pushdown applies; a
      // null condition drops the row in both modes — the reference's
      // strict JEXL errors such rows out of the main output too
      ColumnOps.simple(spec) { df =>
        if (dropWhenTrue) df.filter(!cond) else df.filter(cond)
      }

    // `filter-by-regex if-matched <col> <regex>` — full-string anchored
    // match, because the reference uses Matcher.matches()
    // (reference: wrangler-core directives/row/RecordRegexFilter.java:68-83)
    case "filter-by-regex" =>
      regexFilter(spec.col(1), spec.str(2),
        dropMatching = spec.str(0).toLowerCase != "if-not-matched", spec)
    case "filter-row-if-matched" =>
      regexFilter(spec.col(0), spec.str(1), dropMatching = true, spec)
    case "filter-row-if-not-matched" =>
      regexFilter(spec.col(0), spec.str(1), dropMatching = false, spec)

    // drops a row only when EVERY listed column is null — empty string is
    // deliberately NOT dropped, matching the reference implementation
    // (reference: wrangler-core directives/row/RecordMissingOrNullFilter.java:73-85;
    //  its missing-column row-duplication quirk is NOT replicated — we
    //  treat a missing column as "not null present" and keep the row once)
    case "filter-empty-or-null" => emptyOrNullFilter(spec.cols(0), spec)

    // abort the run when the condition holds for any row
    // (reference: wrangler-core directives/row/Fail.java:81)
    case "fail" =>
      val cond = ExprCompiler.compile(spec.expr(0))
      ColumnOps.simple(spec) { df =>
        df.filter(
          assert_true(!coalesce(cond, lit(false)),
            lit(s"fail: condition [${spec.expr(0)}] triggered")).isNull)
      }

    // error side-channel: matching rows leave the main branch and land in
    // the errors output carrying the ORIGINAL input row
    // (reference: wrangler-core directives/row/SendToError.java:99,
    //  executor/RecipePipelineExecutor.java:133-137)
    case "send-to-error" => errorOp(spec, terminateRow = true)
    case "send-to-error-and-continue" => errorOp(spec, terminateRow = false)

    // multi-column zip-explode: arrays zip to the longest (null-padded),
    // scalars repeat (reference: wrangler-core directives/row/Flatten.java:92-155)
    case "flatten" => ColumnOps.simple(spec) { df =>
      val cols = spec.cols(0)
      val arrayCols = cols.filter(c =>
        df.schema(df.schema.fieldIndex(c)).dataType.isInstanceOf[ArrayType])
      if (arrayCols.isEmpty) df
      else if (arrayCols.size == 1 && cols.size == 1) {
        val c = cols.head
        // preserve column order while replacing values by exploded elems
        df.withColumn(c, explode_outer(col(c)))
      } else {
        val zipped = "__graft_zip"
        val maxLen = greatest(arrayCols.map(c => size(col(c))): _*)
        val asArrays = cols.map { c =>
          if (arrayCols.contains(c)) col(c).as(c)
          else array_repeat(col(c), maxLen).as(c)
        }
        df.withColumn(zipped, explode_outer(arrays_zip(asArrays: _*)))
          .select(df.columns.map { c =>
            if (cols.contains(c)) col(zipped).getField(c).as(c) else col(c)
          }.toSeq: _*)
      }
    }

    // split string → one row per part
    // (reference: wrangler-core directives/row/SplitToRows.java:75)
    case "split-to-rows" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, explode(split(col(c), spec.str(1))))
    }

    // (reference: wrangler-core directives/row/SetRecordDelimiter.java:82)
    case "set-record-delim" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val delim = spec.str(1)
      val limited = spec.tokens.drop(2).collectFirst { case TNum(n) => n.toInt }
      val parts = split(col(c), java.util.regex.Pattern.quote(delim))
      val sliced = limited.map(l => slice(parts, 1, l)).getOrElse(parts)
      df.withColumn(c, explode(sliced))
    }

    // deterministic content-keyed sampling: the keep decision is a pure
    // function of the key (md5 range test), so the sample is identical
    // across partitioning, retries, and cluster sizes — see
    // session.Sampler.consistent
    case "sample-by-hash" => ColumnOps.simple(spec) { df =>
      graft.session.Sampler.consistent(df, spec.col(0),
        spec.str(1).toDouble, salt = spec.optStr(2).getOrElse(""))
    }

    // `sample-weighted :key :group 'web:0.5,books:1.0' [default] [salt]`
    // — per-group sampling rates (data mixing): each group contributes
    // its own stable hash-range fraction of the corpus
    case "sample-weighted" => ColumnOps.simple(spec) { df =>
      graft.session.Sampler.weightedByGroup(df, spec.col(0), spec.col(1),
        parseFractions(spec.name, spec.str(2)),
        default = spec.optStr(3).map(_.toDouble).getOrElse(1.0),
        salt = spec.optStr(4).getOrElse(""))
    }

    // `repartition-output [targetMB]` — size the output layout so each
    // written file lands near the target (default 128 MB): coalesce
    // when shrinking (narrow), repartition only when growing; row
    // content untouched (sources.Sources.repartitionForOutput)
    case "repartition-output" => ColumnOps.simple(spec) { df =>
      graft.sources.Sources.repartitionForOutput(df,
        targetBytes = spec.optStr(0).map(_.toLong * 1024 * 1024)
          .getOrElse(128L * 1024 * 1024))
    }

    // `sample-temperature :key :group [alpha] [frac] [salt]` — p∝n^α
    // source mixing: per-group keep rates sized from group counts so
    // the expected kept fraction is `frac`, α up-weighting small
    // sources (session.Sampler.temperatureMix)
    case "sample-temperature" => ColumnOps.simple(spec) { df =>
      graft.session.Sampler.temperatureMix(df, spec.col(0), spec.col(1),
        alpha = spec.optStr(2).map(_.toDouble).getOrElse(0.5),
        targetFrac = spec.optStr(3).map(_.toDouble).getOrElse(0.25),
        salt = spec.optStr(4).getOrElse(""))
    }

    // `sample-mixture :key :group 'en:0.6,code:0.4' <budgetTokens>
    //  :tokens [maxEpochs] [salt]` — target-proportion mixing over a
    // token budget with epoch oversampling: a group whose target
    // exceeds its supply is REPEATED (floor(rate) copies + one keyed
    // fractional draw), appending a 1-based `epoch` column
    // (session.Sampler.mixtureByBudget)
    case "sample-mixture" => ColumnOps.simple(spec) { df =>
      graft.session.Sampler.mixtureByBudget(df, spec.col(0), spec.col(1),
        parseFractions(spec.name, spec.str(2)),
        budgetTokens = spec.num(3).toLong,
        tokenCol = spec.col(4),
        maxEpochs = spec.optStr(5).map(_.toDouble).getOrElse(4.0),
        salt = spec.optStr(6).getOrElse(""))
    }

    // `hash-split :key train:0.9,val:0.05,test:0.05 [salt] [outcol]` —
    // disjoint named subsets by hash range, each individually stable
    case "hash-split" => ColumnOps.simple(spec) { df =>
      graft.session.Sampler.hashSplit(df, spec.col(0),
        parseFractions(spec.name, spec.str(1)),
        salt = spec.optStr(2).getOrElse(""),
        outCol = spec.optStr(3).getOrElse("split"))
    }

    // transient variables become plain columns: a per-record variable is
    // exactly a derived column in a set-based engine. Cross-row
    // (order-dependent) usage is undefined distributed — same caveat as
    // the reference on Spark/MR (reference: wrangler-core
    // directives/aggregates/SetTransientVariable.java:82, SURVEY §4.3)
    case "set-variable" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(0), ExprCompiler.compile(spec.rawFrom(1)))
    }

    case "increment-variable" => ColumnOps.simple(spec) { df =>
      // Running conditional sum in input order, WITHOUT a global
      // unpartitioned window (which would move the whole dataset to a
      // single task): two-phase scan — per-partition partial sums are
      // collected to the driver (one row per partition, bounded), turned
      // into exclusive prefix offsets, and added to a within-partition
      // cumulative sum. The window is partitioned by spark_partition_id,
      // so every task scans only its own partition.
      // Order-dependence caveat unchanged (input order = partition order,
      // same as the reference on a distributed runner — SURVEY §4.3).
      import org.apache.spark.sql.expressions.Window
      val cond = ExprCompiler.compile(spec.rawFrom(2))
      val step = spec.num(1).toLong
      val stepCol = when(coalesce(cond, lit(false)), step).otherwise(0L)
      val pidC = "__graft_iv_pid"
      val ridC = "__graft_iv_rid"
      // pid/rid are assigned by physical placement, so the partials job
      // and the final windowed job MUST observe the same assignment.
      // A stable-layout upstream (file scan + narrow deterministic ops
      // — PlanStability) re-derives the identical assignment on every
      // evaluation, so both jobs stream straight off the scan with no
      // materialization. Only an unstable upstream (post-shuffle,
      // sample, nondeterministic expression) could hand the two jobs
      // different pid/rid layouts and misalign the offsets — there
      // localCheckpoint pins it. (At-scale alternatives for the
      // unstable path are documented in PERF.md.)
      val tagged = {
        val t = df.withColumn(pidC, spark_partition_id())
          .withColumn(ridC, monotonically_increasing_id())
        if (PlanStability.stableLayout(df)) t else PlanStability.pin(t)
      }
      // one row per partition — bounded driver-side work
      val partials = tagged.groupBy(col(pidC)).agg(sum(stepCol).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      // exclusive prefix: each partition's offset = sum of all prior ones
      val offsets: Map[Int, Long] = {
        var acc = 0L
        partials.map { case (pid, s) => val o = pid -> acc; acc += s; o }.toMap
      }
      val offCol =
        if (offsets.isEmpty) lit(0L)
        else coalesce(element_at(typedLit(offsets), col(pidC)), lit(0L))
      val w = Window.partitionBy(col(pidC)).orderBy(col(ridC))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn(spec.col(0), sum(stepCol).over(w) + offCol)
        .drop(pidC, ridC)
    }

    case _ => null
  })

  private def regexFilter(c: String, regex: String, dropMatching: Boolean,
      spec: DirectiveSpec): PipeOp = {
    // regex literal "null"/empty ⇒ match-nothing no-op pattern
    // (reference: wrangler-core directives/row/RecordRegexFilter.java:79-83)
    val noop = regex == null || regex.isEmpty || regex == "null"
    ColumnOps.simple(spec) { df =>
      if (noop) df
      else {
        val matched = col(c).cast(StringType).rlike(s"^(?:$regex)$$")
        if (dropMatching) df.filter(!coalesce(matched, lit(false)))
        else df.filter(coalesce(matched, lit(false)))
      }
    }
  }

  private def emptyOrNullFilter(cols: Seq[String], spec: DirectiveSpec): PipeOp =
    ColumnOps.simple(spec) { df =>
      val present = cols.filter(c => df.columns.exists(_.equalsIgnoreCase(c)))
      if (present.isEmpty) df
      else df.filter(present.map(c => col(c).isNotNull).reduce(_ || _))
    }

  private def errorOp(spec: DirectiveSpec, terminateRow: Boolean): PipeOp = {
    val condSrc = spec.expr(0)
    val message = spec.optStr(2).orElse(spec.optStr(1))
      .getOrElse(s"condition [$condSrc] triggered")
    new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = {
        val cond = coalesce(ExprCompiler.compile(condSrc), lit(false))
        val errDf = st.df.filter(cond).select(
          lit(spec.name).as("directive"),
          lit(message).as("message"),
          col(PipeState.OrigCol).as("row"))
        val main = if (terminateRow) st.df.filter(!cond) else st.df
        PipeState(main, st.errors :+ errDf, st.hasOrig)
      }
    }
  }

  /** Parse a `name:frac,name:frac` list with a directive-scoped error
    * instead of a bare MatchError on a malformed entry.
    */
  private def parseFractions(directive: String, raw: String): Seq[(String, Double)] =
    raw.split(",").toSeq.map { part =>
      part.trim.split(":") match {
        case Array(name, frac) =>
          val f = frac.toDoubleOption.getOrElse(throw new RecipeException(
            s"$directive: '$frac' is not a number in '$part'"))
          name -> f
        case _ => throw new RecipeException(
          s"$directive: expected name:fraction, got '$part'")
      }
    }
}
