package graft.session

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the Spark-native equivalent of the reference's
  * BasicStatistics + chlorine semantic-type detection
  * (reference: wrangler-core statistics/BasicStatistics.java:36-83,
  * service `/summary` endpoint DirectivesHandler.java:654-658).
  *
  * One aggregation pass over the data produces, per column: null/empty/
  * non-null frequencies and semantic-type frequencies (email, URL, IP,
  * credit-card, date, phone, zip) via the same regex classifiers as the
  * dq: namespace. Single job, map-side combine — no per-column scans.
  */
object Profiler {

  val semanticRegexes: Seq[(String, String)] = Seq(
    "email" -> "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$",
    "url" -> "^(https?|ftp)://[^\\s/$.?#].[^\\s]*$",
    "ipv4" -> "^((25[0-5]|2[0-4]\\d|[01]?\\d?\\d)\\.){3}(25[0-5]|2[0-4]\\d|[01]?\\d?\\d)$",
    "credit_card" -> "^\\d{13,19}$",
    "date" -> "^\\d{4}-\\d{2}-\\d{2}$",
    "phone" -> "^\\+?[0-9. ()-]{7,15}$",
    "zip" -> "^\\d{5}(-\\d{4})?$")

  /** Wide single-pass stats: one output row, 3+K cells per column. */
  private def aggExprs(df: DataFrame): Seq[Column] =
    df.columns.toSeq.flatMap { c =>
      val s = col(c).cast(StringType)
      Seq(
        count(lit(1)).as(s"${c}__total"),
        count(when(col(c).isNull, 1)).as(s"${c}__null"),
        count(when(s === "", 1)).as(s"${c}__empty")) ++
        semanticRegexes.map { case (name, re) =>
          count(when(regexp_like(s, lit(re)), 1)).as(s"${c}__$name")
        }
    }

  /** Long-format profile: (column, measure, count, fraction). */
  def profile(df: DataFrame): DataFrame = {
    val aggs = aggExprs(df)
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val measures = Seq("total", "null", "empty") ++ semanticRegexes.map(_._1)
    val stacked = df.columns.toSeq.flatMap { c =>
      measures.map { m =>
        struct(lit(c).as("column"), lit(m).as("measure"),
          col(s"${c}__$m").as("count"),
          round(col(s"${c}__$m").cast(DoubleType) /
            greatest(col(s"${c}__total"), lit(1L)), 6).as("fraction"))
      }
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Numeric column stats, one aggregation pass, long format:
    * (column, n, nulls, min, max, mean) — the BasicStatistics numeric
    * block. Values rounded to 4 decimals so results are stable across
    * partial-aggregation orders (float addition isn't associative).
    */
  def numericProfile(df: DataFrame): DataFrame = {
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    require(numCols.nonEmpty, "numericProfile: no numeric columns")
    val exprs = numCols.flatMap { c =>
      val d = col(c).cast(DoubleType)
      Seq(count(d).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        round(min(d), 4).as(s"${c}__min"),
        round(max(d), 4).as(s"${c}__max"),
        round(avg(d), 4).as(s"${c}__mean"))
    }
    val wide = df.agg(exprs.head, exprs.tail: _*)
    val stacked = numCols.map { c =>
      struct(lit(c).as("column"), col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("nulls"), col(s"${c}__min").as("min"),
        col(s"${c}__max").as("max"), col(s"${c}__mean").as("mean"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Approximate quantiles + distinct counts for numeric columns — the
    * sketch-based path for 100 TB profiling (t-digest/HLL style
    * mergeable sketches, constant memory per column; never exact sorts).
    */
  def approxNumericProfile(df: DataFrame,
      probabilities: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    require(numCols.nonEmpty, "approxNumericProfile: no numeric columns")
    val probArr = array(probabilities.map(lit): _*)
    val exprs = numCols.flatMap { c =>
      val d = col(c).cast(DoubleType)
      Seq(approx_count_distinct(d).as(s"${c}__distinct"),
        percentile_approx(d, probArr, lit(10000)).as(s"${c}__q"))
    }
    val wide = df.agg(exprs.head, exprs.tail: _*)
    val stacked = numCols.map { c =>
      struct(lit(c).as("column"), col(s"${c}__distinct").as("approx_distinct"),
        col(s"${c}__q").as("quantiles"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Per-column STORED sketches — the profile-once / merge-later
    * artifact: one row per column with the serialized HLL (distinct)
    * and, for numerics, KLL (quantiles) sketches as binary columns.
    * Persist the output per partition/day/source; later profiles union
    * via [[mergeSketchProfiles]] without re-reading raw data. All
    * sketches build in ONE pass over the frame.
    */
  def sketchProfile(df: DataFrame, hllP: Int = 12, kllK: Int = 200): DataFrame = {
    import org.apache.spark.sql.graftx.Sketches
    val cols = df.schema.fields.map(_.name).toSeq
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSet
    require(cols.nonEmpty, "sketchProfile: empty schema")
    val aggs = cols.flatMap { c =>
      Seq(Sketches.hllSketch(col(c), hllP).as(s"__hll_$c")) ++
        (if (numeric(c))
          Seq(Sketches.kllSketchBinary(col(c).cast(DoubleType), kllK)
            .as(s"__kll_$c"))
        else Nil)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__hll_$c").as("hll"),
        (if (numeric(c)) col(s"__kll_$c") else lit(null).cast("binary"))
          .as("kll"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Union stored sketch-profile rows (from [[sketchProfile]] runs over
    * different slices) into one profile per column, with readable
    * figures: approx distinct from the merged HLL, quantiles from the
    * merged KLL.
    */
  def mergeSketchProfiles(profiles: DataFrame,
      probabilities: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    import org.apache.spark.sql.graftx.Sketches
    profiles.groupBy(col("column"))
      .agg(Sketches.hllUnion(col("hll")).as("__h"),
        Sketches.kllMerge(col("kll")).as("__k"))
      .select(col("column"),
        Sketches.hllEstimate(col("__h")).as("approx_distinct"),
        Sketches.kllQuantilesOf(col("__k"), probabilities).as("quantiles"))
  }

  /** Population Stability Index between a current frame and a baseline
    * over one numeric column: fixed-width bins derived from the
    * BASELINE's min/max (out-of-range current values clamp into the
    * edge bins), per-bin population fractions on both sides, and the
    * standard PSI term `(p - q) * ln(p / q)` with `eps` flooring so
    * empty bins stay finite. Rule of thumb: Σ psi_term < 0.1 stable,
    * 0.1–0.25 moderate drift, > 0.25 action.
    *
    * Scale shape: one bounded 2-value stats action on the baseline
    * (min/max), then each side is a map-only bin projection + a
    * `bins`-row aggregate; the per-bin frames (≤ bins rows) broadcast
    * onto a `spark.range(bins)` spine. Totals are two bounded 1-value
    * collects folded in as literals — nothing row-scaled ever reaches
    * the driver and nothing shuffles but the two tiny count exchanges.
    */
  def psiDrift(current: DataFrame, baseline: DataFrame, column: String,
      bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2 && bins <= 100000, s"psiDrift: bins=$bins outside [2, 100000]")
    val v = col(column).cast(DoubleType)
    val Array(lo, hi) = baseline.agg(min(v), max(v)).head() match {
      case r if r.isNullAt(0) =>
        throw new IllegalArgumentException(s"psiDrift: baseline '$column' is all null")
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    require(hi > lo, s"psiDrift: degenerate baseline range [$lo, $hi]")

    def binCounts(df: DataFrame): DataFrame = df
      .where(v.isNotNull)
      .select(least(greatest(
          floor((v - lit(lo)) * bins / lit(hi - lo)), lit(0.0)),
        lit(bins - 1.0)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))

    val cur = binCounts(current)
    val base = binCounts(baseline)
    // bounded collects: one long each (the documented literal-fold
    // pattern; a dummy-key join would constant-fold to a nested loop)
    def total(df: DataFrame, side: String): Double = {
      val r = df.agg(sum(col("c"))).head()
      if (r.isNullAt(0) || r.getLong(0) == 0L)
        throw new IllegalArgumentException(
          s"psiDrift: $side side has no non-null '$column' values")
      r.getLong(0).toDouble
    }
    val tCur = total(cur, "current")
    val tBase = total(base, "baseline")

    spark(current).range(bins).select(col("id").cast("int").as("bin"))
      .join(broadcast(cur.withColumnRenamed("c", "cc")), Seq("bin"), "left")
      .join(broadcast(base.withColumnRenamed("c", "cb")), Seq("bin"), "left")
      .select(col("bin"),
        greatest(coalesce(col("cc"), lit(0L)) / tCur, lit(eps)).as("p"),
        greatest(coalesce(col("cb"), lit(0L)) / tBase, lit(eps)).as("q"))
      .select(col("bin"),
        round(col("p"), 6).as("frac_current"),
        round(col("q"), 6).as("frac_baseline"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi_term"))
  }

  private def spark(df: DataFrame) = df.sparkSession
}

/** Workspace sampling strategies (reference: wrangler-core
  * sampling/{Bernoulli,Poisson,Reservoir}.java, chosen via
  * wrangler-service SamplingMethod.java:27-30 — first|poisson|bernoulli|
  * reservoir).
  */
object Sampler {
  def first(df: DataFrame, n: Int): DataFrame = df.limit(n)

  def bernoulli(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  def poisson(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = true, fraction, seed)

  /** Per-group weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis A-ES): each row draws key = u^(1/w) with u a pure md5
    * function of its id — deterministic across retries, partitionings
    * and cluster sizes, exactly like [[byHash]] — and each group keeps
    * its k largest keys through the bounded-heap aggregate (≤ k rows
    * per group per map partition cross the shuffle; no per-group sort).
    * Rows with null/non-positive weight are excluded. Returns
    * (group, rank, item) with item = id as string.
    */
  def weightedTopKByGroup(df: DataFrame, groupCol: String, weightCol: String,
      idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftx.Sketches
    // 13 hex chars = 52 uniform bits; +1 keeps u in (0, 1]
    val u = (conv(substring(md5(
        coalesce(col(idCol).cast(StringType), lit(""))), 1, 13), 16, 10)
      .cast("long") + 1).cast(DoubleType) / lit(4503599627370496.0)
    val key = pow(u, lit(1.0) / col(weightCol).cast(DoubleType))
    df.where(col(weightCol).cast(DoubleType) > 0)
      .groupBy(col(groupCol))
      .agg(Sketches.topKBy(key, col(idCol).cast(StringType), k).as("__s"))
      .select(col(groupCol), posexplode(col("__s")).as(Seq("rank", "e")))
      .select(col(groupCol), col("rank"), col("e.item").as("item"))
  }

  /** Uniform fixed-size sample via distributed reservoir (takeSample). */
  def reservoir(df: DataFrame, n: Int, seed: Long = 42L): DataFrame = {
    val rows = df.rdd.takeSample(withReplacement = false, n, seed)
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows.toSeq), df.schema)
  }

  // ---- position-INDEPENDENT (keyed) forms of the three seeded
  // samplers. The seeded forms above mirror the reference's workspace
  // samplers (per-row RNG draws), but a draw tied to row POSITION
  // changes under repartitioning, task retry, AQE re-planning, or a
  // different cluster size — at 100 TB that means a sample that cannot
  // be reproduced and an oracle that only holds at one pinned layout.
  // The keyed forms make the draw a pure function of (key, seed) via
  // the md5 hash-point machinery of [[consistent]], so the sample is
  // bit-stable at any scale and the expected output is plain SQL.

  /** Keyed Bernoulli: keep a row iff md5(key ++ "#bern<seed>") lands in
    * the first `fraction` of hash space — [[consistent]] with the seed
    * folded into the salt, so distinct seeds draw independent samples.
    */
  def bernoulliByKey(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    consistent(df, keyCol, fraction, salt = s"#bern$seed")

  /** Cumulative-CDF hex thresholds for Poisson(lambda): element k is
    * [[hexThreshold]](P(X <= k)), ending at the first k whose CDF is
    * within 1e-15 of 1 (beyond it the remaining mass is below the
    * 128-bit hash resolution). Public so the DuckDB oracle can embed
    * the bit-identical literals in a CASE ladder.
    */
  def poissonCdfThresholds(lambda: Double): Seq[String] = {
    require(lambda > 0 && lambda < 30,
      s"poisson lambda must be in (0, 30), got $lambda")
    val buf = Seq.newBuilder[String]
    var p = math.exp(-lambda)
    var cdf = p
    var k = 0
    while (cdf < 1.0 - 1e-15 && k < 64) {
      buf += hexThreshold(cdf)
      k += 1
      p = p * lambda / k
      cdf += p
    }
    buf.result()
  }

  /** Keyed Poisson (with-replacement) sample: each key's multiplicity
    * is the inverse Poisson(fraction) CDF evaluated at its hash point —
    * m = #{k : hash >= threshold_k} over [[poissonCdfThresholds]] —
    * and rows are replicated m times by a generator. Map-only plus
    * explode; like the Bernoulli form the multiplicity is a pure
    * function of (key, seed). Requires keys to be distinct for the
    * "independent draws" reading (duplicate keys draw identically).
    */
  def poissonByKey(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    val h = hashPoint(keyCol, s"#pois$seed")
    val m = poissonCdfThresholds(fraction)
      .map(t => when(h >= lit(t), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("__m", m)
      .filter(col("__m") > 0)
      .withColumn("__i", explode(sequence(lit(1), col("__m"))))
      .drop("__m", "__i")
  }

  /** Keyed fixed-size uniform sample: the n rows whose hash points are
    * smallest — a single distributed TakeOrderedAndProject pass
    * (per-partition top-n partials, n rows to the driver) instead of
    * [[reservoir]]'s count()-then-sample double scan, and reproducible
    * on any cluster at any scale. Keys should be distinct: a hash tie
    * at the cut line is broken arbitrarily.
    */
  def reservoirByKey(df: DataFrame, keyCol: String, n: Int,
      seed: Long = 42L): DataFrame =
    df.withColumn("__h", hashPoint(keyCol, s"#resv$seed"))
      .orderBy(col("__h")).limit(n).drop("__h")

  /** Deterministic content-keyed sampling: keep a row iff
    * md5(key ++ salt) falls in the first `fraction` of the 128-bit
    * hash space. The comparison is lexicographic on the fixed-width
    * lowercase hex digest, which is monotone with its numeric value,
    * so the filter is a single codegen'd string compare over the scan.
    *
    * Unlike `bernoulli` (seeded rand() — the draw depends on row
    * position, so it changes under repartitioning, task retry, AQE
    * re-planning, or a different cluster size), the decision here is a
    * pure function of the KEY: the same row is kept on every run, on
    * any cluster, at any scale — the only sampling form that yields
    * reproducible subsets of a 100 TB corpus, and the standard way to
    * cut stable experiment slices. A non-empty `salt` re-draws the
    * sample without touching the keys. Null keys hash as the empty
    * string (kept or dropped deterministically, never silently null'd
    * out of the filter).
    */
  def consistent(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(keepFraction(hashPoint(keyCol, salt), fraction))

  /** Strict `<` against floor(fraction*2^128) — except fraction >= 1.0,
    * which short-circuits to true: the threshold caps at 2^128-1 (the
    * all-f digest), and a strict compare there would drop a key hashing
    * to exactly "ff…f" even at "keep everything" weight.
    */
  private def keepFraction(h: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true) else h < lit(hexThreshold(fraction))

  /** Assign each row to a named split (train/val/test, …) by where its
    * key's hash lands among cumulative `fraction` ranges — the
    * hash-partitioned counterpart of `consistent` for carving one
    * corpus into disjoint, individually-stable subsets. Fractions must
    * sum to 1 (±1e-6); the last split absorbs the rounding tail so
    * every row is assigned.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: String = "",
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "hashSplit: at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-6,
      s"hashSplit: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = hashPoint(keyCol, salt)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), upper), rest) =>
      when(keepFraction(h, upper), lit(name)).otherwise(rest)
    }
    df.withColumn(outCol, assigned)
  }

  /** Per-group sampling rates over one corpus — the data-mixing
    * primitive: each row keeps iff its key's hash point falls inside
    * ITS group's fraction (a source at weight 1.0 passes whole, one at
    * 0.25 contributes a quarter). Same key-pure hash as `consistent`,
    * so every group's subset is individually stable and nested across
    * weight changes; groups absent from `weights` use `default`.
    */
  def weightedByGroup(df: DataFrame, keyCol: String, groupCol: String,
      weights: Seq[(String, Double)], default: Double = 1.0,
      salt: String = ""): DataFrame = {
    val h = hashPoint(keyCol, salt)
    val pred = weights.foldRight(
      keepFraction(h, default)) { case ((g, f), rest) =>
      when(col(groupCol) === lit(g), keepFraction(h, f)).otherwise(rest)
    }
    df.filter(pred)
  }

  /** Temperature-based source mixing (the `p_g ∝ n_g^α` resampling rule
    * published with multi-corpus LM training mixes): group g keeps a
    * rate r_g = min(1, c·n_g^α / n_g) with c chosen so the expected
    * kept row count is `targetFrac` of the corpus — α=1 keeps natural
    * proportions, α=0 equalizes sources, in between up-weights small
    * sources. One tiny count-per-group job sizes the rates on the
    * driver (group cardinality is bounded — same contract as the
    * IVF/k-means driver step); the corpus pass is then a map-only
    * hash-range filter, stable under repartition/retry like
    * [[consistent]].
    *
    * Oracle-exactness: rates are computed in deterministic
    * sorted-group order, α=0.5 routes through IEEE-correctly-rounded
    * sqrt, the rate is rounded to 6 decimals, and the keep compare is
    * a 60-bit integer test (`first 15 md5 hex < floor(r6·2^60)` —
    * the 2^60 scaling is exponent-only, exact in double), so an
    * engine recomputing the same formula in SQL reproduces the kept
    * set bit-for-bit. Rows whose group is NULL are dropped (they have
    * no rate); the one-shot min(1,·) cap means over-full small groups
    * under-deliver the target slightly rather than re-normalizing
    * iteratively.
    */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
      alpha: Double = 0.5, targetFrac: Double = 0.25,
      salt: String = ""): DataFrame = {
    val thresholds = temperatureThresholds(df, groupCol, alpha, targetFrac)
    val u = conv(substring(hashPoint(keyCol, salt), 1, 15), 16, 10)
      .cast(LongType)
    val pred = thresholds.foldRight(lit(false): Column) {
      case ((g, thr), rest) =>
        when(col(groupCol) === lit(g), u < lit(thr)).otherwise(rest)
    }
    df.filter(pred)
  }

  /** The per-group 60-bit keep thresholds behind [[temperatureMix]]:
    * (group, floor(round(min(1, c·n^α/n), 6) · 2^60)), groups in
    * sorted order. Public so tests and SQL mirrors can reproduce the
    * exact integers.
    */
  def temperatureThresholds(df: DataFrame, groupCol: String,
      alpha: Double, targetFrac: Double): Seq[(String, Long)] = {
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"temperatureMix: targetFrac in (0,1], got $targetFrac")
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperatureMix: alpha in [0,1], got $alpha")
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast(StringType).as("g")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) return Seq.empty
    val n = counts.map(_._2).sum.toDouble
    // sequential sum in sorted-group order — deterministic, mirrorable
    var sp = 0.0
    counts.foreach { case (_, c) => sp += powA(c.toDouble) }
    counts.map { case (g, c) =>
      val raw = ((targetFrac * n / sp) * powA(c.toDouble)) / c.toDouble
      val r6 = java.math.BigDecimal.valueOf(math.min(1.0, raw))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      g -> (r6 * 1152921504606846976.0 /* 2^60: exponent-only, exact */).toLong
    }
  }

  /** Budget-driven corpus mixing with epoch oversampling — the missing
    * half of [[weightedByGroup]]: weights there are per-group KEEP
    * fractions; here they are TARGET MIXTURE proportions over a token
    * budget, the form mixture specs are actually published in
    * ("40% web, 30% code, … for a 1.4T-token run"). Each group g gets
    * rate r_g = min(maxEpochs, (w_g/Σw · budget) / tokens_g): under 1
    * it downsamples, over 1 the group is REPEATED — multiplicity
    * floor(r_g) for every key plus one more iff the key's hash point
    * falls under the fractional remainder (so expected tokens = target,
    * and the "2.3 epochs of books" reading is exact). `maxEpochs` caps
    * repetition of tiny over-weighted sources. One bounded
    * count-per-group aggregate sizes the rates on the driver (same
    * group-cardinality contract as [[temperatureMix]]); the corpus pass
    * is map-only (multiplicity expression + generator), stable under
    * repartition/retry/AQE like every keyed sampler here. Rows whose
    * group carries no weight — or whose group/token column is null —
    * are dropped. `epochCol` records the copy index (1-based), so
    * downstream can distinguish natural from repeated occurrences.
    *
    * Oracle-exactness: same recipe as [[temperatureMix]] — rates
    * rounded to 6 decimals (the fractional part is exact: r6 − floor
    * (r6) subtracts an integer from a double, which IEEE subtraction
    * performs exactly), the fractional draw is the 60-bit integer test
    * (`first 15 md5 hex < floor(frac·2^60)`), so SQL recomputing the
    * formula reproduces the kept multiset bit-for-bit at any SF.
    */
  def mixtureByBudget(df: DataFrame, keyCol: String, groupCol: String,
      weights: Seq[(String, Double)], budgetTokens: Long, tokenCol: String,
      maxEpochs: Double = 4.0, salt: String = "",
      epochCol: String = "epoch"): DataFrame = {
    val rates = mixtureRates(df, groupCol, weights, budgetTokens, tokenCol,
      maxEpochs)
    if (rates.isEmpty) return df.filter(lit(false))
      .withColumn(epochCol, lit(1))
    val u = conv(substring(hashPoint(keyCol, salt + "#mix"), 1, 15), 16, 10)
      .cast(LongType)
    val mult = rates.foldRight(lit(0): Column) {
      case ((g, base, thr), rest) =>
        when(col(groupCol) === lit(g),
          lit(base) + when(u < lit(thr), 1).otherwise(0)).otherwise(rest)
    }
    val m = "__graft_mix_m"
    df.filter(col(groupCol).isNotNull && col(tokenCol).isNotNull)
      .withColumn(m, mult)
      .filter(col(m) > 0)
      .withColumn(epochCol, explode(sequence(lit(1), col(m))))
      .drop(m)
  }

  /** The per-group (floor epochs, 60-bit fractional-draw threshold)
    * pairs behind [[mixtureByBudget]], groups in sorted order. Groups
    * with no weight, zero weight, or no tokens are absent (rate 0).
    * Public so tests and SQL mirrors can reproduce the exact integers.
    */
  def mixtureRates(df: DataFrame, groupCol: String,
      weights: Seq[(String, Double)], budgetTokens: Long, tokenCol: String,
      maxEpochs: Double): Seq[(String, Int, Long)] = {
    require(budgetTokens > 0, s"mixture: budget must be > 0, got $budgetTokens")
    require(maxEpochs >= 1.0 && maxEpochs <= 64.0,
      s"mixture: maxEpochs in [1,64], got $maxEpochs")
    require(weights.nonEmpty, "mixture: at least one group weight")
    require(weights.map(_._1).distinct.size == weights.size,
      "mixture: duplicate group in weights")
    weights.foreach { case (g, w) => require(w >= 0.0,
      s"mixture: negative weight for group '$g'") }
    val wsum = weights.sortBy(_._1).foldLeft(0.0)(_ + _._2)
    require(wsum > 0.0, "mixture: weights sum to 0")
    val wmap = weights.toMap
    val avail = df.filter(col(groupCol).isNotNull && col(tokenCol).isNotNull)
      .groupBy(col(groupCol).cast(StringType).as("g"))
      .agg(sum(col(tokenCol).cast(LongType)).as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    avail.flatMap { case (g, tok) =>
      wmap.get(g).filter(w => w > 0.0 && tok > 0L).map { w =>
        val raw = ((w / wsum) * budgetTokens.toDouble) / tok.toDouble
        val r6 = java.math.BigDecimal.valueOf(math.min(maxEpochs, raw))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val base = math.floor(r6).toInt
        // r6 - base: exact (integer subtracted from a double of larger
        // magnitude); ·2^60 is exponent-only; toLong truncates = floor
        val thr = ((r6 - base) * 1152921504606846976.0).toLong
        (g, base, thr)
      }
    }.toSeq
  }

  private def hashPoint(keyCol: String, salt: String): Column =
    md5(concat(coalesce(col(keyCol).cast(StringType), lit("")), lit(salt)))

  /** 32-hex-digit threshold string for a [0,1] fraction of the 128-bit
    * hash space: floor(fraction * 2^128), zero-padded. Public so the
    * DuckDB oracle can embed the bit-identical literal.
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val full = BigInt(1) << 128
    // java.math.BigDecimal: unlimited precision (scala.math.BigDecimal
    // defaults to MathContext.DECIMAL128 and silently rounds the
    // 39-digit product); new BigDecimal(double) is the exact binary value
    val t = BigInt(new java.math.BigDecimal(fraction)
      .multiply(new java.math.BigDecimal(full.bigInteger))
      .toBigInteger).min(full - 1)
    val h = t.toString(16)
    "0" * (32 - h.length) + h
  }
}
