package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Group-wise EXACT order statistics at 100 TB shapes — the generic form
 * of the histogram/explicit-rank method [[graft.text.CorpusProfile]]
 * uses for its token-count quantiles (the classic "p50/p95/p99 latency
 * per key" / "length distribution per domain" OLAP ask).
 *
 * Why not a window sort or `percentile`: a per-group sort window ranks
 * DATA rows (one hot group = one task holding its whole distribution),
 * and `percentile_approx` trades exactness away. Here the value column
 * is first collapsed to a per-(group, value) HISTOGRAM by one
 * map-side-combined aggregation; the rank window then runs over rows
 * bounded by DISTINCT values per group — for the typical discrete or
 * low-cardinality-value column (lengths, counts, scores rounded to
 * cents) that is orders of magnitude smaller than the data, and a
 * 100M-row group with 2k distinct values costs a 2k-row window.
 *
 * Quantile contract (explicit rank, division-free): pN is the smallest
 * value v whose cumulative count c satisfies `100·c >= N·n` (n = group
 * size) — the ceil(N/100·n)-th smallest element, exactly what an
 * ANSI-SQL oracle replays with the same integer test. Nulls drop (SQL
 * aggregate semantics); the output value columns keep the input type.
 */
object GroupStats {

  /**
   * Per group: row count, min, max, and one `p<N>` column per requested
   * percentile over `valueCol`.
   *
   * @param qs percentiles as integers in [1, 100] (p100 = max)
   */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(qs.nonEmpty, "at least one percentile required")
    require(qs.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1, 100], got ${qs.mkString(",")}")
    require(qs.distinct.size == qs.size,
      s"duplicate percentiles: ${qs.mkString(",")}")
    // output columns are n, min_<v>, max_<v>, p<q> — reject value/group
    // names that would collide (e.g. a value column literally named "n");
    // the internal temp columns are guarded too: an input column named
    // __c/__cum/__tot would alias the histogram count / cumsum / total
    // and corrupt the rank computation instead of failing loudly
    val outNames = Seq("n", s"min_$valueCol", s"max_$valueCol") ++ qs.map(q => s"p$q") ++
      Seq("__c", "__cum", "__tot")
    val clash = (groupCols :+ valueCol).toSet.intersect(outNames.toSet)
    require(clash.isEmpty,
      s"column name(s) would collide with output or internal columns: ${clash.mkString(", ")}")
    val g = groupCols.map(col)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol): _*).agg(count(lit(1)).as("__c"))
    // cumulative count over DISTINCT values per group (histogram rows)
    val wCum = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(wCum))
    // the rank test needs the group total alongside each histogram row;
    // a full-partition window over histogram rows provides it without a
    // second shuffle (same partitioning as the cumsum window)
    val withTotal = cum.withColumn("__tot",
      sum(col("__c")).over(Window.partitionBy(g: _*)))
    withTotal.groupBy(g: _*).agg(
      max(col("__tot")).as("n"),
      Seq(min(col(valueCol)).as(s"min_$valueCol"),
        max(col(valueCol)).as(s"max_$valueCol")) ++
        qs.map(q => min(when(col("__cum") * 100 >= col("__tot") * q,
          col(valueCol))).as(s"p$q")): _*)
  }

  /**
   * Per-group winsorization — clip `valueCol` into its own group's
   * [pLo, pHi] quantile band, the heavy-tail tamer for feature columns
   * (token counts, prices, latencies) before averaging or z-scoring:
   * unlike dropping outliers it keeps the row (and the fact that it
   * WAS extreme, pinned at the boundary), unlike the MAD flag it
   * repairs in place. Quantiles follow [[quantiles]]' explicit rank
   * contract (smallest v with 100·c ≥ N·n), so the clip boundaries —
   * and therefore every output digit — replay exactly in an external
   * engine.
   *
   * Plan shape: one [[quantiles]] pass (histogram-bounded), then a
   * broadcast-or-shuffle equi-join of the tiny per-group boundary
   * table back onto the data — no data-sized window. NULL values stay
   * NULL; a group whose values are all NULL has no boundaries and its
   * (all-NULL) values pass through unchanged.
   *
   * Output: the input columns plus `outCol` (same type as
   * `valueCol`).
   */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      loQ: Int = 10, hiQ: Int = 90,
      outCol: String = "winsorized"): DataFrame = {
    require(loQ >= 1 && hiQ <= 100 && loQ < hiQ,
      s"need 1 <= loQ < hiQ <= 100, got loQ=$loQ hiQ=$hiQ")
    require(!df.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val bounds = quantiles(df, groupCols, valueCol, Seq(loQ, hiQ))
      .select(groupCols.map(col) ++ Seq(
        col(s"p$loQ").as("__wlo"), col(s"p$hiQ").as("__whi")): _*)
    df.join(bounds, groupCols, "left")
      .withColumn(outCol,
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi")
  }

  /**
   * Exact GLOBAL rank without a global sort — the curriculum-ordering /
   * percentile-feature primitive: every row gets its 0-based position
   * in the total order (valueCol, tieCol), but no corpus-sized
   * single-task window ever runs. A plain
   * `row_number().over(Window.orderBy(...))` funnels 100 TB through
   * ONE task; here the rank decomposes as
   * `rank = base(value) + position-within-value`:
   *
   *  - `base(value)` = count of rows with a strictly smaller value —
   *    one map-side-combined histogram, then a cumsum window over
   *    DISTINCT values only (the [[quantiles]] discipline; bounded by
   *    value cardinality, which for this library's micro-unit scores
   *    is orders of magnitude below row count);
   *  - `position` = row_number within the value's tie group ordered by
   *    `tieCol` — windows partitioned BY VALUE run in parallel, each
   *    bounded by its tie-group width (a skewed tie group is one
   *    partition, the documented valve: bin or refine `valueCol`).
   *
   * (value, tie) pairs must be UNIQUE (tieCol is an id column) or the
   * order inside a tie is engine-dependent; `descending` ranks largest
   * value first (curriculum: hardest/highest-score first), ties always
   * ascending by `tieCol`. NULL values/ties are EXCLUDED (a rank in a
   * total order needs both coordinates — the [[spearman]] rule).
   *
   * Output: the two input columns plus `outCol` (long, 0-based).
   */
  def globalRank(df: DataFrame, valueCol: String, tieCol: String,
      outCol: String = "rank", descending: Boolean = false): DataFrame = {
    require(valueCol != tieCol,
      s"valueCol and tieCol must differ, both are '$valueCol'")
    require(!Seq(valueCol, tieCol).contains(outCol),
      s"output column `$outCol` collides with an input column")
    val rows = df.where(col(valueCol).isNotNull && col(tieCol).isNotNull)
      .select(col(valueCol), col(tieCol))
    val ord = if (descending) col(valueCol).desc else col(valueCol).asc
    // base: cumulative count of strictly-smaller (or larger) values,
    // over the distinct-value histogram only; the non-foldable constant
    // partition key keeps WindowExec off its global no-partition path
    val wBase = Window
      .partitionBy(pmod(col("__c"), lit(1L)))
      .orderBy(ord).rowsBetween(Window.unboundedPreceding, -1)
    val base = rows.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(wBase), lit(0L)))
      .select(col(valueCol), col("__base"))
    val wPos = Window.partitionBy(col(valueCol)).orderBy(col(tieCol))
    rows.withColumn("__pos", row_number().over(wPos).cast("long") - 1L)
      .join(base, Seq(valueCol))
      .select(col(valueCol), col(tieCol),
        (col("__base") + col("__pos")).as(outCol))
  }

  /**
   * Per-group exact rank AND percentile feature — [[globalRank]]'s
   * machinery with a group prefix: every row gets its 0-based rank
   * inside its own group's (value, tie) order plus
   * `pct_micro = (rank · 1e6) div (n − 1)` (0 for singleton groups) —
   * the calibrated quality-percentile feature ("this document is in
   * its source's 93rd length percentile") curriculum and filtering
   * thresholds want, comparable ACROSS groups of different sizes.
   *
   * Same no-data-sized-window shape: base from the per-group
   * distinct-value histogram cumsum (window over histogram rows keyed
   * by group), position from row_number inside the (group, value) tie
   * group — both bounded by value cardinality / tie width, never by
   * group row count. (group, value, tie) must be unique per row;
   * NULL coordinates are excluded (the [[spearman]] rule).
   *
   * Output: (groupCols..., valueCol, tieCol, rank, pct_micro).
   */
  def groupPercentRank(df: DataFrame, groupCols: Seq[String],
      valueCol: String, tieCol: String,
      descending: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(valueCol != tieCol,
      s"valueCol and tieCol must differ, both are '$valueCol'")
    val clash = (groupCols :+ valueCol :+ tieCol)
      .filter(Seq("rank", "pct_micro", "__c", "__base", "__n", "__pos").contains)
    require(clash.isEmpty,
      s"column name(s) collide with output or internal columns: ${clash.mkString(", ")}")
    val g = groupCols.map(col)
    val rows = df.where(col(valueCol).isNotNull && col(tieCol).isNotNull)
      .select((groupCols :+ valueCol :+ tieCol).map(col): _*)
    val ord = if (descending) col(valueCol).desc else col(valueCol).asc
    val wBase = Window.partitionBy(g: _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = rows.groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(wBase), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(g: _*)))
      .select(g ++ Seq(col(valueCol), col("__base"), col("__n")): _*)
    val wPos = Window.partitionBy(g :+ col(valueCol): _*).orderBy(col(tieCol))
    rows.withColumn("__pos", row_number().over(wPos).cast("long") - 1L)
      .join(base, groupCols :+ valueCol)
      .select(g ++ Seq(col(valueCol), col(tieCol),
        (col("__base") + col("__pos")).as("rank"),
        when(col("__n") > 1L,
          expr("((__base + __pos) * 1000000L) div (__n - 1L)"))
          .otherwise(lit(0L)).as("pct_micro")): _*)
  }

  /**
   * Per-group Gini coefficient in micro-units — the inequality audit
   * of corpus curation ("is one domain hoarding the token mass? how
   * concentrated are user events?"): 0 = perfectly even, (n−1)/n =
   * one row holds everything. Computed by the classic rank identity
   * `G = (2·Σᵢ rᵢ·xᵢ − (n+1)·Σx) / (n·Σx)` with rᵢ the 1-based
   * ascending-value rank — and the rank sum is TIE-ORDER-INSENSITIVE
   * (equal values across a tie block contribute x·Σranks whatever the
   * within-block order), so the result is deterministic however ties
   * break. All arithmetic is exact: ranks from the per-group
   * distinct-value histogram ([[groupPercentRank]]'s machinery — no
   * data-sized window), Σr·x accumulated in decimal(38,0), one
   * truncating division at the end (both engines truncate toward
   * zero). Values must be NON-NEGATIVE (Gini is undefined on mixed
   * signs — in-plan raise_error); NULL values are excluded; groups
   * with n = 0 vanish, S = 0 yields NULL (0/0).
   *
   * Output: (groupCols..., n, value_sum, gini_micro).
   */
  def gini(df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(valueCol != tieCol,
      s"valueCol and tieCol must differ, both are '$valueCol'")
    val g = groupCols.map(col)
    val v = when(col(valueCol) < 0, raise_error(concat(
        lit(s"GroupStats.gini: `$valueCol` must be non-negative, got "),
        col(valueCol).cast("string"))))
      .otherwise(col(valueCol).cast("long"))
    val rows = df.where(col(valueCol).isNotNull && col(tieCol).isNotNull)
      .select(g ++ Seq(v.as(valueCol), col(tieCol)): _*)
    val wBase = Window.partitionBy(g: _*).orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = rows.groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(wBase), lit(0L)))
      .select(g ++ Seq(col(valueCol), col("__base")): _*)
    val wPos = Window.partitionBy(g :+ col(valueCol): _*).orderBy(col(tieCol))
    rows.withColumn("__pos", row_number().over(wPos).cast("long") - 1L)
      .join(base, groupCols :+ valueCol)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("value_sum"),
        // rank and value are cast to decimal BEFORE the multiply: a
        // long*long product above 2^63 would silently wrap under
        // non-ANSI Spark (round-9 ADVICE). Each operand fits
        // decimal(20,0) (long range), the product fits decimal(38,0)
        // exactly (max 2^126 < 10^38), so the scaladoc's "all
        // arithmetic is exact" claim holds unconditionally.
        sum((col("__base") + col("__pos") + 1L).cast("decimal(20,0)")
          * col(valueCol).cast("decimal(20,0)")).cast("decimal(38,0)")
          .as("__t"))
      .select(g ++ Seq(col("n"), col("value_sum"),
        when(col("value_sum") > 0, expr(
          "CAST(((2 * __t - (CAST(n AS DECIMAL(38,0)) + 1) * value_sum)" +
            " * 1000000) div (CAST(n AS DECIMAL(38,0)) * value_sum)" +
            " AS BIGINT)"))
          .as("gini_micro")): _*)
  }

  /**
   * Per group: row count and one `ap<N>` APPROXIMATE percentile column
   * per requested percentile — Spark's `percentile_approx`
   * (Greenwald-Khanna summaries) in the [[quantiles]] column convention.
   *
   * The cheap first pass when the value column is CONTINUOUS
   * (high-cardinality: latencies in nanos, float scores), where
   * [[quantiles]]'s histogram collapse buys nothing: GK keeps
   * O(accuracy·log n) state per group inside one map-side-combined
   * aggregation — no histogram shuffle, no window — and guarantees the
   * returned element's RANK is within n/accuracy of the target. Returned
   * values are actual elements of the group (input type preserved).
   * Estimates are sketch-merge-order-dependent, so this is a
   * bound-checked operator, not a bit-replayable one — the gate pins
   * `rank(estimate) - target <= n/accuracy` booleans, the
   * [[graft.text.CorpusSketch]] discipline.
   */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[Int], accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(qs.nonEmpty, "at least one percentile required")
    require(qs.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1, 100], got ${qs.mkString(",")}")
    require(qs.distinct.size == qs.size, s"duplicate percentiles: ${qs.mkString(",")}")
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val outNames = Seq("n", "__ap") ++ qs.map(q => s"ap$q")
    val clash = (groupCols :+ valueCol).toSet.intersect(outNames.toSet)
    require(clash.isEmpty,
      s"column name(s) would collide with output or internal columns: ${clash.mkString(", ")}")
    val g = groupCols.map(col)
    val probs = array(qs.map(q => lit(q / 100.0)): _*)
    df.where(col(valueCol).isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        percentile_approx(col(valueCol), probs, lit(accuracy)).as("__ap"))
      .select(g ++ (col("n") +:
        qs.zipWithIndex.map { case (q, i) => col("__ap")(i).as(s"ap$q") }): _*)
  }

  /**
   * Equal-frequency quantile binning (feature bucketization): assign
   * every row its per-group quantile bin in [0, numBins) WITHOUT the
   * per-group data sort `ntile` would run (one hot group = one task
   * holding its entire distribution). The [[quantiles]] histogram
   * method, opened up to a per-row verdict:
   *
   *  1. one map-side-combined (group, value) histogram aggregation;
   *  2. cumulative counts over DISTINCT values per group (window rows
   *     bounded by distinct values, not data);
   *  3. `bin = (cum - 1) · numBins div tot` — integer floor division,
   *     division-free tie contract: all rows sharing a value share a
   *     bin (the bin of the value's LAST occupant in sorted order), an
   *     external engine replays it with the same integer ops;
   *  4. one equi-join back on (group, value) to stamp input rows.
   *
   * Cost: histogram shuffle (∝ distinct values after map combine) +
   * join-back shuffle of the input — two exchanges, none of them a
   * sort of data rows. Null values get a NULL bin (SQL semantics:
   * they are not part of the distribution); bins can be empty only
   * when a single value holds more than a bin's worth of mass (the
   * tie contract above — equal-frequency up to tie granularity).
   */
  def quantileBins(df: DataFrame, groupCols: Seq[String], valueCol: String,
      numBins: Int, outCol: String = "bin"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(numBins >= 2, s"numBins must be >= 2, got $numBins")
    val reserved = Seq("__c", "__cum", "__tot", outCol)
    val clash = (groupCols :+ valueCol).filter(reserved.contains)
    require(clash.isEmpty,
      s"column name(s) collide with output or internal columns: ${clash.mkString(", ")}")
    require(!df.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val g = groupCols.map(col)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol): _*).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bins = hist.withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__tot", sum(col("__c")).over(Window.partitionBy(g: _*)))
      // integral `div` — never a double division (a 100 TB group's
      // (cum·numBins) product can exceed 2^53 and silently round there)
      .select(g ++ Seq(col(valueCol),
        expr(s"CAST(((__cum - 1) * $numBins) div __tot AS BIGINT)").as(outCol)): _*)
    // null-SAFE equality on the group columns: the histogram treats a
    // NULL group key as a real group, so the join back must too (a
    // plain equi-join would hand those rows a null bin the histogram
    // never assigned). valueCol's plain-null behavior is unchanged —
    // null values carry a null bin by contract
    val l = df.alias("__binl")
    val r = bins.alias("__binr")
    val cond = (groupCols :+ valueCol)
      .map(c => col(s"__binl.$c") <=> col(s"__binr.$c")).reduce(_ && _)
    val ordered = (groupCols :+ valueCol) ++
      df.columns.filterNot((groupCols :+ valueCol).contains) // USING-join order kept
    l.join(r, cond, "left")
      .select(ordered.map(c => col(s"__binl.$c")) :+ col(s"__binr.$outCol"): _*)
  }

  /**
   * Per-group z-score standardization (feature normalization): stamp
   * every row with `floor(1e6 · (v - mean) / stddev)` — the z-score in
   * exact MICRO-units, engine-replayable because every step before the
   * final double arithmetic is exact:
   *
   *  - the value column must be INTEGRAL (require-checked): `sum(v)`
   *    and `sum(v²)` accumulate in DECIMAL(38,0) — order-independent,
   *    no floating partial sums to disagree across engines or runs;
   *  - moments convert to double once (exact below 2^53), then mean /
   *    population variance / sqrt / floor are single-valued IEEE ops —
   *    identical everywhere. `floor` (not round) keeps the contract
   *    free of rounding-mode trivia.
   *
   * Degenerate groups (zero variance, incl. singletons) and null
   * values get a NULL score. One map-side-combined stats aggregation
   * (group-count-sized) + one equi-join back — same two-exchange shape
   * as [[quantileBins]], never a window over data rows. Continuous
   * (double) features should be pre-scaled to integers (micro-units)
   * first — the engine-exactness discipline, not a limitation of the
   * math.
   */
  def standardize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      outCol: String = "z_micro"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(!df.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(valueCol).dataType),
      s"`$valueCol` must be an integral type (pre-scale continuous features " +
        s"to micro-units), got ${df.schema(valueCol).dataType.simpleString}")
    val reserved = Seq("__n", "__sm", "__sq")
    val clash = (groupCols :+ valueCol).filter(reserved.contains)
    require(clash.isEmpty, s"reserved column names in use: ${clash.mkString(", ")}")
    val g = groupCols.map(col)
    val v19 = col(valueCol).cast("decimal(19,0)")
    val stats = df.where(col(valueCol).isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(v19).cast("double").as("__sm"),
        sum(v19 * v19).cast("double").as("__sq"))
    val mean = col("__sm") / col("__n")
    val variance = col("__sq") / col("__n") - mean * mean
    // overflow guard: decimal(38,0) holds sums of squares up to ~1e38,
    // so |v| near 1e18 overflows after ~100 rows and (non-ANSI) NULLs
    // __sq for the whole group — without this raise, every z in the
    // group would go silently null with no error
    val sqOk = when(col("__n").isNotNull && col("__sq").isNull,
      raise_error(concat(lit(s"GroupStats.standardize: sum of squares of `$valueCol` " +
        "overflowed decimal(38,0) in a group (values this large need " +
        "pre-scaling to smaller units); group: "),
        concat_ws(",", groupCols.map(c => col(c).cast("string")): _*))))
      .otherwise(col("__sq"))
    df.join(stats, groupCols, "left")
      .withColumn(outCol,
        when(sqOk.isNotNull && variance > 0.0,
          floor(lit(1e6) * (col(valueCol) - mean) / sqrt(variance)).cast("long")))
      .drop("__n", "__sm", "__sq")
  }

  /**
   * Robust (MAD-based) outlier flags — the quality-screening pass that
   * survives the outliers it hunts: z-scores ([[standardize]]) use the
   * mean/stddev, which the outliers themselves inflate; the median and
   * the median-absolute-deviation are 50%-breakdown estimators, so a
   * contaminated tail cannot hide itself. Flags every row with
   * `|v − median| > k·MAD` per group (the classic k = 3 "modified
   * z-score" screen, Iglewicz–Hoaglin without the 0.6745 constant —
   * pure integers instead).
   *
   * Engine-exact by construction: `valueCol` must be integral (the
   * [[standardize]] micro-unit discipline), the median is
   * [[quantiles]]' p50 (smallest value with 100·cum ≥ 50·total over the
   * DISTINCT-value histogram), deviations are exact longs, and the MAD
   * is the same p50 applied to the deviation histogram. No doubles
   * anywhere — two engines agree digit for digit.
   *
   * Scale shape: two histogram passes (distinct-value-sized shuffles,
   * never data-row windows) + two equi-joins back — the
   * [[quantileBins]] exchange discipline twice. A group's WHOLE
   * distribution never sits in one task. Degenerate groups: when MAD
   * = 0 (more than half the group sits at the median) the strict
   * inequality flags every row off the median — the documented
   * contract for near-constant groups; null values get null flags
   * (excluded from both histograms).
   *
   * Output: the input columns + `abs_dev`, `group_med`, `group_mad`,
   * `is_outlier`.
   */
  def robustOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 3): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(valueCol).dataType),
      s"`$valueCol` must be an integral type (pre-scale continuous features " +
        s"to micro-units), got ${df.schema(valueCol).dataType.simpleString}")
    val reserved = Seq("abs_dev", "group_med", "group_mad", "is_outlier", "__dev")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty, s"reserved column names in use: ${clash.mkString(", ")}")
    val med = quantiles(df, groupCols, valueCol, Seq(50))
      .select(groupCols.map(col) :+ col("p50").cast("long").as("group_med"): _*)
    val withMed = df.join(med, groupCols, "left")
      .withColumn("__dev",
        abs(col(valueCol).cast("long") - col("group_med")))
    val mad = quantiles(withMed.where(col("__dev").isNotNull),
        groupCols, "__dev", Seq(50))
      .select(groupCols.map(col) :+ col("p50").cast("long").as("group_mad"): _*)
    withMed.join(mad, groupCols, "left")
      .withColumn("abs_dev", col("__dev"))
      .withColumn("is_outlier",
        when(col("__dev").isNotNull, col("__dev") > lit(k.toLong) * col("group_mad")))
      .drop("__dev")
  }

  /** Hot-value profile: the k most frequent values of a column with
    * counts and dense ranks — the skew diagnostic a 100 TB run consults
    * before choosing salting/broadcast strategies (which keys would
    * straggle?). One map-side-combined count aggregation (distinct-
    * value-sized), then an ORDER BY ... LIMIT k — Spark executes that
    * as TakeOrderedAndProject (per-partition O(n log k) heaps + a
    * k-row driver merge), never a full sort. Ties (cnt desc, value
    * asc) deterministic; nulls count as a value (null-heaviness IS the
    * diagnostic); the rank window runs on the k-row result. */
  def topValues(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(valueCol).asc_nulls_last)
      .limit(k)
    counts.withColumn("rnk",
      row_number().over(Window.orderBy(col("cnt").desc, col(valueCol).asc_nulls_last))
        .cast("long"))
  }

  /**
   * Per-group Spearman rank correlation in micro-units — the
   * monotonic-association screen of feature analysis (does engagement
   * rise with session length? does quality fall with document age?),
   * robust to outliers and to any monotone rescaling because it
   * correlates RANKS, which also makes it exactly integer-replayable
   * where Pearson's product moments are not.
   *
   * Method: average ranks with ties, carried as doubled integers
   * (2·avgrank = 2·cum_before + c + 1 per tie group), then the
   * displacement formula rho = 1 − 6·Σd²/(n(n²−1)) evaluated as
   * rho_micro = 1e6 − (3·ΣD²·1e6) div (2·n·(n²−1)) with D = 2d —
   * exact integer arithmetic end to end, truncating division matching
   * both engines. This is the classic tie-adjusted-rank shortcut:
   * average ranks enter the displacement sum, but the n(n²−1)
   * normalizer is the no-tie one, so heavy-tie columns wanting the
   * full Pearson-on-ranks correction should bin or dedupe first
   * (documented contract, same spirit as [[quantiles]]' explicit rank
   * rule). Concrete consequence for threshold-based callers: under
   * ties |rho_micro| cannot reach 1e6 even at perfect monotone
   * association — a `rho_micro == 1000000` check only holds on
   * tie-free columns; compare against a margin (or pre-dedupe) when
   * the column can tie.
   *
   * `tieCorrected = true` (round-10, default OFF — the documented
   * no-tie normalizer above stays the default contract) switches the
   * normalizer to the full Pearson-on-average-ranks form with the
   * classic Σ(t³−t) tie terms: with A = n³−n−Σ(tx³−tx) and
   * B = n³−n−Σ(ty³−ty) (t = tie-group sizes of x resp. y),
   * rho = (A + B − 3·ΣD²) / (2·√(A·B)) — algebraically identical to
   * the no-tie formula when no ties exist, and reaching ±1 at perfect
   * monotone association even under heavy ties. A, B and ΣD² are
   * exact decimal(38,0) integers in both engines; only the final
   * √-normalization runs in IEEE double (both engines' `sqrt` is
   * correctly rounded, so the truncated micro result replays —
   * Spark's double→long cast truncates, the oracle replays it with
   * an explicit `trunc`). Degenerate groups (a constant x or y:
   * A·B = 0) return NULL rho_micro — correlation with a constant is
   * undefined, same as Pearson.
   *
   * Scale: ranks come from per-(group, value) HISTOGRAMS (the
   * [[quantiles]] discipline) — the rank window runs over DISTINCT
   * values per group, never a data-row sort window, so a hot group
   * costs its value cardinality, not its row count. The two rank
   * join-backs are ordinary (group, value) equi-joins (null-safe, so
   * null GROUP keys stay the real group the histogram counted),
   * AQE-skew-splittable; ΣD² accumulates in decimal(38,0) (exact past
   * n ~ 10¹⁰ rows per group). Rows with a NULL x or y are excluded —
   * a rank needs both coordinates. Output: (groupCols..., n,
   * rho_micro); rho_micro is NULL for n < 2 (undefined).
   */
  def spearman(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, tieCorrected: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(xCol != yCol, s"xCol and yCol must differ, both are '$xCol'")
    val reserved =
      Seq("__c", "__cb", "__a2x", "__a2y", "__sd2", "__tx", "__ty",
        "__A", "__B", "n", "rho_micro")
    val clash = (groupCols ++ Seq(xCol, yCol)).filter(reserved.contains)
    require(clash.isEmpty,
      s"column name(s) collide with output or internal columns: ${clash.mkString(", ")}")
    val g = groupCols.map(col)
    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((groupCols ++ Seq(xCol, yCol)).map(col): _*)
    // 2× average rank per distinct value, from the per-group histogram
    def rank2(vCol: String, out: String): DataFrame = {
      val h = rows.groupBy(g :+ col(vCol): _*).agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(g: _*).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("__cb", coalesce(sum(col("__c")).over(w), lit(0L)))
        .select(g ++ Seq(col(vCol),
          (lit(2L) * col("__cb") + col("__c") + lit(1L)).as(out)): _*)
    }
    def joinBack(l: DataFrame, rankMap: DataFrame, vCol: String,
        out: String): DataFrame = {
      val la = l.alias("__spl"); val ra = rankMap.alias("__spr")
      val cond = (groupCols :+ vCol)
        .map(c => col(s"__spl.$c") <=> col(s"__spr.$c")).reduce(_ && _)
      la.join(ra, cond, "inner")
        .select(l.columns.map(c => col(s"__spl.$c")).toSeq
          :+ col(s"__spr.$out"): _*)
    }
    val ranked = joinBack(
      joinBack(rows, rank2(xCol, "__a2x"), xCol, "__a2x"),
      rank2(yCol, "__a2y"), yCol, "__a2y")
    val base = ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(((col("__a2x") - col("__a2y")) * (col("__a2x") - col("__a2y")))
          .cast("decimal(38,0)")).as("__sd2"))
    if (!tieCorrected)
      base.select(g ++ Seq(col("n"),
        when(col("n") >= 2, expr(
          "1000000L - (3 * __sd2 * 1000000) div " +
            "(2 * CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1))"))
          .as("rho_micro")): _*)
    else {
      // per-group Σ(t³−t) over each column's tie-group sizes — one
      // more aggregation over the (group, value) HISTOGRAM (distinct-
      // value-sized, never data-sized); t cast to decimal BEFORE the
      // cube (the gini discipline: no silent long wrap)
      def tieSum(vCol: String, out: String): DataFrame = {
        val t = col("__c").cast("decimal(20,0)")
        rows.groupBy(g :+ col(vCol): _*).agg(count(lit(1)).as("__c"))
          .groupBy(g: _*)
          .agg(sum(t * t * t - t).cast("decimal(38,0)").as(out))
      }
      def joinGroup(l: DataFrame, r: DataFrame): DataFrame = {
        val la = l.alias("__spl"); val ra = r.alias("__spr")
        val cond = groupCols
          .map(c => col(s"__spl.$c") <=> col(s"__spr.$c")).reduce(_ && _)
        la.join(ra, cond, "inner")
          .select(l.columns.map(c => col(s"__spl.$c")).toSeq
            ++ r.columns.filterNot(groupCols.contains)
              .map(c => col(s"__spr.$c")): _*)
      }
      joinGroup(joinGroup(base, tieSum(xCol, "__tx")), tieSum(yCol, "__ty"))
        // A = n³−n−Tx, B = n³−n−Ty exact in decimal(38,0); the final
        // √(A·B) normalizer in IEEE double (both engines correctly
        // rounded), truncated to micro like Spark's double→long cast
        .withColumn("__A", expr(
          "CAST(n AS DECIMAL(38,0)) * n * n - n - __tx"))
        .withColumn("__B", expr(
          "CAST(n AS DECIMAL(38,0)) * n * n - n - __ty"))
        .select(g ++ Seq(col("n"),
          when(col("n") >= 2 && col("__A") > 0 && col("__B") > 0, expr(
            "CAST(1e6 * CAST(__A + __B - 3 * __sd2 AS DOUBLE) / " +
              "(2.0 * sqrt(CAST(__A AS DOUBLE) * CAST(__B AS DOUBLE)))" +
              " AS BIGINT)"))
            .as("rho_micro")): _*)
    }
  }
}
