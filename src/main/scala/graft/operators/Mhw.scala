package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables
import graft.time.DoyFunctions._

/** Marine-heatwave analytics re-expressed Spark-first over long-format
  * rows. The reference's `(time, lat, lon)` cube maps to rows keyed by a
  * series key (`user_id` here) with one observation per day (SURVEY §3).
  *
  * Reference semantics preserved (file:line cites against
  * /root/reference):
  *  - leap-normalized DOY — src/mhw3d/common/core.py:5 `_clim_doy`
  *  - ±w-day pooling on a per-year 366-slot grid with cross-year padding
  *    (NOT pure circular: contributions into a neighbour year only count
  *    if that year exists in the data) —
  *    src/mhw3d/legacy/climatology.py:61 `_pool_window`,
  *    src/mhw3d/best_practice/climatology.py:130 `compute_threshold`
  *  - strict skipna: a measured-but-NaN value in a pooling window nulls
  *    the threshold — best_practice/climatology.py:225
  *  - legacy Feb-29: DOY 60 overwritten with 0.5·(DOY59+DOY61) after
  *    pooling, before smoothing — legacy/climatology.py:13 `_interp_feb29`
  *  - 31-slot circular running mean with min_periods=1 —
  *    legacy/climatology.py:122 `_smooth_doy`
  *  - events: runs of severity>1, duration filter THEN single-pass
  *    gap-join (start−prev_end ≤ maxGap), metrics over the merged span
  *    including gap days, first-argmax peak — common/core.py:37,89
  *
  * Scale design (100 TB): the per-(key,doy) climatology tables are tiny
  * relative to facts (366 rows per key) → broadcast back to facts, so the
  * fact table never shuffles for severity. Pooling explodes ×(2w+1)
  * map-side then partially aggregates per (key,doy) before the shuffle.
  * Exact `percentile` co-locates each (key,doy) group's values — group
  * cardinality ∝ keys, no global hotspot; at extreme scale swap
  * `approx_percentile` (algebraic t-digest) via the `exact` flag. Event
  * detection is a single shuffle per series key: every window shares
  * `partitionBy(user_id)`, so Catalyst plans one exchange+sort.
  */
object Mhw {

  /** One-shot latch for the exact-overrides-sketch posture notice. */
  private val ApproxNoticeLogged =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Daily series: one observation per (series key, calendar day).
    * sst = mean event value that day, rounded (6dp) for cross-engine
    * parity. Adds year + leap-normalized DOY. Memoized + persisted per
    * (session, dir) in the bounded [[graft.Caches]] registry: every
    * operator in the MHW chain starts here, and the table is tiny
    * relative to the events it aggregates. */
  def daily(s: SparkSession, dir: String): DataFrame =
    graft.Caches.persisted(s, ("mhw_daily", dir)) {
      Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(davg(col("value"), 6).as("sst"))
        .withColumn("yr", year(col("d")))
        .withColumn("doy", climDoy(col("d")))
    }

  /** Distinct dates → leap-normalized DOY (query #1). */
  def climDoyTable(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(to_date(col("ts")).as("d")).distinct()
      .withColumn("doy", climDoy(col("d")))

  // ---------------------------------------------------------------- pooling

  /** One hash shuffle on the series key. Every aggregate in the pooling
    * chain groups by (user_id, some-doy-expression), and hash(user_id)
    * satisfies that clustering requirement, so after this exchange the
    * ±hw pooling explode, the per-DOY aggregate, the Feb-29 fan-out and
    * the ±15 smoothing explode all plan into ONE stage with zero further
    * exchanges. Without it the quantile path shuffles the ×(2hw+1)
    * exploded samples themselves (collect_list partials don't reduce),
    * i.e. 11× the daily volume — measured superlinear at the ×30
    * reference grid (BENCH_GRID_x30). MHW grids are volume-uniform per
    * key (366·years daily rows each), so keying the exchange on the
    * series id alone introduces no skew.
    *
    * The partition count is pinned to spark.sql.shuffle.partitions:
    * left implicit, AQE sizes the exchange by its INPUT bytes (the
    * compact daily table) and coalesces to a handful of partitions —
    * but each row fans out ×11 and then ×31 downstream in-stage, so
    * coalescing starves the whole chain of parallelism. */
  private[graft] def byKey(df: DataFrame): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, col("user_id"))

  /** Explode each daily observation to the (2·hw+1) window centers it
    * contributes to, with the reference's cross-year grid semantics: a
    * center that falls off the [1,366] grid belongs to the adjacent year
    * and only counts if that year is present in the data. */
  private[graft] def poolSamples(dailyDf: DataFrame, hw: Int): DataFrame = {
    val years = dailyDf.select(col("yr").as("c_yr")).distinct()
    byKey(dailyDf)
      .withColumn("k", explode(sequence(lit(-hw), lit(hw))))
      .withColumn("c_raw", col("doy") + col("k"))
      .withColumn("c_yr", col("yr") +
        when(col("c_raw") < 1, -1).when(col("c_raw") > 366, 1).otherwise(0))
      .join(broadcast(years), "c_yr")
      .select(col("user_id"), wrapDoy(col("c_raw")).as("doy"), col("sst"))
  }

  /** Linear-interpolation quantile over a pre-sorted array column (the
    * shared [[graft.Parity.linQuantile]] definition). */
  private def linQuantile(vs: Column, p: Double): Column =
    graft.Parity.linQuantile(vs, p)

  /** Slot-partials pooling — the clim_incremental mergeable-partials
    * discipline ([[climIncremental]]) applied to the ±hw pooled
    * climatology, replacing the raw ×(2hw+1) observation fan that was
    * the engine's one remaining memory wall (BENCH_GRID_x100: 207 GB
    * memory spill at 348 M points — grouped collect_list/GK aggregates
    * run sort-based above 128 groups per partition, so the old shape
    * external-sorted the ENTIRE ×11 exploded sample stream).
    *
    * Two-level build, all in the single [[byKey]] stage:
    *   1. aggregate once per (key, doy) SLOT — unsorted value array,
    *      exact DECIMAL(38,10) sum, count, NaN flag — each in three
    *      year-shift eligibility variants (all years / obs whose next
    *      year exists / obs whose previous year exists, the
    *      cross-year-grid rule of [[poolSamples]]: a contribution that
    *      wraps off the [1,366] grid lands in the adjacent year and
    *      only counts if that year is present);
    *   2. fan SLOTS (not observations) ×(2hw+1) and pick the variant
    *      each wrap direction needs: c_raw>366 wraps forward (needs
    *      year+1 present), c_raw<1 wraps backward (year−1), in-range
    *      centers take everything.
    * The merge per center ([[poolMerged]]) then flattens 2hw+1 small
    * arrays and sums 2hw+1 decimal partials.
    *
    * BIT-IDENTICAL to the raw fan (spec-pinned, "slot-partials pooling
    * ≡ raw fan"): the flattened multiset per center is the same set of
    * doubles, so the re-sorted array and [[graft.Parity.linQuantile]]
    * agree bit-for-bit; decimal sums are exact and associative, so the
    * merged mean finalizes to the same bits. The pre-aggregate row fan
    * drops from ×11 on observations to ×11 on (years× fewer) slots —
    * at the reference ×100 grid (33 years) that is 33× fewer rows
    * through the heavy aggregate, the external-sort volume falls from
    * ~11× to ~2× the daily bytes, and the measured spill goes from
    * 207 GB memory / 20.7 GB disk to ZERO (BENCH_GRID_x100 r10 → r11).
    * Cost of the extra aggregate level: on SINGLE-YEAR data (the sf
    * bench tables span one January) slots ≈ observations, so the
    * second aggregate buys nothing and legacy_clim_thresh pays ~+0.4 s
    * at sf0.1 — accepted: the raw fan's cost grows with years×volume
    * (the 100 TB axis), the slot overhead is a constant factor on a
    * chain that is already sub-second at bench SF. */
  private[graft] def pooledSlots(dailyDf: DataFrame, hw: Int,
                                 withValues: Boolean = true): DataFrame = {
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 10)
    val years = dailyDf.select(col("yr")).distinct()
    // per-observation eligibility flags (broadcast joins keep the byKey
    // partitioning, so the whole chain still plans into one stage)
    val flagged = byKey(dailyDf)
      .join(broadcast(years.select((col("yr") - 1).as("yr"),
                                   lit(1).as("next_ok"))), Seq("yr"), "left")
      .join(broadcast(years.select((col("yr") + 1).as("yr"),
                                   lit(1).as("prev_ok"))), Seq("yr"), "left")
    def variant(cond: Column, sfx: String): Seq[Column] = {
      val v = when(cond, col("sst"))
      val base = Seq(
        sum(v.cast(Dec)).as(s"s$sfx"),
        count(v).as(s"n$sfx"),
        // eligible-ROW count, null-sst rows included: the raw fan emits
        // a center whenever ANY eligible observation row exists (even
        // all-null sst), so center existence must be keyed on rows, not
        // on non-null values (round-11 advisory)
        count(when(cond, lit(1))).as(s"ne$sfx"),
        max(when(cond && isnan(col("sst")), 1).otherwise(0)).as(s"nan$sfx"))
      if (withValues) collect_list(v).as(s"vs$sfx") +: base else base
    }
    val aggs = variant(lit(true), "_all") ++
      variant(col("next_ok") === 1, "_next") ++
      variant(col("prev_ok") === 1, "_prev")
    val slots = flagged.groupBy(col("user_id"), col("doy"))
      .agg(aggs.head, aggs.tail: _*)
    def pick(c: String): Column =
      when(col("c_raw") > 366, col(s"${c}_next"))
        .when(col("c_raw") < 1, col(s"${c}_prev"))
        .otherwise(col(s"${c}_all"))
    val payload =
      (if (withValues) Seq(pick("vs").as("vs")) else Nil) ++
        Seq(pick("s").as("s"), pick("n").as("n"), pick("ne").as("ne"),
            pick("nan").as("nan"))
    slots
      .withColumn("k", explode(sequence(lit(-hw), lit(hw))))
      .withColumn("c_raw", col("doy") + col("k"))
      .select(col("user_id") +: wrapDoy(col("c_raw")).as("doy") +: payload: _*)
  }

  /** Merge (2hw+1) slot partials per window center: sorted pooled value
    * array (multiset-equal to the raw fan's, hence quantile-identical),
    * exact decimal sum + count (mean-identical), pooled NaN flag.
    * Centers with NO eligible observation row (data confined to a
    * year-boundary sliver with no adjacent year) are dropped — the raw
    * fan never emits them either. Existence is keyed on the eligible-
    * ROW count `ne` (null-sst rows included), not the non-null value
    * count: a center whose eligible rows are all null-sst must survive
    * with null seas/thresh, exactly as the raw fan emits it. */
  private[graft] def poolMerged(dailyDf: DataFrame, hw: Int,
                                withValues: Boolean = true): DataFrame = {
    val merge =
      (if (withValues) Seq(sort_array(flatten(collect_list(col("vs")))).as("vs"))
       else Nil) ++
        Seq(sum(col("s")).as("s"), sum(col("n")).as("n"),
            sum(col("ne")).as("ne"), max(col("nan")).as("has_nan"))
    pooledSlots(dailyDf, hw, withValues)
      .groupBy(col("user_id"), col("doy"))
      .agg(merge.head, merge.tail: _*)
      .filter(col("ne") > 0)
      .drop("ne")
  }

  /** Pooled per-DOY quantile (best-practice threshold before smoothing).
    * Strict skipna: any NaN observation in a window nulls that center.
    * `exact=false` switches to approx_percentile for extreme scale; the
    * exact path co-locates each (key,doy) group's ≤ years×(2w+1) values —
    * bounded per group, no global hotspot.
    *
    * Approx error contract (MhwSpec "approx threshold rank-error
    * bound"): approx_percentile is Greenwald–Khanna with relative rank
    * error 1/`accuracy` — the returned value's rank in the pooled group
    * is within n/accuracy of the target rank ⌊p·(n−1)⌋, so the VALUE
    * error is bounded by the sample spread across that rank window
    * (data-dependent, tight where the distribution is dense). At the
    * default accuracy=10000 any group with < 10000 samples (= fewer
    * than ~900 pooled years) is rank-exact, which is why sf-local runs
    * match the exact path bit-for-bit; the spec exercises a LOW
    * accuracy to pin the bound in the divergent regime. */
  def pooledQuantile(dailyDf: DataFrame, hw: Int, pctile: Double,
                     exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    // The [[graft.Hints.ApproxQuantiles]] posture deliberately does NOT
    // flip this chain (unlike the event-stats family): pooled-climatology
    // groups are YEARS-BOUNDED (≤ (2hw+1)·years samples — ~350 at a
    // century of daily data), so a GK sketch's bounded state buys
    // nothing the slot-partials build doesn't already guarantee, while
    // its raw ×(2hw+1) observation fan re-creates the sort-fallback
    // spill the slot build exists to kill. The sketch branch remains
    // reachable via `exact = false` — the divergent-regime rank-error
    // contract is pinned there (MhwSpec) — for callers who genuinely
    // want it.
    val ex = exact
    // one-time notice (round-11 advisory): a deployment that set the
    // global sketch posture should see that this family intentionally
    // ignores it rather than silently wonder which path ran
    if (ex && graft.Hints.approxQuantiles(dailyDf.sparkSession) &&
        ApproxNoticeLogged.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"${graft.Hints.ApproxQuantiles} is set, but the MHW pooled-" +
        "climatology family keeps the exact slot-partials build by design " +
        "(years-bounded groups; see pooledQuantile scaladoc). " +
        "Pass exact = false to force the sketch branch.")
    if (ex)
      // slot-partials build ([[pooledSlots]]): bit-identical values,
      // ×years fewer rows through the heavy aggregate
      poolMerged(dailyDf, hw)
        .select(col("user_id"), col("doy"),
                when(col("has_nan") === 1, lit(null))
                  .otherwise(r(linQuantile(col("vs"), pctile), 6)).as("thresh"))
    else
      // sketch path: GK summaries have bounded per-group state; keeps
      // the raw fan because GK digests aren't mergeable from SQL and
      // the spec-pinned rank-error contract is defined over this exact
      // insertion stream
      poolSamples(dailyDf, hw)
        .groupBy(col("user_id"), col("doy"))
        .agg(expr(s"array(approx_percentile(sst, $pctile, $accuracy))").as("vs"),
             max(when(isnan(col("sst")), 1).otherwise(0)).as("has_nan"))
        .select(col("user_id"), col("doy"),
                when(col("has_nan") === 1, lit(null))
                  .otherwise(r(element_at(col("vs"), 1), 6)).as("thresh"))
  }

  /** Raw-fan spelling of the exact pooled quantile — retained as the
    * parity reference for the slot-partials rework (spec: "slot-partials
    * pooling ≡ raw fan", bit-identical at sf). Not on any query path. */
  private[graft] def pooledQuantileRawFan(dailyDf: DataFrame, hw: Int,
                                          pctile: Double): DataFrame =
    poolSamples(dailyDf, hw)
      .groupBy(col("user_id"), col("doy"))
      .agg(sort_array(collect_list(col("sst"))).as("vs"),
           max(when(isnan(col("sst")), 1).otherwise(0)).as("has_nan"))
      .select(col("user_id"), col("doy"),
              when(col("has_nan") === 1, lit(null))
                .otherwise(r(linQuantile(col("vs"), pctile), 6)).as("thresh"))

  /** Pooled per-DOY mean (legacy climatology before Feb-29 + smoothing).
    * Slot-partials build: merged exact decimal sum / merged count is
    * bit-identical to davg over the raw fan (decimal addition is exact
    * and associative; the finalize expression is the same). */
  def pooledMean(dailyDf: DataFrame, hw: Int): DataFrame =
    poolMerged(dailyDf, hw, withValues = false)
      .select(col("user_id"), col("doy"),
              r(col("s").cast("double") / col("n"), 6).as("seas"))

  /** Raw-fan spelling of [[pooledMean]] — parity reference for the
    * slot-partials rework (spec-pinned). Not on any query path. */
  private[graft] def pooledMeanRawFan(dailyDf: DataFrame, hw: Int): DataFrame =
    poolSamples(dailyDf, hw)
      .groupBy(col("user_id"), col("doy"))
      .agg(davg(col("sst"), 6).as("seas"))

  /** Plain per-DOY mean (best-practice climatology). */
  def climatologyBp(dailyDf: DataFrame): DataFrame =
    dailyDf.groupBy(col("user_id"), col("doy"))
      .agg(davg(col("sst"), 6).as("seas"))

  // ------------------------------------------------------------- smoothing

  /** 31-slot circular running mean over the DOY grid, min_periods=1:
    * smoothed[d] = mean of available values at circular slots d±15.
    * Absent slots contribute nothing (nanmean); outputs every slot within
    * 15 of an available one. */
  def smoothDoy(climDf: DataFrame, valCol: String, half: Int = 15): DataFrame =
    smoothDoyCols(climDf, Seq(valCol), half)

  /** [[smoothDoy]] over several value columns in one explode+aggregate
    * (identical per-column arithmetic — the fused legacy chain smooths
    * seas and thresh in a single pass). */
  def smoothDoyCols(climDf: DataFrame, valCols: Seq[String], half: Int = 15): DataFrame =
    climDf
      .withColumn("o", explode(sequence(lit(-half), lit(half))))
      .groupBy(col("user_id"), wrapDoy(col("doy") + col("o")).as("doy"))
      .agg(davg(col(valCols.head), 6).as(valCols.head),
           valCols.tail.map(c => davg(col(c), 6).as(c)): _*)

  /** Legacy Feb-29: replace every DOY-60 row with 0.5·(DOY59 + DOY61);
    * if either neighbour is absent the row is absent (NaN semantics).
    *
    * Single-pass form: each row fans out map-side to the slots it
    * feeds (itself unless DOY 60; DOY 59/61 additionally contribute to
    * slot 60), then ONE grouped aggregate reassembles the grid. The
    * naive filter-join-union spelling references the input THREE times,
    * so Spark evaluates the (expensive) upstream pooling subtree three
    * times per action — on the reference-scale 3.5 M-point grid that
    * alone tripled the legacy chain's cost. Values are bit-identical:
    * the same `0.5·v59 + 0.5·v61` expression, null neighbours still
    * null the slot, either neighbour absent → slot absent. */
  def interpFeb29(climDf: DataFrame, valCol: String): DataFrame =
    interpFeb29Cols(climDf, Seq(valCol))

  /** [[interpFeb29]] over several value columns in one pass (the fused
    * legacy chain interpolates seas and thresh together). */
  def interpFeb29Cols(climDf: DataFrame, valCols: Seq[String]): DataFrame = {
    def payload = valCols.map(c => col(c).as(c))
    val fan = explode(array(
      when(col("doy") =!= 60,
        struct((col("doy").as("doy2") +: lit(0).as("src") +: payload): _*)),
      when(col("doy") === 59,
        struct((lit(60).as("doy2") +: lit(59).as("src") +: payload): _*)),
      when(col("doy") === 61,
        struct((lit(60).as("doy2") +: lit(61).as("src") +: payload): _*))))
    val perCol = valCols.flatMap { c =>
      Seq(max(when(col("c.src") === 0, col(s"c.$c"))).as(s"direct_$c"),
          max(when(col("c.src") === 59, col(s"c.$c"))).as(s"v59_$c"),
          max(when(col("c.src") === 61, col(s"c.$c"))).as(s"v61_$c"))
    }
    val counts = Seq(
      sum(when(col("c.src") === 0, 1).otherwise(0)).as("dcnt"),
      sum(when(col("c.src") === 59, 1).otherwise(0)).as("n59"),
      sum(when(col("c.src") === 61, 1).otherwise(0)).as("n61"))
    val aggs = counts ++ perCol
    climDf.select(col("user_id"), fan.as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("user_id"), col("c.doy2").as("doy"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("dcnt") > 0 || (col("n59") === 1 && col("n61") === 1))
      .select(col("user_id") +: col("doy") +: valCols.map { c =>
        when(col("dcnt") > 0, col(s"direct_$c"))
          .otherwise(r(lit(0.5) * col(s"v59_$c") + lit(0.5) * col(s"v61_$c"), 6))
          .as(c)
      }: _*)
  }

  // ------------------------------------------------- composed climatologies

  /** best_practice.compute_climatology, smoothPercentile=false. */
  def climatologyBpRaw(s: SparkSession, dir: String): DataFrame =
    climatologyBp(daily(s, dir))

  /** #11m clim_incremental: the MERGEABLE-PARTIALS form of the
    * best-practice climatology — the property that makes the
    * reference's core maintainable at 100 TB: a new month of data
    * appends its per-(key, DOY) partials (decimal sum + count) and the
    * climatology is re-derived from merged partials WITHOUT rescanning
    * history. Demonstrated by splitting the daily series into
    * disjoint halves, aggregating each half independently, merging,
    * and finalizing — because the accumulator is exact decimal, the
    * result is BIT-IDENTICAL to the direct single-pass build
    * (spec-pinned against [[climatologyBpRaw]]; the oracle replays the
    * partials→merge→finalize path as CTEs — MhwSql.climIncremental). */
  def climIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 10)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"), col("doy"))
        .agg(sum(col("sst").cast(Dec)).as("s"), count(col("sst")).as("n"))
    val half = pmod(dayofmonth(col("d")), lit(2))
    partial(d.filter(half === 0)).unionByName(partial(d.filter(half === 1)))
      .groupBy(col("user_id"), col("doy"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .select(col("user_id"), col("doy"),
              r(col("s").cast("double") / col("n"), 6).as("seas"))
  }

  /** best_practice.compute_climatology, smoothPercentile=true. Keyed
    * exchange first: the per-DOY mean then aggregates map-side and the
    * ×31 smoothing explode stays in-stage (one shuffle total), where
    * smoothing a (user_id, doy)-partitioned grid would re-shuffle the
    * exploded 31× rows. The bare [[climatologyBpRaw]] keeps the plain
    * partial-agg shuffle — optimal when nothing runs downstream. */
  def climatologyBpSmooth(s: SparkSession, dir: String): DataFrame =
    smoothDoy(climatologyBp(byKey(daily(s, dir))), "seas")

  /** best_practice.compute_threshold, smoothPercentile=false, q=0.9. */
  def thresholdBpRaw(s: SparkSession, dir: String): DataFrame =
    pooledQuantile(daily(s, dir), 5, 0.9)

  /** best_practice.compute_threshold, smoothPercentile=true, q=0.9. */
  def thresholdBpSmooth(s: SparkSession, dir: String): DataFrame =
    smoothDoy(pooledQuantile(daily(s, dir), 5, 0.9), "thresh")

  /** legacy.compute_climatology: pooled mean + Feb-29 interp + smoothing. */
  def climatologyLegacy(s: SparkSession, dir: String): DataFrame =
    smoothDoy(interpFeb29(pooledMean(daily(s, dir), 5), "seas"), "seas")

  /** legacy.compute_threshold: pooled quantile + Feb-29 interp + smoothing. */
  def thresholdLegacy(s: SparkSession, dir: String): DataFrame =
    smoothDoy(interpFeb29(pooledQuantile(daily(s, dir), 5, 0.9), "thresh"), "thresh")

  /** Fused legacy climatology + threshold: ONE shared ±hw pooling
    * explode and a single per-(key,doy) aggregate computes both the
    * pooled mean (seas) and the pooled quantile (thresh); the Feb-29
    * interpolation and circular smoothing then run over both columns in
    * one pass each. Bit-identical to running [[climatologyLegacy]] and
    * [[thresholdLegacy]] separately (spec-pinned) at half the
    * scan/shuffle cost — severity consumes BOTH tables, so this is the
    * chain a user actually runs (the reference notebook's step 1). */
  def legacyClimThresh(dailyDf: DataFrame, hw: Int = 5, pctile: Double = 0.9,
                       accuracy: Int = 10000, exact: Boolean = true): DataFrame = {
    // same posture policy as [[pooledQuantile]]: pooled groups are
    // years-bounded, so the deployment posture keeps the slot-partials
    // exact build (bounded state AND no observation fan); the GK
    // branch stays reachable via `exact = false` for the
    // `accuracy`-tunable sketch contract
    val ex = exact
    val pooled =
      if (ex)
        // slot-partials build: the one shared slot table feeds both the
        // merged decimal mean and the merged pooled-value quantile —
        // bit-identical to the separate raw-fan operators (spec-pinned)
        poolMerged(dailyDf, hw)
          .select(col("user_id"), col("doy"),
                  r(col("s").cast("double") / col("n"), 6).as("seas"),
                  when(col("has_nan") === 1, lit(null))
                    .otherwise(r(linQuantile(col("vs"), pctile), 6)).as("thresh"))
      else
        poolSamples(dailyDf, hw)
          .groupBy(col("user_id"), col("doy"))
          .agg(davg(col("sst"), 6).as("seas"),
               expr(s"array(approx_percentile(sst, $pctile, $accuracy))").as("vs"),
               max(when(isnan(col("sst")), 1).otherwise(0)).as("has_nan"))
          .select(col("user_id"), col("doy"), col("seas"),
                  when(col("has_nan") === 1, lit(null))
                    .otherwise(r(element_at(col("vs"), 1), 6)).as("thresh"))
    smoothDoyCols(interpFeb29Cols(pooled, Seq("seas", "thresh")), Seq("seas", "thresh"))
  }

  /** Query: the fused legacy chain over the events-derived daily series. */
  def legacyClimThreshQ(s: SparkSession, dir: String): DataFrame =
    legacyClimThresh(daily(s, dir))

  // --------------------------------------------------------------- detrend

  /** best_practice.detrend deg=1 per series: OLS fit of sst against
    * elapsed days, trend subtracted over the full record. Slope/intercept
    * from exact decimal moment sums (order-independent → cross-engine
    * deterministic), final arithmetic IEEE double. One shuffle on the
    * series key; moments are algebraic (map-side partials). */
  def detrend(s: SparkSession, dir: String): DataFrame =
    detrendDaily(daily(s, dir))

  /** Generalized detrend over a canonical daily series: fit on the
    * baseline years (inclusive, None = full record), subtract the trend
    * over the full record — reference evaluates `xr.polyval(da.time)`
    * over everything after fitting on the period slice. */
  def detrendDaily(dl: DataFrame,
                   baseline: Option[(Int, Int)] = None): DataFrame =
    detrendDailyFit(dl, baseline match {
      case Some((y0, y1)) => _.filter(col("yr").between(y0, y1))
      case None => identity
    })

  /** Reference `detrend(period=slice(from, to))` with an ARBITRARY
    * calendar-date slice (best_practice/climatology.py:43, :71-76):
    * the pandas slice is date-granular — a mid-year baseline like
    * slice('1982-06-15', '2011-03-10') is inexpressible with the
    * year-granular `baseline` — so this takes inclusive ISO dates
    * (express a month-granular pandas slice by its expanded first/last
    * day). Fit on the slice, trend evaluated over the full record. */
  def detrendDailyPeriod(dl: DataFrame, fromDate: String, toDate: String): DataFrame =
    detrendDailyFit(dl,
      _.filter(col("d").between(to_date(lit(fromDate)), to_date(lit(toDate)))))

  /** Core: OLS per key over `fitSlice(t)`, trend subtracted everywhere. */
  private def detrendDailyFit(dl: DataFrame,
                              fitSlice: DataFrame => DataFrame): DataFrame = {
    val origin = dl.agg(min(col("d")).as("d0"))
    val t = dl.crossJoin(broadcast(origin))
      .withColumn("t", datediff(col("d"), col("d0")))
    val tFit = fitSlice(t)
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 10)
    val fit = tFit.groupBy(col("user_id")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("t").cast("long")).cast("double").as("st"),
      sum(col("t").cast("long") * col("t")).cast("double").as("stt"),
      sum(col("sst").cast(Dec)).cast("double").as("sy"),
      // double-multiply THEN cast: IEEE product is engine-identical,
      // decimal×int widening rules are not
      sum((col("sst") * col("t")).cast(Dec)).cast("double").as("sty"))
      .withColumn("slope",
        (col("n") * col("sty") - col("st") * col("sy")) /
        (col("n") * col("stt") - col("st") * col("st")))
      .withColumn("intercept",
        col("sy") / col("n") - col("slope") * (col("st") / col("n")))
      .select(col("user_id"), col("slope"), col("intercept"))
    t.join(graft.Hints.keyDim(fit), "user_id")
      .select(col("user_id"), col("d"),
        r(col("sst") - col("intercept") - col("slope") * col("t"), 6)
          .as("detrended"))
  }

  /** Query #8b detrend_poly2: best_practice.detrend with deg=2 — the
    * reference's `deg` parameter beyond the linear default
    * (best_practice/climatology.py:43 `detrend(..., deg)` →
    * `da.polyfit('time', deg)`). Quadratic normal equations solved in
    * closed form (Cramer's rule on the 3×3 moment matrix). Moment sums
    * are exact: integer powers of the day index accumulate in
    * DECIMAL(38,0) (t⁴ sums overflow int64 past ~30 years of daily
    * data), y-moments in DECIMAL(38,10) — order-independent, so the
    * determinant arithmetic sees identical doubles on both engines.
    * Same one-shuffle shape as the linear fit. */
  def detrendPoly2(s: SparkSession, dir: String): DataFrame =
    detrendPoly2Daily(daily(s, dir))

  /** Core of [[detrendPoly2]] over any (user_id, d, sst) daily frame. */
  def detrendPoly2Daily(dl: DataFrame): DataFrame = {
    val origin = dl.agg(min(col("d")).as("d0"))
    val t = dl.crossJoin(broadcast(origin))
      .withColumn("t", datediff(col("d"), col("d0")))
    val DecI = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val DecF = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 10)
    // integer powers stay integral per row (long t⁴ is exact to ~150
    // years of daily data) and accumulate in exact decimals
    val tl = col("t").cast("long")
    val fit = t.groupBy(col("user_id")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(tl.cast(DecI)).cast("double").as("s1"),
      sum((tl * tl).cast(DecI)).cast("double").as("s2"),
      sum((tl * tl * tl).cast(DecI)).cast("double").as("s3"),
      sum((tl * tl * tl * tl).cast(DecI)).cast("double").as("s4"),
      sum(col("sst").cast(DecF)).cast("double").as("sy"),
      sum((col("sst") * col("t")).cast(DecF)).cast("double").as("sty"),
      sum((col("sst") * col("t") * col("t")).cast(DecF)).cast("double").as("st2y"))
      // Cramer: det of [[n,s1,s2],[s1,s2,s3],[s2,s3,s4]]; columns
      // replaced by the y-moment vector for each coefficient
      .withColumn("det",
        col("n") * (col("s2") * col("s4") - col("s3") * col("s3")) -
        col("s1") * (col("s1") * col("s4") - col("s3") * col("s2")) +
        col("s2") * (col("s1") * col("s3") - col("s2") * col("s2")))
      .withColumn("c0",
        (col("sy") * (col("s2") * col("s4") - col("s3") * col("s3")) -
         col("s1") * (col("sty") * col("s4") - col("s3") * col("st2y")) +
         col("s2") * (col("sty") * col("s3") - col("s2") * col("st2y"))) / col("det"))
      .withColumn("c1",
        (col("n") * (col("sty") * col("s4") - col("s3") * col("st2y")) -
         col("sy") * (col("s1") * col("s4") - col("s3") * col("s2")) +
         col("s2") * (col("s1") * col("st2y") - col("sty") * col("s2"))) / col("det"))
      .withColumn("c2",
        (col("n") * (col("s2") * col("st2y") - col("sty") * col("s3")) -
         col("s1") * (col("s1") * col("st2y") - col("sty") * col("s2")) +
         col("sy") * (col("s1") * col("s3") - col("s2") * col("s2"))) / col("det"))
      .select(col("user_id"), col("c0"), col("c1"), col("c2"))
    t.join(graft.Hints.keyDim(fit), "user_id")
      .select(col("user_id"), col("d"),
        r(col("sst") - col("c0") - col("c1") * col("t") -
          col("c2") * col("t") * col("t"), 6).as("detrended"))
  }

  /** Query #8d detrend_period: [[detrendDailyPeriod]] on a sub-month
    * slice of the test corpus (Jan 8–22 inclusive of a Jan 1–30 record)
    * — the reference's date-granular `period=slice(...)` surface that
    * year-granular baselines cannot express. */
  def detrendPeriod(s: SparkSession, dir: String): DataFrame =
    detrendDailyPeriod(daily(s, dir), "2024-01-08", "2024-01-22")

  /** Query #8c detrend_baseline: best_practice.detrend's `period`
    * parameter — fit the linear trend on a baseline slice only (here the
    * first half of the record by day index; the reference takes an
    * arbitrary time slice), then evaluate and subtract it over the FULL
    * record (climatology.py:70-76: polyfit on `da.sel(time=period)`,
    * polyval over `da.time`). The slice boundary is a broadcast scalar —
    * no collect, no second shuffle. */
  def detrendBaseline(s: SparkSession, dir: String): DataFrame =
    detrendBaselineDaily(daily(s, dir))

  /** Core of [[detrendBaseline]] over any (user_id, d, sst) daily frame. */
  def detrendBaselineDaily(dl: DataFrame): DataFrame = {
    val origin = dl.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val t = dl.crossJoin(broadcast(origin))
      .withColumn("t", datediff(col("d"), col("d0")))
      .withColumn("cut", floor(datediff(col("d1"), col("d0")) / 2))
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 10)
    val fit = t.filter(col("t") <= col("cut"))
      .groupBy(col("user_id")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("t").cast("long")).cast("double").as("st"),
        sum(col("t").cast("long") * col("t")).cast("double").as("stt"),
        sum(col("sst").cast(Dec)).cast("double").as("sy"),
        sum((col("sst") * col("t")).cast(Dec)).cast("double").as("sty"))
      .withColumn("slope",
        (col("n") * col("sty") - col("st") * col("sy")) /
        (col("n") * col("stt") - col("st") * col("st")))
      .withColumn("intercept",
        col("sy") / col("n") - col("slope") * (col("st") / col("n")))
      .select(col("user_id"), col("slope"), col("intercept"))
    t.join(graft.Hints.keyDim(fit), "user_id")
      .select(col("user_id"), col("d"),
        r(col("sst") - col("intercept") - col("slope") * col("t"), 6)
          .as("detrended"))
  }

  // -------------------------------------------------------------- severity

  /** common.calculate_severity: T_anom = sst − seas(doy); severity =
    * T_anom / (thresh(doy) − seas(doy) + 1e-9). Clim tables are
    * key-proportional dims (366 rows per key): broadcast by default so
    * the fact side never shuffles, gated by [[graft.Hints.keyDim]] for
    * deployments whose key cardinality would OOM a broadcast — both
    * gated joins share the (user_id, doy) key, so the degraded plan
    * shuffles the fact side once. */
  def severity(dailyDf: DataFrame, seas: DataFrame, thresh: DataFrame): DataFrame =
    dailyDf
      .join(graft.Hints.keyDim(seas), Seq("user_id", "doy"))
      .join(graft.Hints.keyDim(thresh), Seq("user_id", "doy"))
      .select(col("user_id"), col("d"),
        r(col("sst") - col("seas"), 6).as("t_anom"),
        r((col("sst") - col("seas")) /
              (col("thresh") - col("seas") + lit(1e-9)), 6).as("severity"),
        // carried for the relThresh/abs intensity variants (Oliver's
        // mhw_relThresh / mhw_abs series); the base `severity` query
        // projects them away, so its contract is unchanged
        col("sst"), col("seas"), col("thresh"))

  /** Severity over the bp-smooth chain at the given pctile. The clim
    * tables are persisted (broadcast to facts, reused by every consumer)
    * and the chain itself is memoized per (session, dir, pctile) — the
    * event and category queries share one evaluation. The seas table is
    * keyed WITHOUT the pctile (it doesn't depend on it), so chains at
    * two pctiles share one persisted copy instead of double-persisting
    * an identical plan. */
  def severityChain(s: SparkSession, dir: String, pctile: Double = 0.9): DataFrame =
    graft.Caches.persisted(s, ("mhw_sev", dir, pctile)) {
      val dl = daily(s, dir)
      val seas = graft.Caches.persisted(s, ("mhw_seas", dir)) {
        smoothDoy(climatologyBp(dl), "seas")
      }
      val thresh = graft.Caches.persisted(s, ("mhw_thresh", dir, pctile)) {
        smoothDoy(pooledQuantile(dl, 5, pctile), "thresh")
      }
      severity(dl, seas, thresh)
    }

  // ---------------------------------------------------------------- events

  /** common.calculate_mhw_metrics: boolean runs of severity>1 on the
    * shared calendar index (absent days break runs, like NaN→False in the
    * reference), duration filter, then single-pass gap-join of kept runs
    * (start − prev_end ≤ maxGap — chains merge transitively). Metrics
    * computed over the merged index span INCLUDING gap days; peak is the
    * first argmax of T_anom. One shuffle: all windows share
    * partitionBy(user_id).
    *
    * `maxEvents` is the reference's `maxEvt`/`l_return` slot cap
    * (core.py:37,130: metrics arrays are pre-allocated at l_return=200
    * per cell, so chronologically later events have nowhere to land):
    * here a filter on the per-series chronological event ordinal,
    * applied BEFORE the span-metrics join so capped-away events don't
    * pay the join either. Long format needs no padding rows; the
    * default keeps every event (the cap only binds on >200-event
    * series — century-scale hourly records). */
  def detectEvents(sev: DataFrame, minDuration: Int = 5, maxGap: Int = 2,
                   maxEvents: Int = Int.MaxValue): DataFrame = {
    // persist FIRST: the severity table feeds the origin scalar, run
    // detection AND the span metrics join — otherwise the entire
    // upstream chain (pooled quantiles, smoothing, clim joins) is
    // re-evaluated once per consumer
    val sevP =
      if (sev.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        sev.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sev // the memoized severity chain arrives already persisted
    val origin = sevP.agg(min(col("d")).as("d0"))
    val s = sevP.crossJoin(broadcast(origin))
      .withColumn("idx", datediff(col("d"), col("d0")))
    val events0 = eventSpans(s, minDuration, maxGap)
    val events =
      if (maxEvents == Int.MaxValue) events0
      else events0.filter(col("evt") <= maxEvents)

    // Span-join facts back (events are per-key → keyDim-gated
    // broadcast), window for the per-event max, then one grouped pass
    // incl. first-argmax peak.
    val span = s.join(graft.Hints.keyDim(events),
        s("user_id") === events("user_id") &&
        col("idx").between(col("index_start"), col("index_end")))
      .drop(events("user_id"))
      .withColumn("mx", max(col("t_anom")).over(Window.partitionBy("user_id", "evt")))

    span.groupBy(col("user_id"), col("evt"), col("index_start"), col("index_end"))
      .agg(
        min(when(col("t_anom") === col("mx"), col("idx"))).as("index_peak"),
        max(col("t_anom")).as("intensity_max"),
        davg(col("t_anom"), 6).as("intensity_mean"),
        dsum(col("t_anom"), 6).as("intensity_cumul"),
        r(max(col("severity")), 6).as("severity_max"))
      .crossJoin(broadcast(origin))
      .select(col("user_id"), col("evt"),
        col("index_start"), col("index_end"),
        date_add(col("d0"), col("index_start")).as("date_start"),
        date_add(col("d0"), col("index_end")).as("date_end"),
        (col("index_end") - col("index_start") + 1).as("duration"),
        col("index_peak"),
        date_add(col("d0"), col("index_peak")).as("date_peak"),
        col("intensity_max"), col("intensity_mean"), col("intensity_cumul"),
        col("severity_max"))
  }

  /** Run detection core over an idx'd severity frame: boolean runs of
    * severity>1, duration filter, then single-pass gap-join (start −
    * prev_end ≤ maxGap, chains merge transitively). Returns the merged
    * event spans (user_id, evt, index_start, index_end). All windows
    * share partitionBy(user_id) — one exchange. */
  private def eventSpans(s: DataFrame, minDuration: Int, maxGap: Int): DataFrame = {
    val wU = Window.partitionBy("user_id")
    s.filter(col("severity") > 1)
      .withColumn("grp", col("idx") - row_number().over(wU.orderBy("idx")))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("idx")).as("i0"), max(col("idx")).as("i1"))
      .filter(col("i1") - col("i0") + 1 >= minDuration)
      .withColumn("brk",
        when(col("i0") - lag("i1", 1).over(wU.orderBy("i0")) <= maxGap, 0)
          .otherwise(1))
      .withColumn("evt", sum("brk").over(
        wU.orderBy("i0").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("evt"))
      .agg(min(col("i0")).as("index_start"), max(col("i1")).as("index_end"))
  }

  /** Hobday-2018 category from per-event max severity. */
  def categoryOf(sevMax: Column): Column =
    when(sevMax <= 2, "moderate")
      .when(sevMax <= 3, "strong")
      .when(sevMax <= 4, "severe")
      .otherwise("extreme")

  /** Query #10: full event metrics (pctile=0.6, minDuration=3, maxGap=2 —
    * parameters chosen so the test data exercises duration filtering AND
    * gap-merging; operator defaults stay Hobday 5/2). */
  /** The #10-parameterized event table (pctile 0.6, minDuration 3,
    * maxGap 2), memoized per (session, dir): EIGHT queries (#10, #317,
    * #11e, #11l, #11g, #87b/#87, #11i, #345) consume the IDENTICAL
    * detection output, so the window/gap-merge detection runs once per
    * session on top of the already-memoized severity chain. */
  private[graft] def eventsTable(s: SparkSession, dir: String): DataFrame =
    graft.Caches.persisted(s, ("mhw_events06", dir)) {
      detectEvents(severityChain(s, dir, 0.6), minDuration = 3, maxGap = 2)
    }

  def mhwEvents(s: SparkSession, dir: String): DataFrame =
    eventsTable(s, dir)
      .drop("severity_max")

  /** Query #317 mhw_onset_composite: SUPERPOSED EPOCH ANALYSIS around
    * event onsets — for each day offset in [−before, +after] relative
    * to every detected event's start, the composite (cross-event) mean
    * anomaly and severity. The canonical "what does an average MHW look
    * like as it spins up and decays" figure of the Hobday-school
    * literature: the pre-onset ramp (offsets < 0) shows how much
    * warning the threshold gives, the post-onset tail how events decay
    * relative to the duration filter. Same detection parameterization
    * as #10 (pctile 0.6, minDuration 3, maxGap 2) so the composite
    * describes exactly the events #10 reports; the severity composite
    * is the robust panel under that parameterization (the 0.6 quantile
    * can sit below the mean, where the anomaly's sign flips with the
    * denominator — severity is what detection thresholds on).
    *
    * Scale shape: the event table is per-key (keyDim-gated broadcast,
    * the detectEvents span-join discipline); the composite is one
    * range-join of the persisted severity table against it plus a
    * ≤(before+after+1)-row rollup — no window, nothing collected. */
  def mhwOnsetComposite(s: SparkSession, dir: String, before: Int = 10,
                        after: Int = 20): DataFrame = {
    val sev = severityChain(s, dir, 0.6)
    val ev = eventsTable(s, dir)
      .select(col("user_id").as("ev_uid"), col("index_start"))
    val origin = sev.agg(min(col("d")).as("d0"))
    val si = sev.crossJoin(broadcast(origin))
      .withColumn("idx", datediff(col("d"), col("d0")))
    si.join(graft.Hints.keyDim(ev),
        col("user_id") === col("ev_uid") &&
        col("idx").between(col("index_start") - before,
                           col("index_start") + after))
      .select((col("idx") - col("index_start")).cast("int").as("offset"),
              col("t_anom"), col("severity"))
      .groupBy(col("offset"))
      .agg(count(lit(1)).as("n_obs"),
           davg(col("t_anom"), 6).as("mean_anom"),
           davg(col("severity"), 6).as("mean_severity"))
      .orderBy(col("offset"))
  }

  /** Query #11: Hobday-2018 category distribution over detected events. */
  def mhwCategory(s: SparkSession, dir: String): DataFrame =
    eventsTable(s, dir)
      .groupBy(categoryOf(col("severity_max")).as("category"))
      .agg(count(lit(1)).as("n_events"),
           davg(col("duration").cast("double"), 4).as("avg_duration"),
           max(col("intensity_max")).as("max_intensity"))

  /** Query #11d mhw_spatial_extent: per-day MHW coverage — the fraction
    * of observed series in MHW state (severity > 1) each calendar day,
    * the "MHW area" time series of the Hobday mapping studies. One
    * partial-aggregated groupBy over the (persisted) severity table; at
    * 100 TB the day axis has bounded cardinality → tiny shuffle. */
  def mhwSpatialExtent(s: SparkSession, dir: String): DataFrame =
    severityChain(s, dir, 0.9)
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_series"),
           sum(when(col("severity") > 1, 1L).otherwise(0L)).as("n_mhw"))
      .withColumn("mhw_frac", r(col("n_mhw") / col("n_series"), 6))

  /** #341 mhw_event_sync: pairwise EVENT SYNCHRONY — for every series
    * pair that is ever in MHW state on the same day, the Jaccard
    * overlap of their event-day sets (co-event days / union of event
    * days). #11d answers "how much of the basin is burning TODAY";
    * this answers "WHICH CELLS burn TOGETHER" — the spatial-coherence
    * readout behind regional event attribution (a basin-wide forcing
    * shows as a dense high-Jaccard block, local noise as isolated
    * pairs). Pairs that never co-occur are absent — identically in
    * both engines.
    *
    * Scale shape: the event-day table is DETECTION OUTPUT (tiny vs
    * facts); the co-occurrence join is day-keyed, so the per-day fan
    * is (active series)². Event sparsity bounds quiet days, but a
    * basin-wide event makes active ≈ all series — the hot day IS a
    * series² skewed fan, and the output itself is pair-cardinality.
    * [[graft.Hints.SyncDayCap]] bounds it: a positive K keeps, per
    * day, only the K active series with the smallest md5 rank (hash
    * of the series key alone, so the kept set is deterministic and a
    * low-rank series keeps its complete day set), capping the day fan
    * at K² and the output at K²·|days|. Both the pair join AND the
    * per-series day counts run on the capped table, so the capped
    * Jaccard is self-consistent (the synchrony of the subsampled
    * sets, not a biased estimate of the full one). Default 0 = exact,
    * oracle parity; the degraded plan is pinned in PostureSpec. */
  def mhwEventSync(s: SparkSession, dir: String): DataFrame =
    eventSyncDf(severityChain(s, dir, 0.9)
      .filter(col("severity") > 1)
      .select(col("user_id"), col("d")))

  /** DataFrame-generic core: expects a (user_id, d) event-day set. */
  private[graft] def eventSyncDf(evdIn: DataFrame): DataFrame = {
    val cap = graft.Hints.syncDayCap(evdIn.sparkSession)
    val evdAll = graft.Lineage.pin(evdIn)
    val evd =
      if (cap <= 0) evdAll
      else {
        // deterministic per-day thinning: rank active series by a hash
        // of the series key ALONE — the kept set is reproducible, and a
        // series below the rank cut keeps its entire day set. The
        // ranking window is day-keyed and linear in actives (the fan it
        // exists to bound is quadratic).
        val wd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("d"))
          .orderBy(md5(col("user_id").cast("string")), col("user_id"))
        evdAll.withColumn("rk", row_number().over(wd))
          .filter(col("rk") <= cap)
          .drop("rk")
      }
    val cnt = evd.groupBy(col("user_id")).agg(count(lit(1)).as("nd"))
    evd.select(col("user_id").as("user_a"), col("d"))
      .join(evd.select(col("user_id").as("user_b"), col("d")), Seq("d"))
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("days_both"))
      .join(cnt.select(col("user_id").as("user_a"), col("nd").as("days_a")),
            "user_a")
      .join(cnt.select(col("user_id").as("user_b"), col("nd").as("days_b")),
            "user_b")
      .withColumn("jaccard",
        r(col("days_both").cast("double") /
          (col("days_a") + col("days_b") - col("days_both")), 6))
      .select(col("user_a"), col("user_b"), col("days_a"), col("days_b"),
              col("days_both"), col("jaccard"))
      .orderBy(col("user_a"), col("user_b"))
  }

  /** #359 mhw_event_sync_blocks: event synchrony COARSE-GRAINED to
    * series blocks — the aggregation answer to #341's basin-wide-day
    * quadratic (the alternative to [[graft.Hints.SyncDayCap]]'s
    * thinning): series collapse to blocks of `blockSize` consecutive
    * keys, a block is event-active on a day when ANY member is, and
    * the pair Jaccard runs over block event-day sets through the SAME
    * key-generic core as #341. The day fan is (active blocks)² ≤
    * (series/B)² — a B² worst-case reduction — and the output is
    * blocks²-bounded, so the regional-coherence readout (which AREAS
    * burn together) survives the basin-wide regime that makes the
    * cell-level pair table itself impractical. blockSize is the
    * resolution/cost knob a deployment sets to its cell-to-region
    * ratio. */
  def mhwEventSyncBlocks(s: SparkSession, dir: String,
                         blockSize: Int = 16): DataFrame =
    eventSyncDf(severityChain(s, dir, 0.9)
      .filter(col("severity") > 1)
      .select(floor(col("user_id") / blockSize).cast("long").as("user_id"),
              col("d"))
      .distinct())
      .withColumnRenamed("user_a", "block_a")
      .withColumnRenamed("user_b", "block_b")

  /** Query #11e mhw_annual_stats: per-series annual event block stats —
    * event count, total MHW days, mean/max peak intensity, summed
    * cumulative intensity — the `blockAverage` analog of the public
    * marineHeatWaves toolkit (annual block summaries of detected
    * events). Events are tiny relative to facts, so this is a free
    * post-aggregation on the detection output. */
  def mhwAnnualStats(s: SparkSession, dir: String): DataFrame =
    eventsTable(s, dir)
      .groupBy(col("user_id"), year(col("date_start")).as("yr"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("duration").cast("long")).as("mhw_days"),
           davg(col("intensity_max"), 6).as("mean_imax"),
           max(col("intensity_max")).as("max_imax"),
           dsum(col("intensity_cumul"), 6).as("total_cumul"))

  /** #11l mhw_event_dist: corpus-wide distribution of event durations
    * and peak intensities — the headline summary a basin-scale MHW
    * census reports (how long, how hot, across how many series).
    * Detection output is key-proportional-tiny relative to facts, so
    * the single-row final aggregate is cheap; the duration percentiles
    * use the same exact sorted-array interpolation as the threshold
    * chain, conf-switched to `approx_percentile` sketches via
    * [[graft.Hints.ApproxQuantiles]] (exactly as Mhw.pooledQuantile). */
  def mhwEventDist(s: SparkSession, dir: String): DataFrame = {
    def pq(p: Double): Column =
      if (graft.Hints.approxQuantiles(s))
        r(expr(s"approx_percentile(CAST(duration AS DOUBLE), $p, 10000)"), 6)
      else
        r(linQuantile(sort_array(collect_list(col("duration").cast("double"))), p), 6)
    eventsTable(s, dir)
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_series"),
           davg(col("duration").cast("double"), 6).as("mean_duration"),
           max(col("duration")).cast("int").as("max_duration"),
           pq(0.5).as("p50_duration"),
           pq(0.9).as("p90_duration"),
           davg(col("intensity_max"), 6).as("mean_imax"),
           max(col("intensity_max")).as("max_imax"))
  }

  /** #11j `mhw_trend_annual`: the Oliver-2018 headline statistic —
    * the linear trend in annual MHW days per series, in days/decade.
    * Builds the complete per-key annual series (years with zero events
    * INCLUDED via the key's daily-record year span — a fit over only
    * event-years biases the trend high), then a closed-form least
    * squares in exact integer sums (years and day counts are integers,
    * so Σx, Σx², Σxy are exact longs; only the final slope division is
    * IEEE). Events are key-proportional-tiny and the year spine is
    * ~decades/key: both sides of the final join are partial-aggregated
    * before the one exchange on user_id. */
  def mhwTrendAnnual(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsTable(s, dir)
    val annual = ev
      .groupBy(col("user_id"), year(col("date_start")).as("yr"))
      .agg(sum(col("duration").cast("long")).as("days"))
    val spine = daily(s, dir)
      .groupBy(col("user_id"))
      .agg(min(col("yr")).as("y0"), max(col("yr")).as("y1"))
      .select(col("user_id"),
              explode(sequence(col("y0"), col("y1"))).as("yr"))
    val full = spine.join(annual, Seq("user_id", "yr"), "left")
      .select(col("user_id"), col("yr"),
              coalesce(col("days"), lit(0L)).as("days"))
    val n = count(lit(1)).cast("double")
    val st = sum(col("yr").cast("long")).cast("double")
    val stt = sum((col("yr") * col("yr")).cast("long")).cast("double")
    val sy = sum(col("days")).cast("double")
    val sty = sum(col("days") * col("yr")).cast("double")
    full.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_years"),
           r(sy / n, 6).as("mean_days"),
           r(when(n * stt - st * st === 0d, 0d)
               .otherwise((n * sty - st * sy) / (n * stt - st * st)) * 10, 6)
             .as("trend_days_per_decade"))
  }

  /** Query #11g mhw_event_rates: the remainder of Oliver's per-event
    * metric battery (reference ground-truth asset
    * tests/data/legacy/marineHeatWaves.py:373-410):
    *  - intensity variability = sqrt of the population variance of the
    *    anomaly over the event span (incl. gap days), plus the relThresh
    *    (sst − thresh) and absolute (sst) intensity variants;
    *  - per-category day counts, cats = floor(severity) per day (Oliver's
    *    floor(1 + relThreshNorm); our severity carries the reference's
    *    1e-9 epsilon and 6dp stage rounding);
    *  - rate_onset / rate_decline with the half-day boundary convention:
    *    event-edge strength is the midpoint to the neighbouring day's
    *    anomaly when that calendar day exists; otherwise (series boundary
    *    — or a calendar gap, which the reference's dense grid cannot
    *    represent) the peak-distance slope fallback.
    * Variances use exact decimal moment sums (order-independent), final
    * arithmetic IEEE double, 6dp stage rounding — bit-identical to the
    * DuckDB oracle. Single shuffle: the neighbour lag/lead and the run
    * detection share partitionBy(user_id); events are tiny → broadcast
    * span join, like detectEvents. */
  def mhwEventRates(s: SparkSession, dir: String): DataFrame =
    eventRates(severityChain(s, dir, 0.6), minDuration = 3, maxGap = 2)

  /** Core of [[mhwEventRates]] over any severity frame carrying
    * (user_id, d, t_anom, severity, sst, seas, thresh). */
  def eventRates(sev: DataFrame, minDuration: Int = 5, maxGap: Int = 2): DataFrame = {
    val origin = sev.agg(min(col("d")).as("d0"))
    val wOrd = Window.partitionBy("user_id").orderBy("idx")
    val t = sev.crossJoin(broadcast(origin))
      .withColumn("idx", datediff(col("d"), col("d0")))
      .withColumn("ta_prev",
        when(col("idx") - lag("idx", 1).over(wOrd) === 1,
          lag("t_anom", 1).over(wOrd)))
      .withColumn("ta_next",
        when(lead("idx", 1).over(wOrd) - col("idx") === 1,
          lead("t_anom", 1).over(wOrd)))
    val events = eventSpans(t, minDuration, maxGap)
    val span = t.join(graft.Hints.keyDim(events),
        t("user_id") === events("user_id") &&
        col("idx").between(col("index_start"), col("index_end")))
      .drop(events("user_id"))
      .withColumn("rt", r(col("sst") - col("thresh"), 6))
      .withColumn("mx", max(col("t_anom")).over(Window.partitionBy("user_id", "evt")))
    val g = span
      .groupBy(col("user_id"), col("evt"), col("index_start"), col("index_end"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        min(when(col("t_anom") === col("mx"), col("idx"))).as("index_peak"),
        max(col("t_anom")).as("ta_peak"),
        dsum(col("t_anom")).as("m1"),
        dsum(col("t_anom") * col("t_anom")).as("m2"),
        count(col("rt")).cast("double").as("nrt"),
        max(col("rt")).as("imax_relthresh"),
        davg(col("rt"), 6).as("imean_relthresh"),
        dsum(col("rt")).as("rt1"),
        dsum(col("rt") * col("rt")).as("rt2"),
        dsum(col("rt"), 6).as("icum_relthresh"),
        max(col("sst")).as("imax_abs"),
        davg(col("sst"), 6).as("imean_abs"),
        dsum(col("sst")).as("a1"),
        dsum(col("sst") * col("sst")).as("a2"),
        dsum(col("sst"), 6).as("icum_abs"),
        sum(when(floor(col("severity")) === 1, 1L).otherwise(0L)).as("days_moderate"),
        sum(when(floor(col("severity")) === 2, 1L).otherwise(0L)).as("days_strong"),
        sum(when(floor(col("severity")) === 3, 1L).otherwise(0L)).as("days_severe"),
        sum(when(floor(col("severity")) >= 4, 1L).otherwise(0L)).as("days_extreme"),
        min(when(col("idx") === col("index_start"), col("t_anom"))).as("ta_first"),
        min(when(col("idx") === col("index_end"), col("t_anom"))).as("ta_last"),
        min(when(col("idx") === col("index_start"), col("ta_prev"))).as("ta_prev0"),
        min(when(col("idx") === col("index_end"), col("ta_next"))).as("ta_next1"))
    val tp = (col("index_peak") - col("index_start")).cast("double")
    val td = (col("index_end") - col("index_peak")).cast("double")
    def sd(s2: Column, s1: Column, cnt: Column): Column =
      r(sqrt(greatest(s2 / cnt - (s1 / cnt) * (s1 / cnt), lit(0.0))), 6)
    g.select(
      col("user_id"), col("evt"), col("index_start"), col("index_end"),
      (col("index_end") - col("index_start") + 1).as("duration"),
      col("index_peak"),
      sd(col("m2"), col("m1"), col("n")).as("intensity_var"),
      col("imax_relthresh"), col("imean_relthresh"),
      sd(col("rt2"), col("rt1"), col("nrt")).as("ivar_relthresh"),
      col("icum_relthresh"),
      col("imax_abs"), col("imean_abs"),
      sd(col("a2"), col("a1"), col("n")).as("ivar_abs"),
      col("icum_abs"),
      col("days_moderate"), col("days_strong"),
      col("days_severe"), col("days_extreme"),
      r(when(col("ta_prev0").isNotNull,
          (col("ta_peak") - lit(0.5) * (col("ta_first") + col("ta_prev0"))) /
            (tp + lit(0.5)))
        .when(tp === 0, col("ta_peak") - col("ta_first"))
        .otherwise((col("ta_peak") - col("ta_first")) / tp), 6).as("rate_onset"),
      r(when(col("ta_next1").isNotNull,
          (col("ta_peak") - lit(0.5) * (col("ta_last") + col("ta_next1"))) /
            (td + lit(0.5)))
        .when(td === 0, col("ta_peak") - col("ta_last"))
        .otherwise((col("ta_peak") - col("ta_last")) / td), 6).as("rate_decline"))
  }

  /** #87b mhw_trend_significance: Oliver's `meanTrend` inference
    * (reference asset tests/data/legacy/marineHeatWaves.py:687-784)
    * applied to the annual-MHW-days series of [[mhwTrendAnnual]] — the
    * centered-time OLS with the trend's standard error:
    * se = s/√Sxx with s² = SSE/(n−2), plus the t-ratio trend/se (the
    * statistic Oliver compares to the Student-t quantile; the quantile
    * itself is a caller-side table lookup, not data-dependent work).
    * All moment sums are exact integers (years × day counts); only the
    * final algebra is IEEE, so the oracle lands on the same bits. Same
    * plan as mhwTrendAnnual: tiny per-key aggregates, one exchange. */
  def mhwTrendSignificance(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsTable(s, dir)
    val annual = ev
      .groupBy(col("user_id"), year(col("date_start")).as("yr"))
      .agg(sum(col("duration").cast("long")).as("days"))
    val spine = daily(s, dir)
      .groupBy(col("user_id"))
      .agg(min(col("yr")).as("y0"), max(col("yr")).as("y1"))
      .select(col("user_id"),
              explode(sequence(col("y0"), col("y1"))).as("yr"))
    val full = spine.join(annual, Seq("user_id", "yr"), "left")
      .select(col("user_id"), col("yr"),
              coalesce(col("days"), lit(0L)).as("days"))
    trendInference(full)
  }

  /** OLS trend inference over any complete (user_id, yr, days) annual
    * frame — the meanTrend algebra, spec entry point. */
  def trendInference(full: DataFrame): DataFrame = {
    val n = count(lit(1)).cast("double")
    val st = sum(col("yr").cast("long")).cast("double")
    val stt = sum((col("yr") * col("yr")).cast("long")).cast("double")
    val sy = sum(col("days")).cast("double")
    val syy = sum(col("days") * col("days")).cast("double")
    val sty = sum(col("days") * col("yr")).cast("double")
    val g = full.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_years"), n.as("nn"), st.as("st"), stt.as("stt"),
           sy.as("sy"), syy.as("syy"), sty.as("sty"))
      .withColumn("sxx", col("stt") - col("st") * col("st") / col("nn"))
      .withColumn("sxy", col("sty") - col("st") * col("sy") / col("nn"))
      .withColumn("syc", col("syy") - col("sy") * col("sy") / col("nn"))
      .withColumn("slope",
        when(col("sxx") === 0d, 0d).otherwise(col("sxy") / col("sxx")))
      .withColumn("sse",
        greatest(col("syc") - col("slope") * col("slope") * col("sxx"), lit(0d)))
      .withColumn("se",
        when(col("nn") > 2 && col("sxx") > 0,
          sqrt(col("sse") / (col("nn") - 2) / col("sxx"))))
    g.select(col("user_id"), col("n_years"),
      r(col("sy") / col("nn"), 6).as("mean_days"),
      r(col("slope"), 6).as("trend_days_per_year"),
      r(col("se"), 6).as("se_trend"),
      r(when(col("se") > 0, col("slope") / col("se")), 6).as("t_ratio"))
  }

  // ----------------------------------------------------------- cold spells

  /** Severity chain over the NEGATED daily series — the engine of marine
    * cold-spell detection (reference ground-truth asset
    * tests/data/legacy/marineHeatWaves.py:245,414: `coldSpells=True`
    * negates the input, runs the identical detect pipeline, and negates
    * intensities back on output). Negation is applied AFTER the daily
    * mean's 6dp stage rounding, so in negated space every downstream
    * value is the exact IEEE negation of a rounded double — the oracle
    * replays the same order of operations. Memoized separately from the
    * warm-spell chain (same plan shape, different sign). */
  def coldSeverityChain(s: SparkSession, dir: String, pctile: Double = 0.6): DataFrame =
    graft.Caches.persisted(s, ("mhw_cold_sev", dir, pctile)) {
      coldSeverityChainDf(daily(s, dir), pctile)
    }

  /** Core of [[coldSeverityChain]] over any (user_id, d, sst, yr, doy)
    * daily frame. */
  def coldSeverityChainDf(dailyDf: DataFrame, pctile: Double): DataFrame = {
    val dl = dailyDf.withColumn("sst", -col("sst"))
    val seas = smoothDoy(climatologyBp(dl), "seas")
    val thresh = smoothDoy(pooledQuantile(dl, 5, pctile), "thresh")
    severity(dl, seas, thresh)
  }

  /** Query #11h mhw_cold_spells: Oliver's `detect(coldSpells=True)` —
    * marine cold-spell events. The negated series runs the exact warm
    * pipeline (bp-smooth climatology, pooled-quantile threshold at the
    * q=0.6 test parameterization ≡ the 40th percentile of the original
    * series, severity, run/gap-join detection), then the intensity
    * metrics are negated back so cold events report negative anomalies,
    * exactly as the reference flips them on output. Category keeps the
    * Hobday-2018 rule on the (positive) negated-space severity. Plan
    * shape is identical to [[mhwEvents]] — the sign flip is free. */
  def mhwColdSpells(s: SparkSession, dir: String): DataFrame =
    coldEventsOf(coldSeverityChain(s, dir, 0.6), minDuration = 3, maxGap = 2)

  /** Detection + output flip over a negated-space severity frame (the
    * output half of Oliver's coldSpells branch). */
  def coldEventsOf(coldSev: DataFrame, minDuration: Int, maxGap: Int): DataFrame =
    detectEvents(coldSev, minDuration, maxGap)
      .select(
        col("user_id"), col("evt"), col("index_start"), col("index_end"),
        col("date_start"), col("date_end"), col("duration"),
        col("index_peak"), col("date_peak"),
        (-col("intensity_max")).as("intensity_max"),
        (-col("intensity_mean")).as("intensity_mean"),
        (-col("intensity_cumul")).as("intensity_cumul"),
        categoryOf(col("severity_max")).as("category"))

  // ----------------------------------------------------------- event ranks

  /** Query #11i mhw_event_rank: Oliver's `rank()` (reference asset
    * tests/data/legacy/marineHeatWaves.py:785-860) — per-series rank and
    * return period of each event under duration, intensity_max and
    * intensity_cumulative. Rank 1 = largest; ties follow numpy's stable
    * argsort (`n_events − argsort(argsort(x))`): of two equal events the
    * LATER one takes the smaller rank, i.e. `row_number` ordered by
    * (metric DESC, evt DESC). Return period = (nYears + 1) / rank with
    * nYears = (days on record)/365.25 — per series, from its own daily
    * record length, Oliver's time-vector convention.
    *
    * Scale shape: events are key-proportional-tiny; the three rank
    * windows share partitionBy(user_id) (one exchange, three in-stage
    * sorts) and the per-key record-length table joins co-keyed. */
  def mhwEventRank(s: SparkSession, dir: String): DataFrame =
    eventRank(
      eventsTable(s, dir),
      daily(s, dir).groupBy(col("user_id")).agg(count(lit(1)).as("n_days")))

  /** Core of [[mhwEventRank]]: `ev` = detectEvents output (or any frame
    * with user_id, evt, duration, intensity_max, intensity_cumul), `nd`
    * = per-key record length (user_id, n_days). */
  def eventRank(ev: DataFrame, nd: DataFrame): DataFrame = {
    val wU = Window.partitionBy("user_id")
    def rk(c: Column): Column =
      row_number().over(wU.orderBy(c.desc, col("evt").desc)).cast("long")
    val nYears = col("n_days").cast("double") / lit(365.25)
    def rp(rankCol: Column): Column = r((nYears + 1) / rankCol, 6)
    ev.join(graft.Hints.keyDim(nd), Seq("user_id"))
      .select(
        col("user_id"), col("evt"), col("duration"),
        col("intensity_max"), col("intensity_cumul"),
        rk(col("duration")).as("rank_duration"),
        rk(col("intensity_max")).as("rank_imax"),
        rk(col("intensity_cumul")).as("rank_icum"),
        col("n_days"))
      .select(
        col("user_id"), col("evt"), col("duration"),
        col("intensity_max"), col("intensity_cumul"),
        col("rank_duration"), col("rank_imax"), col("rank_icum"),
        rp(col("rank_duration")).as("rp_duration"),
        rp(col("rank_imax")).as("rp_imax"),
        rp(col("rank_icum")).as("rp_icum"))
  }
}
