package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-8 operators (SURVEY §2 #320-#321): retention half-life
  * (censoring-corrected exponential fit) and per-series max drawdown.
  */
object Round9Ops8 {

  // --------------------------------- #320 events_retention_halflife

  /** ln 2 as the 6dp literal both engines share. */
  private val Ln2: Double = math.floor(math.log(2.0) * 1e6 + 0.5) / 1e6

  /** #320 events_retention_halflife: the retention curve REDUCED TO A
    * DECISION NUMBER — pooled day-k retention rates (k = 1..`maxK`)
    * with RIGHT-CENSORING correction (a cohort only enters day k's
    * denominator if the observation window reaches its day k —
    * without this the curve's tail mixes in cohorts that could not
    * possibly retain, the classic dashboard bug), then the exponential
    * fit ln R(k) = a + b·k and half-life −ln2/b. #20c publishes the
    * raw (cohort × offset) triangle; this is the one-number summary a
    * growth review quotes and tracks. Offsets with zero retained drop
    * from the fit (ln 0), slope ≥ 0 reports NULL half-life — the
    * honest answer for non-decaying engagement.
    *
    * Scale shape: one distinct (user, day) pass, a user-keyed cohort
    * join, a ≤maxK-row pooled rollup; eligibility is a cohort-size
    * rollup fanned over the ≤maxK literal grid against a broadcast
    * 1-row max-day scalar (the #132 discipline); the regression folds
    * the ≤maxK points in one aggregate. */
  def eventsRetentionHalflife(s: SparkSession, dir: String,
                              maxK: Int = 14): DataFrame =
    retentionHalflifeDf(Tables.events(s, dir), maxK)

  /** DataFrame-generic core: expects (user_id, ts). */
  def retentionHalflifeDf(evIn: DataFrame, maxK: Int = 14): DataFrame =
    halflifeFromDays(
      evIn.select(col("user_id"), to_date(col("ts")).as("d")).distinct(), maxK)

  /** The readout over a distinct (user_id, d) activity ledger — shared
    * with the #323 stream twin, whose registers ARE this ledger. */
  private[graft] def halflifeFromDays(evIn: DataFrame,
                                      maxK: Int = 14): DataFrame = {
    val s = evIn.sparkSession
    val ev = evIn.transform(graft.Lineage.pinLazy)
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    val maxd = ev.agg(max(col("d")).as("maxd"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    val grid = s.range(1, maxK + 1).select(col("id").cast("int").as("k"))
    val eligible = sizes.crossJoin(broadcast(maxd)).crossJoin(grid)
      .filter(datediff(col("maxd"), col("cohort")) >= col("k"))
      .groupBy(col("k")).agg(sum(col("cohort_size")).as("n_eligible"))
    val retained = ev.join(first, "user_id")
      .select(datediff(col("d"), col("cohort")).as("k"), col("user_id"))
      .filter(col("k").between(1, maxK))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_retained")) // (user, day) is distinct already
    val curve = eligible.join(retained, Seq("k"), "left")
      .select(col("k").as("day_offset"), col("n_eligible"),
              coalesce(col("n_retained"), lit(0L)).as("n_retained"),
              r(coalesce(col("n_retained"), lit(0L)) /
                col("n_eligible").cast("double"), 6).as("rate"))
      .transform(graft.Lineage.pinLazy)
    val pts = curve.filter(col("rate") > 0)
      .select(col("day_offset").cast("double").as("x"),
              r(log(col("rate")), 6).as("y"))
    val m = count(lit(1)).cast("double")
    val slope = (dsum(col("x") * col("y")) - dsum(col("x")) * dsum(col("y")) / m) /
                (dsum(col("x") * col("x")) - dsum(col("x")) * dsum(col("x")) / m)
    val reg = pts.agg(count(lit(1)).as("n_points"), r(slope, 6).as("slope"))
      .withColumn("halflife_days",
        when(col("slope") < 0, r(lit(-Ln2) / col("slope"), 6)))
    curve.crossJoin(broadcast(reg))
      .orderBy(col("day_offset"))
  }

  def eventsRetentionHalflifeSql(maxK: Int = 14): String = {
    val m = "CAST(count(*) AS DOUBLE)"
    val slope =
      s"(${sqlSum("x * y")} - ${sqlSum("x")} * ${sqlSum("y")} / $m) / " +
      s"(${sqlSum("x * x")} - ${sqlSum("x")} * ${sqlSum("x")} / $m)"
    s"""WITH ev AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       |first AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY 1),
       |maxd AS (SELECT max(d) AS maxd FROM ev),
       |sizes AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY 1),
       |eligible AS (
       |  SELECT g.k, CAST(sum(s.cohort_size) AS BIGINT) AS n_eligible
       |  FROM sizes s CROSS JOIN maxd
       |  CROSS JOIN (SELECT CAST(range AS INT) AS k FROM range(1, ${maxK + 1})) g
       |  WHERE datediff('day', s.cohort, maxd.maxd) >= g.k
       |  GROUP BY 1),
       |retained AS (
       |  SELECT datediff('day', f.cohort, e.d) AS k, count(*) AS n_retained
       |  FROM ev e JOIN first f USING (user_id)
       |  WHERE datediff('day', f.cohort, e.d) BETWEEN 1 AND $maxK
       |  GROUP BY 1),
       |curve AS (
       |  SELECT e.k AS day_offset, e.n_eligible,
       |         CAST(coalesce(r.n_retained, 0) AS BIGINT) AS n_retained,
       |         ${sqlR("coalesce(r.n_retained, 0) / CAST(e.n_eligible AS DOUBLE)", 6)} AS rate
       |  FROM eligible e LEFT JOIN retained r ON r.k = e.k),
       |pts AS (
       |  SELECT CAST(day_offset AS DOUBLE) AS x, ${sqlR("ln(rate)", 6)} AS y
       |  FROM curve WHERE rate > 0),
       |reg AS (
       |  SELECT count(*) AS n_points, ${sqlR(slope, 6)} AS slope FROM pts)
       |SELECT c.day_offset, c.n_eligible, c.n_retained, c.rate,
       |       g.n_points, g.slope,
       |       CASE WHEN g.slope < 0 THEN ${sqlR(s"-$Ln2 / g.slope", 6)} END
       |         AS halflife_days
       |FROM curve c CROSS JOIN reg g
       |ORDER BY c.day_offset""".stripMargin
  }

  // --------------------------------------------- #321 ts_max_drawdown

  /** #321 ts_max_drawdown: worst PEAK-TO-TROUGH decline per series —
    * max over days of (running max − value), with the running peak
    * value and the (earliest) trough day. The risk panel of the ts
    * battery: #11h finds threshold-crossing cold spells, drawdown
    * measures the largest cumulative slide regardless of any
    * threshold — the number an SLO/finance review quotes. Earliest-
    * trough tie-break makes the readout total and oracle-checkable.
    *
    * Scale shape: two per-key ordered windows (running max, then the
    * max-gap pick) over the daily table — key-proportional, the #126
    * window discipline; one rollup row per series. */
  def tsMaxDrawdown(s: SparkSession, dir: String): DataFrame =
    tsMaxDrawdownDf(Mhw.daily(s, dir))

  /** DataFrame-generic core: expects (user_id, d, sst). */
  def tsMaxDrawdownDf(dl: DataFrame): DataFrame = {
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = dl.select(col("user_id"), col("d"), col("sst"))
      .withColumn("runmax", max(col("sst")).over(wRun))
      .withColumn("gap", r(col("runmax") - col("sst"), 6))
      .withColumn("mx", max(col("gap")).over(Window.partitionBy(col("user_id"))))
    g.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
           max(col("gap")).as("max_drawdown"),
           min(when(col("gap") === col("mx"), col("d"))).as("trough_d"))
      .orderBy(col("user_id"))
  }

  val tsMaxDrawdownSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d, ${sqlAvg("value", 6)} AS sst
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT user_id, d,
       |         ${sqlR("max(sst) OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) - sst", 6)} AS gap
       |  FROM daily),
       |mx AS (
       |  SELECT user_id, count(*) AS n_days, max(gap) AS max_drawdown
       |  FROM g GROUP BY 1)
       |SELECT m.user_id, m.n_days, m.max_drawdown,
       |       min(g.d) AS trough_d
       |FROM mx m JOIN g ON g.user_id = m.user_id AND g.gap = m.max_drawdown
       |GROUP BY 1, 2, 3
       |ORDER BY m.user_id""".stripMargin
}
