package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-39 operators (SURVEY §2 #261-#263): SLO burn-rate
  * alerting, daily growth accounting, and the temporal value-drift KS
  * monitor.
  */
object Round6Ops22 {

  // ---------------------------------------------------- #261 events_slo_burn

  /** The SLO and the standard multiwindow burn thresholds (Google SRE
    * workbook: page at 14.4× over 1 h, ticket at 6× over 6 h). */
  val Slo = 0.99
  val Burn1hCrit = 14.4
  val Burn6hCrit = 6.0

  /** #261 events_slo_burn: SLO BURN-RATE alerting — per tumbling
    * window (1 h and 6 h), the error-event share divided by the error
    * budget (1 − SLO): burn = 1 means the budget exactly lasts the
    * period, burn = 14.4 over an hour exhausts a 30-day budget in two
    * days (the standard paging threshold). The alert rule SRE
    * runbooks actually ship — #220 pages on volume, #86 on values;
    * THIS pages on reliability, with the multiwindow rule that kills
    * both slow-burn blindness and single-spike noise.
    *
    * Scale shape: one ×2 window fan-out (map-side), one (window,
    * start) aggregation — mergeable counts, no windows over events;
    * window starts are integer epoch arithmetic (no timezone
    * surface). */
  def eventsSloBurn(s: SparkSession, dir: String): DataFrame =
    eventsSloBurnDf(Tables.events(s, dir))

  /** The mergeable burn registers: per (window family, window start),
    * total and error counts — both merge by addition, so the SAME
    * aggregate is the streaming state in
    * [[graft.streaming.Streaming.streamSloBurn]]. */
  def burnRegisters(ev: DataFrame): DataFrame = {
    // floor (not trunc-toward-zero): pre-1970 timestamps must land in
    // the same window register as DuckDB's // floor-division
    val es = floor(epochUs(col("ts")) / lit(1000000.0)).cast("long")
    val fan = ev
      .select(col("event_type"), es.as("es"))
      .select(col("event_type"), explode(array(
        struct(lit("1h").as("win"), (floor(col("es") / 3600L) * 3600)
          .cast("long").as("ws")),
        struct(lit("6h").as("win"), (floor(col("es") / 21600L) * 21600)
          .cast("long").as("ws")))).as("w"),
        col("event_type").as("t"))
      .select(col("w.win"), col("w.ws"), col("t"))
    fan.groupBy(col("win"), col("ws"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("t") === "error", 1L).otherwise(0L)).as("n_errors"))
  }

  /** DataFrame-generic core: expects (ts, event_type). */
  def eventsSloBurnDf(ev: DataFrame): DataFrame =
    burnFinalize(burnRegisters(ev))

  /** Rate/burn/alert readout over the register table. */
  def burnFinalize(g: DataFrame): DataFrame = {
    g.withColumn("err_rate", r(col("n_errors") / col("n").cast("double"), 6))
      .withColumn("burn", r(col("err_rate") / (1.0 - Slo), 6))
      .withColumn("alert",
        when(col("win") === "1h", col("burn") > Burn1hCrit)
          .otherwise(col("burn") > Burn6hCrit))
      .select(col("win"), col("ws").as("window_start_s"), col("n"),
              col("n_errors"), col("err_rate"), col("burn"), col("alert"))
      .orderBy(col("win"), col("window_start_s"))
  }

  val eventsSloBurnSql: String =
    s"""WITH es AS (
       |  SELECT event_type, epoch_us(ts) // 1000000 AS es FROM events),
       |fan AS (
       |  SELECT '1h' AS win, (es // 3600) * 3600 AS ws, event_type FROM es
       |  UNION ALL
       |  SELECT '6h' AS win, (es // 21600) * 21600 AS ws, event_type FROM es),
       |g AS (
       |  SELECT win, CAST(ws AS BIGINT) AS window_start_s, count(*) AS n,
       |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_errors
       |  FROM fan GROUP BY 1, 2)
       |SELECT win, window_start_s, n, n_errors,
       |       ${sqlR("n_errors / CAST(n AS DOUBLE)", 6)} AS err_rate,
       |       ${sqlR(s"(${sqlR("n_errors / CAST(n AS DOUBLE)", 6)}) / ${1.0 - Slo}", 6)} AS burn,
       |       CASE WHEN win = '1h'
       |         THEN (${sqlR(s"(${sqlR("n_errors / CAST(n AS DOUBLE)", 6)}) / ${1.0 - Slo}", 6)}) > $Burn1hCrit
       |         ELSE (${sqlR(s"(${sqlR("n_errors / CAST(n AS DOUBLE)", 6)}) / ${1.0 - Slo}", 6)}) > $Burn6hCrit
       |       END AS alert
       |FROM g ORDER BY win, window_start_s""".stripMargin

  // -------------------------------------------- #262 events_growth_accounting

  /** Resurrection horizon (days of silence before a return counts as
    * resurrected, not retained). */
  val ResurrectGapDays = 28

  /** #262 events_growth_accounting: DAILY GROWTH ACCOUNTING — each
    * active (user, day) classified as NEW (first day ever), RETAINED
    * (active within [[ResurrectGapDays]]) or RESURRECTED (returned
    * after a longer silence), rolled up per day with mix shares. The
    * standard growth ledger (Social Capital's accounting) behind
    * #64's DAU curve: the same DAU can be healthy (retained-heavy) or
    * churning-and-refilling (new-heavy), and only this decomposition
    * tells them apart; #20c measures the retention CURVE, this is the
    * daily flow ledger. (Churn is the horizon-complement readout —
    * #20c's business — and deliberately not duplicated here.)
    *
    * Scale shape: one distinct to (user, day), one per-user lag window
    * (bounded by active days per user), one day rollup. */
  def eventsGrowthAccounting(s: SparkSession, dir: String): DataFrame =
    eventsGrowthAccountingDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts). */
  def eventsGrowthAccountingDf(ev: DataFrame): DataFrame = {
    val ud = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val classed = ud
      .withColumn("prev_d", lag(col("d"), 1).over(w))
      .withColumn("cls",
        when(col("prev_d").isNull, "new")
          .when(datediff(col("d"), col("prev_d")) > ResurrectGapDays,
                "resurrected")
          .otherwise("retained"))
    classed.groupBy(col("d"))
      .agg(count(lit(1)).as("n_active"),
           sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
           sum(when(col("cls") === "retained", 1L).otherwise(0L))
             .as("n_retained"),
           sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
             .as("n_resurrected"))
      .withColumn("new_share", r(col("n_new") / col("n_active").cast("double"), 6))
      .withColumn("retained_share",
        r(col("n_retained") / col("n_active").cast("double"), 6))
      .orderBy(col("d"))
  }

  val eventsGrowthAccountingSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       |classed AS (
       |  SELECT d,
       |         CASE WHEN prev_d IS NULL THEN 'new'
       |              WHEN datediff('day', prev_d, d) > $ResurrectGapDays
       |                THEN 'resurrected'
       |              ELSE 'retained' END AS cls
       |  FROM (SELECT user_id, d,
       |               lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
       |        FROM ud))
       |SELECT d, count(*) AS n_active,
       |       CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_new,
       |       CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_retained,
       |       CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_resurrected,
       |       ${sqlR("sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS new_share,
       |       ${sqlR("sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS retained_share
       |FROM classed GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ #263 events_value_drift_ks

  /** #263 events_value_drift_ks: TEMPORAL VALUE DRIFT per type — the
    * #116 binned KS distance between each type's first-half and
    * second-half value distributions (the #229 midpoint split), with
    * the large-sample 5% critical value 1.358·√((n₁+n₂)/(n₁n₂)). #116
    * compares types to each OTHER; this compares each type to its own
    * PAST — the monitor a reward/score column gets in production,
    * completing the drift suite (#229 moments, #192 vocabulary, #120
    * centroids — this is full-distribution). Same resolution contract
    * as #116: D̂ under-estimates by at most the largest single-bin
    * mass.
    *
    * Scale shape: mergeable (type, half, bin) histogram partials on a
    * broadcast global grid; cumsums over the types×2×64 dense grid
    * only; one rollup per type. */
  def eventsValueDriftKs(s: SparkSession, dir: String): DataFrame =
    eventsValueDriftKsDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, ts, value). */
  def eventsValueDriftKsDf(ev: DataFrame): DataFrame = {
    val dated = ev.withColumn("d", to_date(col("ts")))
    val bounds = dated.agg(
      min(col("d")).as("dmin"), max(col("d")).as("dmax"),
      min(col("value")).as("lo"), max(col("value")).as("hi"))
      .withColumn("mid", date_add(col("dmin"),
        (datediff(col("dmax"), col("dmin")) / 2).cast("int")))
    val binned = dated.crossJoin(broadcast(bounds))
      .withColumn("half", when(col("d") <= col("mid"), 1).otherwise(2))
      .withColumn("bin", Round6Ops.ksBin)
      .groupBy(col("event_type"), col("half"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val types = binned.select(col("event_type")).distinct()
    val grid = types
      .crossJoin(binned.sparkSession.range(2)
        .select((col("id") + 1).cast("int").as("half")))
      .crossJoin(binned.sparkSession.range(Round6Ops.KsBins)
        .select(col("id").cast("int").as("bin")))
    val wCum = Window.partitionBy(col("event_type"), col("half"))
      .orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_type"), col("half"))
    val cdf = grid.join(binned, Seq("event_type", "half", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wTot))
      .withColumn("f", col("cum").cast("double") / col("n").cast("double"))
    val a = cdf.filter(col("half") === 1)
      .select(col("event_type"), col("bin"), col("f").as("f1"),
              col("n").as("n1"))
    val b = cdf.filter(col("half") === 2)
      .select(col("event_type"), col("bin"), col("f").as("f2"),
              col("n").as("n2"))
    a.join(b, Seq("event_type", "bin"))
      .groupBy(col("event_type"))
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
           r(max(abs(col("f1") - col("f2"))), 6).as("ks_d"))
      .withColumn("crit",
        r(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
          (col("n1") * col("n2")).cast("double")), 6))
      .withColumn("drifted", col("ks_d") > col("crit"))
      .orderBy(col("event_type"))
  }

  val eventsValueDriftKsSql: String = {
    import Round6Ops.KsBins
    s"""WITH dated AS (
       |  SELECT event_type, value, CAST(ts AS DATE) AS d FROM events),
       |bounds AS (
       |  SELECT min(d) + CAST(datediff('day', min(d), max(d)) // 2 AS INT) AS mid,
       |         min(value) AS lo, max(value) AS hi
       |  FROM dated),
       |binned AS (
       |  SELECT event_type,
       |         CASE WHEN d <= b.mid THEN 1 ELSE 2 END AS half,
       |         CASE WHEN b.hi = b.lo THEN 0
       |              ELSE LEAST(${KsBins - 1},
       |                CAST(floor(((value - b.lo) / (b.hi - b.lo)) * $KsBins)
       |                     AS INT))
       |         END AS bin,
       |         count(*) AS c
       |  FROM dated CROSS JOIN bounds b GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT t.event_type, h.half, g.bin
       |  FROM (SELECT DISTINCT event_type FROM binned) t
       |  CROSS JOIN (SELECT CAST(range + 1 AS INT) AS half FROM range(0, 2)) h
       |  CROSS JOIN (SELECT CAST(range AS INT) AS bin FROM range(0, $KsBins)) g),
       |cdf AS (
       |  SELECT g.event_type, g.half, g.bin,
       |         CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.event_type, g.half
       |              ORDER BY g.bin ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
       |         CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.event_type, g.half)
       |              AS DOUBLE) AS f,
       |         CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.event_type, g.half)
       |              AS BIGINT) AS n
       |  FROM grid g LEFT JOIN binned c
       |    ON g.event_type = c.event_type AND g.half = c.half AND g.bin = c.bin),
       |j AS (
       |  SELECT a.event_type, first(a.n) AS n1, first(b.n) AS n2,
       |         ${sqlR("max(abs(a.f - b.f))", 6)} AS ks_d
       |  FROM cdf a JOIN cdf b
       |    ON a.event_type = b.event_type AND a.bin = b.bin
       |   AND a.half = 1 AND b.half = 2
       |  GROUP BY 1)
       |SELECT event_type, n1, n2, ks_d,
       |       ${sqlR("1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))", 6)}
       |         AS crit,
       |       ks_d > ${sqlR("1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))", 6)}
       |         AS drifted
       |FROM j ORDER BY event_type""".stripMargin
  }
}
