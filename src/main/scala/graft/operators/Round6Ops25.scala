package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-42 operators (SURVEY §2 #268-#269): rolling
  * correlation between activity series and the lifecycle activity
  * curve.
  */
object Round6Ops25 {

  // ------------------------------------------------- #268 ts_rolling_corr

  /** Trailing window length in days. */
  val RollDays = 30

  /** #268 ts_rolling_corr: ROLLING CORRELATION between event types'
    * daily volumes — for every ordered type pair, the trailing-
    * [[RollDays]]-day Pearson correlation as of each day. The
    * relationship-breakdown monitor: #85's cross-correlation is one
    * static number, but co-moving series DECOUPLE (a checkout change
    * breaks the view→purchase link) and the rolling series is where
    * that reads first — risk desks watch exactly this statistic for
    * pairs trades, ops for funnel stages.
    *
    * Scale shape: one (type, day) aggregation collapses the corpus;
    * the pair frame joins the bounded daily grid to itself on the day
    * (≤ types²×days rows); all five co-moments come from ONE
    * exchange+sort per pair key (decimal window sums, the #11f prefix
    * discipline); correlation algebra is per-row on the bounded
    * frame. */
  def tsRollingCorr(s: SparkSession, dir: String): DataFrame =
    tsRollingCorrDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, ts). */
  def tsRollingCorrDf(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("v"))
    val pairs = daily.select(col("event_type").as("ta"), col("d"),
                             col("v").as("va"))
      .join(daily.select(col("event_type").as("tb"), col("d"),
                         col("v").as("vb")), Seq("d"))
      .filter(col("ta") < col("tb"))
    val w = Window.partitionBy(col("ta"), col("tb")).orderBy(col("d"))
      .rowsBetween(-(RollDays - 1), Window.currentRow)
    def wsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,10)")).over(w).cast("double")
    val withM = pairs
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", wsum(col("va"))).withColumn("sy", wsum(col("vb")))
      .withColumn("sxy", wsum(col("va") * col("vb")))
      .withColumn("sxx", wsum(col("va") * col("va")))
      .withColumn("syy", wsum(col("vb") * col("vb")))
    val den = sqrt(greatest(lit(0.0), col("n") * col("sxx") - col("sx") * col("sx")) *
                   greatest(lit(0.0), col("n") * col("syy") - col("sy") * col("sy")))
    withM
      .withColumn("corr",
        when(den > 0,
          r((col("n") * col("sxy") - col("sx") * col("sy")) / den, 6))
          .otherwise(lit(0.0)))
      .withColumn("full_window", col("n") >= RollDays)
      .select(col("ta"), col("tb"), col("d"), col("n").cast("long").as("n"),
              col("corr"), col("full_window"))
      .orderBy(col("ta"), col("tb"), col("d"))
  }

  val tsRollingCorrSql: String = {
    def wsum(x: String) =
      s"CAST(sum(CAST($x AS DECIMAL(38,10))) OVER w AS DOUBLE)"
    val den = "sqrt(greatest(0.0, n * sxx - sx * sx) * " +
              "greatest(0.0, n * syy - sy * sy))"
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d,
       |         CAST(count(*) AS DOUBLE) AS v
       |  FROM events GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, a.d,
       |         a.v AS va, b.v AS vb
       |  FROM daily a JOIN daily b ON a.d = b.d AND a.event_type < b.event_type),
       |m AS (
       |  SELECT ta, tb, d,
       |         CAST(count(*) OVER w AS DOUBLE) AS n,
       |         ${wsum("va")} AS sx, ${wsum("vb")} AS sy,
       |         ${wsum("va * vb")} AS sxy, ${wsum("va * va")} AS sxx,
       |         ${wsum("vb * vb")} AS syy
       |  FROM pairs
       |  WINDOW w AS (PARTITION BY ta, tb ORDER BY d
       |               ROWS BETWEEN ${RollDays - 1} PRECEDING AND CURRENT ROW))
       |SELECT ta, tb, d, CAST(n AS BIGINT) AS n,
       |       CASE WHEN $den > 0
       |         THEN ${sqlR(s"(n * sxy - sx * sy) / ($den)", 6)}
       |         ELSE 0.0 END AS corr,
       |       n >= $RollDays AS full_window
       |FROM m ORDER BY ta, tb, d""".stripMargin
  }

  // ------------------------------------------- #269 events_lifecycle_activity

  /** #269 events_lifecycle_activity: the LIFECYCLE ACTIVITY CURVE —
    * every user's activity re-indexed to weeks since their first
    * event, rolled up per lifecycle week: active users, events per
    * active user, and retention vs week 0. The cohort-time view the
    * calendar-time ops can't give: #262 ledgers daily flows, #20c
    * measures fixed-horizon return — THIS is the decay curve product
    * reviews draw (does engagement deepen or bleed as accounts age),
    * and the input to any LTV extrapolation beyond #109's observed
    * triangle.
    *
    * Scale shape: one per-user min-date aggregation rejoined as a
    * broadcast key dim (the #202 pattern), one (user, week) distinct,
    * one lifecycle-week rollup with a broadcast week-0 scalar. */
  def eventsLifecycleActivity(s: SparkSession, dir: String): DataFrame =
    eventsLifecycleActivityDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts). */
  def eventsLifecycleActivityDf(ev: DataFrame): DataFrame = {
    val dated = ev.select(col("user_id"), to_date(col("ts")).as("d"))
    val first = dated.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val weeked = dated.join(graft.Hints.keyDim(first), Seq("user_id"))
      .withColumn("wk", (datediff(col("d"), col("d0")) / 7).cast("long"))
    val g = weeked.groupBy(col("wk"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
    val wk0 = g.filter(col("wk") === 0)
      .select(col("n_users").as("cohort_size"))
    g.crossJoin(broadcast(wk0))
      .withColumn("events_per_user",
        r(col("n_events") / col("n_users").cast("double"), 6))
      .withColumn("retention",
        r(col("n_users") / col("cohort_size").cast("double"), 6))
      .select(col("wk"), col("n_users"), col("n_events"),
              col("events_per_user"), col("retention"))
      .orderBy(col("wk"))
  }

  val eventsLifecycleActivitySql: String =
    s"""WITH dated AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
       |first_ AS (
       |  SELECT user_id, min(d) AS d0 FROM dated GROUP BY 1),
       |weeked AS (
       |  SELECT dated.user_id,
       |         CAST(datediff('day', f.d0, dated.d) // 7 AS BIGINT) AS wk
       |  FROM dated JOIN first_ f USING (user_id)),
       |g AS (
       |  SELECT wk, count(DISTINCT user_id) AS n_users, count(*) AS n_events
       |  FROM weeked GROUP BY 1),
       |wk0 AS (SELECT n_users AS cohort_size FROM g WHERE wk = 0)
       |SELECT wk, n_users, n_events,
       |       ${sqlR("n_events / CAST(n_users AS DOUBLE)", 6)} AS events_per_user,
       |       ${sqlR("n_users / CAST(wk0.cohort_size AS DOUBLE)", 6)} AS retention
       |FROM g CROSS JOIN wk0 ORDER BY wk""".stripMargin
}
