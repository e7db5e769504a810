package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-47 operators (SURVEY §2 #277-#278): A/A calibration of
  * the experiment machinery and the feature adoption curve.
  */
object Round6Ops29 {

  // ------------------------------------------- #277 events_aa_calibration

  /** #277 events_aa_calibration: the A/A TEST — users split by an
    * INDEPENDENT hash salt (so the split is orthogonal to #137's
    * arms), the per-type conversion z-scores recomputed under the
    * null — the SAME cell machinery, conversion threshold and guards
    * as #137 (via the salt-parameterized shared helpers), so the audit
    * exercises exactly the metric #137 reports — and the
    * false-positive audit: how many metrics read
    * |z| > 1.96 when NOTHING differs? The calibration run every
    * experimentation platform executes before trusting itself — a
    * fire rate far from 5% means broken variance math, hidden
    * dependence (#271's ICC ignored), or a biased splitter (#227's
    * SRM), and invalidates every #137 readout until explained.
    *
    * Scale shape: exactly #137's shape under a different salt — one
    * distinct-users pass, one per-(user, type) rollup against
    * broadcast arm sizes, a ≤|types| readout with the corpus fire
    * rate as a window total. */
  def eventsAaCalibration(s: SparkSession, dir: String): DataFrame = {
    val cells = Round6Ops2.abCellsSalted(s, dir, "aa:")
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
             (col("n_a") + col("n_b")).cast("double")
    val bothArms = col("n_a") > 0 && col("n_b") > 0
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    val wAll = Window.partitionBy()
    val z = when(bothArms, when(se > 0.0, r((pb - pa) / se, 6)))
    cells
      .withColumn("z", coalesce(z, lit(0.0)))
      .withColumn("fired", abs(col("z")) > 1.96)
      .withColumn("n_metrics", count(lit(1)).over(wAll))
      .withColumn("n_fired",
        sum(when(abs(col("z")) > 1.96, 1L).otherwise(0L)).over(wAll))
      .withColumn("fire_rate",
        r(col("n_fired") / col("n_metrics").cast("double"), 6))
      .select(col("event_type"), col("conv_a"), col("conv_b"), col("n_a"),
              col("n_b"), col("z"), col("fired"), col("fire_rate"))
      .orderBy(col("event_type"))
  }

  val eventsAaCalibrationSql: String = {
    val pa = "(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    val pb = "(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    val pp = "(CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    val se = s"sqrt($pp * (1.0 - $pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
    Round6Ops2.abCellsSqlPrefixSalted("aa:") +
    s""",
       |z AS (
       |  SELECT event_type, conv_a, conv_b, n_a, n_b,
       |         coalesce(CASE WHEN n_a > 0 AND n_b > 0 THEN
       |           CASE WHEN $se > 0.0 THEN ${sqlR(s"($pb - $pa) / ($se)", 6)} END
       |         END, 0.0) AS z
       |  FROM cells)
       |SELECT event_type, conv_a, conv_b, n_a, n_b, z,
       |       abs(z) > 1.96 AS fired,
       |       ${sqlR("CAST(sum(CASE WHEN abs(z) > 1.96 THEN 1 ELSE 0 END) OVER () AS DOUBLE) / count(*) OVER ()", 6)}
       |         AS fire_rate
       |FROM z ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------- #278 events_adoption_curve

  /** #278 events_adoption_curve: FEATURE ADOPTION per event type —
    * each (user, type)'s first-ever day, rolled up per (type, day):
    * first-time adopters, the cumulative adopter count, and adoption
    * penetration of the full user base. The product-analytics S-curve
    * (#262 classifies users as new/returning GLOBALLY; adoption is per
    * FEATURE — a flat curve on a shipped feature is the launch
    * post-mortem, and penetration caps the remaining headroom).
    *
    * Scale shape: one (user, type) min-day aggregation, one (type,
    * day) rollup, a per-type cumulative window bounded by days, and
    * the user-base size as a broadcast scalar. */
  def eventsAdoptionCurve(s: SparkSession, dir: String): DataFrame =
    eventsAdoptionCurveDf(Tables.events(s, dir))

  /** The mergeable first-day registers: per (user, type), the minimum
    * event day — min merges, so the SAME aggregate is the streaming
    * state in [[graft.streaming.Streaming.streamAdoption]] (an early
    * arrival only ever moves a user's adoption date EARLIER). */
  def adoptionRegisters(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(to_date(col("ts"))).as("d0"))

  /** DataFrame-generic core: expects (user_id, ts, event_type). */
  def eventsAdoptionCurveDf(ev: DataFrame): DataFrame =
    adoptionFinalize(adoptionRegisters(ev))

  /** Curve readout over the (user, type) first-day register table. */
  def adoptionFinalize(first: DataFrame): DataFrame = {
    val daily = first.groupBy(col("event_type"), col("d0").as("d"))
      .agg(count(lit(1)).as("n_adopters"))
    val nUsers = first.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(nUsers))
      .withColumn("cum_adopters", sum(col("n_adopters")).over(wCum))
      .withColumn("penetration",
        r(col("cum_adopters") / col("n_users").cast("double"), 6))
      .select(col("event_type"), col("d"), col("n_adopters"),
              col("cum_adopters"), col("penetration"))
      .orderBy(col("event_type"), col("d"))
  }

  val eventsAdoptionCurveSql: String =
    s"""WITH first_ AS (
       |  SELECT user_id, event_type, min(CAST(ts AS DATE)) AS d0
       |  FROM events GROUP BY 1, 2),
       |daily AS (
       |  SELECT event_type, d0 AS d, count(*) AS n_adopters
       |  FROM first_ GROUP BY 1, 2),
       |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
       |SELECT event_type, d, n_adopters,
       |       CAST(sum(n_adopters) OVER (PARTITION BY event_type ORDER BY d
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_adopters,
       |       ${sqlR("CAST(sum(n_adopters) OVER (PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) / nu.n_users", 6)}
       |         AS penetration
       |FROM daily CROSS JOIN nu
       |ORDER BY event_type, d""".stripMargin
}
