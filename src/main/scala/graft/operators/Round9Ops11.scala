package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-11 operators (SURVEY §2 #328-#329): historical feed
  * outage detection and partial autocorrelation.
  */
object Round9Ops11 {

  // -------------------------------------------------- #328 dq_outages

  /** #328 dq_outages: HISTORICAL feed-outage ledger per event type —
    * every interarrival gap ≥ `ratio`× the type's own mean gap,
    * reported as an interval (start, end, duration, how many normal
    * gaps it swallowed). The post-mortem companion to #325: freshness
    * answers "is the feed alive NOW", this answers "when did it go
    * quiet BEFORE and for how long" — the table an incident review
    * pulls up first, and the ground truth a #325 staleness threshold
    * is calibrated against. Normalizing by the type's own cadence
    * makes one threshold serve hourly digests and 100 Hz telemetry
    * alike (the #325 insight applied retrospectively).
    *
    * Scale shape: one per-type ordered lag window; the per-type mean
    * gap is a ≤|types|-row rollup broadcast back onto the feed (no
    * second data-proportional shuffle); the filter keeps only outage
    * rows — output is incident-sized, not feed-sized. */
  def dqOutages(s: SparkSession, dir: String, ratio: Double = 5.0): DataFrame =
    dqOutagesDf(Tables.events(s, dir), ratio)

  /** DataFrame-generic core: expects (event_type, ts, event_id). */
  def dqOutagesDf(ev: DataFrame, ratio: Double = 5.0): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("es"), col("event_id"))
    val gaps = ev
      .select(col("event_type"), unix_timestamp(col("ts")).as("es"),
              col("event_id"))
      .withColumn("prev_s", lag(col("es"), 1).over(w))
      .withColumn("gap_s", col("es") - col("prev_s"))
      .filter(col("gap_s").isNotNull)
    val mg = gaps.groupBy(col("event_type"))
      .agg(r(dsum(col("gap_s")) / count(lit(1)), 6).as("mean_gap_s"))
    gaps.join(broadcast(mg), "event_type")
      .withColumn("gap_ratio", r(col("gap_s") / nullif(col("mean_gap_s"),
        lit(0d)), 6))
      .filter(col("gap_ratio") >= ratio)
      .select(col("event_type"), col("prev_s").as("start_s"),
              col("es").as("end_s"), col("gap_s"), col("mean_gap_s"),
              col("gap_ratio"))
      .orderBy(col("event_type"), col("start_s"))
  }

  def dqOutagesSql(ratio: Double = 5.0): String =
    s"""WITH e AS (
       |  SELECT event_type,
       |         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
       |         event_id
       |  FROM events),
       |gaps AS (
       |  SELECT event_type, es,
       |         es - lag(es, 1) OVER (PARTITION BY event_type
       |           ORDER BY es, event_id) AS gap_s,
       |         lag(es, 1) OVER (PARTITION BY event_type
       |           ORDER BY es, event_id) AS prev_s
       |  FROM e),
       |g2 AS (SELECT * FROM gaps WHERE gap_s IS NOT NULL),
       |mg AS (
       |  SELECT event_type,
       |         ${sqlR(s"${sqlSum("gap_s")} / count(*)", 6)} AS mean_gap_s
       |  FROM g2 GROUP BY 1),
       |sc AS (
       |  SELECT g.event_type, g.prev_s AS start_s, g.es AS end_s,
       |         g.gap_s, m.mean_gap_s,
       |         ${sqlR("g.gap_s / nullif(m.mean_gap_s, 0.0)", 6)} AS gap_ratio
       |  FROM g2 g JOIN mg m USING (event_type))
       |SELECT event_type, start_s, end_s, gap_s, mean_gap_s, gap_ratio
       |FROM sc WHERE gap_ratio >= $ratio
       |ORDER BY event_type, start_s""".stripMargin

  // ---------------------------------------------------- #329 ts_pacf

  /** #329 ts_pacf: per-series PARTIAL autocorrelation at lags 1–3 by
    * the Durbin-Levinson recursion — the AR-ORDER diagnostic the
    * Box-Jenkins identification step reads (#75 publishes raw r_k,
    * which confounds direct and propagated correlation; PACF isolates
    * the direct lag-k effect, so an AR(p) series cuts off after lag p
    * — the readout that justifies #327 fitting exactly two
    * coefficients). φ11 = r1; φ22 = (r2−r1²)/(1−r1²) (#327's φ2);
    * φ33 = (r3 − φ21 r2 − φ22 r1)/(1 − φ21 r1 − φ22 r2) with
    * φ21 = φ11 − φ22 φ11. Degenerate denominators → NULL.
    *
    * Scale shape: #327's exactly — one lag window + a per-key mean
    * join-back + one decimal moment fold, one row per series; the
    * recursion is scalar arithmetic on the folded row, 6dp-rounded at
    * every division (the #125 discipline). */
  def tsPacf(s: SparkSession, dir: String): DataFrame =
    tsPacfDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id, value). */
  def tsPacfDf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = ev
      .select(col("user_id"), col("ts"), col("event_id"),
              col("value").as("v"))
      .withColumn("l1", lag(col("v"), 1).over(w))
      .withColumn("l2", lag(col("v"), 2).over(w))
      .withColumn("l3", lag(col("v"), 3).over(w))
    val m = base.groupBy(col("user_id"))
      .agg(davg(col("v"), 6).as("mean"), count(lit(1)).as("n"))
    def cMom(ck: String) = dsum(when(col(ck).isNotNull,
      col("cv") * col(ck)))
    val agg = base.join(m, "user_id")
      .withColumn("cv", col("v") - col("mean"))
      .withColumn("c1", col("l1") - col("mean"))
      .withColumn("c2", col("l2") - col("mean"))
      .withColumn("c3", col("l3") - col("mean"))
      .groupBy(col("user_id"), col("n"))
      .agg(dsum(col("cv") * col("cv")).as("s0"),
           cMom("c1").as("s1"), cMom("c2").as("s2"), cMom("c3").as("s3"))
    agg
      .withColumn("r1", r(col("s1") / nullif(col("s0"), lit(0d)), 6))
      .withColumn("r2", r(col("s2") / nullif(col("s0"), lit(0d)), 6))
      .withColumn("r3", r(col("s3") / nullif(col("s0"), lit(0d)), 6))
      .withColumn("p22",
        r((col("r2") - col("r1") * col("r1")) /
          nullif(lit(1d) - col("r1") * col("r1"), lit(0d)), 6))
      .withColumn("p21", r(col("r1") * (lit(1d) - col("p22")), 6))
      .withColumn("p33",
        r((col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
          nullif(lit(1d) - col("p21") * col("r1") - col("p22") * col("r2"),
                 lit(0d)), 6))
      .select(col("user_id"), col("n"), col("r1"), col("r2"), col("r3"),
              col("r1").as("pacf1"), col("p22").as("pacf2"),
              col("p33").as("pacf3"))
      .orderBy(col("user_id"))
  }

  val tsPacfSql: String = {
    def cMom(ck: String) =
      sqlSum(s"CASE WHEN $ck IS NOT NULL THEN cv * $ck END")
    s"""WITH base AS (
       |  SELECT user_id, value AS v,
       |         lag(value, 1) OVER w AS l1,
       |         lag(value, 2) OVER w AS l2,
       |         lag(value, 3) OVER w AS l3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |m AS (
       |  SELECT user_id, ${sqlAvg("v", 6)} AS mean, count(*) AS n
       |  FROM base GROUP BY 1),
       |j AS (
       |  SELECT b.user_id, m.n,
       |         b.v - m.mean AS cv, b.l1 - m.mean AS c1,
       |         b.l2 - m.mean AS c2, b.l3 - m.mean AS c3
       |  FROM base b JOIN m USING (user_id)),
       |agg AS (
       |  SELECT user_id, n,
       |         ${sqlSum("cv * cv")} AS s0,
       |         ${cMom("c1")} AS s1, ${cMom("c2")} AS s2, ${cMom("c3")} AS s3
       |  FROM j GROUP BY 1, 2),
       |a1 AS (
       |  SELECT *, ${sqlR("s1 / nullif(s0, 0.0)", 6)} AS r1,
       |            ${sqlR("s2 / nullif(s0, 0.0)", 6)} AS r2,
       |            ${sqlR("s3 / nullif(s0, 0.0)", 6)} AS r3
       |  FROM agg),
       |a2 AS (
       |  SELECT *, ${sqlR("(r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0)", 6)} AS p22
       |  FROM a1),
       |a3 AS (SELECT *, ${sqlR("r1 * (1.0 - p22)", 6)} AS p21 FROM a2),
       |a4 AS (
       |  SELECT *, ${sqlR(
             "(r3 - p21 * r2 - p22 * r1) / " +
             "nullif(1.0 - p21 * r1 - p22 * r2, 0.0)", 6)} AS p33
       |  FROM a3)
       |SELECT user_id, n, r1, r2, r3,
       |       r1 AS pacf1, p22 AS pacf2, p33 AS pacf3
       |FROM a4 ORDER BY user_id""".stripMargin
  }
}
