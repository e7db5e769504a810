package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-10 analytics (SURVEY §2 #152): the Kaplan–Meier
  * survival curve over return times — censoring-aware "when does the
  * user come back?", the statistic naive inter-arrival means (#63)
  * get wrong at the observation edge (each user's LAST event has no
  * observed next; dropping it biases return times short, counting it
  * as churn biases them long — KM censoring is the correct handling).
  */
object Round6Ops3 {

  /** #152 events_survival_km: Kaplan–Meier over RETURN TIMES — for
    * every event, the duration (whole hours) until that user's next
    * event; each user's last event is right-CENSORED at the corpus
    * end (still "at risk" of returning when observation stopped). Per
    * duration hour t: the at-risk count, return/censor exits, the KM
    * factor (1 − d_t/n_t), and the survival curve
    * S(t) = Π_{u≤t} (1 − d_u/n_u) — the probability a user is still
    * away t hours after an event. THE return-time readout a
    * growth/engagement team publishes (and the principled version of
    * a session-timeout choice: the knee of this curve).
    *
    * Scale shape: durations come from ONE per-user lead window
    * (bounded by events-per-user, the #64 lag-features contract) plus
    * a broadcast corpus-end scalar; the curve lives on a DENSE hour
    * grid bounded by the corpus time span (never key- or
    * row-proportional), so the at-risk cumsum and the sequential
    * survival product run over a model-sized table. The product is a
    * 6dp-rounded left fold over the ordered factor array (the #115
    * Holt recurrence discipline: every step rounds, multiplication is
    * IEEE-exact, so the oracle's list_reduce replay is bit-identical).
    */
  def eventsSurvivalKm(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
    val endRow = ev.agg(max(col("ts")).as("end_ts"))
    val durs = ev
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .crossJoin(broadcast(endRow))
      // microsecond-exact integer arithmetic (unix_micros / epoch_us):
      // truncation == floor for the non-negative durations here
      .select(
        expr("(unix_micros(coalesce(next_ts, end_ts)) - unix_micros(ts)) div 3600000000")
          .cast("long").as("dur"),
        col("next_ts").isNull.as("censored"))
    val byDur = durs.groupBy(col("dur"))
      .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d_ret"),
           sum(when(col("censored"), 1L).otherwise(0L)).as("d_cens"))
    val tot = durs.agg(max(col("dur")).as("max_dur"), count(lit(1)).as("n_obs"))
    val grid = tot.select(
      explode(sequence(lit(0L), col("max_dur"))).as("hour"), col("n_obs"))
    val dense = grid.join(byDur, grid("hour") === byDur("dur"), "left")
      .select(col("hour"), col("n_obs"),
              coalesce(col("d_ret"), lit(0L)).as("n_returned"),
              coalesce(col("d_cens"), lit(0L)).as("n_censored"))
    // the grid is bounded by the corpus span in hours (broadcast
    // scalar), so the single-partition cumulative window is over a
    // model-sized table — the #116 KS-grid contract, not a
    // key-proportional window
    val wPrev = Window.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fac = dense
      .withColumn("n_risk",
        col("n_obs") - coalesce(
          sum(col("n_returned") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("factor",
        when(col("n_risk") > 0,
             r(lit(1.0) - col("n_returned").cast("double") /
               col("n_risk").cast("double"), 6))
          .otherwise(lit(1.0)))
      .select(col("hour"), col("n_risk"), col("n_returned"),
              col("n_censored"), col("factor"))
    // sequential 6dp-rounded running product over the ordered factors —
    // one bounded array on one row, then re-exploded against the grid
    val fold = "slice(aggregate(rows, array(CAST(1.0 AS DOUBLE)), " +
      "(acc, x) -> concat(acc, array(" +
      sqlR("element_at(acc, size(acc)) * x.factor", 6) +
      "))), 2, size(rows))"
    fac.agg(sort_array(collect_list(struct(
        col("hour"), col("n_risk"), col("n_returned"), col("n_censored"),
        col("factor")))).as("rows"))
      .withColumn("surv", expr(fold))
      .select(explode(arrays_zip(col("rows"), col("surv"))).as("z"))
      .select(col("z.rows.hour").as("hour"),
              col("z.rows.n_risk").as("n_risk"),
              col("z.rows.n_returned").as("n_returned"),
              col("z.rows.n_censored").as("n_censored"),
              col("z.rows.factor").as("factor"),
              col("z.surv").as("survival"))
      .orderBy(col("hour"))
  }

  val eventsSurvivalKmSql: String = {
    val fold = "list_reduce(list_prepend([CAST(1.0 AS DOUBLE)], " +
      "list_transform(fs, x -> [x])), (acc, e) -> list_append(acc, " +
      sqlR("acc[len(acc)] * e[1]", 6) + "))"
    s"""WITH ev AS (SELECT user_id, ts, event_id FROM events),
       |endd AS (SELECT max(ts) AS end_ts FROM ev),
       |durs AS (
       |  SELECT CAST((epoch_us(COALESCE(next_ts, end_ts)) - epoch_us(ts)) // 3600000000 AS BIGINT) AS dur,
       |         next_ts IS NULL AS censored
       |  FROM (SELECT user_id, ts,
       |               lead(ts) OVER (PARTITION BY user_id
       |                              ORDER BY ts, event_id) AS next_ts
       |        FROM ev) g CROSS JOIN endd),
       |byd AS (
       |  SELECT dur,
       |         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT) AS d_ret,
       |         CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS d_cens
       |  FROM durs GROUP BY 1),
       |tot AS (SELECT max(dur) AS max_dur, count(*) AS n_obs FROM durs),
       |grid AS (
       |  SELECT CAST(g.g AS BIGINT) AS hour, n_obs
       |  FROM tot CROSS JOIN LATERAL
       |    (SELECT unnest(range(0, max_dur + 1)) AS g) g),
       |dense AS (
       |  SELECT hour, n_obs, COALESCE(d_ret, 0) AS n_returned,
       |         COALESCE(d_cens, 0) AS n_censored
       |  FROM grid LEFT JOIN byd ON grid.hour = byd.dur),
       |fac AS (
       |  SELECT hour,
       |         n_obs - COALESCE(sum(n_returned + n_censored)
       |           OVER (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING
       |                 AND 1 PRECEDING), 0) AS n_risk,
       |         n_returned, n_censored
       |  FROM dense),
       |fac2 AS (
       |  SELECT hour, CAST(n_risk AS BIGINT) AS n_risk, n_returned, n_censored,
       |         CASE WHEN n_risk > 0
       |              THEN ${sqlR("1.0 - CAST(n_returned AS DOUBLE) / n_risk", 6)}
       |              ELSE 1.0 END AS factor
       |  FROM fac),
       |folded AS (SELECT $fold AS s
       |           FROM (SELECT list(factor ORDER BY hour) AS fs FROM fac2))
       |SELECT f.hour, f.n_risk, f.n_returned, f.n_censored, f.factor,
       |       fl.s[CAST(f.hour AS INT) + 2] AS survival
       |FROM fac2 f CROSS JOIN folded fl
       |ORDER BY f.hour""".stripMargin
  }
}
