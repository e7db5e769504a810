package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-16 operator (SURVEY §2 #339): type-pair lead-lag
  * scan. (#338 `stream_overdispersion` lives in
  * [[graft.streaming.Streaming.streamOverdispersion]] over the #334
  * registers.)
  */
object Round9Ops16 {

  // ------------------------------------------------ #339 ts_lead_lag

  /** #339 ts_lead_lag: WHICH FEED LEADS WHICH — the cross-correlation
    * function between every pair of per-type daily mean series at lags
    * −3..+3, with the best lag (max |corr|, ties to the smaller |lag|)
    * and a direction verdict. corr(a_t, b_{t−k}) peaking at k > 0
    * means b's past predicts a's present — b LEADS a by k days: the
    * incident-propagation readout ("errors lead purchase drops by a
    * day") that #11i's key-vs-panel scan cannot see and #336's
    * level-equilibrium test does not time. Pearson is pairwise-
    * complete per lag (moment form over decimal sums); zero-variance
    * lags answer NULL and sort after every real peak.
    *
    * Scale shape: the corpus is touched once in the (type, day)
    * rollup; the pair join, the ×7 lag fan (7 window lags + one
    * explode), the per-(pair, lag) moment fold and the best-lag window
    * all run on MODEL-SIZED tables (types² × days × 7 at worst). */
  def tsLeadLag(s: SparkSession, dir: String): DataFrame =
    tsLeadLagDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, ts, value). */
  def tsLeadLagDf(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(davg(col("value"), 6).as("m"))
      .transform(graft.Lineage.pin)
    val pairs = daily.select(col("event_type").as("type_a"), col("d"),
        col("m").as("ya"))
      .join(broadcast(daily.select(col("event_type").as("type_b"), col("d"),
        col("m").as("yb"))), Seq("d"))
      .filter(col("type_a") < col("type_b"))
    val w = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("d"))
    val wide = (-3 to 3).foldLeft(pairs) { (df, k) =>
      val c = if (k > 0) lag(col("yb"), k).over(w)
              else if (k < 0) lead(col("yb"), -k).over(w)
              else col("yb")
      df.withColumn(s"yb_$k", c)
    }
    val stacked = wide.withColumn("s", explode(array((-3 to 3).map { k =>
        struct(lit(k).as("lag_k"), col(s"yb_$k").as("ybk"))
      }: _*)))
      .select(col("type_a"), col("type_b"), col("ya"),
              col("s.lag_k").as("lag_k"), col("s.ybk").as("ybk"))
      .filter(col("ybk").isNotNull)
    val n = count(lit(1)).cast("double")
    val (sx, sy) = (dsum(col("ya")), dsum(col("ybk")))
    val (sxy, sxx, syy) = (dsum(col("ya") * col("ybk")),
      dsum(col("ya") * col("ya")), dsum(col("ybk") * col("ybk")))
    val corr = (n * sxy - sx * sy) /
      nullif(sqrt(greatest(lit(0d), n * sxx - sx * sx) *
                  greatest(lit(0d), n * syy - sy * sy)), lit(0d))
    val perLag = stacked.groupBy(col("type_a"), col("type_b"), col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"), r(corr, 6).as("ccf"))
    val wBest = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(abs(col("ccf")).desc_nulls_last, abs(col("lag_k")),
               col("lag_k"))
    perLag
      .withColumn("best_lag", first(col("lag_k")).over(wBest))
      .withColumn("best_ccf", first(col("ccf")).over(wBest))
      .withColumn("verdict",
        when(col("best_ccf").isNull, "undefined")
          .when(col("best_lag") > 0, "b_leads")
          .when(col("best_lag") < 0, "a_leads")
          .otherwise("coincident"))
      .select(col("type_a"), col("type_b"), col("lag_k"), col("n_pairs"),
              col("ccf"), col("best_lag"), col("best_ccf"), col("verdict"))
      .orderBy(col("type_a"), col("type_b"), col("lag_k"))
  }

  val tsLeadLagSql: String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val sx = sqlSum("ya"); val sy = sqlSum("ybk")
    val sxy = sqlSum("ya * ybk"); val sxx = sqlSum("ya * ya")
    val syy = sqlSum("ybk * ybk")
    val corr = s"($n * $sxy - $sx * $sy) / " +
      s"nullif(sqrt(greatest(0.0, $n * $sxx - $sx * $sx) * " +
      s"greatest(0.0, $n * $syy - $sy * $sy)), 0.0)"
    def colName(k: Int) = if (k < 0) s"yb_m${-k}" else s"yb_$k"
    val lagDefs = (-3 to 3).filter(_ != 0).map { k =>
      val c = if (k > 0) s"lag(yb, $k) OVER pw" else s"lead(yb, ${-k}) OVER pw"
      s"$c AS ${colName(k)}"
    }.mkString(",\n       |         ")
    val pick = (-3 to 3).map { k =>
      s"WHEN $k THEN ${if (k == 0) "yb" else colName(k)}"
    }.mkString(" ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d, ${sqlAvg("value", 6)} AS m
       |  FROM events GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.d,
       |         a.m AS ya, b.m AS yb
       |  FROM daily a JOIN daily b ON a.d = b.d AND a.event_type < b.event_type),
       |wide AS (
       |  SELECT type_a, type_b, ya, yb,
       |         $lagDefs
       |  FROM pairs
       |  WINDOW pw AS (PARTITION BY type_a, type_b ORDER BY d)),
       |stacked AS (
       |  SELECT type_a, type_b, ya, g.lag_k,
       |         CASE g.lag_k $pick END AS ybk
       |  FROM wide CROSS JOIN (
       |    SELECT CAST(range AS INT) AS lag_k FROM range(-3, 4)) g),
       |perlag AS (
       |  SELECT type_a, type_b, lag_k, count(*) AS n_pairs,
       |         ${sqlR(corr, 6)} AS ccf
       |  FROM stacked WHERE ybk IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT *,
       |         first_value(lag_k) OVER bw AS best_lag,
       |         first_value(ccf) OVER bw AS best_ccf
       |  FROM perlag
       |  WINDOW bw AS (PARTITION BY type_a, type_b
       |    ORDER BY abs(ccf) DESC NULLS LAST, abs(lag_k), lag_k))
       |SELECT type_a, type_b, lag_k, n_pairs, ccf, best_lag, best_ccf,
       |       CASE WHEN best_ccf IS NULL THEN 'undefined'
       |            WHEN best_lag > 0 THEN 'b_leads'
       |            WHEN best_lag < 0 THEN 'a_leads'
       |            ELSE 'coincident' END AS verdict
       |FROM best ORDER BY type_a, type_b, lag_k""".stripMargin
  }
}
