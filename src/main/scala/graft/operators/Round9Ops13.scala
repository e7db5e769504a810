package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-13 operators (SURVEY §2 #332-#333): the live A/B
  * monitor's registers/finalize pair and the Lo-MacKinlay variance-
  * ratio test. (#332's stream entry lives in
  * [[graft.streaming.Streaming.streamAbMonitor]].)
  */
object Round9Ops13 {

  // -------------------------------------------- #332 stream_ab_monitor

  /** #332's registers: per-type Welch moments (n, Σx, Σx²) — count and
    * decimal sums all merge by addition, ≤|types| rows of state. These
    * are exactly the moments #104 reduces the corpus to; maintaining
    * them incrementally makes the ENTIRE #104→#330 chain (pair t-stats
    * → erf p-values → Holm/BH) a batch readout over a model-sized
    * sink. */
  private[graft] def welchMomentRegisters(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_raw"),
           dsum(col("value")).as("sx"),
           dsum(col("value") * col("value")).as("sxx"))

  /** #332's finalize: replay #104's mean/variance/t/df expressions
    * over the drained moment registers (same exact decimal sums →
    * identical IEEE scalars → bit-identical t_stat), then #330's
    * correction chain. Shares #330's oracle. */
  private[graft] def abMonitorFinalize(regs: DataFrame): DataFrame = {
    val m = regs.filter(col("n_raw") >= 2)
      .select(col("event_type"), col("n_raw").cast("double").as("n"),
              (col("sx") / col("n_raw").cast("double")).as("mean"),
              ((col("sxx") - col("sx") * col("sx") /
                  col("n_raw").cast("double")) /
               (col("n_raw").cast("double") - 1)).as("variance"))
    val a = m.select(col("event_type").as("type_a"), col("n").as("na"),
                     col("mean").as("ma"), col("variance").as("va"))
    val b = m.select(col("event_type").as("type_b"), col("n").as("nb"),
                     col("mean").as("mb"), col("variance").as("vb"))
    val sea = col("va") / col("na"); val seb = col("vb") / col("nb")
    val fam = a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
              r((col("ma") - col("mb")) / sqrt(sea + seb), 6).as("t_stat"))
    Round9Ops12.multipleTestingDf(fam)
  }

  // ------------------------------------------- #333 ts_variance_ratio

  /** #333 ts_variance_ratio: the Lo-MacKinlay VARIANCE-RATIO test per
    * series — is `value` a random walk? Under the null, the variance
    * of q-period differences is q× the variance of 1-period
    * differences, so VR(q) = var(x_t−x_{t−q}) / (q·var(x_t−x_{t−1}))
    * ≈ 1; VR > 1 reads momentum, VR < 1 mean-reversion. Reported at
    * q = 2 and q = 4 with the homoskedastic z statistic
    * z(q) = (VR−1)/√(2(2q−1)(q−1)/(3q·n)). The random-walk companion
    * to #319's Hurst ladder (VR(q) is the variance-scale ratio at one
    * rung, with a TEST attached) and the diagnostic that says whether
    * #327's AR fit found real structure. Sample variances use the
    * one-pass moment form over exact decimal sums (no mean join-back);
    * series too short for a q-difference pair answer NULL.
    *
    * Scale shape: one per-key ordered window pass producing all three
    * lag differences (shared exchange), then a single moment fold —
    * one row per series, no second data-proportional pass. */
  def tsVarianceRatio(s: SparkSession, dir: String): DataFrame =
    tsVarianceRatioDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id, value). */
  def tsVarianceRatioDf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = ev
      .select(col("user_id"), col("ts"), col("event_id"),
              col("value").as("v"))
      .withColumn("d1", col("v") - lag(col("v"), 1).over(w))
      .withColumn("d2", col("v") - lag(col("v"), 2).over(w))
      .withColumn("d4", col("v") - lag(col("v"), 4).over(w))
    def sVar(d: String, n: org.apache.spark.sql.Column) =
      when(n >= 2,
        (dsum(col(d) * col(d)) - dsum(col(d)) * dsum(col(d)) / n) / (n - 1))
    val agg = base.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
           count(col("d1")).cast("double").as("n1"),
           sVar("d1", count(col("d1")).cast("double")).as("var1"),
           sVar("d2", count(col("d2")).cast("double")).as("var2"),
           sVar("d4", count(col("d4")).cast("double")).as("var4"))
    def z(vr: org.apache.spark.sql.Column, q: Int) =
      r((vr - 1) / sqrt(lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) /
        col("n1")), 6)
    agg
      .withColumn("vr2", r(col("var2") /
        (lit(2d) * nullif(col("var1"), lit(0d))), 6))
      .withColumn("vr4", r(col("var4") /
        (lit(4d) * nullif(col("var1"), lit(0d))), 6))
      .select(col("user_id"), col("n"), col("n1").cast("long").as("n_diffs"),
              col("vr2"), z(col("vr2"), 2).as("z2"),
              col("vr4"), z(col("vr4"), 4).as("z4"))
      .orderBy(col("user_id"))
  }

  val tsVarianceRatioSql: String = {
    def sVar(d: String) = {
      val n = s"CAST(count($d) AS DOUBLE)"
      s"CASE WHEN $n >= 2 THEN (${sqlSum(s"$d * $d")} - " +
      s"${sqlSum(d)} * ${sqlSum(d)} / $n) / ($n - 1) END"
    }
    def zc(q: Int) = 2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)
    s"""WITH base AS (
       |  SELECT user_id,
       |         value - lag(value, 1) OVER w AS d1,
       |         value - lag(value, 2) OVER w AS d2,
       |         value - lag(value, 4) OVER w AS d4
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |agg AS (
       |  SELECT user_id, count(*) AS n,
       |         CAST(count(d1) AS DOUBLE) AS n1,
       |         ${sVar("d1")} AS var1,
       |         ${sVar("d2")} AS var2,
       |         ${sVar("d4")} AS var4
       |  FROM base GROUP BY 1),
       |vr AS (
       |  SELECT *, ${sqlR("var2 / (2.0 * nullif(var1, 0.0))", 6)} AS vr2,
       |            ${sqlR("var4 / (4.0 * nullif(var1, 0.0))", 6)} AS vr4
       |  FROM agg)
       |SELECT user_id, n, CAST(n1 AS BIGINT) AS n_diffs, vr2,
       |       ${sqlR(s"(vr2 - 1) / sqrt(${zc(2)} / n1)", 6)} AS z2,
       |       vr4,
       |       ${sqlR(s"(vr4 - 1) / sqrt(${zc(4)} / n1)", 6)} AS z4
       |FROM vr ORDER BY user_id""".stripMargin
  }
}
