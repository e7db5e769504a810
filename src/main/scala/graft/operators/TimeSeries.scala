package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._

/** Gap handling + resampling over the canonical daily series — the
  * xarray `resample`/`ffill` surface re-expressed relationally. Both are
  * one shuffle on the series key; the spine explode is map-side.
  */
object TimeSeries {

  /** Forward-fill onto the full per-key daily spine: each key's range
    * [min(d), max(d)] is exploded (map-side ×days — no join against a
    * global calendar table), observations left-join on, and
    * `last(ignoreNulls)` over the ordered window carries values across
    * gaps. `filled` marks synthesized rows. */
  def fillForward(s: SparkSession, dir: String): DataFrame = {
    val dl = Mhw.daily(s, dir)
    val spine = dl.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(dl.select(col("user_id"), col("d"), col("sst")), Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        last(col("sst"), ignoreNulls = true).over(w).as("sst_filled"),
        col("sst").isNull.as("filled"))
  }

  val fillForwardSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / count(value)) * 1e6 + 0.5) / 1e6 AS sst
      |  FROM events GROUP BY 1, 2
      |),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(min(d), max(d), INTERVAL 1 DAY))::DATE AS d
      |  FROM daily GROUP BY user_id
      |)
      |SELECT s.user_id, s.d,
      |       last_value(dd.sst IGNORE NULLS) OVER (
      |         PARTITION BY s.user_id ORDER BY s.d
      |         ROWS UNBOUNDED PRECEDING) AS sst_filled,
      |       dd.sst IS NULL AS filled
      |FROM spine s LEFT JOIN daily dd ON s.user_id = dd.user_id AND s.d = dd.d""".stripMargin

  /** Weekly resample: mean per (key, ISO week start) — the
    * `resample(time='1W').mean()` equivalent; pure partial-agg groupBy. */
  def resampleWeekly(s: SparkSession, dir: String): DataFrame =
    Mhw.daily(s, dir)
      .groupBy(col("user_id"), date_trunc("week", col("d")).cast("date").as("week"))
      .agg(davg(col("sst"), 6).as("sst_mean"),
           count(lit(1)).as("n_days"))

  val resampleWeeklySql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / count(value)) * 1e6 + 0.5) / 1e6 AS sst
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(date_trunc('week', d) AS DATE) AS week,
      |       floor((CAST(sum(CAST(sst AS DECIMAL(38,10))) AS DOUBLE) / count(sst)) * 1e6 + 0.5) / 1e6 AS sst_mean,
      |       count(*) AS n_days
      |FROM daily GROUP BY 1, 2""".stripMargin

  /** CUSUM changepoint per series (#11f): deviation-from-mean cumulative
    * sum, argmax |CUSUM| = the most likely single change point — the
    * offline change-detection primitive (regime shifts in a series the
    * MHW chain would otherwise attribute to seasonality). All windows
    * share partitionBy(user_id), so the whole operator is one exchange;
    * prefix sums accumulate in DECIMAL (order-exact), the mean is
    * rounded once, and the argmax row is picked by a deterministic
    * (|cusum| desc, date) rank — first peak on ties, like the
    * reference's first-argmax peak rule. */
  def changepoint(s: SparkSession, dir: String): DataFrame =
    changepointOf(Mhw.daily(s, dir))

  /** Core on any (user_id, d, sst) daily frame — spec entry point. */
  def changepointOf(dl: DataFrame): DataFrame = {
    val dec = "decimal(38,10)"
    val wAll = Window.partitionBy("user_id")
    val wOrd = wAll.orderBy("d")
    dl
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("mean",
        r(sum(col("sst").cast(dec)).over(wAll).cast("double") / col("n"), 6))
      .withColumn("prefix",
        sum(col("sst").cast(dec))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cusum", r(col("prefix") - col("rn") * col("mean"), 6))
      .withColumn("rk",
        row_number().over(wAll.orderBy(abs(col("cusum")).desc, col("d"))))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("d").as("cp_date"),
              col("cusum").as("cp_cusum"), col("n").as("n_days"))
  }

  val changepointSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / count(value)) * 1e6 + 0.5) / 1e6 AS sst
      |  FROM events GROUP BY 1, 2
      |),
      |s AS (
      |  SELECT user_id, d,
      |         count(*) OVER (PARTITION BY user_id) AS n,
      |         floor((CAST(sum(CAST(sst AS DECIMAL(38,10))) OVER (PARTITION BY user_id) AS DOUBLE)
      |                / count(*) OVER (PARTITION BY user_id)) * 1e6 + 0.5) / 1e6 AS mean,
      |         CAST(sum(CAST(sst AS DECIMAL(38,10))) OVER (
      |           PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS prefix,
      |         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      |  FROM daily),
      |c AS (
      |  SELECT user_id, d, n,
      |         floor((prefix - rn * mean) * 1e6 + 0.5) / 1e6 AS cusum
      |  FROM s),
      |rk AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY abs(cusum) DESC, d) AS rk
      |  FROM c)
      |SELECT user_id, d AS cp_date, cusum AS cp_cusum,
      |       CAST(n AS BIGINT) AS n_days
      |FROM rk WHERE rk = 1""".stripMargin
}
