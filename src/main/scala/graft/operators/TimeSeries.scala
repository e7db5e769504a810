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
}
