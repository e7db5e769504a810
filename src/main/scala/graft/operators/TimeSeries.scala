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

  /** #11k `ts_interp_linear`: capped linear gap interpolation — the
    * reference ecosystem's `pad(data, maxPadLength)` (ground-truth asset
    * tests/data/legacy/marineHeatWaves.py:888-916: np.interp over the
    * missing indices, then gaps LONGER than maxPadLength restored to
    * missing). Per key, each spine day in a gap takes
    * v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev) iff the
    * gap run length ≤ maxPad, else stays null; spine endpoints are
    * observed by construction so there is no edge-extension case.
    *
    * One exchange: the prev/next observation carriers are two window
    * frames over the same partitionBy(user_id).orderBy(d) sort. The
    * spine explode is map-side, like [[fillForward]]. */
  def interpLinear(s: SparkSession, dir: String, maxPad: Int = 2): DataFrame =
    interpLinearOf(Mhw.daily(s, dir), maxPad)

  /** Core on any (user_id, d, sst) daily frame — spec entry point. */
  def interpLinearOf(dl: DataFrame, maxPad: Int): DataFrame = {
    val spine = dl.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val wPrev = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsD = when(col("sst").isNotNull, col("d"))
    val interp = col("pv") +
      (col("nv") - col("pv")) *
        (datediff(col("d"), col("pd")).cast("double") /
         datediff(col("nd"), col("pd")).cast("double"))
    spine
      .join(dl.select(col("user_id"), col("d"), col("sst")),
            Seq("user_id", "d"), "left")
      .withColumn("pv", last(col("sst"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(obsD, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("sst"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(obsD, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("d"),
        when(col("sst").isNotNull, col("sst"))
          .when(datediff(col("nd"), col("pd")) - 1 <= maxPad, r(interp, 6))
          .as("sst_interp"),
        (col("sst").isNull &&
         (datediff(col("nd"), col("pd")) - 1 <= maxPad)).as("filled"))
  }

  def interpLinearSql(maxPad: Int = 2): String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d,
       |         floor((CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / count(value)) * 1e6 + 0.5) / 1e6 AS sst
       |  FROM events GROUP BY 1, 2
       |),
       |spine AS (
       |  SELECT user_id, unnest(generate_series(min(d), max(d), INTERVAL 1 DAY))::DATE AS d
       |  FROM daily GROUP BY user_id
       |),
       |carried AS (
       |  SELECT s.user_id, s.d, dd.sst,
       |         last_value(dd.sst IGNORE NULLS) OVER wp AS pv,
       |         last_value(CASE WHEN dd.sst IS NOT NULL THEN s.d END IGNORE NULLS) OVER wp AS pd,
       |         first_value(dd.sst IGNORE NULLS) OVER wn AS nv,
       |         first_value(CASE WHEN dd.sst IS NOT NULL THEN s.d END IGNORE NULLS) OVER wn AS nd
       |  FROM spine s LEFT JOIN daily dd ON s.user_id = dd.user_id AND s.d = dd.d
       |  WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.d ROWS UNBOUNDED PRECEDING),
       |         wn AS (PARTITION BY s.user_id ORDER BY s.d
       |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |)
       |SELECT user_id, d,
       |       CASE WHEN sst IS NOT NULL THEN sst
       |            WHEN datediff('day', pd, nd) - 1 <= $maxPad
       |            THEN floor((pv + (nv - pv) * (CAST(datediff('day', pd, d) AS DOUBLE)
       |                 / CAST(datediff('day', pd, nd) AS DOUBLE))) * 1e6 + 0.5) / 1e6
       |       END AS sst_interp,
       |       (sst IS NULL AND datediff('day', pd, nd) - 1 <= $maxPad) AS filled
       |FROM carried""".stripMargin
}
