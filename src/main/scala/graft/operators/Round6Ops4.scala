package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-13/14 pipeline-audit analytics (SURVEY §2 #161,
  * #164, #166, #167): a Benford first-digit conformance check over
  * order totals (the data-quality screen a warehouse runs before
  * trusting a new feed), a reliability/Brier calibration table for the
  * behavioral propensity score (the eval every score-producing
  * pipeline owes its consumers), an hour×weekday independence test,
  * and a duplicate-payment screen.
  */
object Round6Ops4 {

  /** 6dp-rounded Benford expected shares log10(1 + 1/d), d = 1..9 —
    * computed once driver-side and inlined as LITERALS into both the
    * Spark plan and the oracle SQL, so neither engine's libm log10 is
    * in the compared path. */
  private[graft] val BenfordExp: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> r6d(math.log10(1.0 + 1.0 / d)))

  /** #161 orders_benford: Benford's-law first-significant-digit audit
    * of `o_totalprice` — the classic fabricated/corrupted-feed screen
    * (Nigrini 1996): naturally occurring multi-scale amounts follow
    * P(d) = log10(1+1/d); a flat or spiked digit histogram flags
    * synthetic or truncated data. Output: per digit 1-9 the observed
    * count/share, the Benford share, the chi-square contribution, and
    * the total chi-square statistic.
    *
    * Scale shape: one map-only digit extraction (integer cents →
    * leading digit via the engine-portable integer-to-string route, no
    * log10 on data) + a 9-key count; everything after the groupBy runs
    * on a 9-row model table (digit spine left-join, broadcast total,
    * decimal window sum for the chi-square total). */
  def ordersBenford(s: SparkSession, dir: String): DataFrame =
    benfordReport(s, benfordDigitCounts(
      Tables.orders(s, dir).select(
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))))

  /** Positive-cent leading-digit counts — the O(9) mergeable register
    * table shared by the batch audit and its streaming monitor
    * (#168 stream_benford): counting is the merge operator, so the
    * incrementally-maintained registers are bit-identical to the batch
    * build. */
  def benfordDigitCounts(amounts: DataFrame): DataFrame =
    amounts.filter(col("cents") >= 1)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))

  /** Digit-count registers → the full Benford report (spine join,
    * shares, chi-square terms + decimal-window total) — everything
    * after this point runs on a 9-row model table. */
  def benfordReport(s: SparkSession, digits: DataFrame): DataFrame = {
    val spine = s.range(1, 10).select(col("id").cast("int").as("digit"))
    val full = spine.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val tot = full.agg(sum(col("n")).as("n_total"))
    val expShare = element_at(
      array(BenfordExp.map { case (_, e) => lit(e) }: _*), col("digit"))
    val w = Window.partitionBy()
    full.crossJoin(broadcast(tot))
      .withColumn("exp_share", expShare)
      .withColumn("exp_n", col("n_total") * col("exp_share"))
      .withColumn("chi2_term",
        r((col("n") - col("exp_n")) * (col("n") - col("exp_n")) / col("exp_n"), 6))
      .withColumn("chi2_total",
        r(sum(col("chi2_term").cast("decimal(38,10)")).over(w).cast("double"), 6))
      .select(col("digit"), col("n"), r(col("n") / col("n_total"), 6).as("obs_share"),
              col("exp_share"), col("chi2_term"), col("chi2_total"))
      .orderBy(col("digit"))
  }

  /** Full Benford-report oracle over a digit-count CTE body `c(digit,
    * n)` — shared by the batch audit (#161, over orders) and the
    * streaming monitor (#168, over event values). */
  def benfordReportSql(countsCte: String): String = {
    val expVals = BenfordExp.map { case (d, e) => s"($d, CAST($e AS DOUBLE))" }
      .mkString(", ")
    s"""WITH c AS ($countsCte),
       |f AS (
       |  SELECT s.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
       |  FROM (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit) s
       |  LEFT JOIN c ON c.digit = s.digit),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM f),
       |e(digit, exp_share) AS (VALUES $expVals),
       |x AS (
       |  SELECT f.digit, f.n,
       |         ${sqlR("f.n / t.n_total", 6)} AS obs_share, e.exp_share,
       |         ${sqlR("(f.n - t.n_total * e.exp_share) * (f.n - t.n_total * e.exp_share) / (t.n_total * e.exp_share)", 6)} AS chi2_term
       |  FROM f CROSS JOIN t JOIN e ON e.digit = f.digit)
       |SELECT digit, n, obs_share, exp_share, chi2_term,
       |       ${sqlR("CAST(sum(CAST(chi2_term AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS chi2_total
       |FROM x ORDER BY digit""".stripMargin
  }

  // the same cents >= 1 guard as the Spark twin and the streaming
  // oracle: a negative/zero total (refund rows) would otherwise make
  // the oracle CAST a '-' leading character and abort
  val ordersBenfordSql: String = benfordReportSql(
    """
      |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
      |         count(*) AS n
      |  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |        FROM orders)
      |  WHERE cents >= 1 GROUP BY 1""".stripMargin)

  // --------------------------------------- #164 events_brier_calibration

  /** #164 events_brier_calibration: reliability diagram + Brier score
    * for the simplest honest propensity model — predict each user's
    * second-half conversion from their FIRST-half conversion rate
    * (time-split, so the eval never peeks at its own labels; the #139
    * backtest discipline applied to a per-user classifier). Per
    * predicted-probability decile bin: user count, mean prediction,
    * realized positive fraction, and the calibration gap; plus the
    * corpus Brier score. The table every score consumer (the #145 bot
    * flag, a quality classifier's keep-probability) should demand
    * before thresholding on a "probability".
    *
    * Scale shape: the time midpoint is one broadcast scalar; prediction
    * and outcome are two per-user aggregations joined on the user key;
    * binning is map-only, and the readout (≤10 bins) is model-sized —
    * the Brier total is a decimal window sum over those rows. */
  def eventsBrierCalibration(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), epochUs(col("ts")).as("us"), col("event_type"))
    val midRow = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val withMid = ev.crossJoin(broadcast(midRow))
    val conv1 = when(col("event_type") === Round6Ops3.ConvType, 1L).otherwise(0L)
    val pred = withMid.filter(col("us") <= col("mid_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hist"), sum(conv1).as("n_conv"))
      .select(col("user_id"), r(col("n_conv") / col("n_hist"), 6).as("p_pred"))
    val outcome = withMid.filter(col("us") > col("mid_us"))
      .groupBy(col("user_id"))
      .agg(max(conv1).as("y"))
    val joined = pred.join(outcome, Seq("user_id"), "left")
      .select(col("p_pred"), coalesce(col("y"), lit(0L)).as("y"))
      .withColumn("bin", least(floor(col("p_pred") * 10).cast("int"), lit(9)))
    val sqErr = (col("p_pred") - col("y")) * (col("p_pred") - col("y"))
    val w = Window.partitionBy()
    joined.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"),
           dsum(col("p_pred")).as("sp"),
           sum(col("y")).as("ny"),
           sum(sqErr.cast("decimal(28,10)")).as("sq_dec"))
      .withColumn("brier_overall",
        r(sum(col("sq_dec")).over(w).cast("double") /
          sum(col("n_users")).over(w), 6))
      .select(col("bin"), col("n_users"),
              r(col("sp") / col("n_users"), 6).as("mean_pred"),
              r(col("ny") / col("n_users"), 6).as("frac_pos"),
              r(r(col("ny") / col("n_users"), 6) - r(col("sp") / col("n_users"), 6), 6)
                .as("gap"),
              col("brier_overall"))
      .orderBy(col("bin"))
  }

  val eventsBrierCalibrationSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
       |  FROM events),
       |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev),
       |pred AS (
       |  SELECT user_id,
       |         ${sqlR(s"sum(CASE WHEN event_type = '${Round6Ops3.ConvType}' THEN 1 ELSE 0 END) / count(*)", 6)} AS p_pred
       |  FROM ev CROSS JOIN mid WHERE us <= mid_us GROUP BY 1),
       |outc AS (
       |  SELECT user_id, max(CASE WHEN event_type = '${Round6Ops3.ConvType}' THEN 1 ELSE 0 END) AS y
       |  FROM ev CROSS JOIN mid WHERE us > mid_us GROUP BY 1),
       |j AS (
       |  SELECT p.p_pred, CAST(COALESCE(o.y, 0) AS BIGINT) AS y,
       |         LEAST(CAST(floor(p.p_pred * 10) AS INT), 9) AS bin
       |  FROM pred p LEFT JOIN outc o USING (user_id)),
       |pb AS (
       |  SELECT bin, count(*) AS n_users, ${sqlSum("p_pred")} AS sp,
       |         CAST(sum(y) AS BIGINT) AS ny,
       |         sum(CAST((p_pred - y) * (p_pred - y) AS DECIMAL(28,10))) AS sq_dec
       |  FROM j GROUP BY 1)
       |SELECT bin, n_users,
       |       ${sqlR("sp / n_users", 6)} AS mean_pred,
       |       ${sqlR("ny / n_users", 6)} AS frac_pos,
       |       ${sqlR(s"(${sqlR("ny / n_users", 6)}) - (${sqlR("sp / n_users", 6)})", 6)} AS gap,
       |       ${sqlR("CAST(sum(sq_dec) OVER () AS DOUBLE) / (sum(n_users) OVER ())", 6)} AS brier_overall
       |FROM pb ORDER BY bin""".stripMargin

  // ---------------------------------- #166 events_hod_dow_independence

  /** #166 events_hod_dow_independence: the hour-of-day × day-of-week
    * activity heatmap with a chi-square INDEPENDENCE test against the
    * rank-1 expectation (row margin × column margin / N) — per cell the
    * observed count, expected count, lift, and chi-square term, plus
    * the total statistic (dof = 6×23). Lift ≫ 1 cells are the traffic
    * concentrations capacity planning keys on; a tiny total chi-square
    * says hour and weekday act independently and one marginal profile
    * suffices.
    *
    * Scale shape: time bucketing is pure integer arithmetic on epoch
    * micros (no calendar functions — engine-portable by construction),
    * one map-only extraction + a ≤168-key count; margins, expectations
    * and the decimal-window chi-square total all run on the dense
    * 7×24 spine (a model table). */
  def eventsHodDowIndependence(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .select(
        expr("CAST((unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 + 4) % 7 AS INT)")
          .as("dow"),
        expr("CAST((unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) % 24 AS INT)")
          .as("hod"))
      .groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n"))
    val spine = s.range(7).select(col("id").cast("int").as("dow"))
      .crossJoin(s.range(24).select(col("id").cast("int").as("hod")))
    val full = spine.join(obs, Seq("dow", "hod"), "left")
      .select(col("dow"), col("hod"), coalesce(col("n"), lit(0L)).as("n"))
    val wAll = Window.partitionBy()
    val wDow = Window.partitionBy(col("dow"))
    val wHod = Window.partitionBy(col("hod"))
    // margins multiply as DOUBLE: a long×long product of two margins
    // overflows int64 around N ≈ 4e10 events (Spark would wrap silently
    // where DuckDB's HUGEINT keeps going — a silent parity break)
    val expd = sum(col("n")).over(wDow).cast("double") *
      sum(col("n")).over(wHod).cast("double") /
      sum(col("n")).over(wAll).cast("double")
    full
      .withColumn("expected", r(expd, 6))
      .withColumn("chi2_term",
        when(col("expected") > 0,
          r((col("n") - col("expected")) * (col("n") - col("expected")) /
            col("expected"), 6)).otherwise(lit(0.0)))
      .withColumn("lift",
        when(col("expected") > 0, r(col("n") / col("expected"), 6)))
      .withColumn("chi2_total",
        r(sum(col("chi2_term").cast("decimal(38,10)")).over(wAll)
          .cast("double"), 6))
      .select(col("dow"), col("hod"), col("n"), col("expected"), col("lift"),
              col("chi2_term"), col("chi2_total"))
      .orderBy(col("dow"), col("hod"))
  }

  val eventsHodDowIndependenceSql: String = {
    val us = "epoch_us(CAST(ts AS TIMESTAMP))"
    s"""WITH o AS (
       |  SELECT CAST(($us // 86400000000 + 4) % 7 AS INT) AS dow,
       |         CAST(($us // 3600000000) % 24 AS INT) AS hod, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |f AS (
       |  SELECT s.dow, s.hod, CAST(COALESCE(o.n, 0) AS BIGINT) AS n
       |  FROM (SELECT CAST(d.d AS INT) AS dow, CAST(h.h AS INT) AS hod
       |        FROM (SELECT unnest(range(0, 7)) AS d) d,
       |             (SELECT unnest(range(0, 24)) AS h) h) s
       |  LEFT JOIN o ON o.dow = s.dow AND o.hod = s.hod),
       |x AS (
       |  SELECT dow, hod, n,
       |         ${sqlR("CAST(sum(n) OVER (PARTITION BY dow) AS DOUBLE) * CAST(sum(n) OVER (PARTITION BY hod) AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)", 6)} AS expected
       |  FROM f),
       |y AS (
       |  SELECT dow, hod, n, expected,
       |         CASE WHEN expected > 0
       |              THEN ${sqlR("(n - expected) * (n - expected) / expected", 6)}
       |              ELSE 0.0 END AS chi2_term,
       |         CASE WHEN expected > 0 THEN ${sqlR("n / expected", 6)} END AS lift
       |  FROM x)
       |SELECT dow, hod, n, expected, lift, chi2_term,
       |       ${sqlR("CAST(sum(CAST(chi2_term AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS chi2_total
       |FROM y ORDER BY dow, hod""".stripMargin
  }

  // ------------------------------------------ #167 orders_dup_payments

  private[graft] val DupPaymentWindowDays = 30L
  private[graft] val ReplayEvery = 50L
  private[graft] val ReplayKeyOffset = 1000000000L

  /** #167 orders_dup_payments: the accounts-payable DUPLICATE-PAYMENT
    * audit — pairs of orders by the same customer for the identical
    * cent amount within a 30-day window (the classic double-submission
    * screen; Benford #161 flags a corrupt feed wholesale, this flags
    * individual repeated payments inside an honest one). Like
    * #165's integrity gate, the op simulates its own fault: every
    * [[ReplayEvery]]-th order is re-submitted under a fresh synthetic
    * key 0-6 days later (the retry-storm / double-click failure mode),
    * and the audit must surface exactly those replays — known ground
    * truth at every scale, plus any natural collisions. Same-day pairs
    * grade `exact`, the rest `suspect`.
    *
    * Scale shape: the replay is a map-only union (no key ever
    * collected); the pair search is an equi-join on the (customer,
    * cent-amount) blocking key — never a cross or band join; candidate
    * pairs are bounded by Σ block² over naturally tiny exact-amount
    * blocks, and the day-gap predicate prunes post-join. Integer cents
    * and integer epoch days: zero float comparisons. */
  def ordersDupPayments(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
    val replay = base.filter(col("o_orderkey") % ReplayEvery === 0)
      .select(col("o_custkey"),
              (col("o_orderkey") + ReplayKeyOffset).as("o_orderkey"),
              col("cents"), (col("day") + col("o_orderkey") % 7).as("day"))
    val feed = base.unionByName(replay)
    val a = feed.select(col("o_custkey"), col("o_orderkey").as("order_a"),
                        col("cents"), col("day").as("day_a"))
    val b = feed.select(col("o_custkey"), col("o_orderkey").as("order_b"),
                        col("cents"), col("day").as("day_b"))
    a.join(b, Seq("o_custkey", "cents"))
      .filter(col("order_a") < col("order_b"))
      .withColumn("day_gap", abs(col("day_b") - col("day_a")))
      .filter(col("day_gap") <= DupPaymentWindowDays)
      .select(col("o_custkey"), col("order_a"), col("order_b"),
              col("cents").as("amount_cents"), col("day_gap"),
              when(col("day_gap") === 0, lit("exact")).otherwise(lit("suspect"))
                .as("severity"))
      .orderBy(col("o_custkey"), col("order_a"), col("order_b"))
  }

  val ordersDupPaymentsSql: String =
    s"""WITH base AS (
       |  SELECT o_custkey, o_orderkey,
       |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       |         epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
       |  FROM orders),
       |feed AS (
       |  SELECT * FROM base
       |  UNION ALL
       |  SELECT o_custkey, o_orderkey + $ReplayKeyOffset, cents,
       |         day + o_orderkey % 7
       |  FROM base WHERE o_orderkey % $ReplayEvery = 0)
       |SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       |       a.cents AS amount_cents,
       |       abs(b.day - a.day) AS day_gap,
       |       CASE WHEN abs(b.day - a.day) = 0 THEN 'exact'
       |            ELSE 'suspect' END AS severity
       |FROM feed a JOIN feed b
       |  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
       | AND a.o_orderkey < b.o_orderkey
       |WHERE abs(b.day - a.day) <= $DupPaymentWindowDays
       |ORDER BY a.o_custkey, order_a, order_b""".stripMargin
}
