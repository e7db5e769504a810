package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-20 analytics (SURVEY §2 #188-#191): langid quality
  * metrics, behavior-chain entropy, SPC control charts, and seasonal
  * indices.
  */
object Round6Ops6 {

  // ----------------------------------------------- #188 text_langid_eval

  /** #188 text_langid_eval: the METRIC layer over #23's confusion
    * matrix — per language: support, predictions, true positives,
    * precision, recall, F1, plus corpus accuracy. #23 pins the
    * classifier's raw (lang × predicted) counts; this is the readout a
    * curation team actually thresholds on before trusting the router
    * for mixture decisions (#74/#185 weight by lang — a low-recall
    * language silently starves its own weight).
    *
    * Scale shape: rides #23's single corpus scan; everything here is
    * algebra on the ≤|langs|² matrix (window sums on a model table). */
  def textLangidEval(s: SparkSession, dir: String): DataFrame = {
    val cm = TextOps.textLangid(s, dir)
    val wTrue = Window.partitionBy(col("lang"))
    val wPred = Window.partitionBy(col("predicted"))
    val wAll = Window.partitionBy()
    val tp = sum(when(col("lang") === col("predicted"), col("n"))
      .otherwise(0L)).over(wTrue)
    val enriched = cm
      .withColumn("n_true", sum(col("n")).over(wTrue))
      .withColumn("n_pred", sum(col("n")).over(wPred))
      .withColumn("accuracy",
        r(sum(when(col("lang") === col("predicted"), col("n")).otherwise(0L))
            .over(wAll) / sum(col("n")).over(wAll), 6))
    enriched.filter(col("lang") === col("predicted"))
      .select(col("lang"), col("n_true"), col("n_pred"), col("n").as("n_tp"),
              r(col("n") / col("n_pred"), 6).as("precision"),
              r(col("n") / col("n_true"), 6).as("recall"),
              col("accuracy"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          r(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)).otherwise(lit(0.0)))
      .select(col("lang"), col("n_true"), col("n_pred"), col("n_tp"),
              col("precision"), col("recall"), col("f1"), col("accuracy"))
      .orderBy(col("lang"))
  }

  val textLangidEvalSql: String = {
    val p6 = sqlR("n / n_pred", 6)
    val r6v = sqlR("n / n_true", 6)
    s"""WITH cm AS (${TextOps.textLangidSql}),
       |e AS (
       |  SELECT lang, predicted, n,
       |         sum(n) OVER (PARTITION BY lang) AS n_true,
       |         sum(n) OVER (PARTITION BY predicted) AS n_pred,
       |         ${sqlR("(sum(CASE WHEN lang = predicted THEN n ELSE 0 END) OVER ()) / (sum(n) OVER ())", 6)} AS accuracy
       |  FROM cm)
       |SELECT lang, CAST(n_true AS BIGINT) AS n_true,
       |       CAST(n_pred AS BIGINT) AS n_pred, CAST(n AS BIGINT) AS n_tp,
       |       $p6 AS precision, $r6v AS recall,
       |       CASE WHEN ($p6) + ($r6v) > 0
       |            THEN ${sqlR(s"2 * ($p6) * ($r6v) / (($p6) + ($r6v))", 6)}
       |            ELSE 0.0 END AS f1,
       |       accuracy
       |FROM e WHERE lang = predicted ORDER BY lang""".stripMargin
  }

  // ------------------------------------------- #189 events_markov_entropy

  /** #189 events_markov_entropy: per-state Shannon entropy of the #60
    * behavior chain's transition rows plus the occupancy-weighted
    * ENTROPY RATE — how predictable the next action is given the
    * current one, the single number that says whether the #60 matrix
    * is worth deploying as a recommender prior (rate ≈ ln|types| means
    * the chain explains nothing; ≈ 0 means behavior is deterministic).
    * Occupancy is the empirical source-state frequency — the honest
    * plug-in weighting, not an eigenvector solve.
    *
    * Scale shape: transition counts are the #60 aggregation (one lag
    * window + one groupBy); entropies, occupancies and the rate are
    * decimal-window algebra on the ≤|types|² model table. ln terms are
    * 6dp-rounded before the decimal sum (the #125 discipline). */
  def eventsMarkovEntropy(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val wPrev = Window.partitionBy(col("prev"))
    val wAll = Window.partitionBy()
    val p = col("n") / sum(col("n")).over(wPrev)
    val hTerm = r(-r(p, 6) * r(log(r(p, 6)), 6), 6)
    val perState = trans
      .withColumn("h_term", hTerm)
      .groupBy(col("prev"))
      .agg(sum(col("n")).as("n_from"),
           dsum(col("h_term"), 6).as("entropy"))
      .withColumn("occupancy",
        r(col("n_from") / sum(col("n_from")).over(wAll), 6))
    perState
      .withColumn("entropy_rate",
        r(sum(r(col("occupancy") * col("entropy"), 6).cast("decimal(38,10)"))
          .over(wAll).cast("double"), 6))
      .select(col("prev").as("state"), col("n_from"), col("occupancy"),
              col("entropy"), col("entropy_rate"))
      .orderBy(col("state"))
  }

  val eventsMarkovEntropySql: String = {
    val p = "n / (sum(n) OVER (PARTITION BY prev))"
    val p6 = sqlR(p, 6)
    val hTerm = sqlR(s"-($p6) * (${sqlR(s"ln($p6)", 6)})", 6)
    s"""WITH trans AS (
       |  SELECT prev, event_type AS next, count(*) AS n
       |  FROM (SELECT event_type,
       |               lag(event_type) OVER (PARTITION BY user_id
       |                                     ORDER BY ts, event_id) AS prev
       |        FROM events)
       |  WHERE prev IS NOT NULL
       |  GROUP BY 1, 2),
       |ht AS (SELECT prev, n, $hTerm AS h_term FROM trans),
       |st AS (
       |  SELECT prev, CAST(sum(n) AS BIGINT) AS n_from,
       |         ${sqlSum("h_term", 6)} AS entropy
       |  FROM ht GROUP BY 1),
       |occ AS (
       |  SELECT prev, n_from, entropy,
       |         ${sqlR("n_from / (sum(n_from) OVER ())", 6)} AS occupancy
       |  FROM st)
       |SELECT prev AS state, n_from, occupancy, entropy,
       |       ${sqlR(s"CAST(sum(CAST((${sqlR("occupancy * entropy", 6)}) AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS entropy_rate
       |FROM occ ORDER BY state""".stripMargin
  }

  // ---------------------------------------- #190 lineitem_returns_pchart

  /** #190 lineitem_returns_pchart: the SPC p-chart over monthly return
    * rates — per ship month: lines, returns (`l_returnflag = 'R'`),
    * the rate, the corpus center line p̄, binomial 3σ control limits
    * p̄ ± 3·√(p̄(1−p̄)/n) (LCL floored at 0), and the out-of-control
    * flag. Statistical process control for the returns pipeline: #143's
    * CUSUM finds small sustained per-user shifts; the p-chart is the
    * classic month-grain process monitor an ops review reads.
    *
    * Scale shape: one month-key aggregation (calendar month via
    * year()/month() — both engines extract proleptic-Gregorian UTC
    * fields identically); the center line is a broadcast scalar; limits
    * and flags are map-only algebra on the ≤|months| model table. */
  def lineitemReturnsPchart(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val monthly = li.groupBy(col("ym"))
      .agg(count(lit(1)).as("n_lines"), sum(col("ret")).as("n_returns"))
    val totals = monthly.agg(
      r(sum(col("n_returns")) / sum(col("n_lines")), 6).as("p_bar"))
    val sigma = sqrt(col("p_bar") * (lit(1) - col("p_bar")) / col("n_lines"))
    monthly.crossJoin(broadcast(totals))
      .withColumn("rate", r(col("n_returns") / col("n_lines"), 6))
      .withColumn("ucl", r(col("p_bar") + lit(3) * sigma, 6))
      .withColumn("lcl", r(greatest(lit(0.0), col("p_bar") - lit(3) * sigma), 6))
      .withColumn("out_of_control",
        col("rate") > col("ucl") || col("rate") < col("lcl"))
      .select(col("ym"), col("n_lines"), col("n_returns"), col("rate"),
              col("p_bar"), col("lcl"), col("ucl"), col("out_of_control"))
      .orderBy(col("ym"))
  }

  val lineitemReturnsPchartSql: String = {
    val sigma = "sqrt(p_bar * (1 - p_bar) / n_lines)"
    s"""WITH m AS (
       |  SELECT CAST(year(CAST(l_shipdate AS TIMESTAMP)) * 100 +
       |              month(CAST(l_shipdate AS TIMESTAMP)) AS INT) AS ym,
       |         count(*) AS n_lines,
       |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT ${sqlR("CAST(sum(n_returns) AS DOUBLE) / CAST(sum(n_lines) AS DOUBLE)", 6)} AS p_bar FROM m),
       |x AS (
       |  SELECT m.ym, m.n_lines, m.n_returns, t.p_bar,
       |         ${sqlR("m.n_returns / m.n_lines", 6)} AS rate,
       |         ${sqlR(s"t.p_bar + 3 * $sigma", 6)} AS ucl,
       |         ${sqlR(s"greatest(0.0, t.p_bar - 3 * $sigma)", 6)} AS lcl
       |  FROM m CROSS JOIN t)
       |SELECT ym, n_lines, n_returns, rate, p_bar, lcl, ucl,
       |       (rate > ucl OR rate < lcl) AS out_of_control
       |FROM x ORDER BY ym""".stripMargin
  }

  // ---------------------------------------- #191 orders_seasonal_index

  /** #191 orders_seasonal_index: the classical monthly SEASONAL INDEX
    * of order revenue — per calendar month (1-12): observation years,
    * mean monthly revenue across years, and the index (that mean over
    * the across-months mean, so the indices average to 1). The
    * month-grain multiplicative profile beside #174's week-grain
    * additive model and #76's per-series decomposition: the one-table
    * answer to "how much is December worth vs June" a planning cycle
    * starts from.
    *
    * Scale shape: one (year, month)-key revenue aggregation (decimal
    * sums), then 12-row model-table algebra (means, window
    * normalization). */
  def ordersSeasonalIndex(s: SparkSession, dir: String): DataFrame = {
    // mean revenue held as INTEGER CENTS after the single 2dp rounding:
    // re-casting a ~1e8-magnitude computed double back to decimal for
    // the grand mean diverges at the ulp level between engines (the
    // shortest-repr vs binary-expansion cast split) — integer cents
    // make every later step exact in both
    val perMonth = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
              col("o_totalprice"))
      .groupBy(col("m"))
      .agg(countDistinct(col("y")).as("n_years"),
           dsum(col("o_totalprice")).as("total"))
      .withColumn("cents",
        floor(col("total") / col("n_years") * 100 + 0.5).cast("long"))
    val wAll = Window.partitionBy()
    perMonth
      .withColumn("mean_rev", col("cents") / lit(100.0))
      .withColumn("grand_mean",
        sum(col("cents")).over(wAll).cast("double") /
          (lit(100.0) * count(lit(1)).over(wAll)))
      .withColumn("seasonal_index", r(col("mean_rev") / col("grand_mean"), 6))
      .select(col("m").as("month"), col("n_years"), col("mean_rev"),
              col("seasonal_index"))
      .orderBy(col("month"))
  }

  val ordersSeasonalIndexSql: String =
    s"""WITH pm AS (
       |  SELECT month(CAST(o_orderdate AS TIMESTAMP)) AS m,
       |         CAST(count(DISTINCT year(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS n_years,
       |         ${sqlSum("o_totalprice")} AS total
       |  FROM orders GROUP BY 1),
       |c AS (
       |  SELECT m, n_years,
       |         CAST(floor(total / n_years * 100 + 0.5) AS BIGINT) AS cents
       |  FROM pm),
       |g AS (
       |  SELECT m, n_years, cents / 100.0 AS mean_rev,
       |         CAST(sum(cents) OVER () AS DOUBLE) /
       |           (100.0 * (count(*) OVER ())) AS grand_mean
       |  FROM c)
       |SELECT CAST(m AS INT) AS month, n_years, mean_rev,
       |       ${sqlR("mean_rev / grand_mean", 6)} AS seasonal_index
       |FROM g ORDER BY month""".stripMargin
}
