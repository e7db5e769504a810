package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-25 operators (SURVEY §2 #204-#207): the
  * header-vs-detail reconciliation audit, one-way ANOVA across event
  * types, a binned Mann–Whitney U rank test, and the Ljung–Box
  * whiteness test over per-entity event series.
  */
object Round6Ops8 {

  // ------------------------------------------------- #204 orders_reconcile

  /** #204 orders_reconcile: header-vs-detail RECONCILIATION — the
    * warehouse audit that recomputes each order's total from its line
    * items (Σ extendedprice·(1−discount)·(1+tax)) and compares it to
    * the header's o_totalprice, rolled up per order status: order
    * counts, headers with NO detail rows at all, and the relative-gap
    * profile (mean, max, share within 1%) over reconciled orders.
    * This is the daily close-of-books check between #201 (are the keys
    * referentially sound?) and #200 (are the columns sane?): key
    * integrity can be perfect while amounts drift — partial loads,
    * double-applied discounts, tax-rule skew between the order and
    * billing pipelines all surface here first.
    *
    * Scale shape: line items pre-aggregate to one row per order key
    * BEFORE the join (map-side decimal partials; the shuffle moves one
    * row per order, not one per line), then a key-equi LEFT join from
    * the header side — both sides hash on the order key, and on the
    * #97 bucketed layout the join is exchange-free. The readout is a
    * ≤|status| rollup. Per-order relative gaps are 6dp-rounded before
    * the decimal mean so the oracle lands on identical bits. */
  def ordersReconcile(s: SparkSession, dir: String): DataFrame = {
    val recomp = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
                (lit(1.0) + col("l_tax"))).as("recomp"))
    val joined = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .join(recomp, Seq("o_orderkey"), "left")
      .withColumn("rel",
        when(col("recomp").isNotNull,
          r(abs(col("o_totalprice") - col("recomp")) / col("o_totalprice"), 6)))
    joined.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(when(col("recomp").isNull, 1L).otherwise(0L)).as("n_no_lines"),
           count(col("rel")).as("n_recon"),
           r(dsum(col("rel")) / count(col("rel")), 6).as("mean_rel"),
           max(col("rel")).as("max_rel"),
           r(sum(when(col("rel") <= 0.01, 1L).otherwise(0L)) /
             count(col("rel")).cast("double"), 6).as("share_1pct"))
      .orderBy(col("o_orderstatus"))
  }

  val ordersReconcileSql: String =
    s"""WITH recomp AS (
       |  SELECT l_orderkey AS o_orderkey,
       |         ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}
       |           AS recomp
       |  FROM lineitem GROUP BY 1),
       |j AS (
       |  SELECT o.o_orderstatus, r.recomp,
       |         CASE WHEN r.recomp IS NOT NULL THEN
       |           ${sqlR("abs(o.o_totalprice - r.recomp) / o.o_totalprice", 6)}
       |         END AS rel
       |  FROM orders o LEFT JOIN recomp r USING (o_orderkey))
       |SELECT o_orderstatus, count(*) AS n_orders,
       |       CAST(sum(CASE WHEN recomp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_no_lines,
       |       count(rel) AS n_recon,
       |       ${sqlR(s"${sqlSum("rel")} / count(rel)", 6)} AS mean_rel,
       |       max(rel) AS max_rel,
       |       ${sqlR("CAST(sum(CASE WHEN rel <= 0.01 THEN 1 ELSE 0 END) AS DOUBLE) / count(rel)", 6)}
       |         AS share_1pct
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------- #205 events_anova

  /** #205 events_anova: one-way ANOVA of event value across event
    * types — per-type n and mean, plus the corpus-level decomposition
    * SS_between / SS_within, degrees of freedom, and the F statistic.
    * The k-sample generalization of #104's pairwise Welch t: ONE test
    * answering "do the type means differ anywhere?" before k² pairwise
    * probing (the multiple-comparison discipline #104's grid needs).
    *
    * Scale shape: one decimal-exact moment pass reduces the corpus to
    * a |types|-row table (n, Σx, Σx² per type — mergeable partials);
    * the grand totals and both sums of squares are windows over that
    * model-sized rollup only. Per-type SS terms are 6dp-rounded before
    * the decimal window-sum (the #203 diff2 discipline) so both
    * engines land on identical bits. */
  def eventsAnova(s: SparkSession, dir: String): DataFrame =
    eventsAnovaDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, value). */
  def eventsAnovaDf(ev: DataFrame): DataFrame = {
    val g = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("s"),
           dsum(col("value") * col("value")).as("ss"))
    val wAll = Window.partitionBy()
    def wsumL(c: Column) = sum(c).over(wAll)
    def wsumD(c: Column) =
      sum(c.cast("decimal(38,10)")).over(wAll).cast("double")
    val withTot = g
      .withColumn("n_tot", wsumL(col("n")))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("grand", wsumD(col("s")) / col("n_tot"))
      .withColumn("mean_v", r(col("s") / col("n"), 6))
      .withColumn("term_b",
        r(col("n") * (col("s") / col("n") - col("grand")) *
          (col("s") / col("n") - col("grand")), 6))
      .withColumn("term_w",
        r(col("ss") - col("s") * col("s") / col("n"), 6))
    withTot
      .withColumn("ss_between", r(wsumD(col("term_b")), 6))
      .withColumn("ss_within", r(wsumD(col("term_w")), 6))
      .withColumn("df_between", (col("k") - 1).cast("long"))
      .withColumn("df_within", (col("n_tot") - col("k")).cast("long"))
      .withColumn("f_stat",
        r((col("ss_between") / col("df_between")) /
          (col("ss_within") / col("df_within")), 6))
      .select(col("event_type"), col("n"), col("mean_v"), col("ss_between"),
              col("ss_within"), col("df_between"), col("df_within"),
              col("f_stat"))
      .orderBy(col("event_type"))
  }

  val eventsAnovaSql: String = {
    val wsumD = (x: String) =>
      s"CAST(sum(CAST($x AS DECIMAL(38,10))) OVER () AS DOUBLE)"
    s"""WITH g AS (
       |  SELECT event_type, count(*) AS n,
       |         ${sqlSum("value")} AS s,
       |         ${sqlSum("value * value")} AS ss
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT event_type, n, s, ss,
       |         CAST(sum(n) OVER () AS BIGINT) AS n_tot,
       |         CAST(count(*) OVER () AS BIGINT) AS k,
       |         ${wsumD("s")} / CAST(sum(n) OVER () AS BIGINT) AS grand
       |  FROM g),
       |terms AS (
       |  SELECT event_type, n, n_tot, k,
       |         ${sqlR("s / n", 6)} AS mean_v,
       |         ${sqlR("n * (s / n - grand) * (s / n - grand)", 6)} AS term_b,
       |         ${sqlR("ss - s * s / n", 6)} AS term_w
       |  FROM t)
       |SELECT event_type, n, mean_v,
       |       ${sqlR(wsumD("term_b"), 6)} AS ss_between,
       |       ${sqlR(wsumD("term_w"), 6)} AS ss_within,
       |       k - 1 AS df_between,
       |       n_tot - k AS df_within,
       |       ${sqlR(
             s"(${sqlR(wsumD("term_b"), 6)} / (k - 1)) / " +
             s"(${sqlR(wsumD("term_w"), 6)} / (n_tot - k))", 6)} AS f_stat
       |FROM terms ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------ #206 events_mwu

  /** Bin width for the rank grid (values land in [0, ~500]). */
  val MwuBinWidth = 1.0

  /** #206 events_mwu: Mann–Whitney U rank test between the 'click' and
    * 'purchase' value distributions on a UNIT-WIDTH BIN GRID — the
    * nonparametric location test beside #104 (Welch assumes normal
    * means; MWU ranks survive the heavy right tail event values have)
    * and the hypothesis-test companion of #116's KS distance (KS says
    * how far apart; MWU says whether one stochastically dominates).
    * Values sharing a bin are treated as tied ranks — the binned
    * statistic with the standard tie-corrected normal approximation,
    * the same resolution trade #116 makes. 2·U is assembled from
    * integer bin counts (exact, order-free); only the final
    * mean/variance/z algebra leaves integers.
    *
    * Scale shape: one conditional-count aggregation collapses the
    * corpus to ≤|bins| rows (bounded by the value range, not the
    * corpus); the cumulative-count window runs over that bounded grid
    * only, then one total row. No ranking window ever touches raw
    * events. */
  def eventsMwu(s: SparkSession, dir: String): DataFrame =
    eventsMwuDf(Tables.events(s, dir), "click", "purchase")

  /** DataFrame-generic core: expects (event_type, value). */
  def eventsMwuDf(ev: DataFrame, typeA: String, typeB: String): DataFrame = {
    val bins = ev.filter(col("event_type").isin(typeA, typeB))
      .select(floor(col("value") / MwuBinWidth).cast("long").as("bin"),
              col("event_type"))
      .groupBy(col("bin"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("na"),
           sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("nb"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = bins
      .withColumn("cum_b", coalesce(sum(col("nb")).over(wCum), lit(0L)))
      // 2·U contribution of this bin: each A beats every B below its
      // bin and half-ties every B sharing it — kept doubled so the
      // accumulation stays in exact integers.
      .withColumn("u2_term", col("na") * (lit(2L) * col("cum_b") + col("nb")))
      .withColumn("t", col("na") + col("nb"))
      .withColumn("tie_term", col("t") * (col("t") - 1L) * (col("t") + 1L))
    val agg = withCum.agg(
      sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
      count(lit(1)).as("n_bins"),
      sum(col("u2_term")).as("u2"), sum(col("tie_term")).as("ties"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val nT = (col("n_a") + col("n_b")).cast("double")
    val uA = col("u2") / 2.0
    val varU = nA * nB / 12.0 *
      ((nT + 1.0) - col("ties").cast("double") / (nT * (nT - 1.0)))
    agg
      .withColumn("u_a", uA)
      .withColumn("mu_u", nA * nB / 2.0)
      .withColumn("var_u", r(varU, 6))
      .withColumn("z", r((uA - nA * nB / 2.0) / sqrt(r(varU, 6)), 6))
      .withColumn("auc", r(uA / (nA * nB), 6))
      .select(col("n_a"), col("n_b"), col("n_bins"), col("u_a"), col("mu_u"),
              col("var_u"), col("z"), col("auc"))
  }

  def eventsMwuSql(typeA: String = "click", typeB: String = "purchase"): String =
    s"""WITH bins AS (
       |  SELECT CAST(floor(value / $MwuBinWidth) AS BIGINT) AS bin,
       |         CAST(sum(CASE WHEN event_type = '$typeA' THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |         CAST(sum(CASE WHEN event_type = '$typeB' THEN 1 ELSE 0 END) AS BIGINT) AS nb
       |  FROM events WHERE event_type IN ('$typeA', '$typeB')
       |  GROUP BY 1),
       |c AS (
       |  SELECT na, nb,
       |         coalesce(sum(nb) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_b,
       |         na + nb AS t
       |  FROM bins),
       |a AS (
       |  SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b,
       |         count(*) AS n_bins,
       |         CAST(sum(na * (2 * cum_b + nb)) AS BIGINT) AS u2,
       |         CAST(sum(t * (t - 1) * (t + 1)) AS BIGINT) AS ties
       |  FROM c)
       |SELECT n_a, n_b, n_bins,
       |       u2 / 2.0 AS u_a,
       |       CAST(n_a AS DOUBLE) * n_b / 2.0 AS mu_u,
       |       ${sqlR("CAST(n_a AS DOUBLE) * n_b / 12.0 * ((n_a + n_b + 1.0) - CAST(ties AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0)))", 6)} AS var_u,
       |       ${sqlR("(u2 / 2.0 - CAST(n_a AS DOUBLE) * n_b / 2.0) / sqrt(" +
             sqlR("CAST(n_a AS DOUBLE) * n_b / 12.0 * ((n_a + n_b + 1.0) - CAST(ties AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0)))", 6) + ")", 6)} AS z,
       |       ${sqlR("(u2 / 2.0) / (CAST(n_a AS DOUBLE) * n_b)", 6)} AS auc
       |FROM a""".stripMargin

  // ---------------------------------------------------- #207 ts_ljung_box

  /** Maximum autocorrelation lag the portmanteau test pools. */
  val LbMaxLag = 5

  /** χ²(0.95, df) critical values for df = 1..5. */
  private[graft] val Chi2Crit95 =
    Seq(3.841459, 5.991465, 7.814728, 9.487729, 11.070498)

  /** #207 ts_ljung_box: Ljung–Box portmanteau whiteness test per
    * entity — autocorrelations of the demeaned event-value series at
    * lags 1..[[LbMaxLag]] pooled into Q = n(n+2)·Σ r_k²/(n−k), tested
    * against χ²(df) at 5%. The model-diagnostic completing the
    * serial-structure toolkit: #75 reads single lags, #60/#189 test
    * state sequences; Q asks ONE question — "is there any linear
    * serial structure at all?" — which is the whiteness check run on
    * forecast residuals before trusting #139's backtest or a #143
    * control chart calibrated on iid noise. Lags with n ≤ k contribute
    * nothing and drop from df.
    *
    * Scale shape: per-entity mean by aggregation, rejoined as a
    * broadcast key dim (the #202 pattern); lagged products come from
    * entity-keyed windows (bounded by events-per-entity, one
    * exchange+sort shared by all five lags); decimal-exact sums, r_k
    * 6dp-rounded before the fixed-order Q polynomial. */
  def tsLjungBox(s: SparkSession, dir: String): DataFrame =
    tsLjungBoxDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id, value). */
  def tsLjungBoxDf(ev: DataFrame): DataFrame = {
    val means = ev.groupBy(col("user_id"))
      .agg(davg(col("value"), 6).as("xbar"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dx = ev.join(graft.Hints.keyDim(means), Seq("user_id"))
      .withColumn("dx", col("value") - col("xbar"))
    val lagged = (1 to LbMaxLag).foldLeft(dx) { (df, k) =>
      df.withColumn(s"l$k", lag(col("dx"), k).over(w))
    }
    val aggs = count(lit(1)).as("n") +: dsum(col("dx") * col("dx")).as("denom") +:
      (1 to LbMaxLag).map(k => dsum(col("dx") * col(s"l$k")).as(s"num$k"))
    val perUser = lagged.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    val withR = (1 to LbMaxLag).foldLeft(perUser) { (df, k) =>
      df.withColumn(s"r$k",
        when(col("n") > k && col("denom") > 0,
          r(col(s"num$k") / col("denom"), 6)).otherwise(lit(0.0)))
    }
    val n = col("n").cast("double")
    // fixed-order polynomial: terms appear left-to-right exactly as
    // written in the oracle, so the IEEE sum is bit-identical.
    val qSum = (1 to LbMaxLag).map { k =>
      when(col("n") > k, col(s"r$k") * col(s"r$k") / (n - k)).otherwise(lit(0.0))
    }.reduce(_ + _)
    val dfCol = (1 to LbMaxLag).map { k =>
      when(col("n") > k, 1L).otherwise(0L)
    }.reduce(_ + _)
    val crit = Chi2Crit95.zipWithIndex.foldLeft(lit(Double.MaxValue)) {
      case (acc, (c, i)) => when(col("df") === (i + 1), c).otherwise(acc)
    }
    withR
      .withColumn("q_stat", r(n * (n + 2.0) * qSum, 6))
      .withColumn("df", dfCol)
      .withColumn("reject", when(col("df") > 0, col("q_stat") > crit)
        .otherwise(lit(false)))
      .select(Seq(col("user_id"), col("n")) ++
              (1 to LbMaxLag).map(k => col(s"r$k")) ++
              Seq(col("q_stat"), col("df"), col("reject")): _*)
      .orderBy(col("user_id"))
  }

  val tsLjungBoxSql: String = {
    val lags = (1 to LbMaxLag)
      .map(k => s"lag(dx, $k) OVER w AS l$k").mkString(",\n         ")
    val nums = (1 to LbMaxLag)
      .map(k => s"${sqlSum(s"dx * l$k")} AS num$k").mkString(",\n         ")
    val rs = (1 to LbMaxLag).map { k =>
      s"CASE WHEN n > $k AND denom > 0 THEN ${sqlR(s"num$k / denom", 6)} ELSE 0.0 END AS r$k"
    }.mkString(",\n         ")
    val qSum = (1 to LbMaxLag).map { k =>
      s"(CASE WHEN n > $k THEN r$k * r$k / (CAST(n AS DOUBLE) - $k) ELSE 0.0 END)"
    }.mkString(" + ")
    val dfExpr = (1 to LbMaxLag)
      .map(k => s"(CASE WHEN n > $k THEN 1 ELSE 0 END)").mkString(" + ")
    val crit = Chi2Crit95.zipWithIndex
      .map { case (c, i) => s"WHEN df = ${i + 1} THEN $c" }
      .mkString(" ")
    s"""WITH m AS (
       |  SELECT user_id, ${sqlAvg("value", 6)} AS xbar
       |  FROM events GROUP BY 1),
       |d AS (
       |  SELECT e.user_id, e.ts, e.event_id, e.value - m.xbar AS dx
       |  FROM events e JOIN m USING (user_id)),
       |lagged AS (
       |  SELECT user_id, dx,
       |         $lags
       |  FROM d
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |agg AS (
       |  SELECT user_id, count(*) AS n,
       |         ${sqlSum("dx * dx")} AS denom,
       |         $nums
       |  FROM lagged GROUP BY 1),
       |rk AS (
       |  SELECT user_id, n,
       |         $rs
       |  FROM agg),
       |q AS (
       |  SELECT user_id, n, r1, r2, r3, r4, r5,
       |         ${sqlR(s"CAST(n AS DOUBLE) * (n + 2.0) * ($qSum)", 6)} AS q_stat,
       |         CAST($dfExpr AS BIGINT) AS df
       |  FROM rk)
       |SELECT user_id, n, r1, r2, r3, r4, r5, q_stat, df,
       |       CASE WHEN df > 0 THEN
       |         q_stat > (CASE $crit ELSE 1e308 END)
       |       ELSE false END AS reject
       |FROM q ORDER BY user_id""".stripMargin
  }
}
