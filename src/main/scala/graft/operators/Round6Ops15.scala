package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-32 operators (SURVEY §2 #233-#236): price indices,
  * the declarative data-quality rule engine, seasonal residual
  * anomalies, and heavy-hitter drift.
  */
object Round6Ops15 {

  // ------------------------------------------- #233 lineitem_price_index

  /** #233 lineitem_price_index: the LASPEYRES / PAASCHE / FISHER price
    * indices of the part catalog by ship month — unit prices per
    * (part, month), the first month as base, and for every month the
    * three classic index numbers over the parts present in both
    * baskets: Laspeyres (base-quantity weights — "what would the old
    * basket cost now"), Paasche (current weights), Fisher (their
    * geometric mean, the superlative index). The procurement-inflation
    * readout #180's per-part dispersion can't aggregate to: ONE
    * comparable number per month for "are our input prices drifting",
    * the same statistic national CPIs publish.
    *
    * Scale shape: one (part, month) aggregation collapses the fact
    * table; the base basket is a part-proportional dim
    * ([[graft.Hints.keyDim]]-gated broadcast join); decimal-exact
    * basket sums per month; index algebra on the ≤|months| rollup. */
  def lineitemPriceIndex(s: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"),
               date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(r(dsum(col("l_extendedprice") / col("l_quantity")) / count(lit(1)), 6)
             .as("p"),
           dsum(col("l_quantity")).as("q"))
    val base = pm.crossJoin(broadcast(pm.agg(min(col("m")).as("m0"))))
      .filter(col("m") === col("m0"))
      .select(col("pk"), col("p").as("p0"), col("q").as("q0"))
    val joined = pm.join(graft.Hints.keyDim(base), Seq("pk"))
    joined.groupBy(col("m"))
      .agg(count(lit(1)).as("n_parts"),
           dsum(col("p") * col("q0")).as("l_num"),
           dsum(col("p0") * col("q0")).as("l_den"),
           dsum(col("p") * col("q")).as("p_num"),
           dsum(col("p0") * col("q")).as("p_den"))
      .withColumn("laspeyres", r(col("l_num") / col("l_den"), 6))
      .withColumn("paasche", r(col("p_num") / col("p_den"), 6))
      .withColumn("fisher",
        r(sqrt(col("laspeyres") * col("paasche")), 6))
      .select(col("m").as("month"), col("n_parts"), col("laspeyres"),
              col("paasche"), col("fisher"))
      .orderBy(col("month"))
  }

  val lineitemPriceIndexSql: String =
    s"""WITH pm AS (
       |  SELECT l_partkey AS pk,
       |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
       |         ${sqlR(s"${sqlSum("l_extendedprice / l_quantity")} / count(*)", 6)} AS p,
       |         ${sqlSum("l_quantity")} AS q
       |  FROM lineitem GROUP BY 1, 2),
       |base AS (
       |  SELECT pk, p AS p0, q AS q0 FROM pm
       |  WHERE m = (SELECT min(m) FROM pm)),
       |j AS (SELECT pm.m, pm.p, pm.q, b.p0, b.q0 FROM pm JOIN base b USING (pk)),
       |agg AS (
       |  SELECT m, count(*) AS n_parts,
       |         ${sqlSum("p * q0")} AS l_num, ${sqlSum("p0 * q0")} AS l_den,
       |         ${sqlSum("p * q")} AS p_num, ${sqlSum("p0 * q")} AS p_den
       |  FROM j GROUP BY 1)
       |SELECT m AS month, n_parts,
       |       ${sqlR("l_num / l_den", 6)} AS laspeyres,
       |       ${sqlR("p_num / p_den", 6)} AS paasche,
       |       ${sqlR(s"sqrt((${sqlR("l_num / l_den", 6)}) * (${sqlR("p_num / p_den", 6)}))", 6)} AS fisher
       |FROM agg ORDER BY month""".stripMargin

  // ---------------------------------------------------- #234 dq_rule_check

  /** The declarative rule book: (rule_id, SQL predicate over the
    * lineitem⋈orders row that DEFINES a violation). One literal table
    * drives both engines — adding a rule is one line. */
  private[graft] val Rules: Seq[(String, String)] = Seq(
    "quantity_positive" -> "l_quantity <= 0",
    "discount_domain" -> "l_discount < 0 OR l_discount > 1",
    "tax_domain" -> "l_tax < 0 OR l_tax > 1",
    "price_positive" -> "l_extendedprice <= 0",
    "returnflag_domain" -> "l_returnflag NOT IN ('A', 'N', 'R')",
    "ship_after_order" -> "l_shipdate < o_orderdate")

  /** #234 dq_rule_check: the declarative DATA-QUALITY RULE ENGINE —
    * a literal rule book of violation predicates (domains, sign
    * constraints, and the cross-table "shipped before ordered"
    * temporal sanity check) evaluated over the fact join in ONE pass,
    * one row per rule: checked count, violations, rate, verdict. The
    * third DQ layer: #200/#229 profile what IS, #201 checks keys —
    * this checks STATED INVARIANTS, the contract tests an ingest
    * pipeline publishes. Rules are data (a Seq of predicates), so the
    * book grows without new plan shapes.
    *
    * Scale shape: every row-local rule is a conditional sum in one
    * aggregate over one scan; the temporal rule rides the same
    * key-equi lineitem⋈orders join #204 pays (exchange-free on the
    * #97 bucketed layout); output is |rules| rows. */
  def dqRuleCheck(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"), "left")
    val aggs: Seq[Column] = count(lit(1)).as("n_checked") +:
      Rules.map { case (id, pred) =>
        sum(when(expr(pred), 1L).otherwise(0L)).as(s"v_$id")
      }
    val m = joined.agg(aggs.head, aggs.tail: _*)
    val rows = Rules.map { case (id, pred) =>
      struct(lit(id).as("rule_id"), lit(pred).as("violation_when"),
             col(s"v_$id").as("n_violations"))
    }
    m.select(col("n_checked"), explode(array(rows: _*)).as("p"))
      .select(col("p.rule_id"), col("p.violation_when"), col("n_checked"),
              col("p.n_violations"),
              r(col("p.n_violations") / col("n_checked").cast("double"), 6)
                .as("violation_rate"),
              (col("p.n_violations") === 0).as("pass"))
      .orderBy(col("rule_id"))
  }

  val dqRuleCheckSql: String = {
    val aggs = "count(*) AS n_checked" +: Rules.map { case (id, pred) =>
      s"CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS v_$id"
    }
    val sel = Rules.map { case (id, pred) =>
      val p = pred.replace("'", "''")
      s"""SELECT '$id' AS rule_id, '$p' AS violation_when,
         |       n_checked, v_$id AS n_violations,
         |       ${sqlR(s"v_$id / CAST(n_checked AS DOUBLE)", 6)} AS violation_rate,
         |       v_$id = 0 AS pass
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH j AS (
       |  SELECT l.*, o.o_orderdate
       |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |m AS (SELECT ${aggs.mkString(",\n             ")} FROM j)
       |$sel
       |ORDER BY rule_id""".stripMargin
  }

  // ------------------------------------------------ #235 ts_seasonal_anomaly

  /** #235 ts_seasonal_anomaly: SEASONALLY-ADJUSTED anomaly screen per
    * entity — the #76 day-of-week decomposition's residuals
    * (v − dow-mean) screened at 3 residual-σ. The screen #39/#86 get
    * wrong on seasonal series: a normal Saturday peak trips a flat
    * z-test, and a broken Saturday hides inside the pooled variance —
    * deseasonalizing first is why ops monitors decompose before
    * alerting. Per entity: n, residual σ, anomaly count + share and
    * the worst residual.
    *
    * Scale shape: #76's two-aggregate shape (dow means → broadcast
    * key dim → residuals) plus one conditional rollup; everything
    * keyed on the entity, decimal-exact moments, no windows over raw
    * events. */
  def tsSeasonalAnomaly(s: SparkSession, dir: String): DataFrame =
    tsSeasonalAnomalyDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, value). */
  def tsSeasonalAnomalyDf(evIn: DataFrame): DataFrame = {
    val ev = evIn.select(col("user_id"), dayofweek(col("ts")).as("dow"),
                         col("value").as("v"))
    val seas = ev.groupBy(col("user_id"), col("dow"))
      .agg(davg(col("v"), 6).as("seas"))
    val resid = ev.join(graft.Hints.keyDim(seas), Seq("user_id", "dow"))
      .withColumn("resid", col("v") - col("seas"))
    val m = resid.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
           dsum(col("resid")).as("sr"),
           dsum(col("resid") * col("resid")).as("srr"))
      .withColumn("sd_resid",
        r(sqrt(greatest(lit(0.0),
          col("srr") / col("n") - (col("sr") / col("n")) * (col("sr") / col("n")))), 6))
    resid.join(graft.Hints.keyDim(m.select(col("user_id"), col("sd_resid"))),
               Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("sd_resid") > 0 &&
                    abs(col("resid")) > lit(3.0) * col("sd_resid"), 1L)
                 .otherwise(0L)).as("n_anomalies"),
           first(col("sd_resid")).as("sd_resid"),
           r(max(abs(col("resid"))), 6).as("max_abs_resid"))
      .withColumn("anomaly_share",
        r(col("n_anomalies") / col("n").cast("double"), 6))
      .select(col("user_id"), col("n"), col("sd_resid"), col("n_anomalies"),
              col("anomaly_share"), col("max_abs_resid"))
      .orderBy(col("user_id"))
  }

  val tsSeasonalAnomalySql: String = {
    val sd = "sqrt(greatest(0.0, srr / n - (sr / n) * (sr / n)))"
    s"""WITH ev AS (
       |  SELECT user_id, dayofweek(ts) + 1 AS dow, value AS v FROM events),
       |seas AS (
       |  SELECT user_id, dow, ${sqlAvg("v", 6)} AS seas
       |  FROM ev GROUP BY 1, 2),
       |resid AS (
       |  SELECT e.user_id, e.v - s.seas AS resid
       |  FROM ev e JOIN seas s ON s.user_id = e.user_id AND s.dow = e.dow),
       |m AS (
       |  SELECT user_id, count(*) AS n,
       |         ${sqlSum("resid")} AS sr, ${sqlSum("resid * resid")} AS srr
       |  FROM resid GROUP BY 1),
       |sds AS (SELECT user_id, ${sqlR(sd, 6)} AS sd_resid FROM m)
       |SELECT r.user_id, count(*) AS n, first(s.sd_resid) AS sd_resid,
       |       CAST(sum(CASE WHEN s.sd_resid > 0
       |                     AND abs(r.resid) > 3.0 * s.sd_resid
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       |       ${sqlR("CAST(sum(CASE WHEN s.sd_resid > 0 AND abs(r.resid) > 3.0 * s.sd_resid THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)}
       |         AS anomaly_share,
       |       ${sqlR("max(abs(r.resid))", 6)} AS max_abs_resid
       |FROM resid r JOIN sds s USING (user_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------- #236 events_topk_drift

  /** Heavy-hitter list size the drift compares. */
  val DriftK = 20

  /** #236 events_topk_drift: HEAVY-HITTER TURNOVER between the two
    * halves of the time range (the #229 midpoint split) — each half's
    * top-[[DriftK]] users by event count, full-outer joined: who
    * stayed, entered, dropped, and how far ranks moved, plus the
    * Jaccard overlap of the two lists on every row. The hot-key churn
    * monitor #58's salting decision needs: salting is keyed to
    * YESTERDAY's heavy hitters, and this table says how fast that
    * list rots (#44 finds the hitters; this tracks their half-life).
    *
    * Scale shape: one conditional-count aggregation per (user, half);
    * each half's top-k comes from sort+limit (TakeOrdered bounded
    * heaps — never a ranking window over users); rank/join/Jaccard
    * algebra runs on the ≤2k-row lists. */
  def eventsTopkDrift(s: SparkSession, dir: String): DataFrame =
    eventsTopkDriftDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts). */
  def eventsTopkDriftDf(ev: DataFrame): DataFrame = {
    val dated = ev.withColumn("d", to_date(col("ts")))
    val bounds = dated.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
      .select(date_add(col("dmin"),
        (datediff(col("dmax"), col("dmin")) / 2).cast("int")).as("mid"))
    val counts = dated.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(sum(when(col("d") <= col("mid"), 1L).otherwise(0L)).as("c1"),
           sum(when(col("d") > col("mid"), 1L).otherwise(0L)).as("c2"))
    def top(c: String): DataFrame = {
      val lim = counts.filter(col(c) > 0)
        .orderBy(col(c).desc, col("user_id")).limit(DriftK)
        .select(col("user_id"), col(c))
      lim.withColumn(s"rank_${c.last}",
        row_number().over(Window.orderBy(col(c).desc, col("user_id")))
          .cast("long"))
    }
    val j = top("c1").join(top("c2"), Seq("user_id"), "full_outer")
    val nCommon = sum(when(col("rank_1").isNotNull && col("rank_2").isNotNull,
                           1L).otherwise(0L))
    val wAll = Window.partitionBy()
    j.withColumn("status",
        when(col("rank_1").isNotNull && col("rank_2").isNotNull, "stayed")
          .when(col("rank_1").isNotNull, "dropped")
          .otherwise("entered"))
      .withColumn("rank_shift",
        when(col("status") === "stayed", col("rank_2") - col("rank_1")))
      .withColumn("n_common", nCommon.over(wAll))
      .withColumn("jaccard",
        r(col("n_common") / count(lit(1)).over(wAll).cast("double"), 6))
      .select(col("user_id"), col("c1"), col("rank_1"), col("c2"),
              col("rank_2"), col("status"), col("rank_shift"),
              col("jaccard"))
      .orderBy(col("user_id"))
  }

  val eventsTopkDriftSql: String =
    s"""WITH dated AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
       |mid AS (
       |  SELECT min(d) + CAST(datediff('day', min(d), max(d)) // 2 AS INT) AS mid
       |  FROM dated),
       |counts AS (
       |  SELECT user_id,
       |         CAST(sum(CASE WHEN d <= mid.mid THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |         CAST(sum(CASE WHEN d > mid.mid THEN 1 ELSE 0 END) AS BIGINT) AS c2
       |  FROM dated CROSS JOIN mid GROUP BY 1),
       |t1 AS (
       |  SELECT user_id, c1, CAST(row_number() OVER (ORDER BY c1 DESC, user_id)
       |           AS BIGINT) AS rank_1
       |  FROM counts WHERE c1 > 0
       |  ORDER BY c1 DESC, user_id LIMIT $DriftK),
       |t2 AS (
       |  SELECT user_id, c2, CAST(row_number() OVER (ORDER BY c2 DESC, user_id)
       |           AS BIGINT) AS rank_2
       |  FROM counts WHERE c2 > 0
       |  ORDER BY c2 DESC, user_id LIMIT $DriftK),
       |j AS (
       |  SELECT coalesce(t1.user_id, t2.user_id) AS user_id,
       |         t1.c1, t1.rank_1, t2.c2, t2.rank_2
       |  FROM t1 FULL OUTER JOIN t2 ON t1.user_id = t2.user_id),
       |f AS (
       |  SELECT *,
       |         CASE WHEN rank_1 IS NOT NULL AND rank_2 IS NOT NULL THEN 'stayed'
       |              WHEN rank_1 IS NOT NULL THEN 'dropped'
       |              ELSE 'entered' END AS status,
       |         CAST(sum(CASE WHEN rank_1 IS NOT NULL AND rank_2 IS NOT NULL
       |                  THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n_common,
       |         count(*) OVER () AS n_all
       |  FROM j)
       |SELECT user_id, c1, rank_1, c2, rank_2, status,
       |       CASE WHEN status = 'stayed' THEN rank_2 - rank_1 END AS rank_shift,
       |       ${sqlR("n_common / CAST(n_all AS DOUBLE)", 6)} AS jaccard
       |FROM f ORDER BY user_id""".stripMargin
}
