package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-33 operators (SURVEY §2 #237, #239, #241): the Hill
  * tail-index estimator, the event-feed rule registers (streamed as
  * #240), and the hour×weekday load heatmap. (#238 stream_doc_quality
  * and #240 stream_rule_check live in [[graft.streaming.Streaming]].)
  */
object Round6Ops16 {

  // ---------------------------------------------- #237 revenue_tail_hill

  /** Top order statistics the Hill estimator pools. */
  val HillK = 100

  /** #237 revenue_tail_hill: the HILL ESTIMATOR of the order-value tail
    * index — over the top [[HillK]]+1 order totals, α̂ = k / Σ ln(X_(i)
    * / X_(k+1)): the maximum-likelihood tail exponent of a Pareto-like
    * upper tail. THE number that prices every heavy-tail decision this
    * library's monitors assume: α ≤ 2 means infinite variance (the
    * #104/#205 moment tests are off the table), #105's "top decile
    * carries X%" extrapolates with α, and a drifting α̂ is an early
    * fraud/pricing-mix signal. Reported with the implied
    * P(X > 2·threshold) survival ratio 2^(−α̂).
    *
    * Scale shape: the top k+1 order statistics come from sort+limit
    * (TakeOrdered bounded heaps — never a full sort); the threshold is
    * a broadcast scalar; the log-excess sum is decimal-exact over the
    * k-row list (ln 6dp-rounded per the Parity contract). */
  def revenueTailHill(s: SparkSession, dir: String): DataFrame =
    revenueTailHillDf(Tables.orders(s, dir))

  /** DataFrame-generic core: expects (o_orderkey, o_totalprice). */
  def revenueTailHillDf(orders: DataFrame, k: Int = HillK): DataFrame = {
    val top = orders
      .select(col("o_totalprice").as("x"), col("o_orderkey"))
      .orderBy(col("x").desc, col("o_orderkey")).limit(k + 1)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("x").desc, col("o_orderkey"))))
    val thr = top.filter(col("rnk") === k + 1)
      .select(col("x").as("thr"))
    top.filter(col("rnk") <= k)
      .crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("k"),
           first(col("thr")).as("threshold"),
           dsum(r(log(col("x") / col("thr")), 6)).as("log_excess"))
      .withColumn("alpha", r(col("k") / col("log_excess"), 6))
      .withColumn("mean_log_excess", r(col("log_excess") / col("k"), 6))
      .withColumn("p_double",
        r(pow(lit(2.0), -r(col("k") / col("log_excess"), 6)), 6))
      .select(col("k"), col("threshold"), col("alpha"),
              col("mean_log_excess"), col("p_double"))
  }

  def revenueTailHillSql(k: Int = HillK): String =
    s"""WITH top AS (
       |  SELECT o_totalprice AS x,
       |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
       |           AS rnk
       |  FROM orders
       |  ORDER BY o_totalprice DESC, o_orderkey LIMIT ${k + 1}),
       |thr AS (SELECT x AS thr FROM top WHERE rnk = ${k + 1}),
       |agg AS (
       |  SELECT count(*) AS k, first(thr.thr) AS threshold,
       |         ${sqlSum(sqlR("ln(top.x / thr.thr)", 6))} AS log_excess
       |  FROM top CROSS JOIN thr WHERE top.rnk <= $k)
       |SELECT k, threshold,
       |       ${sqlR("k / log_excess", 6)} AS alpha,
       |       ${sqlR("log_excess / k", 6)} AS mean_log_excess,
       |       ${sqlR(s"pow(2.0, -(${sqlR("k / log_excess", 6)}))", 6)} AS p_double
       |FROM agg""".stripMargin

  // ------------------------------------------------- #239 dq_event_rules

  /** The event-feed rule book: (rule_id, violation predicate). */
  private[graft] val EventRules: Seq[(String, String)] = Seq(
    "value_nonneg" -> "value < 0",
    "type_domain" ->
      "event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error')",
    "user_nonneg" -> "user_id < 0",
    "ts_present" -> "ts IS NULL")

  /** The mergeable rule registers: one global row of conditional sums —
    * each counter merges by addition, so the SAME aggregate is the
    * streaming state in [[graft.streaming.Streaming.streamRuleCheck]]. */
  def eventRuleRegisters(ev: DataFrame): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_checked") +:
      EventRules.map { case (id, pred) =>
        sum(when(expr(pred), 1L).otherwise(0L)).as(s"v_$id")
      }
    ev.agg(aggs.head, aggs.tail: _*)
  }

  /** Long-format readout of the 1-row register table. */
  def eventRuleFinalize(m: DataFrame): DataFrame = {
    val rows = EventRules.map { case (id, pred) =>
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

  /** #239 dq_event_rules: #234's declarative rule engine pointed at the
    * EVENT feed — sign/domain/presence contracts on the stream's
    * schema, evaluated as one global register row of conditional sums.
    * The event rules are deliberately row-local (no joins): that is
    * what makes the register mergeable and therefore STREAMABLE
    * (#240) — the contract tests that run continuously at the ingest
    * edge, where #234's join rules run at rest.
    *
    * Scale shape: one scan, one 1-row aggregate, |rules| output rows. */
  def dqEventRules(s: SparkSession, dir: String): DataFrame =
    eventRuleFinalize(eventRuleRegisters(Tables.events(s, dir)))

  val dqEventRulesSql: String = {
    val aggs = "count(*) AS n_checked" +: EventRules.map { case (id, pred) =>
      s"CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS v_$id"
    }
    val sel = EventRules.map { case (id, pred) =>
      val p = pred.replace("'", "''")
      s"""SELECT '$id' AS rule_id, '$p' AS violation_when,
         |       n_checked, v_$id AS n_violations,
         |       ${sqlR(s"v_$id / CAST(n_checked AS DOUBLE)", 6)} AS violation_rate,
         |       v_$id = 0 AS pass
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (SELECT ${aggs.mkString(",\n              ")} FROM events)
       |$sel
       |ORDER BY rule_id""".stripMargin
  }

  // --------------------------------------------- #241 events_load_heatmap

  /** #241 events_load_heatmap: the hour×weekday LOAD MATRIX — event
    * counts per (dow, hour) cell with the three shares capacity
    * planning reads (of corpus, within the weekday, cell rank) and a
    * top-decile peak flag. The ops-facing readout BEHIND #166's
    * independence test: #166 says "hour and weekday interact", this
    * says WHERE — which 17 of the 168 cells need the autoscaler
    * headroom, when to schedule the #103 backfills, and what "normal"
    * looks like for #220's day-grain monitor to subdivide.
    *
    * Scale shape: one (dow, hour) aggregation collapses the corpus to
    * ≤168 rows; shares and ranks are windows over that fixed grid. */
  def eventsLoadHeatmap(s: SparkSession, dir: String): DataFrame =
    eventsLoadHeatmapDf(Tables.events(s, dir))

  /** The mergeable (dow, hour) count registers — count merges, so the
    * SAME aggregate is the streaming state in
    * [[graft.streaming.Streaming.streamLoadHeatmap]]. */
  def loadCells(ev: DataFrame): DataFrame =
    ev.groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))

  /** DataFrame-generic core: expects (ts). */
  def eventsLoadHeatmapDf(ev: DataFrame): DataFrame =
    loadHeatmapFinalize(loadCells(ev))

  /** Shares/rank readout over the ≤168-cell register table. */
  def loadHeatmapFinalize(g: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val wDow = Window.partitionBy(col("dow"))
    val wRank = Window.orderBy(col("n").desc, col("dow"), col("hod"))
    g.withColumn("corpus_share",
        r(col("n") / sum(col("n")).over(wAll).cast("double"), 6))
      .withColumn("dow_share",
        r(col("n") / sum(col("n")).over(wDow).cast("double"), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("n_cells", count(lit(1)).over(wAll))
      .withColumn("is_peak", col("rank") * 10 <= col("n_cells"))
      .drop("n_cells")
      .orderBy(col("dow"), col("hod"))
  }

  val eventsLoadHeatmapSql: String =
    s"""WITH g AS (
       |  SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod, count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT dow, hod, n,
       |       ${sqlR("n / CAST(sum(n) OVER () AS DOUBLE)", 6)} AS corpus_share,
       |       ${sqlR("n / CAST(sum(n) OVER (PARTITION BY dow) AS DOUBLE)", 6)}
       |         AS dow_share,
       |       CAST(row_number() OVER (ORDER BY n DESC, dow, hod) AS BIGINT)
       |         AS rank,
       |       row_number() OVER (ORDER BY n DESC, dow, hod) * 10
       |         <= count(*) OVER () AS is_peak
       |FROM g ORDER BY dow, hod""".stripMargin
}
