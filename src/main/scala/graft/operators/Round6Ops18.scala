package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-35 operators (SURVEY §2 #247-#249): the revenue
  * growth bridge, external cluster validation by NMI, and the exact
  * vector-duplicate audit. (#246 stream_load_heatmap lives in
  * [[graft.streaming.Streaming]] and drains #241's cell registers.)
  */
object Round6Ops18 {

  // -------------------------------------------- #247 orders_revenue_bridge

  /** #247 orders_revenue_bridge: the month-over-month REVENUE BRIDGE —
    * each month's gross revenue change decomposed over the part
    * catalog into the three effects a business review walks: volume
    * (Δq at last month's price), price (this month's volume at Δp),
    * and mix (parts entering/leaving the assortment — the residual
    * that closes the bridge exactly). #65 reports THAT revenue moved;
    * the bridge says WHY — a flat top line hiding price hikes that
    * offset volume decay is exactly what this table exposes, and #233
    * prices the same drift as an index while this allocates dollars.
    *
    * Scale shape: one (part, month) aggregation; consecutive months
    * join per part (key-equi on part + month arithmetic); decimal-
    * exact effect sums per month; the bridge identity is algebra on
    * the ≤|months| rollup. */
  def ordersRevenueBridge(s: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"),
               date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(dsum(col("l_quantity")).as("q"),
           dsum(col("l_extendedprice")).as("rev"))
      .withColumn("p", r(col("rev") / col("q"), 6))
    val months = pm.groupBy(col("m"))
      .agg(r(dsum(col("rev")), 2).as("rev_total"))
    val matched = pm.as("c").join(
        pm.select(col("pk"), add_months(col("m"), 1).as("m"),
                  col("q").as("q_prev"), col("p").as("p_prev")).as("pv"),
        Seq("pk", "m"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_matched"),
           r(dsum(r((col("q") - col("q_prev")) * col("p_prev"), 6)), 2)
             .as("qty_effect"),
           r(dsum(r(col("q") * (col("p") - col("p_prev")), 6)), 2)
             .as("price_effect"))
    months.as("cur").join(
        months.select(add_months(col("m"), 1).as("m"),
                      col("rev_total").as("rev_prev")).as("prv"),
        Seq("m"))
      .join(matched, Seq("m"), "left")
      .withColumn("delta", r(col("rev_total") - col("rev_prev"), 2))
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .withColumn("qty_effect", coalesce(col("qty_effect"), lit(0.0)))
      .withColumn("price_effect", coalesce(col("price_effect"), lit(0.0)))
      .withColumn("mix_effect",
        r(col("delta") - col("qty_effect") - col("price_effect"), 2))
      .select(col("m").as("month"), col("rev_total"), col("rev_prev"),
              col("delta"), col("n_matched"), col("qty_effect"),
              col("price_effect"), col("mix_effect"))
      .orderBy(col("month"))
  }

  val ordersRevenueBridgeSql: String =
    s"""WITH pm AS (
       |  SELECT l_partkey AS pk,
       |         CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
       |         ${sqlSum("l_quantity")} AS q,
       |         ${sqlSum("l_extendedprice")} AS rev
       |  FROM lineitem GROUP BY 1, 2),
       |pmp AS (SELECT pk, m, q, rev, ${sqlR("rev / q", 6)} AS p FROM pm),
       |months AS (
       |  SELECT m, ${sqlR(sqlSum("rev"), 2)} AS rev_total
       |  FROM pmp GROUP BY 1),
       |matched AS (
       |  SELECT c.m, count(*) AS n_matched,
       |         ${sqlR(sqlSum(sqlR("(c.q - pv.q) * pv.p", 6)), 2)} AS qty_effect,
       |         ${sqlR(sqlSum(sqlR("c.q * (c.p - pv.p)", 6)), 2)} AS price_effect
       |  FROM pmp c JOIN pmp pv
       |    ON pv.pk = c.pk AND pv.m + INTERVAL 1 MONTH = c.m
       |  GROUP BY 1)
       |SELECT cur.m AS month, cur.rev_total, prv.rev_total AS rev_prev,
       |       ${sqlR("cur.rev_total - prv.rev_total", 2)} AS delta,
       |       coalesce(ma.n_matched, 0) AS n_matched,
       |       coalesce(ma.qty_effect, 0.0) AS qty_effect,
       |       coalesce(ma.price_effect, 0.0) AS price_effect,
       |       ${sqlR(s"(${sqlR("cur.rev_total - prv.rev_total", 2)}) - coalesce(ma.qty_effect, 0.0) - coalesce(ma.price_effect, 0.0)", 2)}
       |         AS mix_effect
       |FROM months cur
       |JOIN months prv ON prv.m + INTERVAL 1 MONTH = cur.m
       |LEFT JOIN matched ma ON ma.m = cur.m
       |ORDER BY month""".stripMargin

  // -------------------------------------------------- #248 emb_cluster_nmi

  /** IVF geometry shared with #31b. */
  val NmiCells = 16
  val NmiIters = 3

  /** #248 emb_cluster_nmi: EXTERNAL cluster validation — the #31b IVF
    * assignment cross-tabulated against the ground-truth labels,
    * scored by Normalized Mutual Information I(C;L)/√(H(C)·H(L)).
    * The third leg of the cluster-trust tripod: #133 measures
    * geometric separation (internal), #198 measures bootstrap
    * stability (reproducibility) — NMI measures AGREEMENT WITH TRUTH,
    * the number that says whether the cells the SemDeDup family
    * (#31f/#31i) blocks on actually track the semantic classes.
    * Emitted per (cluster, label) cell with the corpus NMI/H columns
    * on every row.
    *
    * Scale shape: model-sized k-means (#31b's contract), map-only
    * assignment, one contingency aggregation to ≤ cells×labels rows;
    * entropies and MI are decimal window-sums over that model table
    * with r6-before-ln discipline. */
  def embClusterNmi(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensure(s)
    val corpus = Similarity.pinnedEmbeddings(s, dir)
    val centroids = Similarity.centroidsCached(s, (dir, "full"))(corpus, NmiCells, NmiIters)
    val assigned = Similarity.assignNearest(corpus, centroids)
      .select(col("vec_id"), col("cluster"), col("label"))
    embClusterNmiOf(assigned)
  }

  /** NMI over an assignment frame (cluster, label). */
  private[graft] def embClusterNmiOf(assigned: DataFrame): DataFrame = {
    val cell = assigned.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n_cl"))
    val wAll = Window.partitionBy()
    val wC = Window.partitionBy(col("cluster"))
    val wL = Window.partitionBy(col("label"))
    def wsumD(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,10)")).over(wAll).cast("double")
    val withM = cell
      .withColumn("n", sum(col("n_cl")).over(wAll))
      .withColumn("n_c", sum(col("n_cl")).over(wC))
      .withColumn("n_l", sum(col("n_cl")).over(wL))
    val p = col("n_cl") / col("n").cast("double")
    val miTerm = r(p * r(log(col("n").cast("double") * col("n_cl") /
      (col("n_c").cast("double") * col("n_l"))), 6), 6)
    // entropy as a cell sum: cells of one cluster contribute shares
    // summing to n_c/n, so the window-sum telescopes to −Σ p·ln p exactly
    val hcTerm =
      r(-(col("n_cl") / col("n")) *
        r(log(col("n_c") / col("n").cast("double")), 6), 6)
    val hlTerm =
      r(-(col("n_cl") / col("n")) *
        r(log(col("n_l") / col("n").cast("double")), 6), 6)
    withM
      .withColumn("mi_term", miTerm)
      .withColumn("hc_term", hcTerm)
      .withColumn("hl_term", hlTerm)
      .withColumn("mi", r(wsumD(col("mi_term")), 6))
      .withColumn("h_c", r(wsumD(col("hc_term")), 6))
      .withColumn("h_l", r(wsumD(col("hl_term")), 6))
      .withColumn("nmi",
        when(col("h_c") > 0 && col("h_l") > 0,
          r(col("mi") / sqrt(col("h_c") * col("h_l")), 6))
          .otherwise(lit(0.0)))
      .select(col("cluster"), col("label"), col("n_cl"), col("mi"),
              col("h_c"), col("h_l"), col("nmi"))
      .orderBy(col("cluster"), col("label"))
  }

  def embClusterNmiSql(nCells: Int = NmiCells, iters: Int = NmiIters): String =
    Similarity.ivfChainSql(nCells, iters) +
    s""",
       |cell AS (
       |  SELECT b.cl AS cluster, e.label, count(*) AS n_cl
       |  FROM bucketed b JOIN embeddings e USING (vec_id)
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT cluster, label, n_cl,
       |         CAST(sum(n_cl) OVER () AS BIGINT) AS n,
       |         CAST(sum(n_cl) OVER (PARTITION BY cluster) AS BIGINT) AS n_c,
       |         CAST(sum(n_cl) OVER (PARTITION BY label) AS BIGINT) AS n_l
       |  FROM cell),
       |t AS (
       |  SELECT cluster, label, n_cl,
       |         ${sqlR(s"(n_cl / CAST(n AS DOUBLE)) * (${sqlR("ln(CAST(n AS DOUBLE) * n_cl / (CAST(n_c AS DOUBLE) * n_l))", 6)})", 6)} AS mi_term,
       |         ${sqlR(s"-(n_cl / CAST(n AS DOUBLE)) * (${sqlR("ln(n_c / CAST(n AS DOUBLE))", 6)})", 6)} AS hc_term,
       |         ${sqlR(s"-(n_cl / CAST(n AS DOUBLE)) * (${sqlR("ln(n_l / CAST(n AS DOUBLE))", 6)})", 6)} AS hl_term
       |  FROM m),
       |f AS (
       |  SELECT cluster, label, n_cl,
       |         ${sqlR("CAST(sum(CAST(mi_term AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS mi,
       |         ${sqlR("CAST(sum(CAST(hc_term AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS h_c,
       |         ${sqlR("CAST(sum(CAST(hl_term AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS h_l
       |  FROM t)
       |SELECT cluster, label, n_cl, mi, h_c, h_l,
       |       CASE WHEN h_c > 0 AND h_l > 0
       |         THEN ${sqlR("mi / sqrt(h_c * h_l)", 6)}
       |         ELSE 0.0 END AS nmi
       |FROM f ORDER BY cluster, label""".stripMargin

  // -------------------------------------------------- #249 dq_vector_dupes

  /** #249 dq_vector_dupes: EXACT duplicate vectors — embeddings
    * grouped on the full float array (bitwise equality, no hashing,
    * no tolerance): distinct-vector count, duplicate groups, extra
    * rows, inflation rate, and the largest group's size. The re-embed
    * bug audit: a stuck encoder emitting one vector for many inputs,
    * a double-ingested shard, or a default-vector fallback all
    * produce EXACT copies (#32's cosine dedup hunts near-copies and
    * would drown these in candidates); exact vector dupes also break
    * #30's kNN ties and #31f's keep-first semantics silently.
    *
    * Scale shape: one groupBy on the array value (hash-aggregated like
    * any composite key), one 1-row rollup — no pair space, no joins. */
  def dqVectorDupes(s: SparkSession, dir: String): DataFrame =
    dqVectorDupesDf(Tables.embeddings(s, dir))

  /** DataFrame-generic core: expects (vec_id, embedding). */
  def dqVectorDupesDf(emb: DataFrame): DataFrame = {
    val g = emb.groupBy(col("embedding")).agg(count(lit(1)).as("c"))
    g.agg(sum(col("c")).as("n_vecs"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dupe_groups"),
          sum(when(col("c") > 1, col("c") - 1).otherwise(0L)).as("n_extra"),
          max(col("c")).as("max_group"))
      .withColumn("dupe_rate",
        r(col("n_extra") / col("n_vecs").cast("double"), 6))
  }

  val dqVectorDupesSql: String =
    s"""WITH g AS (
       |  SELECT embedding, count(*) AS c FROM embeddings GROUP BY 1)
       |SELECT CAST(sum(c) AS BIGINT) AS n_vecs,
       |       count(*) AS n_distinct,
       |       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dupe_groups,
       |       CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
       |         AS n_extra,
       |       CAST(max(c) AS BIGINT) AS max_group,
       |       ${sqlR("sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) / CAST(sum(c) AS DOUBLE)", 6)}
       |         AS dupe_rate
       |FROM g""".stripMargin
}
