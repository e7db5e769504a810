package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-43 operators (SURVEY §2 #270-#271): cross-method
  * dedup agreement and the intraclass correlation of event values.
  */
object Round6Ops26 {

  // -------------------------------------------- #270 dedup_method_agreement

  /** #270 dedup_method_agreement: do the TEXT and EMBEDDING near-dup
    * methods agree? The #27 MinHash pair set and the #32 cosine pair
    * set intersected on (id_a, id_b): pair counts per method, the
    * overlap, and the Jaccard agreement. The methodology audit a
    * dedup rollout needs: high agreement means either method suffices
    * (run the cheaper); low agreement means they see DIFFERENT
    * duplicate classes (verbatim vs paraphrase) and the #128 funnel
    * genuinely needs both stages — the number that justifies the
    * pipeline's cost.
    *
    * Scale shape: both pair sets come from their own bucketed
    * operators (never all-pairs); the agreement is one full-outer join
    * on the id pair + a 1-row rollup. */
  def dedupMethodAgreement(s: SparkSession, dir: String): DataFrame = {
    val mh = LshDedup.dedupMinhash(s, dir)
      .select(col("id_a"), col("id_b")).withColumn("mh", lit(1))
    val co = Similarity.embDedupCosine(s, dir)
      .select(col("id_a"), col("id_b")).withColumn("co", lit(1))
    mh.join(co, Seq("id_a", "id_b"), "full_outer")
      .agg(sum(coalesce(col("mh"), lit(0))).cast("long").as("n_minhash"),
           sum(coalesce(col("co"), lit(0))).cast("long").as("n_cosine"),
           sum(when(col("mh").isNotNull && col("co").isNotNull, 1L)
                 .otherwise(0L)).as("n_both"),
           count(lit(1)).as("n_union"))
      .withColumn("agreement",
        when(col("n_union") > 0,
          r(col("n_both") / col("n_union").cast("double"), 6))
          .otherwise(lit(0.0)))
      .select(col("n_minhash"), col("n_cosine"), col("n_both"),
              col("n_union"), col("agreement"))
  }

  val dedupMethodAgreementSql: String =
    s"""WITH mh AS (
       |  SELECT id_a, id_b FROM (${LshDedup.dedupMinhashSql()})),
       |co AS (
       |  SELECT id_a, id_b FROM (${Similarity.embDedupCosineSql()})),
       |j AS (
       |  SELECT coalesce(mh.id_a, co.id_a) AS id_a,
       |         mh.id_a IS NOT NULL AS in_mh,
       |         co.id_a IS NOT NULL AS in_co
       |  FROM mh FULL OUTER JOIN co
       |    ON mh.id_a = co.id_a AND mh.id_b = co.id_b)
       |SELECT CAST(sum(CASE WHEN in_mh THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_minhash,
       |       CAST(sum(CASE WHEN in_co THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_cosine,
       |       CAST(sum(CASE WHEN in_mh AND in_co THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_both,
       |       count(*) AS n_union,
       |       CASE WHEN count(*) > 0
       |         THEN ${sqlR("sum(CASE WHEN in_mh AND in_co THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         ELSE 0.0 END AS agreement
       |FROM j""".stripMargin

  // ------------------------------------------------------- #271 events_icc

  /** #271 events_icc: the INTRACLASS CORRELATION of event values —
    * one-way random-effects ICC(1): how much of the value variance is
    * BETWEEN users vs within them, with the unequal-group-size
    * correction n₀ = (N − Σnᵢ²/N)/(k−1). THE screening statistic for
    * the #267 feature store: ICC ≈ 0 means user identity carries no
    * value signal (per-user features are noise), high ICC means
    * user-level modeling pays; it is also the design effect behind
    * clustered A/B tests (#137 randomizes users — the effective sample
    * size shrinks by 1 + (m̄−1)·ICC).
    *
    * Scale shape: one per-user decimal moment pass (key-proportional
    * rollup), then ONE second-level aggregation of 6dp-rounded
    * per-user terms to a single row — the #205 decomposition pushed
    * down a level. */
  def eventsIcc(s: SparkSession, dir: String): DataFrame =
    eventsIccDf(Tables.events(s, dir))

  /** The mergeable per-user moment registers (count + decimal sums) —
    * key-proportional state, the streaming form in
    * [[graft.streaming.Streaming.streamIcc]]. */
  def iccRegisters(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("s"),
           dsum(col("value") * col("value")).as("ss"))

  /** DataFrame-generic core: expects (user_id, value). */
  def eventsIccDf(ev: DataFrame): DataFrame =
    iccFinalize(iccRegisters(ev))

  /** The 1-row second-level decomposition over the register table. */
  def iccFinalize(g: DataFrame): DataFrame = {
    // SSB via the moment identity Σ sᵢ²/nᵢ − (Σs)²/N — no grand-mean
    // join-back, ONE second-level aggregate
    val m = g.agg(
      count(lit(1)).as("k"),
      sum(col("n")).as("n_tot"),
      dsum(col("s")).as("s_tot"),
      sum(col("n") * col("n")).as("nn"),
      dsum(r(col("ss") - col("s") * col("s") / col("n"), 6)).as("ssw"),
      dsum(r(col("s") * col("s") / col("n"), 6)).as("s2n"))
    // k = 1 or all-singleton groups have no between/within split: the
    // stats guard to NULL instead of ANSI division errors (the #137
    // degenerate-cell discipline) — counts still report
    val valid = col("k") > 1 && col("n_tot") > col("k")
    m.withColumn("ssb", r(col("s2n") - col("s_tot") * col("s_tot") /
        col("n_tot"), 6))
      .withColumn("n0",
        when(valid,
          r((col("n_tot") - col("nn") / col("n_tot").cast("double")) /
            (col("k") - 1).cast("double"), 6)))
      .withColumn("msb", when(valid, r(col("ssb") / (col("k") - 1), 6)))
      .withColumn("msw",
        when(valid, r(col("ssw") / (col("n_tot") - col("k")), 6)))
      .withColumn("icc",
        when(valid,
          r((col("msb") - col("msw")) /
            (col("msb") + (col("n0") - 1) * col("msw")), 6)))
      .select(col("k").as("n_users"), col("n_tot").as("n_events"),
              col("n0"), col("msb"), col("msw"), col("icc"))
  }

  val eventsIccSql: String =
    s"""WITH g AS (
       |  SELECT user_id, count(*) AS n,
       |         ${sqlSum("value")} AS s, ${sqlSum("value * value")} AS ss
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_tot,
       |         ${sqlSum("s")} AS s_tot,
       |         CAST(sum(n * n) AS BIGINT) AS nn,
       |         ${sqlSum(sqlR("ss - s * s / n", 6))} AS ssw,
       |         ${sqlSum(sqlR("s * s / n", 6))} AS s2n
       |  FROM g),
       |f AS (
       |  SELECT k, n_tot, nn, ssw,
       |         ${sqlR("s2n - s_tot * s_tot / n_tot", 6)} AS ssb,
       |         CASE WHEN k > 1 AND n_tot > k THEN
       |           ${sqlR("(n_tot - nn / CAST(n_tot AS DOUBLE)) / CAST(k - 1 AS DOUBLE)", 6)}
       |         END AS n0
       |  FROM m)
       |SELECT k AS n_users, n_tot AS n_events, n0,
       |       CASE WHEN k > 1 AND n_tot > k
       |         THEN ${sqlR("ssb / (k - 1)", 6)} END AS msb,
       |       CASE WHEN k > 1 AND n_tot > k
       |         THEN ${sqlR("ssw / (n_tot - k)", 6)} END AS msw,
       |       CASE WHEN k > 1 AND n_tot > k THEN
       |         ${sqlR(
         s"((${sqlR("ssb / (k - 1)", 6)}) - (${sqlR("ssw / (n_tot - k)", 6)})) / " +
         s"((${sqlR("ssb / (k - 1)", 6)}) + (n0 - 1) * (${sqlR("ssw / (n_tot - k)", 6)}))", 6)}
       |       END AS icc
       |FROM f""".stripMargin
}
