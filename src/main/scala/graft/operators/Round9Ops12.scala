package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._

/** Round-9 batch-12 operator (SURVEY §2 #330): multiple-testing
  * correction over the pairwise-comparison family.
  */
object Round9Ops12 {

  // ------------------------------------- #330 events_multiple_testing

  /** 1/√2 as a shared literal so both engines scale |t| identically. */
  private val InvSqrt2 = 0.7071067811865476

  /** Two-sided normal-approximation p-value from a t statistic:
    * p = 1 − erf(|t|/√2), erf by the Abramowitz-Stegun 7.1.26
    * polynomial (max abs error 1.5e-7, far below the 6dp readout) —
    * closed-form literal arithmetic both engines evaluate identically,
    * the same cross-engine discipline as the logistic scoring ops
    * (exp + immediate 6dp round). Large-sample approximation is
    * appropriate here: the #104 family's per-group n is in the
    * hundreds and the Welch df makes Student ≈ normal. */
  private def pTwoSided(t: org.apache.spark.sql.Column) = {
    val x = abs(t) * InvSqrt2
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * tt + lit(-1.453152027)) * tt +
      lit(1.421413741)) * tt + lit(-0.284496736)) * tt +
      lit(0.254829592)) * tt
    r(poly * exp(-(x * x)), 6) // 1 − erf = poly·e^(−x²) exactly in 7.1.26
  }

  private def pTwoSidedSql(t: String): String = {
    val x = s"(abs($t) * $InvSqrt2)"
    val tt = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $tt + -1.453152027) * $tt + " +
      s"1.421413741) * $tt + -0.284496736) * $tt + 0.254829592) * $tt)"
    sqlR(s"$poly * exp(-($x * $x))", 6)
  }

  /** #330 events_multiple_testing: the #104 Welch pair family put
    * under FAMILY-WISE control — the step every real A/B review runs
    * after computing 10 pairwise tests and before believing any of
    * them (10 tests at α=0.05 expect ~0.5 false positives; the naive
    * table IS the garden of forking paths). Per pair: the raw
    * normal-approx p, the HOLM step-down adjusted p (controls FWER —
    * running max of min(1, (m−j+1)·p₍ⱼ₎) up the sorted family) and the
    * BENJAMINI-HOCHBERG adjusted p (controls FDR — running min of
    * min(1, m·p₍ⱼ₎/j) down the family), with reject flags at α=0.05.
    * Holm ⊆ BH rejections by construction (spec-pinned).
    *
    * Scale shape: the family table is MODEL-SIZED (≤|types|² rows from
    * #104's one-scan moment rollup), so the unpartitioned rank/cummax/
    * cummin windows run on a deliberately single-partition model table
    * — the same contract as every broadcast-scalar readout; the fact
    * table is scanned exactly once, inside #104. */
  def eventsMultipleTesting(s: SparkSession, dir: String,
                            alpha: Double = 0.05): DataFrame =
    multipleTestingDf(Analytics3.eventsWelchT(s, dir), alpha)

  /** DataFrame-generic core: expects (type_a, type_b, t_stat). */
  def multipleTestingDf(fam: DataFrame, alpha: Double = 0.05): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
    val wOrd = Window.partitionBy(lit(1))
      .orderBy(col("p_raw"), col("type_a"), col("type_b"))
    val p = fam
      .select(col("type_a"), col("type_b"), col("t_stat"))
      .withColumn("p_raw", pTwoSided(col("t_stat")))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("p_rank", row_number().over(wOrd))
      .withColumn("holm_term",
        r(least(lit(1.0), (col("m") - col("p_rank") + 1) * col("p_raw")), 6))
      .withColumn("bh_term",
        r(least(lit(1.0), col("m") * col("p_raw") / col("p_rank")), 6))
      .withColumn("p_holm", max(col("holm_term"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("p_bh", min(col("bh_term"))
        .over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    p.select(col("type_a"), col("type_b"), col("t_stat"), col("p_raw"),
             col("p_rank"), col("m").as("n_tests"),
             col("p_holm"), col("p_bh"),
             (col("p_holm") < alpha).as("sig_holm"),
             (col("p_bh") < alpha).as("sig_bh"))
      .orderBy(col("type_a"), col("type_b"))
  }

  def eventsMultipleTestingSql(alpha: Double = 0.05): String =
    s"""WITH fam AS (${Analytics3.eventsWelchTSql}),
       |p AS (
       |  SELECT type_a, type_b, t_stat,
       |         ${pTwoSidedSql("t_stat")} AS p_raw
       |  FROM fam),
       |rk AS (
       |  SELECT *, count(*) OVER () AS m,
       |         row_number() OVER (ORDER BY p_raw, type_a, type_b) AS p_rank
       |  FROM p),
       |terms AS (
       |  SELECT *,
       |         ${sqlR("least(1.0, (m - p_rank + 1) * p_raw)", 6)} AS holm_term,
       |         ${sqlR("least(1.0, m * p_raw / p_rank)", 6)} AS bh_term
       |  FROM rk),
       |adj AS (
       |  SELECT *,
       |         max(holm_term) OVER (ORDER BY p_rank
       |           ROWS UNBOUNDED PRECEDING) AS p_holm,
       |         min(bh_term) OVER (ORDER BY p_rank
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_bh
       |  FROM terms)
       |SELECT type_a, type_b, t_stat, p_raw, p_rank,
       |       CAST(m AS BIGINT) AS n_tests, p_holm, p_bh,
       |       p_holm < $alpha AS sig_holm, p_bh < $alpha AS sig_bh
       |FROM adj ORDER BY type_a, type_b""".stripMargin
}
