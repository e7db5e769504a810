package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Round-6 operator batch 4 (SURVEY §2 #131, #132, #134): shingle
  * novelty attribution, the quality-threshold data-selection curve, and
  * a fixed-period periodogram for seasonality detection. Same contracts
  * as every other batch: Parity decimal/rounding discipline end-to-end,
  * no key-proportional global windows, joins bounded by inverted-index
  * or broadcast shapes. (#133 emb_silhouette lives with the other
  * embedding evaluators in [[Similarity3]].)
  */
object Round6Ops2 {

  // ------------------------------------------- #131 text_ngram_novelty

  /** #131 text_ngram_novelty: per-document novelty attribution — the
    * fraction of a document's distinct word-3-gram shingles whose FIRST
    * corpus occurrence (minimum doc_id) is this document. The
    * memorization/contribution metric of a curation pipeline: boilerplate
    * and near-copies score near 0, fresh text near 1 (the per-doc
    * complement of #90 doc_dup_inflation's corpus-level inflation).
    *
    * Scale shape: ONE shingle explode (map-side) into a min-aggregate
    * inverted index keyed by shingle — no join back to the exploded
    * table: each shingle's min doc_id IS its novelty attribution, so
    * the per-doc novel count comes from re-grouping the index rows by
    * their winner (doc-sized, not shingle-sized), and the per-doc
    * denominator is a map-side `size(shingles)` that never explodes.
    * NO self-join, so unlike #26/#28b no stop-shingle DF cap is
    * needed. One shingle-keyed shuffle + one doc-keyed rollup; the
    * doc↔novel join is doc-cardinality on both sides. The shingle
    * arrays come from [[TextOps.shingleTable]]'s memoized build, shared
    * with the #26/#27/#28b dedup family — one evaluation serves all. */
  def textNgramNovelty(s: SparkSession, dir: String): DataFrame =
    textNgramNoveltyDf(Tables.documents(s, dir))

  def textNgramNoveltyDf(docs: DataFrame): DataFrame = {
    val sh = TextOps.shingleTable(docs)
    val novel = sh
      .select(col("doc_id"), explode(col("sh")).as("sg"))
      .groupBy(col("sg")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    val totals = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0)
    totals.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty",
        r(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"), col("novelty"))
      .orderBy(col("doc_id"))
  }

  val textNgramNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |           unnest(CASE WHEN len(t) >= 3 THEN
       |             list_transform(range(1, len(t) - 1),
       |                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |           ELSE [] END) AS s
       |    FROM toks)),
       |fs AS (SELECT s, min(doc_id) AS first_seen FROM sh GROUP BY 1)
       |SELECT sh.doc_id, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN fs.first_seen = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       ${sqlR("CAST(sum(CASE WHEN fs.first_seen = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS novelty
       |FROM sh JOIN fs ON sh.s = fs.s
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------- #132 corpus_quality_curve

  private val CurveSteps = 10

  /** #132 corpus_quality_curve: the data-selection tradeoff curve — for
    * each quality-score cutoff t ∈ {0.0, 0.1, …, 0.9}, how many
    * documents and tokens survive `quality ≥ t`, and what fraction of
    * the corpus' tokens that is. The plot every filtering decision for a
    * pretraining corpus is made from ("at what cutoff do we still have
    * our token budget?"); composes #22's score with #21's token counts.
    *
    * Scale shape: quality + token count are one map-side scan; the
    * 10-point threshold grid fans each doc out ×10 map-side (a bounded
    * literal explode, not a join), and the rollup is a 10-group
    * aggregate with conditional sums — no sort, no quantile, no window.
    * Thresholds are exact doubles k/10 so the ≥ compare is
    * bit-deterministic cross-engine. */
  def corpusQualityCurve(s: SparkSession, dir: String): DataFrame = {
    val q = TextOps.textQuality(s, dir).select(col("doc_id"), col("quality"))
    val sized = Tables.documents(s, dir)
      .select(col("doc_id"), size(lowerTokens(col("text"))).cast("long").as("n_tok"))
    q.join(sized, "doc_id")
      .withColumn("k", explode(sequence(lit(0), lit(CurveSteps - 1))))
      .withColumn("threshold", col("k").cast("double") / CurveSteps.toDouble)
      .groupBy(col("threshold"))
      .agg(sum(when(col("quality") >= col("threshold"), 1L).otherwise(0L))
             .as("n_docs"),
           sum(when(col("quality") >= col("threshold"), col("n_tok")).otherwise(0L))
             .as("n_tokens"),
           sum(col("n_tok")).as("total_tokens"))
      .select(col("threshold"), col("n_docs"), col("n_tokens"),
        r(col("n_tokens").cast("double") / col("total_tokens").cast("double"), 6)
          .as("token_share"))
      .orderBy(col("threshold"))
  }

  val corpusQualityCurveSql: String =
    s"""WITH q AS (${TextOps.textQualitySql}),
       |sized AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |grid AS (
       |  SELECT CAST(range AS DOUBLE) / ${CurveSteps}.0 AS threshold
       |  FROM range(0, $CurveSteps)),
       |agg AS (
       |  SELECT g.threshold,
       |         CAST(sum(CASE WHEN q.quality >= g.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       |         CAST(sum(CASE WHEN q.quality >= g.threshold THEN s.n_tok ELSE 0 END) AS BIGINT) AS n_tokens,
       |         CAST(sum(s.n_tok) AS BIGINT) AS total_tokens
       |  FROM q JOIN sized s USING (doc_id) CROSS JOIN grid g
       |  GROUP BY 1)
       |SELECT threshold, n_docs, n_tokens,
       |       ${sqlR("CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)", 6)} AS token_share
       |FROM agg ORDER BY threshold""".stripMargin

  // -------------------------------------------- #134 ts_periodogram

  private[graft] val PeriodogramPeriods = Seq(7, 14, 30)

  /** #134 ts_periodogram: spectral power of each user's daily series at
    * fixed candidate periods P ∈ {7, 14, 30} days — the mean-centered
    * discrete Fourier magnitude
    *   power(P) = (Σ(x−x̄)·cos φ)² + (Σ(x−x̄)·sin φ)²) / n,  φ = 2π·(day mod P)/P
    * — the seasonality detector that decides which period
    * #76 ts_seasonal_decompose should strip. Evaluating only a bounded
    * period grid keeps this a PLAIN AGGREGATE (unlike a full FFT, which
    * would need the whole series in one place): the mean-centering is
    * expanded algebraically (Σx·c − x̄·Σc) so one pass collects all five
    * sums as mergeable decimal partials — one shuffle, map-side ×3
    * period fan-out, no window, no array build.
    *
    * Parity: cos/sin are the libm calls whose last ulp can differ across
    * engines, so both are 6dp-rounded before use (#24f ln discipline);
    * taking day MOD P first keeps the phase argument in [0, 2π) where
    * argument reduction is exact. */
  def tsPeriodogram(s: SparkSession, dir: String): DataFrame =
    tsPeriodogramDf(Mhw.daily(s, dir))

  def tsPeriodogramDf(dl: DataFrame): DataFrame = {
    val day = datediff(col("d"), lit("1970-01-01"))
    val phase = lit(2.0 * math.Pi) * pmod(day, col("p")) / col("p")
    val terms = dl
      .withColumn("p", explode(array(PeriodogramPeriods.map(lit(_)): _*)))
      .withColumn("c", r(cos(phase), 6))
      .withColumn("sn", r(sin(phase), 6))
    terms.groupBy(col("user_id"), col("p"))
      .agg(count(lit(1)).as("n_obs"),
           dsum(col("sst")).as("sx"),
           dsum(col("sst") * col("c")).as("sxc"),
           dsum(col("sst") * col("sn")).as("sxs"),
           dsum(col("c")).as("sc"),
           dsum(col("sn")).as("ss"))
      .withColumn("a", col("sxc") - (col("sx") / col("n_obs")) * col("sc"))
      .withColumn("b", col("sxs") - (col("sx") / col("n_obs")) * col("ss"))
      .select(col("user_id"), col("p").cast("int").as("period"), col("n_obs"),
        r((col("a") * col("a") + col("b") * col("b")) / col("n_obs"), 6)
          .as("power"))
      .orderBy(col("user_id"), col("period"))
  }

  val tsPeriodogramSql: String = {
    val phase = "(2 * pi() * (datediff('day', DATE '1970-01-01', d) % p)) / p"
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d, ${sqlAvg("value", 6)} AS sst
       |  FROM events GROUP BY 1, 2),
       |per AS (SELECT p FROM (VALUES (7), (14), (30)) periods(p)),
       |terms AS (
       |  SELECT user_id, p, sst,
       |         ${sqlR(s"cos($phase)", 6)} AS c,
       |         ${sqlR(s"sin($phase)", 6)} AS sn
       |  FROM daily CROSS JOIN per),
       |agg AS (
       |  SELECT user_id, p, count(*) AS n_obs,
       |         ${sqlSum("sst")} AS sx,
       |         ${sqlSum("sst * c")} AS sxc,
       |         ${sqlSum("sst * sn")} AS sxs,
       |         ${sqlSum("c")} AS sc,
       |         ${sqlSum("sn")} AS ss
       |  FROM terms GROUP BY 1, 2),
       |ab AS (
       |  SELECT user_id, p, n_obs,
       |         sxc - (sx / n_obs) * sc AS a,
       |         sxs - (sx / n_obs) * ss AS b
       |  FROM agg)
       |SELECT user_id, CAST(p AS INT) AS period, n_obs,
       |       ${sqlR("(a * a + b * b) / n_obs", 6)} AS power
       |FROM ab ORDER BY 1, 2""".stripMargin
  }
}
