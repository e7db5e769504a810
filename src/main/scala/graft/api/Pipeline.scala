package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.operators.{LshDedup, Similarity, TextOps}

/** Column mapping for a document corpus. */
case class DocConfig(idCol: String = "doc_id", textCol: String = "text")

/** Column mapping for an embedding corpus. */
case class VecConfig(idCol: String = "vec_id", vecCol: String = "embedding",
                     labelCol: String = "label")

/** User-facing training-data pipeline API over arbitrary DataFrames —
  * the dedup / similarity operators unbound from the test tables.
  * Every method normalizes the caller's columns onto the canonical
  * layout and delegates to the operator cores; see the operator
  * scaladocs for semantics and scale shapes.
  */
object Pipeline {

  private def docs(df: DataFrame, cfg: DocConfig): DataFrame =
    df.select(col(cfg.idCol).cast("long").as("doc_id"),
              col(cfg.textCol).as("text"))

  private def vecs(df: DataFrame, cfg: VecConfig): DataFrame =
    df.select(col(cfg.idCol).cast("long").as("vec_id"),
              col(cfg.vecCol).as("embedding"),
              col(cfg.labelCol).as("label"))

  /** Exact dedup: (fp, keep_id, n_dups) per normalized-content group. */
  def dedupExact(df: DataFrame, cfg: DocConfig = DocConfig()): DataFrame =
    TextOps.dedupExactDf(docs(df, cfg))

  /** Near-dup pairs with exact word-3-gram Jaccard ≥ tau. */
  def dedupNgramJaccard(df: DataFrame, tau: Double = 0.3,
                        cfg: DocConfig = DocConfig()): DataFrame =
    TextOps.dedupNgramJaccardDf(docs(df, cfg), tau)

  /** MinHash+LSH near-dup pairs (banded, exact-verified). */
  def dedupMinhash(df: DataFrame, tau: Double = 0.3,
                   cfg: DocConfig = DocConfig()): DataFrame =
    LshDedup.dedupMinhashDf(docs(df, cfg), tau)

  /** SimHash near-dup pairs (64-bit fingerprints, hamming-verified). */
  def dedupSimhash(df: DataFrame, maxHamming: Int = 8,
                   cfg: DocConfig = DocConfig()): DataFrame =
    LshDedup.dedupSimhashDf(docs(df, cfg), maxHamming)

  /** PII scrub: email/phone counts + redacted-text fingerprint per doc. */
  def piiRedact(df: DataFrame, cfg: DocConfig = DocConfig()): DataFrame =
    TextOps.textPiiRedactDf(docs(df, cfg))

  /** Token-distribution Shannon entropy (+ distinct-normalized) per doc. */
  def tokenEntropy(df: DataFrame, cfg: DocConfig = DocConfig()): DataFrame =
    TextOps.textTokenEntropyDf(docs(df, cfg))

  /** Winnowing fingerprint set per document. */
  def winnowFingerprints(df: DataFrame, k: Int = 8, w: Int = 16,
                         cfg: DocConfig = DocConfig()): DataFrame =
    TextOps.textWinnowFpDf(docs(df, cfg), k, w)

  /** Brute-force cosine top-k of `queryDf` against `corpusDf`. */
  def knn(corpusDf: DataFrame, queryDf: DataFrame, k: Int = 5,
          corpusCfg: VecConfig = VecConfig(),
          queryCfg: VecConfig = VecConfig()): DataFrame =
    Similarity.knnBruteDf(
      vecs(corpusDf, corpusCfg).drop("label"),
      queryDf.select(col(queryCfg.idCol).cast("long").as("q_id"),
                     col(queryCfg.vecCol).as("q_emb")),
      k)

  /** Embedding near-dup pairs with cosine ≥ tau, blocked by label. */
  def dedupCosine(df: DataFrame, tau: Double = 0.35,
                  cfg: VecConfig = VecConfig()): DataFrame =
    Similarity.embDedupCosineDf(vecs(df, cfg), tau)

  /** Duplicate clusters: connected components over the n-gram Jaccard
    * near-dup graph; (doc_id, cluster) with cluster = min member id. */
  def dedupClusters(df: DataFrame, tau: Double = 0.3,
                    cfg: DocConfig = DocConfig()): DataFrame =
    graft.operators.Analytics.dedupClustersDf(docs(df, cfg), tau)

  /** Deterministic stratified sample: keep rows whose md5(id) bucket
    * (0-99) falls below the stratum's percentage rate — reproducible
    * across engines, runs, and partitionings. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Int], defaultRate: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val bucket =
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 6), 16, 10)
        .cast("long") % 100
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, v).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** End-to-end corpus curation over an arbitrary DataFrame: quality
    * gate → exact-dedup keep-min-id → deterministic stratified sample,
    * fused into one plan (map-side score and sample predicates around a
    * single content-fingerprint exchange — see TextOps.corpusCurate for
    * the plan-pinned shape). Keeps the caller's columns and adds
    * `quality`. */
  def curate(df: DataFrame, minQuality: Double = 0.5,
             stratumCol: String = "lang",
             rates: Map[String, Int] = Map("en" -> 10),
             defaultRate: Int = 25,
             cfg: DocConfig = DocConfig()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.Parity.r
    import graft.functions.TextFunctions._
    val t = col(cfg.textCol)
    val toks = lowerTokens(t)
    val len = length(t)
    val punct = regexp_count(t, lit("[.,;:!?]"))
    val stop = markerCount(toks, stopwordsEn)
    val scored = df.withColumn("quality",
        r(lit(0.4) * (stop / size(toks)) +
          lit(0.3) * (lit(1.0) - punct / len) +
          lit(0.3) * least(lit(1.0), len / lit(500.0)), 6))
      .filter(col("quality") >= minQuality)
    val deduped = scored
      .withColumn("__keep", min(col(cfg.idCol))
        .over(Window.partitionBy(fingerprint(t))))
      .filter(col(cfg.idCol) === col("__keep")).drop("__keep")
    stratifiedSample(deduped, stratumCol, cfg.idCol, rates, defaultRate)
  }

  /** Fused text+embedding curation: quality gate on the documents, then
    * SemDeDup keep-first pruning among the gated vectors (shared
    * deterministic k-means model trained on the FULL embedding corpus).
    * One row per gated doc with cluster and kept flag — see
    * Similarity.corpusCurateSemanticDf for the plan shape. */
  def curateSemantic(docsDf: DataFrame, vecsDf: DataFrame,
                     minQuality: Double = 0.5, tau: Double = 0.3,
                     nCells: Int = 16, iters: Int = 3,
                     dCfg: DocConfig = DocConfig(),
                     vCfg: VecConfig = VecConfig()): DataFrame = {
    // carry lang/source through when the caller has them (they are
    // reporting columns, not semantics) — null otherwise
    def opt(c: String) =
      (if (docsDf.columns.contains(c)) col(c) else lit(null).cast("string")).as(c)
    val d = docsDf.select(col(dCfg.idCol).cast("long").as("doc_id"),
                          col(dCfg.textCol).as("text"), opt("lang"), opt("source"))
    graft.operators.Similarity.corpusCurateSemanticDf(
      d, vecs(vecsDf, vCfg), minQuality, tau, nCells, iters)
  }
}
