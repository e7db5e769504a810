package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-17 operator (SURVEY §2 #340): kNN label-noise
  * detection. (#341 `mhw_event_sync` lives in
  * [[graft.operators.Mhw.mhwEventSync]] on the severity chain.)
  */
object Round9Ops17 {

  // -------------------------------------------- #340 emb_label_noise

  /** #340 emb_label_noise: LABEL-NOISE detection by neighborhood
    * disagreement (confident-learning flavor, Northcutt et al.) — a
    * vector whose own label disagrees with the MAJORITY label of its
    * k nearest neighbors is a mislabeling suspect; reported per label
    * as a noise rate. #119 answers "how predictive are the labels
    * overall" on a holdout; this POINTS AT the rows to re-annotate —
    * the triage list a labeling vendor gets back, and the cleaning
    * pass run before #160 trains on the labels. Majority ties break
    * to the smaller label (the #119 convention); graph isolates
    * (vectors whose LSH buckets hold no neighbor) are excluded
    * identically in both engines.
    *
    * Scale shape: rides the memoized #158 kNN graph (LSH bucket
    * self-join — pair space bounded by banding, never corpus²); the
    * vote, majority-pick and per-label rollup are all proportional to
    * graph edges (corpus × k), with a rank-1 window on a ≤k-vote
    * group. */
  def embLabelNoise(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    labelNoiseFromGraph(
      Similarity.knnGraph(s, dir, k).select(col("q_id"), col("vec_id")),
      Tables.embeddings(s, dir).select(col("vec_id"), col("label")))

  /** DataFrame-generic core: expects (vec_id, embedding, label). */
  private[graft] def embLabelNoiseDf(emb: DataFrame, k: Int = 3): DataFrame =
    labelNoiseFromGraph(
      Similarity.knnGraphDf(emb, k).select(col("q_id"), col("vec_id")),
      emb.select(col("vec_id"), col("label")))

  private def labelNoiseFromGraph(g: DataFrame, lab: DataFrame): DataFrame = {
    val votes = g
      .join(lab.select(col("vec_id"), col("label").as("nb_label")), "vec_id")
      .groupBy(col("q_id"), col("nb_label"))
      .agg(count(lit(1)).as("votes"))
    val maj = votes.groupBy(col("q_id"))
      .agg(max(struct(col("votes"), (-col("nb_label")).as("neg_l"))).as("best"))
      .select(col("q_id"), (-col("best.neg_l")).cast("int").as("maj_label"))
    lab.select(col("vec_id").as("q_id"), col("label").as("own_label"))
      .join(maj, "q_id")
      .groupBy(col("own_label").as("label"))
      .agg(count(lit(1)).as("n_checked"),
           sum(when(col("own_label") =!= col("maj_label"), 1L).otherwise(0L))
             .as("n_suspect"))
      .withColumn("noise_rate",
        r(col("n_suspect").cast("double") / col("n_checked"), 6))
      .orderBy(col("label"))
  }

  def embLabelNoiseSql(k: Int = 3): String =
    s"""WITH g AS (SELECT q_id, vec_id FROM (${Similarity.knnGraphSql(k)})),
       |nb AS (
       |  SELECT g.q_id, e.label AS nb_label
       |  FROM g JOIN embeddings e ON e.vec_id = g.vec_id),
       |votes AS (
       |  SELECT q_id, nb_label, count(*) AS votes FROM nb GROUP BY 1, 2),
       |maj AS (
       |  SELECT q_id, CAST(nb_label AS INT) AS maj_label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY votes DESC, nb_label) AS rn
       |    FROM votes)
       |  WHERE rn = 1),
       |j AS (
       |  SELECT e.label AS own_label, m.maj_label
       |  FROM embeddings e JOIN maj m ON m.q_id = e.vec_id)
       |SELECT own_label AS label, count(*) AS n_checked,
       |       CAST(sum(CASE WHEN own_label <> maj_label THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_suspect,
       |       ${sqlR(
             "CAST(sum(CASE WHEN own_label <> maj_label THEN 1 ELSE 0 END) " +
             "AS DOUBLE) / count(*)", 6)} AS noise_rate
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
}
