package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-5 operators (SURVEY §2 #314-#315): edge embeddedness /
  * local bridges over the similarity graph, and the corpus keyphrase
  * index.
  */
object Round9Ops5 {

  // ------------------------------------------ #314 graph_local_bridges

  /** #314 graph_local_bridges: per-edge EMBEDDEDNESS (common-neighbor
    * count, Granovetter's tie strength) and the LOCAL BRIDGE flag
    * (embeddedness 0 — removing the edge pushes its endpoints to
    * distance > 2) over the #31d kNN graph. The edge-level complement
    * of #302/#313: the exact edges where LPA communities split and
    * where #312's chained near-dup blobs break are the zero-embedded
    * ones — this op NAMES them, the candidate list for manual dedup
    * review ("are these two clusters really the same document?").
    *
    * Scale shape: the #171 degree-bounded wedge self-join (≤ deg² per
    * node for the fixed-k graph) rolled up per (a, b) endpoint pair,
    * left-joined onto the u<v edge list — no structure beyond the
    * wedges materializes; integer counts end-to-end. */
  def graphLocalBridges(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    // rides the memoized symmetric edge set shared with #302/#313/#347
    localBridgesCore(Round9Ops2.knnUndCached(s, dir, k))

  /** DataFrame-generic core: directed (src, dst), symmetrized inside. */
  def localBridgesDf(e: DataFrame): DataFrame =
    localBridgesCore(e.union(e.select(col("dst"), col("src")))
      .distinct().transform(graft.Lineage.pin))

  /** The readout over an already-symmetrized edge table. */
  private def localBridgesCore(und: DataFrame): DataFrame = {
    val common = und.select(col("dst").as("n"), col("src").as("a"))
      .join(und.select(col("src").as("n"), col("dst").as("b")), Seq("n"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
    und.filter(col("src") < col("dst"))
      .join(common,
            col("src") === col("a") && col("dst") === col("b"), "left")
      .select(col("src"), col("dst"),
              coalesce(col("n_common"), lit(0L)).as("embeddedness"),
              (coalesce(col("n_common"), lit(0L)) === 0).as("is_local_bridge"))
      .orderBy(col("src"), col("dst"))
  }

  def graphLocalBridgesSql(k: Int = 3): String =
    s"""WITH g AS (SELECT q_id, vec_id FROM (${Similarity.knnGraphSql(k)})),
       |und AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT q_id AS src, vec_id AS dst FROM g
       |    UNION ALL
       |    SELECT vec_id AS src, q_id AS dst FROM g)),
       |common AS (
       |  SELECT x.src AS a, y.dst AS b, count(*) AS n_common
       |  FROM und x JOIN und y ON x.dst = y.src AND x.src < y.dst
       |  GROUP BY 1, 2)
       |SELECT u.src, u.dst,
       |       CAST(coalesce(c.n_common, 0) AS BIGINT) AS embeddedness,
       |       coalesce(c.n_common, 0) = 0 AS is_local_bridge
       |FROM und u LEFT JOIN common c ON c.a = u.src AND c.b = u.dst
       |WHERE u.src < u.dst
       |ORDER BY 1, 2""".stripMargin

  // --------------------------------------- #315 corpus_keyphrase_index

  /** #315 corpus_keyphrase_index: the CORPUS-level keyphrase table —
    * #307's RAKE phrase occurrences rolled up across documents: per
    * phrase, how many docs carry it, how often it occurs, and its
    * total/mean RAKE mass; top `topK` by (total desc, phrase). The
    * "what is this corpus about" summary a curation dashboard leads
    * with, and the candidate list for boilerplate review (a phrase in
    * thousands of docs with high mass is a template, not a topic —
    * read beside #221's template detector).
    *
    * Scale shape: rides the shared #307 chain (one posexplode scan,
    * one vocabulary-keyed shuffle); the index is one phrase-keyed
    * rollup (distinct docs via per-group count over (doc, phrase)
    * pre-rollup — no count-distinct expansion) and the top-k is
    * sort+limit over the bounded phrase table (the #243 discipline,
    * never a global rank window). */
  def corpusKeyphraseIndex(s: SparkSession, dir: String,
                           topK: Int = 20): DataFrame = {
    val perDoc = Round9Ops3.rakePhraseScores(Tables.documents(s, dir))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("occ"), dsum(col("score")).as("sc"))
    perDoc.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("occ")).as("n_occurrences"),
           dsum(col("sc"), 6).as("total_score"))
      .orderBy(col("total_score").desc, col("phrase"))
      .limit(topK)
  }

  def corpusKeyphraseIndexSql(topK: Int = 20): String =
    s"""${Round9Ops3.rakeChainSql},
       |perdoc AS (
       |  SELECT doc_id, phrase, count(*) AS occ, ${sqlSum("score")} AS sc
       |  FROM ps GROUP BY 1, 2),
       |idx AS (
       |  SELECT phrase, count(*) AS n_docs,
       |         CAST(sum(occ) AS BIGINT) AS n_occurrences,
       |         ${sqlSum("sc", 6)} AS total_score
       |  FROM perdoc GROUP BY 1)
       |SELECT phrase, n_docs, n_occurrences, total_score
       |FROM idx ORDER BY total_score DESC, phrase LIMIT $topK""".stripMargin
}
