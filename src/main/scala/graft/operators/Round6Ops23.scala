package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Round-6 batch-40 operators (SURVEY §2 #264): embedding-level
  * decontamination. (#265 stream_slo_burn lives in
  * [[graft.streaming.Streaming]] and drains #261's registers.)
  */
object Round6Ops23 {

  /** Cosine threshold for a semantic eval-set hit. */
  val SemContamTau = 0.4

  /** #264 corpus_semantic_contamination: EMBEDDING-LEVEL
    * decontamination — training documents whose embedding sits within
    * cosine ≥ [[SemContamTau]] of ANY benchmark document (the #24d
    * src0/src1 eval convention), reported per training source with hit
    * counts and the worst similarity. The modern complement of #24d:
    * n-gram contamination catches verbatim leakage, but a PARAPHRASED
    * eval item shares almost no shingles and still leaks the answer —
    * embedding similarity is how production decontamination (GPT-3
    * appendix C onward) actually screens. Pairs come from the #32 LSH
    * bucket machinery restricted to train×eval, so the benchmark side
    * never joins against the full corpus pair space.
    *
    * Scale shape: bucket fan-out on both sides, bucket-equi join
    * train×eval (candidates bounded by bucket occupancy, never
    * all-pairs), cheap id-pair distinct BEFORE vectors join back,
    * exact 6dp decimal cosine on survivors, one per-source rollup. */
  def corpusSemanticContamination(s: SparkSession, dir: String,
                                  tau: Double = SemContamTau): DataFrame = {
    graft.functions.GraftFunctions.ensure(s)
    val evalSrcs = Seq("src0", "src1")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val e = Tables.embeddings(s, dir)
      .join(docs, col("vec_id") === col("doc_id"))
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("is_eval", col("source").isin(evalSrcs: _*))
    val ps = Similarity.planes(16, 6, 64)
    val buck = e.withColumn("tb", explode(array(
        ps.zipWithIndex.map { case (p, t) =>
          struct(lit(t).as("t"), Similarity.bucketExpr(col("embedding"), p).as("b"))
        }: _*)))
      .select(col("vec_id"), col("is_eval"), col("tb"))
    val candIds = buck.filter(!col("is_eval"))
      .select(col("tb"), col("vec_id").as("id_t"))
      .join(buck.filter(col("is_eval"))
        .select(col("tb"), col("vec_id").as("id_e")), Seq("tb"))
      .select(col("id_t"), col("id_e")).distinct()
    val hits = candIds
      .join(e.select(col("vec_id").as("id_t"), col("source"),
                     col("embedding").as("emb_t"), col("nrm").as("n_t")), "id_t")
      .join(e.select(col("vec_id").as("id_e"),
                     col("embedding").as("emb_e"), col("nrm").as("n_e")), "id_e")
      .filter(call_function("float_dot", col("emb_t"), col("emb_e")) /
              (col("n_t") * col("n_e")) >= tau - 1e-6)
      .withColumn("cosine",
        r(dotDec(col("emb_t"), col("emb_e")) / (col("n_t") * col("n_e")), 6))
      .filter(col("cosine") >= tau)
      .groupBy(col("source"), col("id_t"))
      .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cos"))
    val trainDocs = docs.filter(!col("source").isin(evalSrcs: _*))
      .groupBy(col("source")).agg(count(lit(1)).as("n_train"))
    trainDocs.join(
        hits.groupBy(col("source"))
          .agg(count(lit(1)).as("n_flagged"),
               sum(col("n_hits")).as("n_pairs"),
               max(col("max_cos")).as("max_cos")),
        Seq("source"), "left")
      .withColumn("n_flagged", coalesce(col("n_flagged"), lit(0L)))
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .withColumn("flag_share",
        r(col("n_flagged") / col("n_train").cast("double"), 6))
      .select(col("source"), col("n_train"), col("n_flagged"), col("n_pairs"),
              col("flag_share"), col("max_cos"))
      .orderBy(col("source"))
  }

  def corpusSemanticContaminationSql(tau: Double = SemContamTau): String =
    Similarity.lshBucketSqlPrefix(16, 6,
      leadCtes =
        """ed AS (
          |  SELECT e.vec_id, e.embedding, d.source,
          |         d.source IN ('src0', 'src1') AS is_eval
          |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
          |""".stripMargin,
      src = "ed", extra = Seq("is_eval")) +
    s""",
       |cand AS (
       |  SELECT DISTINCT tr.vec_id AS id_t, ev.vec_id AS id_e
       |  FROM cb tr JOIN cb ev
       |    ON tr.t = ev.t AND tr.b = ev.b
       |   AND NOT tr.is_eval AND ev.is_eval),
       |hits AS (
       |  SELECT a.source, c.id_t, count(*) AS n_hits,
       |         max(floor((${graft.functions.VectorFunctions.sqlCosine("a.embedding", "b.embedding")}) * 1e6 + 0.5) / 1e6) AS max_cos
       |  FROM cand c
       |  JOIN ed a ON a.vec_id = c.id_t
       |  JOIN ed b ON b.vec_id = c.id_e
       |  WHERE floor((${graft.functions.VectorFunctions.sqlCosine("a.embedding", "b.embedding")}) * 1e6 + 0.5) / 1e6 >= $tau
       |  GROUP BY 1, 2),
       |train AS (
       |  SELECT source, count(*) AS n_train FROM documents
       |  WHERE source NOT IN ('src0', 'src1') GROUP BY 1),
       |agg AS (
       |  SELECT source, count(*) AS n_flagged,
       |         CAST(sum(n_hits) AS BIGINT) AS n_pairs,
       |         max(max_cos) AS max_cos
       |  FROM hits GROUP BY 1)
       |SELECT t.source, t.n_train,
       |       coalesce(a.n_flagged, 0) AS n_flagged,
       |       coalesce(a.n_pairs, 0) AS n_pairs,
       |       ${sqlR("coalesce(a.n_flagged, 0) / CAST(t.n_train AS DOUBLE)", 6)}
       |         AS flag_share,
       |       a.max_cos
       |FROM train t LEFT JOIN agg a USING (source)
       |ORDER BY t.source""".stripMargin
}
