package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{DocConfig, Pipeline, VecConfig}
import graft.sources.Tables

/** The Pipeline facade over renamed user columns must equal the
  * canonical operators over the test tables. */
class PipelineApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("dedup over renamed document columns equals the canonical run") {
    val renamed = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"))
    val viaApi = Pipeline.dedupNgramJaccard(renamed, cfg = DocConfig("id", "body"))
      .collect().map(_.toSeq).toSet
    val canonical = operators.TextOps.dedupNgramJaccard(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(viaApi == canonical && viaApi.nonEmpty)
  }

  test("knn over renamed embedding columns equals the canonical run") {
    val renamed = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val qs = renamed.filter(col("id") < 5)
    val viaApi = Pipeline.knn(renamed, qs,
        corpusCfg = VecConfig("id", "vec"), queryCfg = VecConfig("id", "vec"))
      .collect().map(_.toSeq).toSet
    val canonical = operators.Similarity.knnBrute(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(viaApi == canonical && viaApi.size == 25)
  }

  test("cosine dedup via facade finds the canonical pairs") {
    val viaApi = Pipeline.dedupCosine(Tables.embeddings(spark, sf))
      .collect().map(_.toSeq).toSet
    val canonical = operators.Similarity.embDedupCosine(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(viaApi == canonical)
  }

  test("curate over renamed columns keeps the canonical doc ids") {
    val renamed = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"),
              col("lang"), col("source"))
    val viaApi = Pipeline.curate(renamed, cfg = DocConfig("id", "body"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val canonical = operators.TextOps.corpusCurate(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaApi == canonical && viaApi.nonEmpty)
  }

  test("curateSemantic over renamed columns equals the canonical run; lang optional") {
    val docsRen = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"),
              col("lang"), col("source"))
    val vecsRen = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("vec"), col("label"))
    val viaApi = Pipeline.curateSemantic(docsRen, vecsRen,
        dCfg = DocConfig("id", "body"), vCfg = VecConfig("vid", "vec"))
      .collect().map(_.toSeq).toSet
    val canonical = operators.Similarity.corpusCurateSemantic(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(viaApi == canonical && viaApi.nonEmpty)
    // lang/source are reporting columns: absent → nulls, same kept set
    val noMeta = Pipeline.curateSemantic(
        docsRen.select(col("id"), col("body")), vecsRen,
        dCfg = DocConfig("id", "body"), vCfg = VecConfig("vid", "vec"))
    assert(noMeta.filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet ==
           canonical.collect { case s if s(5) == true => s(0).asInstanceOf[Long] }.toSet)
  }
}
