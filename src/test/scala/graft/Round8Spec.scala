package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round6Ops12, Round6Ops24}

/** Round-8 operators (#280 stream_disposition, #281 stream_garbage_mix):
  * the documents-feed curation gate and garbage screen live, via the
  * registers/finalize contract — the stream twin must be bit-identical
  * to the batch build because the register stage IS shared code. */
class Round8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("stream_disposition: streamed decision table is bit-identical to batch #266") {
    val batch = Round6Ops24.corpusDisposition(spark, sf).collect()
    val streamed = graft.streaming.Streaming.streamDisposition(spark, sf)
      .collect()
    assert(batch.map(_.toString).toSeq == streamed.map(_.toString).toSeq)
    // every doc routes exactly once; shares total 1 per source and corpus
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(batch.map(_.getLong(2)).sum == total)
    assert(math.abs(batch.map(_.getDouble(5)).sum - 1.0) < 1e-4)
  }

  test("stream_garbage_mix: streamed per-source registers are bit-identical to batch") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val batch = Round6Ops12.garbageMixFinalize(
      Round6Ops12.garbageRegisters(docs)).collect()
    val streamed = graft.streaming.Streaming.streamGarbageMix(spark, sf)
      .collect()
    assert(batch.map(_.toString).toSeq == streamed.map(_.toString).toSeq)
    assert(batch.map(_.getLong(1)).sum == docs.count())
    batch.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }
}
