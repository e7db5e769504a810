package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round9Ops7, Round9Ops8, Round9Ops9}

/** Round-9 batch-9 operators (#322-#324). */
class Round9Ops9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("emb_cka_matrix: diagonal is exactly 1; halves entry matches #318; symmetry by construction") {
    val m = Round9Ops9.embCkaMatrix(spark, sf).collect()
    assert(m.length == 36, "8 blocks -> 36 unordered pairs")
    m.filter(r => r.getInt(0) == r.getInt(1))
      .foreach(r => assert(r.getDouble(3) == 1.0, s"diag ${r.toSeq}"))
    m.foreach { r =>
      assert(r.getInt(0) <= r.getInt(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-6)
    }
    // at (d=8, blocks=2) the matrix's (1,2) cell IS #318's statistic
    // (same dim blocks, same math)
    val halves = Round9Ops7.embCkaHalves(spark, sf).collect()(0).getDouble(5)
    val m2 = Round9Ops9.embCkaMatrixDf(
      graft.sources.Tables.embeddings(spark, sf), 8, 2).collect()
    val cell12 = m2.find(r => r.getInt(0) == 1 && r.getInt(1) == 2).get.getDouble(3)
    assert(math.abs(cell12 - halves) < 1e-9, s"matrix $cell12 vs halves $halves")
  }

  test("stream_retention_halflife: drained stream is bit-identical to batch #320") {
    val streamed = graft.streaming.Streaming
      .streamRetentionHalflife(spark, sf).collect()
    val batch = Round9Ops8.eventsRetentionHalflife(spark, sf).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }

  test("stream_hurst: drained stream is bit-identical to batch #319") {
    val streamed = graft.streaming.Streaming.streamHurst(spark, sf).collect()
    val batch = Round9Ops7.tsHurst(spark, sf).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }
}
