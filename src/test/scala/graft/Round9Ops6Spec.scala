package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mhw, Round9Ops4}

/** Round-9 batch-6 operators (#316-#317). */
class Round9Ops6Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("stream_value_psi: drained stream is bit-identical to the batch scorecard") {
    val streamed = graft.streaming.Streaming.streamValuePsi(spark, sf).collect()
    val batch = Round9Ops4.dqValuePsi(spark, sf).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }

  test("mhw_onset_composite: onset severity above pre-onset baseline; offsets bounded") {
    val out = Mhw.mhwOnsetComposite(spark, sf).collect()
    assert(out.nonEmpty)
    val byOff = out.map(r => r.getInt(0) -> r).toMap
    out.foreach { r =>
      assert(r.getInt(0) >= -10 && r.getInt(0) <= 20)
      assert(r.getLong(1) > 0)
    }
    // every detected event contributes its onset day, so offset 0 has
    // at least as many observations as any other offset
    val n0 = byOff(0).getLong(1)
    out.foreach(r => assert(r.getLong(1) <= n0,
      s"offset ${r.getInt(0)} has ${r.getLong(1)} > $n0 at onset"))
    // onset day is in-event by construction (every contributing row is
    // a flagged severity>1 day): mean severity > 1 there, and above the
    // far pre-onset baseline where most days are sub-threshold
    assert(byOff(0).getDouble(3) > 1.0)
    assert(byOff(0).getDouble(3) > byOff(-10).getDouble(3),
      "onset composite severity should exceed the pre-onset baseline")
  }
}
