package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops13

/** Round-9 batch-13 operators (#332-#333). */
class Round9Ops13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("stream_ab_monitor: register stream ≡ batch corrected readout, bit for bit") {
    val batch = graft.operators.Round9Ops12
      .eventsMultipleTesting(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamAbMonitor(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  // Random walk (cumsum of seeded white noise): VR ≈ 1 at both horizons.
  // Strongly mean-reverting series (white noise itself): VR(2) ≈ 0.5.
  test("ts_variance_ratio: random walk ≈ 1, white noise reverts") {
    import spark.implicits._
    val n = 500
    val rng = new java.util.Random(11)
    val steps = Array.fill(n)(rng.nextGaussian())
    val walk = steps.scanLeft(0.0)(_ + _).drop(1)
    val ev = (walk.zipWithIndex.map { case (v, i) =>
      (1L, ts(i * 60L), i.toLong, v) // random walk
    } ++ steps.zipWithIndex.map { case (v, i) =>
      (2L, ts(i * 60L), i.toLong, v) // white noise
    }).toSeq.toDF("user_id", "ts", "event_id", "value")
    val out = Round9Ops13.tsVarianceRatioDf(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rw = out(1L)
    assert(math.abs(rw.getDouble(3) - 1.0) < 0.2, s"walk vr2=${rw.getDouble(3)}")
    assert(math.abs(rw.getDouble(5) - 1.0) < 0.3, s"walk vr4=${rw.getDouble(5)}")
    assert(math.abs(rw.getDouble(4)) < 3.0, "walk z2 inside the null band")
    val wn = out(2L)
    assert(math.abs(wn.getDouble(3) - 0.5) < 0.15, s"noise vr2=${wn.getDouble(3)}")
    assert(wn.getDouble(4) < -3.0, "noise strongly rejects the random walk")
  }

  test("ts_variance_ratio: short and constant series answer NULL") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 0L, 3.0), (1L, ts(60), 1L, 4.0), // one d1 pair only
      (2L, ts(0), 0L, 2.0), (2L, ts(60), 1L, 2.0),
      (2L, ts(120), 2L, 2.0), (2L, ts(180), 3L, 2.0),
      (2L, ts(240), 4L, 2.0), (2L, ts(300), 5L, 2.0) // constant: var1 = 0
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Round9Ops13.tsVarianceRatioDf(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(3, 4, 5, 6).foreach { i =>
      assert(out(1L).isNullAt(i), s"short col $i")
      assert(out(2L).isNullAt(i), s"constant col $i")
    }
  }

  test("ts_variance_ratio: corpus run — every series answers, ratios positive") {
    val out = Round9Ops13.tsVarianceRatio(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (!r.isNullAt(3)) assert(r.getDouble(3) > 0.0)
      if (!r.isNullAt(5)) assert(r.getDouble(5) > 0.0)
    }
  }
}
