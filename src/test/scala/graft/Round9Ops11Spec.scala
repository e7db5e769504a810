package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops11

/** Round-9 batch-11 operators (#328-#329). */
class Round9Ops11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // Type a: steady 10 s cadence 0..100, then a 600 s hole, then
  // 10 s cadence again to 800. 21 gaps total: 20 × 10 s + 1 × 600 s →
  // mean 38.095238; 600 / 38.095238 = 15.75 ≥ 5 → exactly one outage.
  test("dq_outages: a planted hole is the only incident, cadence-normalized") {
    import spark.implicits._
    val times = (0 to 100 by 10) ++ (700 to 800 by 10)
    val ev = times.zipWithIndex.map { case (s, i) =>
      ("a", ts(s.toLong), i.toLong)
    }.toDF("event_type", "ts", "event_id")
    val out = Round9Ops11.dqOutagesDf(ev).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 100 && r.getLong(2) == 700 && r.getLong(3) == 600)
    assert(math.abs(r.getDouble(4) - 38.095238) < 1e-6)
    assert(r.getDouble(5) == 15.75)
  }

  test("dq_outages: a perfectly steady feed reports no incidents") {
    import spark.implicits._
    val ev = (0 to 300 by 10).zipWithIndex.map { case (s, i) =>
      ("b", ts(s.toLong), i.toLong)
    }.toDF("event_type", "ts", "event_id")
    assert(Round9Ops11.dqOutagesDf(ev).count() == 0)
  }

  test("dq_outages: corpus run — intervals ordered, ratios above threshold") {
    val out = Round9Ops11.dqOutages(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "start before end")
      assert(r.getDouble(5) >= 5.0)
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  // AR(1) with phi=0.7 (seeded white noise): PACF cuts off after lag 1 —
  // pacf1 ≈ 0.7, pacf2 ≈ 0, pacf3 ≈ 0.
  test("ts_pacf: AR(1) cuts off after lag 1") {
    import spark.implicits._
    val n = 400
    val rng = new java.util.Random(7)
    val x = new Array[Double](n)
    x(0) = 0.0
    for (t <- 1 until n) x(t) = 0.7 * x(t - 1) + rng.nextGaussian()
    val ev = x.zipWithIndex.map { case (v, i) =>
      (1L, ts(i * 60L), i.toLong, v)
    }.toSeq.toDF("user_id", "ts", "event_id", "value")
    val r = Round9Ops11.tsPacfDf(ev).collect()(0)
    assert(math.abs(r.getDouble(5) - 0.7) < 0.15, s"pacf1=${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6)) < 0.15, s"pacf2=${r.getDouble(6)}")
    assert(math.abs(r.getDouble(7)) < 0.15, s"pacf3=${r.getDouble(7)}")
  }

  test("ts_pacf: pacf2 equals the #327 Yule-Walker phi2 on the corpus") {
    val pacf = Round9Ops11.tsPacf(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap
    val ar2 = graft.operators.Round9Ops10.tsAr2Forecast(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toMap
    assert(pacf.keySet == ar2.keySet)
    pacf.foreach { case (uid, p) => assert(p == ar2(uid), s"user $uid") }
  }
}
