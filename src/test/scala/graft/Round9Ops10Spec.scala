package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops10

/** Round-9 batch-10 operators (#325-#327). */
class Round9Ops10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // Type a: events every 10 s from 0 to 100 (11 events, mean gap 10).
  // Type b: events every 50 s from 0 to 400 (9 events, mean gap 50).
  // Corpus max = 400. a: lag 300, staleness 30 -> stale. b: lag 0 -> fresh.
  // Type c: one event at 200 -> no gap -> unknown.
  test("dq_freshness: hand feed — lag, gap-normalized staleness, verdicts") {
    import spark.implicits._
    val ev = ((0 to 100 by 10).map(s => ("a", ts(s))) ++
              (0 to 400 by 50).map(s => ("b", ts(s))) ++
              Seq(("c", ts(200)))).toDF("event_type", "ts")
    val out = Round9Ops10.freshnessFinalize(
        Round9Ops10.freshnessRegisters(ev)).collect()
    val a = out.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 11 && a.getLong(4) == 300)
    assert(a.getDouble(5) == 10.0 && a.getDouble(6) == 30.0)
    assert(a.getString(7) == "stale")
    val b = out.find(_.getString(0) == "b").get
    assert(b.getLong(4) == 0 && b.getDouble(6) == 0.0)
    assert(b.getString(7) == "fresh")
    val c = out.find(_.getString(0) == "c").get
    assert(c.isNullAt(5) && c.isNullAt(6) && c.getString(7) == "unknown")
  }

  test("dq_freshness: corpus run — non-negative lags, the newest type reads fresh") {
    val out = Round9Ops10.dqFreshness(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) >= 0)
      assert(r.getLong(2) <= r.getLong(3))
    }
    assert(out.exists(_.getLong(4) == 0), "some type holds the corpus max")
  }

  test("stream_freshness: register stream ≡ batch, bit for bit") {
    val batch = Round9Ops10.dqFreshness(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamFreshness(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  // x_t = 0.6 x_{t-1} - 0.3 x_{t-2} + seeded white noise (java.util.Random
  // is algorithm-specified, so the series is deterministic across JVMs).
  // Yule-Walker on n=400 recovers the coefficients approximately.
  test("ts_ar2_forecast: Yule-Walker recovers a planted AR(2)") {
    import spark.implicits._
    val n = 400
    val rng = new java.util.Random(42)
    val x = new Array[Double](n)
    x(0) = 0.5; x(1) = -0.2
    for (t <- 2 until n) {
      val noise = rng.nextGaussian() * 0.8
      x(t) = 0.6 * x(t - 1) - 0.3 * x(t - 2) + noise
    }
    val ev = x.zipWithIndex.map { case (v, i) =>
      (7L, ts(i * 60L), i.toLong, v)
    }.toSeq.toDF("user_id", "ts", "event_id", "value")
    val r = Round9Ops10.tsAr2ForecastDf(ev).collect()(0)
    val (phi1, phi2) = (r.getDouble(5), r.getDouble(6))
    assert(math.abs(phi1 - 0.6) < 0.2, s"phi1=$phi1")
    assert(math.abs(phi2 + 0.3) < 0.2, s"phi2=$phi2")
    Seq(7, 8, 9).foreach(i => assert(!r.isNullAt(i), s"forecast col $i"))
  }

  test("ts_ar2_forecast: degenerate series answer NULL") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 0L, 5.0), (1L, ts(60), 1L, 5.0), (1L, ts(120), 2L, 5.0),
      (2L, ts(0), 0L, 1.0), (2L, ts(60), 1L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Round9Ops10.tsAr2ForecastDf(ev).collect()
    val const = out.find(_.getLong(0) == 1L).get // zero variance
    val short = out.find(_.getLong(0) == 2L).get // n = 2, no lag-2 pair
    Seq(3, 4, 5, 6, 7, 8, 9).foreach { i =>
      assert(const.isNullAt(i), s"const col $i")
    }
    Seq(4, 5, 6, 7, 8, 9).foreach { i =>
      assert(short.isNullAt(i), s"short col $i")
    }
  }

  test("ts_ar2_forecast: corpus run — r1/r2 bounded, stationary fits forecast") {
    val out = Round9Ops10.tsAr2Forecast(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (!r.isNullAt(3)) assert(math.abs(r.getDouble(3)) <= 1.000001)
      if (!r.isNullAt(4)) assert(math.abs(r.getDouble(4)) <= 1.000001)
      if (!r.isNullAt(5)) assert(!r.isNullAt(7), "fit implies forecast")
    }
  }
}
