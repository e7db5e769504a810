package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops16

/** Round-9 batch-16 operators (#338-#339). */
class Round9Ops16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def dayTs(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0))

  test("stream_overdispersion: register stream ≡ batch, bit for bit") {
    val batch = graft.operators.Round9Ops14
      .eventsOverdispersion(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamOverdispersion(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  // b_t = a_{t-2} + tiny noise: signal 'a' leads 'b' by 2 days. The pair
  // (a, b) has type_a = "a", so corr(a_t, b_{t+2}) peaks at lag_k = -2
  // (ybk = lead(b, 2)) -> verdict a_leads.
  test("ts_lead_lag: a planted 2-day lead is found at the right lag") {
    import spark.implicits._
    val n = 120
    val rng = new java.util.Random(5)
    val sig = Array.fill(n + 2)(rng.nextGaussian() * 10)
    val ev = (0 until n).flatMap { i =>
      Seq(("a", dayTs(i), sig(i + 2) + 0.01 * rng.nextGaussian()),
          ("b", dayTs(i), sig(i) + 0.01 * rng.nextGaussian()))
    }.toDF("event_type", "ts", "value")
    val out = Round9Ops16.tsLeadLagDf(ev).collect()
    assert(out.length == 7, "one row per lag")
    val best = out.head
    assert(best.getInt(5) == -2, s"best lag ${best.getInt(5)}")
    assert(best.getDouble(6) > 0.95, "near-perfect correlation at the lead")
    assert(best.getString(7) == "a_leads")
    // the lag-0 correlation is far weaker than the peak
    val lag0 = out.find(_.getInt(2) == 0).get
    assert(math.abs(lag0.getDouble(4)) < 0.5)
  }

  test("ts_lead_lag: corpus run — 7 rows per pair, one consistent verdict each") {
    val out = Round9Ops16.tsLeadLag(spark, sf).collect()
    assert(out.nonEmpty && out.length % 7 == 0)
    out.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, rows) =>
        assert(rows.map(_.getInt(5)).distinct.length == 1,
          "best_lag constant within a pair")
        assert(rows.map(_.getString(7)).distinct.length == 1)
        rows.foreach(r => if (!r.isNullAt(4))
          assert(math.abs(r.getDouble(4)) <= 1.000001))
    }
  }
}
