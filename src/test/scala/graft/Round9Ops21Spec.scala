package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops21

/** Round-9 batch-21 operators (#348-#349). */
class Round9Ops21Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // N(50, 1)-ish values: the percentile CI should cover the sample mean
  // and have width ~4·sd/sqrt(n).
  test("events_bootstrap_ci: interval covers the mean with a plausible width") {
    import spark.implicits._
    val rng = new java.util.Random(33)
    val ev = (0L until 400L).map(i => (i, "m", 50.0 + rng.nextGaussian()))
      .toDF("event_id", "event_type", "value")
    val r = Round9Ops21.bootstrapCiDf(ev, 100).collect()(0)
    val (mean, se, lo, hi) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
    assert(r.getLong(6) == 100, "all replicas materialize")
    assert(lo < mean && mean < hi, "CI covers the sample mean")
    assert(se > 0.02 && se < 0.15, s"bootstrap SE near 1/sqrt(400) = 0.05: $se")
    assert(hi - lo > 2 * se, "percentile interval wider than ±1 SE")
    assert(hi - lo < 8 * se, "percentile interval not degenerate")
  }

  test("events_bootstrap_ci: corpus run — ordered intervals per type") {
    val out = Round9Ops21.eventsBootstrapCi(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(5), "lo <= hi")
      assert(r.getDouble(3) >= 0.0)
      assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5),
        "mean inside its own CI")
    }
  }

  test("stream_bootstrap_ci: register stream ≡ batch, bit for bit") {
    val batch = Round9Ops21.eventsBootstrapCi(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamBootstrapCi(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  test("events_markov_stationary: sums to 1 and matches empirical occupancy") {
    val out = Round9Ops21.eventsMarkovStationary(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"probability mass conserved: $total")
    out.foreach { r =>
      assert(r.getDouble(1) >= 0.0)
      assert(r.getDouble(3) < 0.05,
        s"ergodic chain: stationary ≈ empirical (gap ${r.getDouble(3)})")
    }
  }

  // A biased 2-state chain: a->b always; b->a w.p. 1/2, b->b w.p. 1/2.
  // Stationary solves pi = piP -> pi(a) = 1/3, pi(b) = 2/3. A state with
  // no outgoing row keeps its mass (absorbing convention).
  test("events_markov_stationary: hand chains land on the exact fixed point") {
    import spark.implicits._
    val trans = Seq(
      ("a", "b", 10L, 1.0),
      ("b", "a", 5L, 0.5), ("b", "b", 5L, 0.5)
    ).toDF("prev", "next", "n", "prob")
    val out = Round9Ops21.stationaryFromTrans(trans, 24).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 1.0 / 3) < 1e-4, s"pi(a)=${out("a")}")
    assert(math.abs(out("b") - 2.0 / 3) < 1e-4, s"pi(b)=${out("b")}")
    // absorbing: c only ever receives -> all mass drains into c
    val absorbing = Seq(("a", "c", 1L, 1.0), ("c", "c", 1L, 1.0))
      .toDF("prev", "next", "n", "prob")
    val out2 = Round9Ops21.stationaryFromTrans(absorbing, 24).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2("c") > 0.999 && out2("a") < 1e-3)
  }
}
