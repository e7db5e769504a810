package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops19

/** Round-9 batch-19 operators (#344-#345). */
class Round9Ops19Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def dayTs(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0))

  // dst copies src's yesterday state exactly: TE(src->dst) is large,
  // TE(dst->src) near zero (src is its own coin flips).
  test("events_transfer_entropy: a copied-with-lag signal flows one way") {
    import spark.implicits._
    val n = 300
    val rng = new java.util.Random(21)
    val coin = Array.fill(n + 1)(if (rng.nextBoolean()) 10.0 else -10.0)
    val ev = (0 until n).flatMap { i =>
      Seq(("src", dayTs(i), coin(i) + 0.01 * rng.nextGaussian()),
          ("dst", dayTs(i), coin(math.max(i - 1, 0)) + 0.01 * rng.nextGaussian()))
    }.toDF("event_type", "ts", "value")
    val out = Round9Ops19.transferEntropyDf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val fwd = out(("src", "dst"))
    val bwd = out(("dst", "src"))
    assert(fwd > 0.4, s"forward flow dominant (te=$fwd)")
    assert(bwd < 0.05, s"no reverse flow (te=$bwd)")
  }

  test("events_transfer_entropy: corpus run — ordered pair grid, te >= 0") {
    val out = Round9Ops19.eventsTransferEntropy(spark, sf).collect()
    val types = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(out.length == types * (types - 1), "both directions per pair")
    out.foreach { r =>
      assert(r.getDouble(3) >= -1e-9, "transfer entropy is non-negative")
      assert(r.getLong(2) > 0)
    }
  }

  test("mhw_duration_scaling: a single-row law with r2 in [0, 1]") {
    val out = Round9Ops19.mhwDurationScaling(spark, sf).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) > 0, "events detected")
    assert(!r.isNullAt(1) && !r.isNullAt(2))
    val r2 = r.getDouble(3)
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
  }
}
