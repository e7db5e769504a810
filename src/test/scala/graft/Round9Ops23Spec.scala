package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops23

/** Round-9 batch-23 operators (#352-#353). */
class Round9Ops23Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("stream_modality_balance: register stream ≡ batch, bit for bit") {
    val batch = graft.operators.Round6Ops11
      .mmModalityBalance(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamModalityBalance(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  test("orders_fulfillment_lag: quantiles ordered, lags consistent with the join") {
    import org.apache.spark.sql.functions._
    val out = Round9Ops23.ordersFulfillmentLag(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "p50 <= p95")
      assert(r.getDouble(3) <= r.getInt(5) + 1e-9, "p95 <= max")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // order inventory: every order with at least one line item is graded
    val graded = out.map(_.getLong(1)).sum
    val withLines = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.lineitem(spark, sf)
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(graded == withLines)
  }
}
