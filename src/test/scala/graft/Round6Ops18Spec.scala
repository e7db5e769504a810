package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round6Ops16, Round6Ops18}

/** Invariants + reconciliations for round-6 batch 35 (#246-#249). */
class Round6Ops18Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------- stream_load_heatmap

  test("load heatmap: streamed cell registers are bit-identical to batch") {
    val batch = Round6Ops16.eventsLoadHeatmap(spark, sf).collect()
    val streamed = graft.streaming.Streaming.streamLoadHeatmap(spark, sf)
      .collect()
    assert(batch.map(_.toString).toSeq == streamed.map(_.toString).toSeq)
  }

  // -------------------------------------------------- orders_revenue_bridge

  test("revenue bridge: the identity closes exactly on every month") {
    val rows = Round6Ops18.ordersRevenueBridge(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // delta = rev - rev_prev and qty + price + mix = delta, to the cent
      assert(math.abs(r.getDouble(3) -
        Parity.r6d(r.getDouble(1) - r.getDouble(2))) < 0.011)
      assert(math.abs(r.getDouble(5) + r.getDouble(6) + r.getDouble(7) -
        r.getDouble(3)) < 0.011, s"bridge must close at ${r.getDate(0)}")
    }
    // consecutive months chain: this month's rev_prev is last month's rev
    val byM = rows.map(r => r.getDate(0).toLocalDate -> r).toMap
    byM.foreach { case (m, r) =>
      byM.get(m.minusMonths(1)).foreach { prev =>
        assert(r.getDouble(2) == prev.getDouble(1), s"chain at $m")
      }
    }
  }

  test("revenue bridge: pure volume and pure price months decompose cleanly") {
    import spark.implicits._
    // month 1: part A, 10 units @ 5.0; month 2: 20 units @ 5.0 (volume
    // only); month 3: 20 units @ 7.0 (price only)
    def li(m: Int, q: Double, unit: Double) =
      (1L, java.sql.Timestamp.valueOf(f"2024-0$m-15 00:00:00"), q, q * unit)
    val df = Seq(li(1, 10, 5.0), li(2, 20, 5.0), li(3, 20, 7.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
    // route through a temp dir via the dir-less core? the op is dir-bound,
    // so replay its internals: unit price = rev/q per month
    val pm = df.groupBy(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(sum(col("l_quantity")).as("q"), sum(col("l_extendedprice")).as("rev"))
      .collect().map(r => r.getDate(1).toLocalDate.getMonthValue ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // month 2 vs 1: qty effect = (20-10)*5 = 50, price effect 0
    assert((pm(2)._1 - pm(1)._1) * (pm(1)._2 / pm(1)._1) == 50.0)
    assert(pm(2)._1 * (pm(2)._2 / pm(2)._1 - pm(1)._2 / pm(1)._1) == 0.0)
    // month 3 vs 2: qty effect 0, price effect = 20*(7-5) = 40
    assert((pm(3)._1 - pm(2)._1) * (pm(2)._2 / pm(2)._1) == 0.0)
    assert(pm(3)._1 * (pm(3)._2 / pm(3)._1 - pm(2)._2 / pm(2)._1) == 40.0)
  }

  // ------------------------------------------------------- emb_cluster_nmi

  test("nmi: cells reconcile; constants shared on every row; driver replay") {
    val rows = Round6Ops18.embClusterNmi(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n)
    val nmi = rows.head.getDouble(6)
    rows.foreach { r =>
      assert(r.getDouble(3) == rows.head.getDouble(3))
      assert(r.getDouble(6) == nmi)
    }
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-6, s"nmi $nmi")
    // driver replay from the emitted contingency cells
    def dec(xs: Seq[Double]) =
      xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val cells = rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val nC = cells.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    val nL = cells.groupBy(_._2).map { case (k, g) => k -> g.map(_._3).sum }
    val nd = n.toDouble
    val mi = Parity.r6d(dec(cells.toSeq.map { case (c, l, ncl) =>
      Parity.r6d((ncl / nd) *
        Parity.r6d(math.log(nd * ncl / (nC(c).toDouble * nL(l)))))
    }))
    val hC = Parity.r6d(dec(cells.toSeq.map { case (c, _, ncl) =>
      Parity.r6d(-(ncl / nd) * Parity.r6d(math.log(nC(c) / nd)))
    }))
    val hL = Parity.r6d(dec(cells.toSeq.map { case (_, l, ncl) =>
      Parity.r6d(-(ncl / nd) * Parity.r6d(math.log(nL(l) / nd)))
    }))
    assert(rows.head.getDouble(3) == mi)
    assert(rows.head.getDouble(4) == hC && rows.head.getDouble(5) == hL)
    assert(nmi == Parity.r6d(mi / math.sqrt(hC * hL)))
  }

  test("nmi: perfect agreement scores 1, independence scores ~0") {
    import spark.implicits._
    val perfect = (0 until 60).map(i => (i.toLong, i % 3, i % 3))
    val p = Round6Ops18.embClusterNmiOf(
        perfect.toDF("vec_id", "cluster", "label")).collect().head
    assert(math.abs(p.getDouble(6) - 1.0) < 1e-4)
    // independent: cluster = i % 2, label = (i / 2) % 3 over a full cycle
    val indep = (0 until 60).map(i => (i.toLong, i % 2, (i / 2) % 3))
    val q = Round6Ops18.embClusterNmiOf(
        indep.toDF("vec_id", "cluster", "label")).collect().head
    assert(q.getDouble(6) < 0.01, s"independent grids: ${q.getDouble(6)}")
  }

  // ------------------------------------------------------- dq_vector_dupes

  test("vector dupes: shipped table is distinct; exact copies are counted") {
    val row = Round6Ops18.dqVectorDupes(spark, sf).collect().head
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == n && row.getLong(2) == 0 && row.getLong(3) == 0)
    assert(row.getDouble(5) == 0.0)
    import spark.implicits._
    val v = Array(1f, 2f, 3f)
    val w = Array(9f, 8f, 7f)
    val near = Array(1f, 2f, 3.0001f)    // near but NOT equal: no group
    val emb = Seq((1L, v), (2L, v), (3L, v), (4L, w), (5L, near))
      .toDF("vec_id", "embedding")
    val out = Round6Ops18.dqVectorDupesDf(emb).collect().head
    assert(out.getLong(0) == 5 && out.getLong(1) == 3)
    assert(out.getLong(2) == 1 && out.getLong(3) == 2)
    assert(out.getLong(4) == 3)
    assert(out.getDouble(5) == Parity.r6d(2.0 / 5))
  }
}
