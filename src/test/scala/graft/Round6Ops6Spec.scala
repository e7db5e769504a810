package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops6

/** Invariants + reconciliations for round-6 batch 20 (#188-#191). */
class Round6Ops6Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------- text_langid_eval

  test("langid eval: metrics reconcile with the #23 confusion matrix") {
    val rows = Round6Ops6.textLangidEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val cm = graft.operators.TextOps.textLangid(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val acc = rows.head.getDouble(7)
    assert(rows.forall(_.getDouble(7) == acc))
    val total = cm.values.sum
    val diag = cm.filter { case ((t, p), _) => t == p }.values.sum
    assert(acc == Parity.r6d(diag.toDouble / total))
    rows.foreach { r =>
      val lang = r.getString(0)
      val nTrue = cm.filter(_._1._1 == lang).values.sum
      val nPred = cm.filter(_._1._2 == lang).values.sum
      val tp = cm.getOrElse((lang, lang), 0L)
      assert(r.getLong(1) == nTrue && r.getLong(2) == nPred && r.getLong(3) == tp)
      assert(r.getDouble(4) == Parity.r6d(tp.toDouble / nPred))
      assert(r.getDouble(5) == Parity.r6d(tp.toDouble / nTrue))
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  // --------------------------------------------- events_markov_entropy

  test("markov entropy: per-state entropies bounded by ln|types|; rate is their occupancy mix") {
    val rows = Round6Ops6.eventsMarkovEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTypes = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().count()
    val hMax = math.log(nTypes.toDouble) + 1e-6
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= hMax)
    }
    val rate = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == rate))
    val mix = rows.map(r => Parity.r6d(r.getDouble(2) * r.getDouble(3)))
      .map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(rate == Parity.r6d(mix.toDouble))
  }

  // ------------------------------------------- lineitem_returns_pchart

  test("p-chart: limits bracket the center line; flags match the limits; totals reconcile") {
    val rows = Round6Ops6.lineitemReturnsPchart(spark, sf).collect()
    assert(rows.nonEmpty)
    val pbar = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == pbar))
    val li = graft.sources.Tables.lineitem(spark, sf)
    assert(rows.map(_.getLong(1)).sum == li.count())
    assert(rows.map(_.getLong(2)).sum ==
      li.filter(col("l_returnflag") === "R").count())
    rows.foreach { r =>
      assert(r.getDouble(5) <= pbar + 1e-9) // lcl <= pbar
      assert(r.getDouble(6) >= pbar - 1e-9) // ucl >= pbar
      assert(r.getDouble(5) >= 0.0)
      val ooc = r.getDouble(3) > r.getDouble(6) || r.getDouble(3) < r.getDouble(5)
      assert(r.getBoolean(7) == ooc)
    }
  }

  // --------------------------------------------- orders_seasonal_index

  test("seasonal index: twelve months; indices average to 1; revenue reconciles") {
    val rows = Round6Ops6.ordersSeasonalIndex(spark, sf).orderBy("month").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 12))
    val idxMean = rows.map(_.getDouble(3)).sum / 12
    assert(math.abs(idxMean - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(2) > 0)
      assert(r.getDouble(3) > 0)
    }
  }
}
