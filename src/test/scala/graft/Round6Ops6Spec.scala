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

  // ----------------------------------------------------- doc_vocab_drift

  test("vocab drift: top-K + residual cover both halves exactly; JS bounded by ln 2") {
    val rows = Round6Ops6.docVocabDrift(spark, sf).collect()
    assert(rows.length <= Round6Ops6.VocabDriftTopK + 1)
    assert(rows.count(_.getString(0) == "__other__") == 1)
    // full-mass accounting on both sides
    val totalToks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(rows.map(_.getLong(1)).sum + rows.map(_.getLong(2)).sum == totalToks)
    val js = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == js))
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-6)
    // each pair term is >= 0 analytically; the 6dp ln/share rounding
    // can push a stored term one ulp-of-rounding below zero
    rows.foreach(r => assert(r.getDouble(5) >= -2e-6))
    // identical halves would give 0; hash halves of one corpus stay small
    assert(js < 0.2, s"suspicious drift $js between random halves")
  }

  // ------------------------------------------------- events_activity_gini

  test("activity gini: Lorenz curve is convex-consistent; gini replayed from user counts") {
    val rows = Round6Ops6.eventsActivityGini(spark, sf)
      .orderBy("events_per_user").collect()
    assert(rows.nonEmpty)
    val gini = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == gini))
    assert(gini >= 0.0 && gini < 1.0)
    // cumulative shares are nondecreasing and end at 1
    val cp = rows.map(_.getDouble(3)); val cm = rows.map(_.getDouble(4))
    assert(cp.zip(cp.tail).forall { case (a, b) => b >= a })
    assert(cm.zip(cm.tail).forall { case (a, b) => b >= a })
    assert(math.abs(cp.last - 1.0) < 1e-4 && math.abs(cm.last - 1.0) < 1e-4)
    // Lorenz below diagonal: cumulative mass share <= cumulative pop share
    rows.foreach(r => assert(r.getDouble(4) <= r.getDouble(3) + 1e-9))
    // exact driver-side replay from raw per-user counts
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").count().collect().map(_.getLong(1)).sorted
    val n = counts.length.toDouble
    val tot = counts.sum.toDouble
    // trapezoidal grouped Gini over value buckets (same identity)
    val byVal = counts.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.length) }
    var cumMass = 0L
    val terms = byVal.map { case (v, cnt) =>
      val prev = cumMass; cumMass += v * cnt
      Parity.r6d((cnt / n) * (prev / tot + cumMass / tot))
    }
    val dec = terms.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(gini == Parity.r6d(1.0 - dec.toDouble))
  }
}
