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
    // every language seen in EITHER role gets a row — zero-TP languages
    // must not vanish from the readout
    val langs = cm.keys.flatMap { case (t, p) => Seq(t, p) }.toSet
    assert(rows.map(_.getString(0)).toSet == langs)
    rows.foreach { r =>
      val lang = r.getString(0)
      val nTrue = cm.filter(_._1._1 == lang).values.sum
      val nPred = cm.filter(_._1._2 == lang).values.sum
      val tp = cm.getOrElse((lang, lang), 0L)
      assert(r.getLong(1) == nTrue && r.getLong(2) == nPred && r.getLong(3) == tp)
      val expP = if (nPred > 0) Parity.r6d(tp.toDouble / nPred) else 0.0
      val expR = if (nTrue > 0) Parity.r6d(tp.toDouble / nTrue) else 0.0
      assert(r.getDouble(4) == expP)
      assert(r.getDouble(5) == expR)
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

  // -------------------------------------------------- events_burstiness

  test("burstiness: bounded in (-1, 1); Fano consistent; driver-side replay for one user") {
    val rows = Round6Ops6.eventsBurstiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 2)
      assert(r.getDouble(3) > 0)
      assert(r.getDouble(4) >= -1e-9) // Fano nonnegative
      if (!r.isNullAt(5))
        assert(r.getDouble(5) > -1.0 - 1e-9 && r.getDouble(5) < 1.0 + 1e-9)
    }
    val uid = rows.head.getLong(0)
    val hs = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .collect().map(_.getLong(0))
    val span = hs.max - hs.min + 1
    val counts = hs.groupBy(identity).map(_._2.length.toLong)
    val mu = hs.length.toDouble / span
    val ex2 = counts.map(c => c * c).sum.toDouble / span
    assert(rows.head.getLong(2) == span)
    assert(rows.head.getDouble(4) == Parity.r6d((ex2 - mu * mu) / mu))
  }

  // -------------------------------------------------- corpus_epoch_plan

  test("epoch plan: grants never exceed targets or the repetition cap; capped flag consistent") {
    val rows = Round6Ops6.corpusEpochPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (avail, target, granted) = (r.getLong(2), r.getLong(5), r.getLong(7))
      assert(granted <= target)
      assert(granted <= avail * Round6Ops6.MaxEpochs)
      assert(r.getBoolean(8) == (target > avail * Round6Ops6.MaxEpochs))
      assert(math.abs(r.getDouble(6) - Parity.r6d(target.toDouble / avail)) < 1e-9)
    }
    // targets approximately exhaust the 2x budget
    val budget = totalTokens * Round6Ops6.EpochBudgetMultiple
    val tgt = rows.map(_.getLong(5)).sum
    assert(math.abs(tgt - budget).toDouble / budget < 1e-3)
    // temperature flattening: under-represented groups get epochs > multiple
    assert(rows.exists(_.getDouble(6) > Round6Ops6.EpochBudgetMultiple))
  }

  // ---------------------------------------------- events_conversion_lag

  test("conversion lag: buckets respect ranges; converters reconcile") {
    val rows = Round6Ops6.eventsConversionLag(spark, sf).collect()
    assert(rows.nonEmpty)
    val valid = Set("a_under_1h", "b_1_6h", "c_7_24h", "d_over_24h")
    rows.foreach { r =>
      assert(valid.contains(r.getString(0)))
      val m = r.getDouble(2)
      r.getString(0) match {
        case "a_under_1h" => assert(m == 0.0)
        case "b_1_6h"     => assert(m >= 1 && m <= 6)
        case "c_7_24h"    => assert(m >= 7 && m <= 24)
        case _            => assert(m > 24)
      }
    }
    val converters = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == converters)
  }

  // ---------------------------------------------- graph_assortativity

  test("assortativity: single row; correlation bounded; driver-side replay") {
    val rows = Round6Ops6.graphAssortativity(spark, sf).collect()
    assert(rows.length == 1)
    val r0 = rows.head
    assert(r0.getLong(0) >= 1 && r0.getLong(1) >= 1)
    if (!r0.isNullAt(3))
      assert(r0.getDouble(3) >= -1.0 - 1e-9 && r0.getDouble(3) <= 1.0 + 1e-9)
    // replay from the collected edge set
    val e = graft.operators.Similarity.knnGraph(spark, sf, 3)
      .select("q_id", "vec_id").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    assert(r0.getLong(0) == deg.size)
    assert(r0.getLong(1) == e.size / 2)
    val xy = e.toSeq.map { case (a, b) => (deg(a).toDouble, deg(b).toDouble) }
    def dsum(vs: Seq[Double]) =
      vs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val m = xy.length.toDouble
    val (sx, sy) = (dsum(xy.map(_._1)), dsum(xy.map(_._2)))
    val (sxy, sxx, syy) = (dsum(xy.map(p => p._1 * p._2)),
      dsum(xy.map(p => p._1 * p._1)), dsum(xy.map(p => p._2 * p._2)))
    val (cxy, cxx, cyy) = (sxy - sx * sy / m, sxx - sx * sx / m, syy - sy * sy / m)
    if (cxx > 0 && cyy > 0)
      assert(r0.getDouble(3) == Parity.r6d(cxy / (math.sqrt(cxx) * math.sqrt(cyy))))
  }

  // ------------------------------------------------ emb_cluster_stability

  test("cluster stability: contingency covers the corpus; ARI replayed exactly from the table") {
    val rows = graft.operators.Similarity.embClusterStability(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n)
    val ari = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == ari))
    assert(ari <= 1.0 + 1e-9)
    // exact replay from the contingency counts
    def c2(x: Long) = x * (x - 1) / 2
    val sij = rows.map(r => c2(r.getLong(2))).sum
    val sa = rows.groupBy(_.getInt(0)).values.map(g => c2(g.map(_.getLong(2)).sum)).sum
    val sb = rows.groupBy(_.getInt(1)).values.map(g => c2(g.map(_.getLong(2)).sum)).sum
    val cn2 = (n * (n - 1)).toDouble / 2
    val expIdx = sa.toDouble * sb / cn2
    val denom = (sa.toDouble + sb) / 2 - expIdx
    assert(ari == Parity.r6d((sij - expIdx) / denom))
    // the deterministic trainer should find broadly similar structure
    // from half the data on this corpus
    assert(ari > 0.1, s"suspiciously unstable clustering: ari=$ari")
  }

  // ---------------------------------------------------- doc_feature_corr

  test("feature corr: six ordered pairs within [-1,1]; chars-tokens pair replayed") {
    val rows = Round6Ops6.docFeatureCorr(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    // length in chars and length in tokens must co-vary strongly
    val ct = rows.find(r => r.getString(0) == "chars" && r.getString(1) == "tokens").get
    assert(ct.getDouble(3) > 0.5, s"chars-tokens corr ${ct.getDouble(3)}")
    // driver replay for that pair, in the operator's bounded units
    // (thousands — Pearson is scale-invariant, the rescale keeps every
    // cross-product below the decimal-cast divergence magnitude)
    val xs = graft.sources.Tables.documents(spark, sf)
      .select(length(col("text")).cast("double").as("c"),
              size(split(trim(col("text")), "\\s+")).cast("double").as("t"))
      .filter(col("t") > 0)
      .collect()
      .map(r => (Parity.r6d(r.getDouble(0) / 1000.0),
                 Parity.r6d(r.getDouble(1) / 1000.0)))
    def dsum(vs: Seq[Double]) =
      vs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val nn = xs.length.toDouble
    val (sx, sy) = (dsum(xs.map(_._1)), dsum(xs.map(_._2)))
    val (sxy, sxx, syy) = (dsum(xs.map(p => p._1 * p._2)),
      dsum(xs.map(p => p._1 * p._1)), dsum(xs.map(p => p._2 * p._2)))
    val (cxy, cxx, cyy) = (sxy - sx * sy / nn, sxx - sx * sx / nn, syy - sy * sy / nn)
    assert(ct.getLong(2) == xs.length)
    assert(ct.getDouble(3) == Parity.r6d(cxy / (math.sqrt(cxx) * math.sqrt(cyy))))
  }
}
