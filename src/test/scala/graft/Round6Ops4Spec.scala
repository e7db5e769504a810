package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round6Ops4, Similarity2, TextOps2}

/** Invariants + reconciliations for round-6 batch 13 (#161-#164). */
class Round6Ops4Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- orders_benford

  test("benford: full digit spine, counts reconcile with orders, shares and chi2 are coherent") {
    val rows = Round6Ops4.ordersBenford(spark, sf).orderBy("digit").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    // observed and expected shares both sum to ~1
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // expected shares are the 6dp Benford constants, monotone decreasing
    val exp = rows.map(_.getDouble(3))
    assert(exp.toSeq == Round6Ops4.BenfordExp.map(_._2))
    assert(exp.zip(exp.tail).forall { case (a, b) => b < a })
    // one chi2 total everywhere; equals the sum of the per-digit terms
    val tot = rows.head.getDouble(5)
    assert(rows.forall(r => r.getDouble(5) == tot))
    assert(math.abs(rows.map(_.getDouble(4)).sum - tot) < 1e-5)
    assert(rows.forall(_.getDouble(4) >= 0.0))
  }

  // ---------------------------------------------------------- emb_anisotropy

  test("anisotropy: one scope per label plus ALL; identity stays in cosine bounds; ALL n reconciles") {
    val rows = Similarity2.embAnisotropy(spark, sf).collect()
    val byScope = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("label").distinct().collect().map(_.getInt(0).toString).toSet
    assert(byScope.keySet == labels + "ALL")
    assert(byScope("ALL")._1 ==
      labels.toSeq.map(l => byScope(l)._1).sum)
    rows.foreach { r =>
      val (mpc, cn) = (r.getDouble(2), r.getDouble(3))
      assert(mpc >= -1.0 - 1e-9 && mpc <= 1.0 + 1e-9)
      // centroid of unit vectors has norm <= 1
      assert(cn >= 0.0 && cn <= 1.0 + 1e-9)
      // identity consistency: mean pairwise cosine ~= (n*cn^2*n - n)/(n(n-1))
      val n = r.getLong(1).toDouble
      val approx = (n * n * cn * cn - n) / (n * (n - 1))
      assert(math.abs(mpc - approx) < 1e-3,
        s"scope ${r.getString(0)}: $mpc vs identity $approx")
    }
  }

  // ---------------------------------------- corpus_tokenizer_fertility

  test("fertility: doc counts reconcile; bytes dominate chars; ratios are consistent") {
    val rows = TextOps2.corpusTokenizerFertility(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      val (nChars, nBytes, nWs) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nBytes >= nChars)          // UTF-8 never shrinks
      assert(nChars >= nWs)             // every ws token costs >= 1 char
      assert(r.getDouble(6) >= 1.0)     // chars per token
      assert(r.getDouble(7) >= r.getDouble(6) - 1e-9) // bytes/token >= chars/token
      assert(math.abs(r.getDouble(8) - nWs.toDouble / r.getLong(1)) < 1e-3)
    }
  }

  // ---------------------------------------- events_brier_calibration

  test("brier calibration: bins bound their mean predictions; one overall score; users reconcile") {
    val rows = Round6Ops4.eventsBrierCalibration(spark, sf).orderBy("bin").collect()
    assert(rows.nonEmpty)
    val brier = rows.head.getDouble(5)
    assert(rows.forall(r => r.getDouble(5) == brier))
    assert(brier >= 0.0 && brier <= 1.0)
    rows.foreach { r =>
      val (bin, mp, fp) = (r.getInt(0), r.getDouble(2), r.getDouble(3))
      assert(bin >= 0 && bin <= 9)
      // mean prediction lies inside its decile (bin 9 is closed above)
      assert(mp >= bin / 10.0 - 1e-9)
      if (bin < 9) assert(mp < (bin + 1) / 10.0 + 1e-9)
      assert(fp >= 0.0 && fp <= 1.0)
      assert(math.abs(r.getDouble(4) - Parity.r6d(fp - mp)) < 1e-9)
    }
    // every first-half-active user is predicted exactly once
    val ev = graft.sources.Tables.events(spark, sf)
    import org.apache.spark.sql.functions._
    val us = Parity.epochUs(col("ts"))
    val mid = ev.agg(expr(
      s"(min(${"unix_micros(cast(ts as timestamp))"}) + max(${"unix_micros(cast(ts as timestamp))"})) div 2")
      .as("m")).collect()(0).getLong(0)
    val nPredicted = ev.filter(us <= mid).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nPredicted)
  }

  // ------------------------------------ events_hod_dow_independence

  test("hod/dow independence: dense 168-cell grid, margins reconcile, chi2 total = sum of terms") {
    val rows = Round6Ops4.eventsHodDowIndependence(spark, sf)
      .orderBy("dow", "hod").collect()
    assert(rows.length == 168)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      (for (d <- 0 to 6; h <- 0 to 23) yield (d, h)))
    val n = rows.map(_.getLong(2)).sum
    assert(n == graft.sources.Tables.events(spark, sf).count())
    // expected counts reproduce the grand total
    assert(math.abs(rows.map(_.getDouble(3)).sum - n) < 1e-3)
    val tot = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == tot))
    assert(math.abs(rows.map(_.getDouble(5)).sum - tot) < 1e-4)
    rows.filter(_.getDouble(3) > 0).foreach { r =>
      assert(math.abs(r.getDouble(4) - Parity.r6d(r.getLong(2) / r.getDouble(3))) < 1e-9)
    }
  }

  // -------------------------------------------- orders_dup_payments

  test("dup payments: every injected replay is caught; pairs share customer and cents; gaps bounded") {
    val rows = Round6Ops4.ordersDupPayments(spark, sf).collect()
    val orders = graft.sources.Tables.orders(spark, sf)
    import org.apache.spark.sql.functions._
    val injected = orders
      .filter(col("o_orderkey") % Round6Ops4.ReplayEvery === 0)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    // recall: each replayed order appears as (orig, orig + offset)
    val caught = rows.map(r => (r.getLong(1), r.getLong(2))).toSet
    injected.foreach { k =>
      assert(caught.contains((k, k + Round6Ops4.ReplayKeyOffset)),
        s"replayed order $k not caught")
    }
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= Round6Ops4.DupPaymentWindowDays)
      assert(r.getString(5) == (if (r.getLong(4) == 0) "exact" else "suspect"))
    }
  }

  // ------------------------------------- dedup_minhash_band_curve

  test("band curve: stricter bands only lose pairs (nesting); rates and analytic stay in [0,1]") {
    val rows = graft.operators.LshDedup.dedupMinhashBandCurve(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
      (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    byKey.foreach { case ((_, _, _), (nPairs, nCaught, rate, ana)) =>
      assert(nCaught >= 0 && nCaught <= nPairs)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(ana >= 0.0 && ana <= 1.0)
    }
    // same pair population in every config's binning
    val bins = byKey.keys.map(_._3).toSet
    bins.foreach { bin =>
      val n32 = byKey.get((32, 2, bin)).map(_._1)
      assert(n32 == byKey.get((16, 4, bin)).map(_._1))
      assert(n32 == byKey.get((8, 8, bin)).map(_._1))
      // a full 8-row band match implies its 4- and 2-row sub-bands match
      val c = (r: Int, b: Int) => byKey((b, r, bin))._2
      assert(c(2, 32) >= c(4, 16) && c(4, 16) >= c(8, 8))
    }
  }

  // --------------------------------- emb_centroid_classifier_eval

  test("centroid classifier: shares partition each true label; accuracy equals the diagonal mass") {
    val rows = graft.operators.Similarity3.embCentroidClassifierEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val acc = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == acc))
    val total = rows.map(_.getLong(2)).sum
    val diag = rows.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    assert(math.abs(acc - Parity.r6d(diag.toDouble / total)) < 1e-9)
    rows.groupBy(_.getInt(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
    // every held-out vector is classified exactly once
    val nTest = graft.sources.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.expr("vec_id % 2 = 1")).count()
    assert(total == nTest)
  }

  // --------------------------------------------- graph_cluster_coeff

  test("cluster coeff: bounded in [0,1], zero below degree 2, exact vs a driver-side recount") {
    val rows = graft.operators.Graph.graphClusterCoeff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      if (r.getLong(1) < 2) assert(r.getDouble(3) == 0.0)
      val maxT = r.getLong(1) * (r.getLong(1) - 1) / 2
      assert(r.getLong(2) <= maxT)
    }
    // exact recount on the collected edge set (test SF is small)
    val e = graft.operators.Similarity.knnGraph(spark, sf, 3)
      .select("q_id", "vec_id").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val adj = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    rows.foreach { r =>
      val nbrs = adj.getOrElse(r.getLong(0), Set.empty[Long]).toSeq.sorted
      val tri = (for (i <- nbrs.indices; j <- i + 1 until nbrs.size
                      if e.contains((nbrs(i), nbrs(j)))) yield 1).size
      assert(r.getLong(1) == nbrs.size && r.getLong(2) == tri,
        s"node ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), want (${nbrs.size}, $tri)")
    }
  }

  // --------------------------------------------- supplier_herfindahl

  test("herfindahl: one row per active region; HHI bounded by [10000/n, 10000]; top share consistent") {
    val rows = graft.operators.Analytics3.supplierHerfindahl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(n > 0)
      assert(hhi >= 10000.0 / n - 1.0 && hhi <= 10000.0 + 1.0)
      assert(top > 0.0 && top <= 1.0)
      // the max share alone contributes top² to the (scaled) HHI
      assert(hhi >= top * top * 10000 - 1.0)
    }
  }

  // ------------------------------------------------ dedup_band_cost

  test("band cost: coarser bands cost fewer buckets and fewer candidate pairs; caps only reduce") {
    val rows = graft.operators.LshDedup.dedupBandCost(spark, sf)
      .orderBy("rows_per_band").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((32, 2), (16, 4), (8, 8)))
    rows.foreach { r =>
      assert(r.getLong(5) >= r.getLong(6)) // cap never adds pairs
      assert(r.getLong(3) <= r.getLong(2)) // collision buckets <= buckets
    }
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(4) >= 1))
    // stricter bands (more of them, fewer rows each) generate at least as many raw pairs
    val raw = rows.map(_.getLong(5))
    assert(raw(0) >= raw(1) && raw(1) >= raw(2))
  }

  // ------------------------------------------------ ts_holt_winters

  test("holt-winters: 7 forecasts per qualifying series; level/trend replayed by a driver-side fold") {
    val rows = graft.operators.Round6Ops.tsHoltWinters(spark, sf)
      .orderBy("user_id", "h").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(4)).toSeq.sorted == (1 to 7))
      assert(g.map(_.getDouble(2)).distinct.length == 1) // one level per series
    }
    // driver-side replay for one series
    val uid = rows.head.getLong(0)
    val xs = graft.operators.Mhw.daily(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id") === uid)
      .orderBy("d").select("sst").collect().map(_.getDouble(0))
    val r6 = Parity.r6d _
    val l0 = r6(xs.take(7).foldLeft(0.0)(_ + _) / 7)
    var (l, b) = (l0, 0.0)
    var sArr = xs.take(7).map(x => r6(x - l0))
    xs.drop(7).foreach { x =>
      val sm = sArr.head
      val nl = r6(0.5 * (x - sm) + 0.5 * (l + b))
      val nb = r6(0.3 * (nl - l) + 0.7 * b)
      val ns = r6(0.2 * (x - nl) + 0.8 * sm)
      sArr = sArr.tail :+ ns; l = nl; b = nb
    }
    val got = rows.filter(_.getLong(0) == uid)
    assert(got.head.getDouble(2) == l && got.head.getDouble(3) == b)
    (1 to 7).foreach { h =>
      assert(got(h - 1).getDouble(5) == r6(l + h * b + sArr(h - 1)),
        s"h=$h forecast mismatch")
    }
  }

  // ------------------------------------------------ text_readability

  test("readability: counters positive, scores consistent with the published formulas") {
    val rows = graft.operators.TextOps2.textReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, se, sy) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(w > 0 && se >= 1)
      val ease = 206.835 - 1.015 * (w.toDouble / se) - 84.6 * (sy.toDouble / w)
      val grade = 0.39 * (w.toDouble / se) + 11.8 * (sy.toDouble / w) - 15.59
      assert(math.abs(r.getDouble(4) - Parity.r6d(ease)) < 1e-9)
      assert(math.abs(r.getDouble(5) - Parity.r6d(grade)) < 1e-9)
    }
  }

  // ------------------------------------------------ knn_exposure_bias

  test("exposure bias: shares sum to 1 on both axes; retrieved slots reconcile with k x queries") {
    val rows = graft.operators.Similarity3.knnExposureBias(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    assert(rows.map(_.getLong(2)).sum == 25L) // 5 queries x k=5
    assert(rows.map(_.getLong(1)).sum ==
      graft.sources.Tables.embeddings(spark, sf).count())
    rows.filter(_.getLong(2) > 0).foreach { r =>
      assert(!r.isNullAt(5) && r.getDouble(5) > 0.0)
    }
  }

  // -------------------------------------------------- mm_integrity

  test("mm integrity: corruption accounting matches the injected fault rule exactly") {
    val rows = graft.multimodal.Multimodal.mmIntegrity(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions._
    assert(rows.map(_.getLong(2)).sum == docs.count())
    // expected mismatches: doc_id % 17 == 0 AND payload not truncated
    val expMismatch = docs
      .filter(col("doc_id") % graft.multimodal.Multimodal.CorruptEvery === 0)
      .filter(octet_length(col("text")) + 4 >= graft.multimodal.Multimodal.TruncatedBelowBytes)
      .count()
    assert(rows.map(_.getLong(4)).sum == expMismatch)
    rows.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) + r.getLong(5) == r.getLong(2))
      val qr = (r.getLong(2) - r.getLong(3)).toDouble / r.getLong(2)
      assert(math.abs(r.getDouble(6) - Parity.r6d(qr)) < 1e-9)
    }
  }
}
