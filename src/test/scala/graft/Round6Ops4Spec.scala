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
