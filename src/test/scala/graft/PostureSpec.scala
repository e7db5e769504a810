package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics2, Mhw, Round6Ops19, Round6Ops9, SimilarityPq}

/** Deployment-posture pins (round 7): every scale knob in [[Hints]] must
  * keep BOTH postures executable — the exact/test posture bit-matches the
  * oracle (CORRECTNESS gate), and the degraded/100 TB posture is pinned
  * here: the expensive plan shape is actually gone (not just documented)
  * and the output stays within its error contract. Also pins the two
  * round-7 plan fixes (ann_pq heap shortlist, vocab-coverage value
  * buckets) so a refactor can't regress them to corpus-sized sorts. */
class PostureSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // ------------------------------------------------------------- ann_pq

  test("ann_pq: ADC shortlist is a bounded heap — the only window is the ≤shortlist re-rank") {
    val df = SimilarityPq.annPq(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.size == 1,
      s"expected exactly the final re-rank window, got ${windows.size}")
    val p = plan(df)
    assert(p.contains("collect_top_k"))
    assert(p.contains("partial_collect_top_k"), "shortlist heaps must combine map-side")
  }

  // ------------------------------------------- corpus_source_overlap gate

  test("source overlap: exactAudit=false drops the shingle self-join, estimates unchanged") {
    def joinsOnHash(df: DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case j: BaseJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.references.exists(_.name == "h")) => j
      }.size

    val on = Round6Ops9.corpusSourceOverlap(spark, sf)
    assert(joinsOnHash(on) >= 1, "default posture keeps the exact-verify join")
    val onRows = on.collect()

    withConf(Hints.ExactAudit, "false") {
      val off = Round6Ops9.corpusSourceOverlap(spark, sf)
      assert(joinsOnHash(off) == 0,
        "estimate-only posture must never join on the shingle hash")
      val offRows = off.collect()
      assert(offRows.length == onRows.length)
      val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getString(1))
      val byKey = onRows.map(r => key(r) -> r).toMap
      offRows.foreach { r =>
        val ex = byKey(key(r))
        // sketch columns bit-identical; exact columns null in the
        // degraded posture (they're audit-only)
        for (c <- Seq("nd_a", "nd_b", "jaccard_est", "union_est", "inter_est"))
          assert(r.getAs[Any](c) == ex.getAs[Any](c), s"column $c diverged")
        assert(r.isNullAt(r.fieldIndex("inter_exact")))
        assert(r.isNullAt(r.fieldIndex("union_exact")))
      }
    }
  }

  // ------------------------------------------- text_vocab_coverage buckets

  test("vocab coverage: no vocabulary-wide rank — value-bucket identity, no row_number anywhere") {
    val df = Round6Ops19.textVocabCoverage(spark, sf)
    val p = plan(df)
    assert(!p.contains("row_number"),
      "coverage must rank frequency buckets, never every vocab row")
    // the one remaining total-order window runs over the bucket table:
    // distinct frequency VALUES, Zipf-bounded ≪ |vocab| ≪ corpus
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.size == 1)
    // cross-engine value check is the CORRECTNESS gate; here pin the
    // identity against a direct driver replay at tiny SF
    val toks = graft.sources.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split(" ", -1))
    val byType = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ranked = byType.toSeq.sortBy { case (w, c) => (-c, w) }
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    for (k <- Round6Ops19.VocabCutoffs) {
      val row = rows(k.toLong)
      assert(row.getAs[Long]("vocab_size") == byType.size)
      assert(row.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(row.getAs[Long]("tokens_covered") == ranked.take(k).map(_._2).sum)
    }
  }

  // ------------------------------------------------ approxQuantiles posture

  test("approxQuantiles=true: threshold chain and percentile family run sketches, no collect_list") {
    withConf(Hints.ApproxQuantiles, "true") {
      for (df <- Seq(Mhw.thresholdBpSmooth(spark, sf),
                     Mhw.legacyClimThresh(Mhw.daily(spark, sf)),
                     Analytics2.eventsPercentiles(spark, sf))) {
        val p = plan(df)
        assert(p.contains("approx_percentile"), "sketch path must be active")
        assert(!p.contains("collect_list"),
          "sketch posture must not materialize per-group sample arrays")
      }
    }
  }

  test("approxQuantiles=true: events percentiles stay inside a 3-order-stat bracket of exact") {
    val exactRows = Analytics2.eventsPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = graft.sources.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    withConf(Hints.ApproxQuantiles, "true") {
      val approxRows = Analytics2.eventsPercentiles(spark, sf).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(approxRows.keySet == exactRows.keySet)
      for ((t, ar) <- approxRows; vs = vals(t); n = vs.length;
           (c, p) <- Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)) {
        val h = p * (n - 1)
        val lo = vs(math.max(0, math.floor(h).toInt - 1))
        val hi = vs(math.min(n - 1, math.ceil(h).toInt + 1))
        val v = ar.getAs[Double](c)
        assert(v >= lo - 1e-9 && v <= hi + 1e-9,
          s"$t $c approx $v outside order-stat bracket [$lo, $hi]")
        // counts (non-quantile columns) must not change with the posture
        assert(ar.getAs[Long]("n") == exactRows(t).getAs[Long]("n"))
      }
    }
  }

  test("approxQuantiles=true: RFM and Pareto flip to sketch boundaries and still partition everyone") {
    withConf(Hints.ApproxQuantiles, "true") {
      val rfm = graft.operators.Analytics3.eventsRfm(spark, sf)
      assert(plan(rfm).contains("approx_percentile"))
      val rows = rfm.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        for (c <- Seq("r_score", "f_score", "m_score")) {
          val v = r.getAs[Int](c)
          assert(v >= 1 && v <= 4, s"$c=$v out of range")
        }
      }
      val pareto = graft.operators.Analytics3.customerPareto(spark, sf)
      assert(plan(pareto).contains("approx_percentile"))
      val deciles = pareto.collect()
      assert(deciles.nonEmpty && deciles.length <= 10)
    }
  }
}
