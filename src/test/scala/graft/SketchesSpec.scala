package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, SimilarityPq, Sketches}

/** Invariants for the sketch/statistics operators (#72-#76) and the PQ
  * ANN path (#31g) — the DuckDB oracle pins exact outputs; these pin
  * the guarantees the estimators are supposed to carry. */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  private val sf = "/root/testdata/sf0.001"

  test("CMS estimate dominates the exact count (one-sided error)") {
    val rows = Sketches.eventsCms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_exact"),
        s"CMS under-estimated ${r.getAs[Long]("user_id")}")
    }
    val total = graft.sources.Tables.events(spark, sf).count()
    rows.foreach(r => assert(r.getAs[Long]("cms_est") <= total))
  }

  test("bloom semi-join has no false negatives; member rows all pass") {
    val rows = Sketches.eventsBloomJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_member"))
      assert(r.getAs[Long]("n_false_pos") >= 0)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_rows"))
    }
    // every purchase row's user is a member by construction → all pass
    val p = rows.find(_.getAs[String]("event_type") == "purchase").get
    assert(p.getAs[Long]("n_pass") == p.getAs[Long]("n_rows"))
    assert(p.getAs[Long]("n_member") == p.getAs[Long]("n_rows"))
  }

  test("mix weights normalize to 1 and upweight small domains") {
    val rows = Sketches.corpusMixWeights(spark, sf).collect()
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    val sSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(sSum - 1.0) < 1e-3)
    // sqrt temperature: weight/share ratio decreases with share
    val byShare = rows.sortBy(_.getAs[Double]("share"))
    if (byShare.length >= 2) {
      val lo = byShare.head
      val hi = byShare.last
      assert(lo.getAs[Double]("weight") / lo.getAs[Double]("share") >=
             hi.getAs[Double]("weight") / hi.getAs[Double]("share"))
    }
  }

  private def series(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(1700000000000L + i * 86400000L), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
  }

  test("autocorr: linear series → acf 1; alternating series → acf1 -1, acf2 1") {
    val lin = Sketches.tsAutocorrDf(series((1 to 20).map(_.toDouble))).collect().head
    assert(lin.getAs[Double]("acf1") == 1.0)
    assert(lin.getAs[Double]("acf2") == 1.0)
    val alt = Sketches.tsAutocorrDf(series(Seq.tabulate(20)(i => if (i % 2 == 0) 1.0 else -1.0)))
      .collect().head
    assert(alt.getAs[Double]("acf1") == -1.0)
    assert(alt.getAs[Double]("acf2") == 1.0)
    // constant series: zero variance → NULL, not NaN/crash
    val const = Sketches.tsAutocorrDf(series(Seq.fill(10)(3.0))).collect().head
    assert(const.isNullAt(const.fieldIndex("acf1")))
  }

  test("seasonal decompose: pure weekly pattern → strength 1; noise on flat → strength 0") {
    // 4 full weeks of a repeating dow pattern: residuals are exactly 0
    val weekly = Sketches.tsSeasonalDecomposeDf(
      series(Seq.tabulate(28)(i => (i % 7).toDouble * 10))).collect().head
    assert(weekly.getAs[Double]("var_resid") == 0.0)
    assert(weekly.getAs[Double]("strength") == 1.0)
    // alternating noise uncorrelated with dow (period 2 vs 7): every dow
    // sees both values equally over a 14-day cycle → seasonal means are
    // all equal → var_resid == var_total → strength 0
    val noise = Sketches.tsSeasonalDecomposeDf(
      series(Seq.tabulate(56)(i => if (i % 2 == 0) 1.0 else -1.0))).collect().head
    assert(noise.getAs[Double]("strength") == 0.0)
  }

  test("corpus split: exhaustive, deterministic, train-dominant") {
    val rows = Sketches.corpusSplit(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.sources.Tables.documents(spark, sf).count())
    val again = Sketches.corpusSplit(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val trainFrac = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("quantile sketch: every estimate within one bin width of the exact order statistic") {
    // the histogram bound is vs the TYPE-1 quantile (the order statistic
    // at rank ⌈q·n⌉, which provably shares the estimate's bin) — the
    // interpolated percentile can drift across empty tail bins
    val est = Sketches.eventsQuantileSketch(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val vals = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(est.keySet == vals.keySet)
    for ((t, e) <- est; vs = vals(t); bw = (vs.last - vs.head) / 64.0;
         (eCol, q) <- Seq("p50_est" -> 0.5, "p90_est" -> 0.9, "p99_est" -> 0.99)) {
      val orderStat = vs(math.ceil(q * vs.length).toInt - 1)
      val d = math.abs(e.getAs[Double](eCol) - orderStat)
      assert(d <= bw + 1e-9, s"$t $eCol off by $d > bin width $bw")
    }
  }

  test("PQ ANN recalls the brute-force top-k (refined shortlist)") {
    def key(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val brute = key(Similarity.knnBrute(spark, sf).collect())
    val pq = key(SimilarityPq.annPq(spark, sf).collect())
    assert(pq.keySet == brute.keySet)
    val recalls = brute.map { case (q, b) => pq(q).intersect(b).size.toDouble / b.size }
    val mean = recalls.sum / recalls.size
    // 64-dim near-random vectors, 8×16 codebook, 32-candidate shortlist:
    // ADC recall is genuinely bounded here (observed 0.76); the exactness
    // of the refine stage is pinned separately below
    assert(mean >= 0.7, s"mean PQ recall $mean below 0.7")
  }

  test("PQ with a corpus-wide shortlist degenerates to exact brute force") {
    // ADC error can only cost shortlist membership; once the shortlist
    // covers the corpus, the exact re-rank must reproduce knn_brute
    // bit-for-bit (same rounded cosines, same tiebreaks)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id", "cosine", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = rows(Similarity.knnBrute(spark, sf))
    val pqAll = rows(SimilarityPq.annPq(spark, sf, shortlist = 100000))
    assert(pqAll == brute)
  }

  test("PQ codes are within the codebook range and cover multiple cells") {
    // encode via the public path at tiny SF: every rank-1 self-exclusion
    // holds and the ADC ordering is sane (exact top-1 cosine ≥ any other)
    val out = SimilarityPq.annPq(spark, sf).collect()
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(!rs.exists(_.getAs[Long]("vec_id") == q))
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Double]("cosine")).toSeq ==
             sorted.map(_.getAs[Double]("cosine")).sortBy(-(_: Double)).toSeq)
    }
  }

  test("kmv overlap: estimates track a known partial overlap; exacts are exact") {
    import spark.implicits._
    // A = users 0..9999, B = 5000..14999 → inter 5000, union 15000,
    // J = 1/3; sketches full (10000 ≫ k=256) so the estimator path runs.
    // md5-hashed → fully deterministic: these are regression values.
    val ev = ((0 until 10000).map(u => ("A", u.toLong)) ++
              (5000 until 15000).map(u => ("B", u.toLong)))
      .toDF("event_type", "user_id")
    val out = graft.operators.Sketches.eventsKmvOverlapDf(ev).collect()
    assert(out.length == 1)
    val r0 = out.head
    assert(r0.getAs[Long]("inter_exact") == 5000L)
    assert(r0.getAs[Long]("union_exact") == 15000L)
    val j = r0.getAs[Double]("jaccard_est")
    val u = r0.getAs[Double]("union_est")
    val i = r0.getAs[Double]("inter_est")
    // k=256 → RSE ≈ 1/√k ≈ 6.3%; allow 3σ
    assert(math.abs(j - 1.0 / 3) < 0.1, s"jaccard_est $j")
    assert(math.abs(u - 15000) / 15000 < 0.2, s"union_est $u")
    assert(math.abs(i - 5000) / 5000 < 0.3, s"inter_est $i")
  }

  test("kmv sketches merge: k-min of unioned k-mins equals k-min of the union") {
    // the mergeability contract that lets per-day/per-segment sketches
    // combine without touching raw data
    val k = 256
    def h(u: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.take(15), 16)
    val s1 = (0L until 4000L).map(h)
    val s2 = (2000L until 8000L).map(h)
    def kmin(xs: Seq[Long]) = xs.distinct.sorted.take(k)
    assert(kmin(kmin(s1) ++ kmin(s2)) == kmin(s1 ++ s2))
  }
}
