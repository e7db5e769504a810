package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops11

/** Invariants + reconciliations for round-6 batch 28 (#217-#220). */
class Round6Ops11Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def dec(xs: Seq[Double]): Double =
    xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  // --------------------------------------------------------------- ts_adf

  test("adf: driver replay of the unit-root regression for every key") {
    val rows = Round6Ops11.tsAdf(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.operators.Mhw.daily(spark, sf)
      .select(col("user_id"), col("d"), col("sst")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { row =>
      val xs = daily(row.getLong(0)).sortBy(_._2.toEpochDay).map(_._3).toSeq
      val pairs = xs.sliding(2).map(p => (p(0), p(1) - p(0))).toSeq
      val n = pairs.length
      assert(row.getLong(1) == n && n >= 10)
      val sx = dec(pairs.map(_._1)); val sy = dec(pairs.map(_._2))
      val sxy = dec(pairs.map(p => p._1 * p._2))
      val sxx = dec(pairs.map(p => p._1 * p._1))
      val syy = dec(pairs.map(p => p._2 * p._2))
      val den = n * sxx - sx * sx
      val beta = (n * sxy - sx * sy) / den
      val alpha = (sy - beta * sx) / n
      val ssr = syy - alpha * sy - beta * sxy
      val stat =
        if (ssr > 0) Parity.r6d(beta / math.sqrt(ssr / (n - 2) * n / den))
        else 0.0
      assert(row.getDouble(2) == Parity.r6d(alpha))
      assert(row.getDouble(3) == Parity.r6d(beta))
      assert(row.getDouble(4) == stat)
      assert(row.getBoolean(5) == (stat < Round6Ops11.AdfCrit5))
    }
  }

  test("adf: a mean-reverting AR series rejects the unit root; a trend walk does not") {
    import spark.implicits._
    def noise(i: Int): Double = // deterministic md5-uniform in [-0.5, 0.5)
      (java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"adf:$i".getBytes).map("%02x".format(_)).mkString.take(8),
        16).toDouble / 0xFFFFFFFFL.toDouble) - 0.5
    var y = 0.0
    val ar = (0 until 60).map { i => y = 0.2 * y + noise(i); (1L, i, y) }
    var w = 0.0
    val walk = (0 until 60).map { i => w = w + 1.0 + noise(i) * 0.01; (2L, i, w) }
    val dl = (ar ++ walk).map { case (u, i, v) =>
      (u, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
       Parity.r6d(v))
    }.toDF("user_id", "d", "sst")
    val out = Round6Ops11.tsAdfDf(dl).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(5), s"AR(0.2) must reject: ${out(1L).getDouble(4)}")
    assert(!out(2L).getBoolean(5), s"trend walk must not: ${out(2L).getDouble(4)}")
  }

  // ----------------------------------------------------------- events_sprt

  test("sprt: driver replay of the walk, crossings and decision per user") {
    val rows = Round6Ops11.eventsSprt(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
                 r.getString(3)))
      .groupBy(_._1)
    rows.foreach { row =>
      val es = ev(row.getLong(0)).sortBy(t => (t._2, t._3)).map(_._4).toSeq
      var cp = 0L; var t1 = Option.empty[Long]; var t0 = Option.empty[Long]
      es.zipWithIndex.foreach { case (t, i) =>
        if (t == "purchase") cp += 1
        val rn = i + 1L
        val llr = Parity.r6d(cp * Round6Ops11.SprtK1 +
                             (rn - cp) * Round6Ops11.SprtK0)
        if (llr >= Round6Ops11.SprtA && t1.isEmpty) t1 = Some(rn)
        if (llr <= Round6Ops11.SprtB && t0.isEmpty) t0 = Some(rn)
      }
      val decision =
        if (t1.nonEmpty && (t0.isEmpty || t1.get <= t0.get)) "accept_h1"
        else if (t0.nonEmpty) "accept_h0" else "continue"
      assert(row.getLong(1) == es.length)
      assert(row.getLong(2) == cp)
      assert(row.getDouble(3) == Parity.r6d(cp * Round6Ops11.SprtK1 +
        (es.length - cp) * Round6Ops11.SprtK0))
      assert(row.getString(4) == decision, s"user ${row.getLong(0)}")
      val tmin = (t1.toSeq ++ t0.toSeq).sorted.headOption
      if (tmin.isEmpty) assert(row.isNullAt(5))
      else assert(row.getLong(5) == tmin.get)
    }
  }

  test("sprt: pure streaks decide at Wald's exact first-crossing steps") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(t0.getTime + i * 60000L)
    val buyer = (0 until 30).map(i => (1L, ts(i), i.toLong, "purchase"))
    val browser = (0 until 30).map(i => (2L, ts(i), i.toLong, "view"))
    val out = Round6Ops11.eventsSprtDf(
        (buyer ++ browser).toDF("user_id", "ts", "event_id", "event_type"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // ceil(A / K1) = ceil(2.944439 / 0.693147) = 5 green steps
    assert(out(1L).getString(4) == "accept_h1")
    assert(out(1L).getLong(5) == 5)
    // ceil(A / |K0|) = ceil(2.944439 / 0.194156) = 16 red steps
    assert(out(2L).getString(4) == "accept_h0")
    assert(out(2L).getLong(5) == 16)
  }

  // --------------------------------------------------- mm_modality_balance

  test("modality balance: docs and bytes reconcile; every share axis sums to 1") {
    val rows = Round6Ops11.mmModalityBalance(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("audio", "image", "text", "video"))
    def sums(key: org.apache.spark.sql.Row => String, share: Int) =
      rows.groupBy(key).values.map(g => g.map(_.getDouble(share)).sum)
    sums(_.getString(0), 5).foreach(s => assert(math.abs(s - 1.0) < 1e-4))
    sums(_.getString(1), 6).foreach(s => assert(math.abs(s - 1.0) < 1e-4))
    assert(math.abs(rows.map(_.getDouble(7)).sum - 1.0) < 1e-4)
    // frames follow the FakeDecoder rule: 1 + bytes/100 per doc
    val frames = graft.sources.Tables.documents(spark, sf)
      .select("text").collect()
      .map(r => 1L + r.getString(0).getBytes("UTF-8").length / 100).sum
    assert(rows.map(_.getLong(4)).sum == frames)
  }

  // ----------------------------------------------------- dq_volume_anomaly

  test("volume monitor: gap-free spine, driver-replayed robust z") {
    val rows = Round6Ops11.dqVolumeAnomaly(spark, sf).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.head.plusDays(rows.length - 1) == days.last) // no gaps
    val ns = rows.map(_.getLong(1).toDouble).sorted
    def med(xs: Array[Double]): Double = {
      val h = (xs.length - 1) * 0.5; val l = h.toInt
      xs(l) + (xs(math.min(l + 1, xs.length - 1)) - xs(l)) * (h - l)
    }
    val m = Parity.r6d(med(ns))
    val devs = rows.map(r => Parity.r6d(math.abs(r.getLong(1) - m)))
    val mad = Parity.r6d(med(devs.sorted))
    val meanAd = Parity.r6d(dec(devs.toSeq) / devs.length)
    rows.foreach { r =>
      assert(r.getDouble(2) == m && r.getDouble(3) == mad)
      val z =
        if (mad > 0) Parity.r6d(0.6745 * (r.getLong(1) - m) / mad)
        else if (meanAd > 0)
          Parity.r6d((r.getLong(1) - m) / (1.253314 * meanAd))
        else 0.0
      assert(r.getDouble(4) == z)
      assert(r.getBoolean(5) == (math.abs(z) > Round6Ops11.VolZThreshold))
      assert(r.getBoolean(6) == (r.getLong(1) == 0))
    }
  }

  test("volume monitor: a dropped day and a double-load day both page") {
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 3, 1)
    // 30 steady days of 100 events, day 10 missing, day 20 at 3x
    val evs = (0 until 30).filter(_ != 10).flatMap { d =>
      val n = if (d == 20) 300 else 100
      (0 until n).map(i => java.sql.Timestamp.valueOf(
        base.plusDays(d).atTime(i % 24, i % 60)))
    }
    val out = Round6Ops11.dqVolumeAnomalyDf(evs.toDF("ts")).collect()
    assert(out.length == 30)
    val byDay = out.map(r => r.getDate(0).toLocalDate -> r).toMap
    val drop = byDay(base.plusDays(10))
    assert(drop.getLong(1) == 0 && drop.getBoolean(6) && drop.getBoolean(5))
    val spike = byDay(base.plusDays(20))
    assert(spike.getBoolean(5) && !spike.getBoolean(6))
    assert(out.count(_.getBoolean(5)) == 2)
  }
}
