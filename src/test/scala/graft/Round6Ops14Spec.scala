package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round6Ops14, TimeSeries}

/** Invariants + reconciliations for round-6 batch 31 (#229-#232). */
class Round6Ops14Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------- dq_profile_drift

  test("profile drift: driver replay of both halves for every column") {
    val rows = Round6Ops14.dqProfileDrift(spark, sf).collect()
    assert(rows.length == Round6Ops14.DriftCols.length)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("value"), col("user_id"),
              col("event_type"), col("props")).collect()
    val days = ev.map(_.getDate(0).toLocalDate)
    val mid = days.min.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) / 2)
    val h1 = ev.filter(!_.getDate(0).toLocalDate.isAfter(mid))
    val h2 = ev.filter(_.getDate(0).toLocalDate.isAfter(mid))
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("value").getLong(2) == h1.length)
    assert(byName("value").getLong(3) == h2.length)
    assert(byName("value").getDouble(4) ==
      Parity.r6d(h2.length.toDouble / h1.length))
    assert(byName("event_type").getLong(5) ==
      h1.map(_.getString(3)).distinct.length)
    assert(byName("event_type").getLong(6) ==
      h2.map(_.getString(3)).distinct.length)
    assert(byName("user_id").getLong(5) == h1.map(_.getLong(2)).distinct.length)
    // value mean shift replay (decimal sums, h1 sd)
    def dec(xs: Seq[Double]) =
      xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val v1 = h1.map(_.getDouble(1)).toSeq; val v2 = h2.map(_.getDouble(1)).toSeq
    val m1 = dec(v1) / v1.length; val m2 = dec(v2) / v2.length
    val sd1 = math.sqrt(math.max(0.0,
      (dec(v1.map(x => x * x)) - dec(v1) * dec(v1) / v1.length) / (v1.length - 1)))
    assert(byName("value").getDouble(9) == Parity.r6d((m2 - m1) / sd1))
    assert(byName("props").isNullAt(9))
    rows.foreach(r => assert(r.getDouble(8) == 0.0)) // no nulls in the feed
  }

  test("profile drift: a rescaled metric and a grown enum both surface") {
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 5, 1)
    def ts(d: Int, i: Int) =
      java.sql.Timestamp.valueOf(base.plusDays(d).atTime(i % 24, i % 60))
    // first 10 days: values ~N(10); last 10 days: values rescaled x100,
    // and event_type gains a brand-new enum member
    val evs = (0 until 20).flatMap { d =>
      (0 until 50).map { i =>
        val v = 10.0 + (i % 7)
        (1000L + i, ts(d, i), if (d < 10) v else v * 100,
         if (d < 10) s"t${i % 3}" else s"t${i % 4}", "{}")
      }
    }
    val out = Round6Ops14.dqProfileDriftDf(
        evs.toDF("user_id", "ts", "value", "event_type", "props"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("value").getDouble(9) > 100.0, "x100 rescale must scream")
    assert(out("event_type").getLong(6) == out("event_type").getLong(5) + 1)
    assert(out("event_type").getDouble(7) > 1.0)
  }

  // ------------------------------------------------- ts_changepoint_multi

  test("changepoint multi: level 1 is exactly #11f; level-2 segments split at cp1") {
    val rows = Round6Ops14.tsChangepointMulti(spark, sf).collect()
    val single = TimeSeries.changepoint(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val l1 = rows.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r).toMap
    assert(l1.keySet == single.keySet)
    l1.foreach { case (uid, r) =>
      assert(r.getDate(3) == single(uid).getDate(1), s"cp1($uid)")
      assert(r.getDouble(4) == single(uid).getDouble(2))
    }
    // level-2 segments partition each key's days around cp1
    val daily = graft.operators.Mhw.daily(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getInt(1) == 2).groupBy(_.getLong(0)).foreach {
      case (uid, segs) =>
        assert(segs.map(_.getString(2)).toSet.subsetOf(Set("left", "right")))
        if (segs.length == 2)
          assert(segs.map(_.getLong(5)).sum == daily(uid))
        segs.foreach(s => assert(s.getLong(5) >= Round6Ops14.CpMinSeg))
    }
  }

  test("changepoint multi: a double step yields both breaks") {
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    // 0..19 at 10, 20..39 at 20, 40..59 at 30: breaks near day 19 and 39
    val dl = (0 until 60).map { i =>
      (1L, java.sql.Date.valueOf(base.plusDays(i)),
       if (i < 20) 10.0 else if (i < 40) 20.0 else 30.0)
    }
    val out = Round6Ops14.tsChangepointMultiDf(dl.toDF("user_id", "d", "sst"))
      .collect()
    val l1 = out.filter(_.getInt(1) == 1).head
    val l2 = out.filter(_.getInt(1) == 2)
      .map(r => r.getString(2) -> r.getDate(3).toLocalDate).toMap
    val cp1 = l1.getDate(3).toLocalDate
    // level 1 lands on one of the two true steps (symmetric series →
    // the CUSUM peaks at both; the tie rule picks the earlier)
    assert(cp1 == base.plusDays(19) || cp1 == base.plusDays(39))
    // the OTHER step is found at level 2 in the complementary segment
    val other = if (cp1 == base.plusDays(19)) base.plusDays(39)
                else base.plusDays(19)
    assert(l2.values.toSet.contains(other), s"l2=$l2")
  }

  // ---------------------------------------------- doc_instruction_detect

  test("instruction detect: SFT-shaped text routes, prose and corpus do not") {
    val real = Round6Ops14.docInstructionDetect(spark, sf).collect()
    assert(real.count(_.getBoolean(6)) <= real.length / 50)
    import spark.implicits._
    val sft = "Q: what is spark? A: a distributed engine. " +
      "Q: why use it? A: scale. Explain the answer. List three reasons. " +
      "1. speed 2. scale 3. apis? Write a summary. Answer: done?"
    val prose = "the quiet river wound through the valley carrying " +
      "the last light of the afternoon toward the distant sea"
    val out = Round6Ops14.docInstructionDetectDf(
        Seq((1L, sft), (2L, prose)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(6), s"sft score ${out(1L).getDouble(5)}")
    assert(!out(2L).getBoolean(6), s"prose score ${out(2L).getDouble(5)}")
    assert(out(1L).getDouble(1) > 0 && out(2L).getDouble(1) == 0.0)
  }

  // -------------------------------------------------------- ann_shard_plan

  test("shard plan: cells partition the corpus; snake is balanced and replayable") {
    val rows = Round6Ops14.annShardPlan(spark, sf).collect()
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(3)).distinct.sorted.toSeq ==
      (0L until Round6Ops14.PlanShards).toSeq)
    // rank order is by size desc; snake assignment replays from rank
    val sorted = rows.sortBy(_.getLong(2))
    assert(sorted.map(_.getLong(1)).toSeq ==
      sorted.map(_.getLong(1)).sortBy(-_).toSeq)
    sorted.foreach { r =>
      val s = Round6Ops14.PlanShards
      val r0 = ((r.getLong(2) - 1) % (2 * s)).toInt
      val shard = if (r0 < s) r0 else 2 * s - 1 - r0
      assert(r.getLong(3) == shard)
    }
    // loads reconcile and the plan is within one max-cell of balanced
    val loads = rows.groupBy(_.getLong(3)).values
      .map(g => g.map(_.getLong(1)).sum).toSeq
    assert(loads.sum == total)
    val maxCell = rows.map(_.getLong(1)).max
    assert(loads.max - loads.min <= maxCell,
      s"snake imbalance ${loads.max - loads.min} > max cell $maxCell")
    rows.foreach { r =>
      val load = loads.sum.toDouble
      assert(r.getDouble(5) == Parity.r6d(r.getLong(4) / load))
    }
  }
}
