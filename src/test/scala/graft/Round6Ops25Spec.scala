package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops25

/** Invariants + reconciliations for round-6 batch 42 (#268-#269). */
class Round6Ops25Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------- ts_rolling_corr

  test("rolling corr: bounded in [-1,1]; driver replay of a full window") {
    val rows = Round6Ops25.tsRollingCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= -1.0 - 1e-6 &&
      r.getDouble(4) <= 1.0 + 1e-6))
    // replay the last full window of the first pair
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("v")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val full = rows.filter(_.getBoolean(5))
    if (full.nonEmpty) {
      val pick = full.last
      val (ta, tb, d) = (pick.getString(0), pick.getString(1),
        pick.getDate(2).toLocalDate)
      val byTd = daily.map(t => (t._1, t._2) -> t._3).toMap
      val win = (0 until Round6Ops25.RollDays).flatMap { k =>
        val dd = d.minusDays(k)
        for { a <- byTd.get((ta, dd)); b <- byTd.get((tb, dd)) } yield (a, b)
      }
      def dec(xs: Seq[Double]) =
        xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
      val n = win.length.toDouble
      val sx = dec(win.map(_._1)); val sy = dec(win.map(_._2))
      val sxy = dec(win.map(p => p._1 * p._2))
      val sxx = dec(win.map(p => p._1 * p._1))
      val syy = dec(win.map(p => p._2 * p._2))
      val den = math.sqrt(math.max(0.0, n * sxx - sx * sx) *
                          math.max(0.0, n * syy - sy * sy))
      assert(pick.getLong(3) == win.length)
      assert(pick.getDouble(4) ==
        Parity.r6d((n * sxy - sx * sy) / den), s"corr($ta,$tb,$d)")
    }
  }

  test("rolling corr: locked series read 1, anti-locked read -1") {
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    // volumes: a = 2 + (d%5), b = a (locked); c = 8 - (d%5) (anti)
    val evs = (0 until 40).flatMap { d =>
      val va = 2 + d % 5
      def mk(t: String, n: Int) = (0 until n).map(i =>
        (t, java.sql.Timestamp.valueOf(base.plusDays(d).atTime(i % 24, i % 60))))
      mk("aa", va) ++ mk("bb", va) ++ mk("cc", 8 - d % 5)
    }
    val out = Round6Ops25.tsRollingCorrDf(evs.toDF("event_type", "ts"))
      .collect().filter(_.getBoolean(5))
    val ab = out.filter(r => r.getString(0) == "aa" && r.getString(1) == "bb")
    val ac = out.filter(r => r.getString(0) == "aa" && r.getString(1) == "cc")
    assert(ab.nonEmpty && ac.nonEmpty)
    ab.foreach(r => assert(math.abs(r.getDouble(4) - 1.0) < 1e-4))
    ac.foreach(r => assert(math.abs(r.getDouble(4) + 1.0) < 1e-4))
  }

  // --------------------------------------------- events_lifecycle_activity

  test("lifecycle: week 0 holds every user; retention decays from 1") {
    val rows = Round6Ops25.eventsLifecycleActivity(spark, sf).collect()
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val wk0 = rows.find(_.getLong(0) == 0).get
    assert(wk0.getLong(1) == users, "every user is active in their week 0")
    assert(wk0.getDouble(4) == 1.0)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(3) ==
        Parity.r6d(r.getLong(2).toDouble / r.getLong(1)))
    }
    // events reconcile
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n)
  }
}
