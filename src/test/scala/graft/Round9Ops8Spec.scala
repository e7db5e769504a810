package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops8

/** Round-9 batch-8 operators (#320-#321). */
class Round9Ops8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // Window 2024-01-01 .. 2024-01-05 (maxd = day 4).
  //   cohort day0: users 1,2,3,4 — active offsets: u1 {0..4}, u2 {0,1,2},
  //     u3 {0,1}, u4 {0}
  //   cohort day3: user 5 — active {3, 4} (offset 1); eligible only
  //     for k=1 (maxd - cohort = 1)
  // k=1: eligible 5 (both cohorts), retained u1,u2,u3,u5 = 4 -> 0.8
  // k=2: eligible 4 (day0 only),    retained u1,u2      = 2 -> 0.5
  // k=3: eligible 4,                retained u1          = 1 -> 0.25
  // k=4: eligible 4,                retained u1          = 1 -> 0.25
  test("events_retention_halflife: censoring-corrected curve on a hand cohort table") {
    import spark.implicits._
    def t(day: Int, u: Long) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"))
    val ev = Seq(
      t(0, 1), t(1, 1), t(2, 1), t(3, 1), t(4, 1),
      t(0, 2), t(1, 2), t(2, 2),
      t(0, 3), t(1, 3),
      t(0, 4),
      t(3, 5), t(4, 5)).toDF("user_id", "ts")
    val out = Round9Ops8.retentionHalflifeDf(ev, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, 5L, 4L, 0.8), (2, 4L, 2L, 0.5), (3, 4L, 1L, 0.25), (4, 4L, 1L, 0.25)))
    val full = Round9Ops8.retentionHalflifeDf(ev, 4).collect()
    assert(full.forall(_.getLong(4) == 4L), "all four offsets enter the fit")
    val slope = full.head.getDouble(5)
    assert(slope < 0, "decaying curve has negative slope")
    assert(math.abs(full.head.getDouble(6) - (-Round9Ops8Spec.Ln2 / slope)) < 1e-4)
  }

  test("events_retention_halflife: corpus run — rates in [0,1], eligibility non-increasing") {
    val out = Round9Ops8.eventsRetentionHalflife(spark, sf).collect()
    assert(out.nonEmpty)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1),
        "later offsets cannot have more eligible users")
      case _ => ()
    }
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  // Series 5, 8, 3, 6, 1: running max 5,8,8,8,8; gaps 0,0,5,2,7 ->
  // drawdown 7, trough day 5.
  test("ts_max_drawdown: hand series — worst slide and its trough day") {
    import spark.implicits._
    val dl = Seq(5.0, 8.0, 3.0, 6.0, 1.0).zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
    }.toDF("user_id", "d", "sst")
    val r = Round9Ops8.tsMaxDrawdownDf(dl).collect()(0)
    assert(r.getLong(1) == 5 && r.getDouble(2) == 7.0)
    assert(r.getDate(3).toString == "2024-01-05")
  }

  test("ts_max_drawdown: corpus run — drawdown non-negative, trough inside the series") {
    val out = Round9Ops8.tsMaxDrawdown(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getLong(1) > 0)
      assert(r.getDate(3) != null)
    }
  }
}

object Round9Ops8Spec {
  val Ln2: Double = math.floor(math.log(2.0) * 1e6 + 0.5) / 1e6
}
