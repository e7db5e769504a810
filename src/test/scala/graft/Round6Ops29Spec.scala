package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops29

/** Invariants + reconciliations for round-6 batch 47 (#277-#278). */
class Round6Ops29Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // --------------------------------------------------- events_aa_calibration

  test("aa calibration: the null split fires at (or below) the nominal rate") {
    val rows = Round6Ops29.eventsAaCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    // the fire rate is identical on every row and NOT wildly above 5%
    // (with 5 metrics, 0 or 1 firings are the plausible null outcomes)
    val fr = rows.head.getDouble(7)
    rows.foreach(r => assert(r.getDouble(7) == fr))
    assert(rows.count(_.getBoolean(6)) <= 1,
      "an A/A split must not fire on most metrics")
    // the AA arm is orthogonal to #137's arm: both halves populated
    rows.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
      assert(math.abs(r.getDouble(5)) < 4.0, "no extreme z under the null")
    }
  }

  test("aa calibration: arm assignment differs from the #137 split") {
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    val ab = users.map(u =>
      java.lang.Long.parseLong(md5hex(u.toString).take(15), 16) % 2)
    val aa = users.map(u =>
      java.lang.Long.parseLong(md5hex(s"aa:$u").take(15), 16) % 2)
    val agree = ab.zip(aa).count(p => p._1 == p._2)
    // orthogonal hashes agree on ~half the users, never all
    assert(agree > users.length / 4 && agree < users.length * 3 / 4)
  }

  // --------------------------------------------------- events_adoption_curve

  test("adoption: streamed first-day registers are bit-identical to batch") {
    val batch = Round6Ops29.eventsAdoptionCurve(spark, sf).collect()
    val streamed = graft.streaming.Streaming.streamAdoption(spark, sf)
      .collect()
    assert(batch.map(_.toString).toSeq == streamed.map(_.toString).toSeq)
  }

  test("adoption: cumulative adopters replay; penetration caps at 1") {
    val rows = Round6Ops29.eventsAdoptionCurve(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val nUsers = ev.map(_._1).distinct.length
    val first = ev.groupBy(t => (t._1, t._3)).map { case ((u, t), g) =>
      (u, t, g.map(_._2).minBy(_.toEpochDay))
    }
    rows.groupBy(_.getString(0)).foreach { case (t, g) =>
      val sorted = g.sortBy(_.getDate(1).getTime)
      var cum = 0L
      sorted.foreach { r =>
        val d = r.getDate(1).toLocalDate
        val adopters = first.count(f => f._2 == t && f._3 == d)
        assert(r.getLong(2) == adopters, s"adopters($t,$d)")
        cum += adopters
        assert(r.getLong(3) == cum)
        assert(r.getDouble(4) == Parity.r6d(cum.toDouble / nUsers))
      }
      assert(sorted.last.getDouble(4) <= 1.0 + 1e-9)
    }
  }
}
