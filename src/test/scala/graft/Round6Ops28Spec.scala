package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops28

/** Invariants + reconciliations for round-6 batch 45 (#274-#275). */
class Round6Ops28Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------ text_char_entropy

  test("char entropy: repetition reads near zero, prose mid, noise high") {
    import spark.implicits._
    val repeat = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val noisy = "q7Xz2Kp9Lm4Vw8Rt3Ny6Jb1Hc5Gd0Fs" // base64-ish
    val out = Round6Ops28.textCharEntropyDf(Seq(
        (1L, repeat), (2L, prose), (3L, noisy)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(4) == 0.0, "single-char text has zero entropy")
    assert(out(2L).getDouble(4) > 3.0 && out(2L).getDouble(4) < 4.7)
    assert(out(3L).getDouble(4) > out(2L).getDouble(4),
      "random alphanumerics out-entropy prose")
    // driver replay for the prose doc
    val chars = prose.toCharArray.groupBy(identity).map(_._2.length)
    val n = prose.length.toDouble
    val nats = Parity.r6d(chars.map { c =>
      BigDecimal(-(c / n) * Parity.r6d(math.log(c / n)))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble)
    assert(out(2L).getDouble(3) == nats)
    assert(out(2L).getDouble(4) ==
      Parity.r6d(nats / Parity.r6d(math.log(2.0))))
  }

  test("char entropy: corpus rows bounded by the alphabet log") {
    val rows = Round6Ops28.textCharEntropy(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      assert(r.getDouble(4) <=
        math.log(r.getLong(2).toDouble) / math.log(2.0) + 1e-4,
        s"doc ${r.getLong(0)}: H exceeds log2(alphabet)")
    }
  }

  // ----------------------------------------------- events_activity_streaks

  test("streaks: hand-built runs are found; live streak touches the last day") {
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    def ts(d: Int) = java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay)
    // user 1: days 0-4 (run of 5), 10-11 (run of 2), 20 (run of 1, last day)
    // user 2: day 3 only (dead streak)
    val evs = (0 to 4).map(d => (1L, ts(d))) ++ Seq((1L, ts(10)), (1L, ts(11)),
      (1L, ts(20)), (2L, ts(3)))
    val out = Round6Ops28.eventsActivityStreaksDf(
        evs.toDF("user_id", "ts")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 8 && out(1L).getLong(2) == 3)
    assert(out(1L).getLong(3) == 5)
    assert(out(1L).getLong(4) == 1, "day-20 run is live (feed ends day 20)")
    assert(out(2L).getLong(3) == 1 && out(2L).getLong(4) == 0)
    assert(out(1L).getDouble(5) == Parity.r6d(8.0 / 3))
  }

  test("streaks: corpus reconciliation — active days partition into runs") {
    val rows = Round6Ops28.eventsActivityStreaks(spark, sf).collect()
    val ud = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byUser = ud.groupBy(_._1)
    rows.foreach { r =>
      val days = byUser(r.getLong(0)).map(_._2).sortBy(_.toEpochDay)
      assert(r.getLong(1) == days.length)
      // runs by consecutive-day grouping
      var runs = 1; var longest = 1; var cur = 1
      days.sliding(2).foreach { p =>
        if (p.length == 2) {
          if (p(1).toEpochDay == p(0).toEpochDay + 1) { cur += 1 }
          else { runs += 1; cur = 1 }
          longest = math.max(longest, cur)
        }
      }
      assert(r.getLong(2) == runs, s"runs(${r.getLong(0)})")
      assert(r.getLong(3) == longest)
    }
  }
}
