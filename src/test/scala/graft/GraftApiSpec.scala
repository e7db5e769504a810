package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Graft, SeriesConfig}
import graft.operators.Mhw
import graft.sources.Tables

/** Semantics only multi-year data can exercise: cross-year window
  * pooling at the Dec↔Jan boundary, Feb-29 interpolation on a real leap
  * year, and baseline-period restriction — asserted against
  * hand-computed values. */
class GraftApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def series(rows: Seq[(String, Double)]) =
    Graft.dailySeries(
      rows.toDF("t", "v").withColumn("k", lit(1L)),
      SeriesConfig(keyCol = "k", timeCol = "t", valueCol = "v"))

  private def days(from: java.time.LocalDate, to: java.time.LocalDate) =
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to)).toSeq

  test("cross-year pooling: Dec 31 spike reaches January centers via the year boundary") {
    import java.time.LocalDate
    val rows = days(LocalDate.of(2022, 12, 20), LocalDate.of(2023, 1, 10))
      .map(d => d.toString -> (if (d == LocalDate.of(2022, 12, 31)) 100.0 else 10.0))
    val pooled = Mhw.pooledMean(series(rows), 5)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // centers 1 and 366 both pool Dec 27-31 + Jan 1-6 → (10·10+100)/11
    assert(pooled(1) == 18.181818)
    assert(pooled(366) == 18.181818)
    // center 6 pools Jan 1-11 only → flat
    assert(pooled(6) == 10.0)
  }

  test("leap year: Feb 29 is DOY 60 from real data; legacy interp overwrites it") {
    import java.time.LocalDate
    // spike at Feb 23 (doy 54): inside the ±5 window of doy 59, outside 60/61
    val rows = days(LocalDate.of(2024, 2, 20), LocalDate.of(2024, 3, 10))
      .map(d => d.toString -> (if (d == LocalDate.of(2024, 2, 23)) 100.0 else 10.0))
    val daily = series(rows)
    val raw = Mhw.pooledMean(daily, 5)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(raw(59) == 18.181818) // window 54..64 catches the spike
    assert(raw(60) == 10.0)      // window 55..65 does not
    assert(raw(61) == 10.0)
    val legacy = Mhw.interpFeb29(Mhw.pooledMean(daily, 5), "seas")
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(legacy(60) == 0.5 * 18.181818 + 0.5 * 10.0) // 14.090909
    assert(legacy(59) == raw(59))
  }

  test("baseline period restricts the fit but detrend covers the full record") {
    import java.time.LocalDate
    // 2022: steep trend; 2023: flat. Fit on 2023 only → trend ~0 →
    // detrended 2023 values ≈ 0-mean flat, 2022 keeps its slope.
    val rows =
      days(LocalDate.of(2022, 1, 1), LocalDate.of(2022, 1, 31)).zipWithIndex
        .map { case (d, i) => d.toString -> (10.0 + i) } ++
      days(LocalDate.of(2023, 1, 1), LocalDate.of(2023, 1, 31))
        .map(d => d.toString -> 50.0)
    val out = Mhw.detrendDaily(series(rows), baseline = Some((2023, 2023)))
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2))).toMap
    // flat baseline fit: slope 0, intercept 50 → 2023 residuals are 0
    assert(out("2023-01-05") == 0.0)
    assert(out("2023-01-31") == 0.0)
    // 2022 rows evaluated under the same (flat) model keep their trend
    assert(out("2022-01-01") == -40.0)
    assert(out("2022-01-31") == -10.0)
    // full record covered
    assert(out.size == 62)
  }

  test("generic API over the events table equals the canonical chain") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val viaApi = Graft.dailySeries(ev,
        SeriesConfig(keyCol = "user_id", timeCol = "ts", valueCol = "value"))
      .collect().map(_.toSeq).toSet
    val canonical = Mhw.daily(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(viaApi == canonical)
  }
}
