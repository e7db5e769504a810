package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops13

/** Invariants + reconciliations for round-6 batch 30 (#225-#228). */
class Round6Ops13Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def dec(xs: Seq[Double]): Double =
    xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // -------------------------------------------------------- ts_granger

  test("granger: driver replay of the two-regressor F for every pair") {
    val rows = Round6Ops13.tsGranger(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("v")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val byTd = daily.map(t => (t._1, t._2) -> t._3).toMap
    rows.foreach { row =>
      val (tx, ty) = (row.getString(0), row.getString(1))
      val trip = daily.filter(_._1 == ty).flatMap { case (_, d, yv) =>
        for {
          y1 <- byTd.get((ty, d.minusDays(1)))
          x1 <- byTd.get((tx, d.minusDays(1)))
        } yield (yv, y1, x1)
      }.toSeq
      val n = trip.length
      assert(row.getLong(2) == n && n >= 10)
      val sy = dec(trip.map(_._1)); val s1 = dec(trip.map(_._2))
      val s2 = dec(trip.map(_._3))
      val syy = dec(trip.map(t => t._1 * t._1))
      val s11 = dec(trip.map(t => t._2 * t._2))
      val s22 = dec(trip.map(t => t._3 * t._3))
      val sy1 = dec(trip.map(t => t._1 * t._2))
      val sy2 = dec(trip.map(t => t._1 * t._3))
      val s12 = dec(trip.map(t => t._2 * t._3))
      val nd = n.toDouble
      val c11 = s11 - s1 * s1 / nd; val c22 = s22 - s2 * s2 / nd
      val c12 = s12 - s1 * s2 / nd; val cy1 = sy1 - s1 * sy / nd
      val cy2 = sy2 - s2 * sy / nd; val cyy = syy - sy * sy / nd
      val det = c11 * c22 - c12 * c12
      val b = (cy1 * c22 - cy2 * c12) / det
      val cc = (cy2 * c11 - cy1 * c12) / det
      val ssrU = cyy - b * cy1 - cc * cy2
      val ssrR = cyy - (cy1 / c11) * cy1
      val f = if (ssrU > 0)
        Parity.r6d((ssrR - ssrU) * (nd - 3) / ssrU) else 0.0
      assert(row.getDouble(3) == Parity.r6d(cc), s"coef($tx->$ty)")
      assert(row.getDouble(4) == f, s"F($tx->$ty)")
      assert(row.getBoolean(5) == (f > Round6Ops13.GrangerFCrit))
    }
  }

  test("granger: a lagged copy is caused by its source, not the reverse") {
    import spark.implicits._
    def h(i: Int, salt: String): Int =
      Integer.parseInt(md5hex(s"$salt:$i").take(4), 16) % 7
    val base = java.time.LocalDate.of(2024, 1, 1)
    // x volume: hash noise; y volume tomorrow = x today + fresh noise
    // (a PURE copy gives a zero unrestricted residual, which the
    // operator guards to F = 0 — real series always carry noise)
    val evs = (0 until 40).flatMap { d =>
      val nx = 3 + h(d, "x")
      val ny = 3 + (if (d == 0) h(99, "y0") else h(d - 1, "x")) + h(d, "n") % 2
      (0 until nx).map(i => ("xx", java.sql.Timestamp.valueOf(
        base.plusDays(d).atTime(1, i)))) ++
      (0 until ny).map(i => ("yy", java.sql.Timestamp.valueOf(
        base.plusDays(d).atTime(2, i))))
    }
    val out = Round6Ops13.tsGrangerDf(evs.toDF("event_type", "ts")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("xx", "yy")).getBoolean(5),
      s"x must Granger-cause its lagged copy: F=${out(("xx", "yy")).getDouble(4)}")
    assert(!out(("yy", "xx")).getBoolean(5),
      s"the copy must not cause the source: F=${out(("yy", "xx")).getDouble(4)}")
  }

  // ------------------------------------------------- doc_chunk_passages

  test("chunks: full coverage at the stride grid; fingerprints replay") {
    val rows = Round6Ops13.docChunkPassages(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, chs) =>
      val toks = docs(id).trim.toLowerCase.split(" ", -1)
      val n = toks.length
      val sorted = chs.sortBy(_.getLong(1))
      val expChunks =
        if (n <= Round6Ops13.ChunkSize) 1
        else 1 + math.ceil((n - Round6Ops13.ChunkSize).toDouble /
                           Round6Ops13.ChunkStride).toInt
      assert(sorted.length == expChunks, s"doc $id")
      sorted.zipWithIndex.foreach { case (c, i) =>
        val start = 1 + i * Round6Ops13.ChunkStride
        assert(c.getLong(2) == start)
        val ctoks = toks.slice(start - 1,
          start - 1 + math.min(Round6Ops13.ChunkSize, n - start + 1))
        assert(c.getInt(3) == ctoks.length)
        assert(c.getString(4) == md5hex(ctoks.mkString(" ")))
      }
      // the final chunk reaches the last token; earlier chunks are full
      assert(sorted.last.getLong(2) + sorted.last.getInt(3) - 1 == n)
      sorted.init.foreach(c => assert(c.getInt(3) == Round6Ops13.ChunkSize))
    }
  }

  // ------------------------------------------------------ events_ab_srm

  test("srm: healthy hash split passes; a biased assignment fires the alarm") {
    val row = Round6Ops13.eventsAbSrm(spark, sf).collect().head
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val nA = users.count(u =>
      java.lang.Long.parseLong(md5hex(u.toString).take(15), 16) % 2 == 0)
    val nB = users.length - nA
    assert(row.getLong(0) == nA && row.getLong(1) == nB)
    val e = (nA + nB) / 2.0
    val chi2 = Parity.r6d((nA - e) * (nA - e) / e + (nB - e) * (nB - e) / e)
    assert(row.getDouble(3) == chi2)
    assert(row.getBoolean(4) == (chi2 > Round6Ops13.SrmCrit))
    assert(!row.getBoolean(4), "the md5 split on real users must be healthy")
    // biased world: only users hashing to arm 0
    import spark.implicits._
    val biased = (0L until 2000L).filter(u =>
      java.lang.Long.parseLong(md5hex(u.toString).take(15), 16) % 2 == 0)
    val out = Round6Ops13.eventsAbSrmDf(biased.toDF("user_id")).collect().head
    assert(out.getLong(1) == 0 && out.getBoolean(4))
  }

  // ----------------------------------------------- stream_volume_anomaly

  test("volume monitor: streamed day registers are bit-identical to batch") {
    val batch = graft.operators.Round6Ops11.dqVolumeAnomaly(spark, sf).collect()
    val streamed = graft.streaming.Streaming.streamVolumeAnomaly(spark, sf)
      .collect()
    assert(batch.map(_.toString).toSeq == streamed.map(_.toString).toSeq)
  }
}
