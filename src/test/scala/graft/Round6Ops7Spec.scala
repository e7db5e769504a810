package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round6Ops7

/** Invariants + reconciliations for round-6 batch 24 (#200-#203). */
class Round6Ops7Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------- dq_profile

  test("dq profile: one row per column; counts reconcile; extremes ordered") {
    val rows = Round6Ops7.dqProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Round6Ops7.ProfileCols.map(_._1).sorted)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val n = li.count()
    rows.foreach { r =>
      assert(r.getLong(2) == n)                       // n_rows
      assert(r.getLong(3) >= 0 && r.getLong(3) <= n)  // n_null
      assert(r.getLong(4) >= 1 && r.getLong(4) <= n)  // n_distinct
      r.getString(1) match {
        case "string" =>
          assert(r.isNullAt(5) && r.isNullAt(7))
          assert(r.getString(8) <= r.getString(9))
        case k =>
          assert(r.getDouble(5) <= r.getDouble(6))
          assert(r.isNullAt(8) && r.isNullAt(9))
          if (k == "timestamp") assert(r.isNullAt(7))
      }
    }
    // exact distinct spot-checks against driver-side recounts
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("l_returnflag").getLong(4) ==
      li.select("l_returnflag").distinct().count())
    assert(byName("l_orderkey").getLong(4) ==
      li.select("l_orderkey").distinct().count())
    // mean replay for one column (decimal-exact sum over all rows)
    val qs = li.select(col("l_quantity")).collect().map(_.getDouble(0))
    val dec = qs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(byName("l_quantity").getDouble(7) ==
      Parity.r6d(dec.toDouble / qs.length))
  }

  // --------------------------------------------------- dq_referential

  test("dq referential: six clean checks on the generated star; rows reconcile") {
    val rows = Round6Ops7.dqReferential(spark, sf).collect()
    assert(rows.length == 6)
    val li = graft.sources.Tables.lineitem(spark, sf).count()
    val ord = graft.sources.Tables.orders(spark, sf).count()
    val byFk = rows.map(r => r.getString(0) -> r).toMap
    assert(byFk("lineitem.l_orderkey->orders.o_orderkey").getLong(1) == li)
    assert(byFk("orders.o_custkey->customer.c_custkey").getLong(1) == ord)
    rows.foreach { r =>
      // the generated star is referentially clean — the audit must agree
      assert(r.getLong(3) == 0 && r.getLong(4) == 0, s"orphans in ${r.getString(0)}")
      assert(r.getDouble(5) == 0.0)
      assert(r.getLong(2) <= r.getLong(1)) // keys <= rows
    }
  }

  test("dq referential: injected orphans are counted in both units") {
    import spark.implicits._
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "x"), (9L, "y"),
                    (8L, "z")).toDF("k", "v")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val row = Round6Ops7.fkCheck("t", child, "k", parent, "p").collect().head
    assert(row.getLong(1) == 6)           // child rows
    assert(row.getLong(2) == 4)           // child keys
    assert(row.getLong(3) == 3)           // orphan rows (9,9,8)
    assert(row.getLong(4) == 2)           // orphan keys (9,8)
    assert(row.getDouble(5) == Parity.r6d(3.0 / 6.0))
  }

  // -------------------------------------------------- ts_mann_kendall

  test("mann-kendall: driver replay of S, ties, variance and z for every user") {
    val rows = Round6Ops7.tsMannKendall(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.operators.Mhw.daily(spark, sf)
      .select(col("user_id"), col("d"), col("sst")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val uid = r.getLong(0)
      val all = daily(uid).map(t => (t._2, t._3)).sortBy(_._1.toEpochDay)
      val dmax = all.map(_._1.toEpochDay).max
      val win = all.filter(p => dmax - p._1.toEpochDay < 90)
      val n = win.length
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == n.toLong * (n - 1) / 2)
      val s = (for {
        i <- win.indices; j <- i + 1 until n
      } yield math.signum(win(j)._2 - win(i)._2).toLong).sum
      assert(r.getLong(3) == s)
      val tie = win.groupBy(_._2).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n.toLong * (n - 1) * (2L * n + 5) - tie) / 18.0
      assert(r.getDouble(4) == Parity.r6d(varS))
      val z =
        if (varS <= 0) 0.0
        else if (s > 0) Parity.r6d((s - 1) / math.sqrt(Parity.r6d(varS)))
        else if (s < 0) Parity.r6d((s + 1) / math.sqrt(Parity.r6d(varS)))
        else 0.0
      assert(r.getDouble(5) == z)
      val expTrend =
        if (z > 1.96) "increasing" else if (z < -1.96) "decreasing" else "none"
      assert(r.getString(6) == expTrend)
    }
  }

  test("mann-kendall: monotone series maxes S; constant series has zero variance") {
    import spark.implicits._
    val up = (0 until 30).map(i =>
      (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
       i.toDouble))
    val const = (0 until 30).map(i =>
      (2L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
       5.0))
    val dl = (up ++ const).toDF("user_id", "d", "sst")
    val out = Round6Ops7.tsMannKendallDf(dl).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(3) == 30L * 29 / 2)       // every pair ascends
    assert(out(1L).getString(6) == "increasing")
    assert(out(2L).getLong(3) == 0)
    assert(out(2L).getDouble(4) == 0.0)              // all one tie group
    assert(out(2L).getDouble(5) == 0.0)
    assert(out(2L).getString(6) == "none")
  }

  // ------------------------------------------------------- emb_mmd

  test("mmd: full upper triangle; cohorts partition the corpus; total replayed") {
    val rows = Round6Ops7.embMmd(spark, sf).collect()
    val d = Round6Ops7.MmdDims
    assert(rows.length == d * (d + 1) / 2)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    rows.foreach(r => assert(r.getLong(2) + r.getLong(3) == n))
    val mmd2 = rows.head.getDouble(7)
    assert(rows.forall(_.getDouble(7) == mmd2))
    assert(mmd2 >= 0.0)
    val dec = rows.map(_.getDouble(6))
      .map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(mmd2 == Parity.r6d(dec.toDouble))
    // random halves of one corpus should be close in second moments
    assert(mmd2 < 0.05, s"suspicious cohort divergence $mmd2")
  }

  test("mmd: identical cohorts give exactly zero") {
    import spark.implicits._
    val vecs = (0 until 10).map { i =>
      // vector content depends only on i/2 → even id 2k and odd id 2k+1
      // carry the same vector, so the cohorts are identical multisets
      (i.toLong, Array.tabulate(16)(j => ((i / 2) * 17 + j).toFloat / 100f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val rows = Round6Ops7.embMmdDf(emb).collect()
    rows.foreach { r =>
      assert(r.getDouble(4) == r.getDouble(5)) // m_even == m_odd
      assert(r.getDouble(6) == 0.0)
      assert(r.getDouble(7) == 0.0)
    }
  }
}
