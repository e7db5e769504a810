package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops7

/** Round-9 batch-7 operators (#318-#319). */
class Round9Ops7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("emb_cka_halves: duplicated halves give CKA = 1; independent axes give CKA ~ 0") {
    import spark.implicits._
    // 4-dim vectors whose second half IS the first half -> C_AB = C_AA =
    // C_BB and CKA = 1 exactly
    val dup = Seq.tabulate(40) { i =>
      val a = Array((i % 7).toFloat, (i % 3).toFloat)
      Tuple1(a ++ a)
    }.toDF("embedding")
    val d1 = Round9Ops7.embCkaHalvesDf(dup, 2).collect()(0)
    assert(d1.getLong(0) == 40 && d1.getInt(1) == 2)
    assert(math.abs(d1.getDouble(5) - 1.0) < 1e-4, s"dup halves CKA ${d1.getDouble(5)}")
    // second half varies on an axis uncorrelated with the first
    // (balanced grid: i%4 and i/4%4 are independent factors)
    val ind = Seq.tabulate(64) { i =>
      Tuple1(Array((i % 4).toFloat, 1f, (i / 4 % 4).toFloat, 1f))
    }.toDF("embedding")
    val d2 = Round9Ops7.embCkaHalvesDf(ind, 2).collect()(0)
    assert(d2.getDouble(5) < 0.05, s"independent halves CKA ${d2.getDouble(5)}")
  }

  test("emb_cka_halves: corpus readout bounded and consistent") {
    val r = Round9Ops7.embCkaHalves(spark, sf).collect()(0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0 + 1e-6)
    assert(r.getDouble(2) >= 0 && r.getDouble(3) > 0 && r.getDouble(4) > 0)
  }

  test("ts_hurst: a pure trend is persistent (H near 1); constant series drop") {
    import spark.implicits._
    val trend = (0 until 64).map(t =>
      (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(t)),
       t.toDouble))
    val const = (0 until 64).map(t =>
      (2L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(t)),
       5.0))
    val dl = (trend ++ const).toDF("user_id", "d", "sst")
    val out = Round9Ops7.tsHurstDf(dl).collect()
    assert(out.length == 1, "constant series has zero block variance and drops")
    val r = out(0)
    assert(r.getLong(0) == 1L)
    assert(r.getDouble(3) > 0.9, s"trend Hurst ${r.getDouble(3)}")
    assert(r.getString(4) == "persistent")
  }

  test("ts_hurst: corpus regimes match the estimate bands") {
    val out = Round9Ops7.tsHurst(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 4, "all four scales present")
      val h = r.getDouble(3)
      val reg = r.getString(4)
      assert(if (h > 0.55) reg == "persistent"
             else if (h < 0.45) reg == "antipersistent" else reg == "noise")
    }
  }
}
