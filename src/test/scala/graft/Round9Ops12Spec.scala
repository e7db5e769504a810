package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops12
import graft.sources.Evolution

/** Round-9 batch-12 operators (#330-#331). */
class Round9Ops12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // Hand family: p_raw values spread so the corrections differ.
  // t=5 -> p≈0 (significant under everything); t=0.1 -> p≈0.92 (never).
  test("events_multiple_testing: Holm dominates BH, monotone adjustments") {
    import spark.implicits._
    val fam = Seq(
      ("a", "b", 5.0), ("a", "c", 2.5), ("a", "d", 1.9),
      ("b", "c", 1.0), ("b", "d", 0.5), ("c", "d", 0.1)
    ).toDF("type_a", "type_b", "t_stat")
    val out = Round9Ops12.multipleTestingDf(fam).collect()
      .sortBy(r => r.getInt(4))
    assert(out.length == 6 && out.forall(_.getLong(5) == 6L))
    // adjusted ps are monotone in rank and >= raw
    out.sliding(2).foreach { case Array(x, y) =>
      assert(x.getDouble(6) <= y.getDouble(6), "Holm monotone")
      assert(x.getDouble(7) <= y.getDouble(7), "BH monotone")
      case _ => ()
    }
    out.foreach { r =>
      assert(r.getDouble(6) >= r.getDouble(3) - 1e-9, "Holm >= raw")
      assert(r.getDouble(7) >= r.getDouble(3) - 1e-9, "BH >= raw")
      assert(r.getDouble(6) >= r.getDouble(7) - 1e-9, "Holm >= BH (FWER stricter)")
      if (r.getBoolean(8)) assert(r.getBoolean(9), "Holm rejections are BH rejections")
    }
    // the t=5 pair survives Holm; the t=0.1 pair survives nothing
    val top = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(top.getBoolean(8) && top.getBoolean(9))
    val dud = out.find(r => r.getString(0) == "c" && r.getString(1) == "d").get
    assert(!dud.getBoolean(8) && !dud.getBoolean(9))
  }

  test("events_multiple_testing: p_raw matches the normal tail to 4dp") {
    import spark.implicits._
    // 2*(1-Phi(1.96)) = 0.0500, 2*(1-Phi(2.5758)) = 0.0100
    val fam = Seq(("x", "y", 1.959964), ("x", "z", 2.575829))
      .toDF("type_a", "type_b", "t_stat")
    val out = Round9Ops12.multipleTestingDf(fam).collect()
      .map(r => (r.getString(1), r.getDouble(3))).toMap
    assert(math.abs(out("y") - 0.05) < 5e-4)
    assert(math.abs(out("z") - 0.01) < 5e-4)
  }

  test("events_multiple_testing: corpus family is complete and ordered") {
    val out = Round9Ops12.eventsMultipleTesting(spark, sf).collect()
    assert(out.nonEmpty)
    val m = out.head.getLong(5)
    assert(out.length == m, "one row per family member")
    assert(out.map(_.getInt(4)).sorted.toSeq == (1 to m.toInt).toSeq)
  }

  test("events_schema_evolution: pre-epoch misses the added column, post covers it") {
    val out = Evolution.eventsSchemaEvolution(spark, sf).collect()
    assert(out.nonEmpty)
    val (e1, e2) = out.partition(_.getInt(0) == 1)
    assert(e1.nonEmpty && e2.nonEmpty)
    e1.foreach { r =>
      assert(r.getLong(4) == r.getLong(2), "epoch 1: every row misses user_id")
      assert(r.getDouble(5) == 0.0)
    }
    e2.foreach { r =>
      assert(r.getLong(4) == 0L, "epoch 2: user_id fully present")
      assert(r.getDouble(5) == 1.0)
    }
  }

  test("events_schema_evolution: merged scan reconciles with direct slices") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val direct = ev
      .filter(to_date(col("ts")).between("2024-01-08", "2024-01-21"))
      .count()
    val merged = Evolution.eventsSchemaEvolution(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(merged == direct)
  }
}
