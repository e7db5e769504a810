package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round6Ops, Round6Ops5}

/** Invariants + reconciliations for round-6 batches 17-19 (#177-#187). */
class Round6Ops5Spec extends AnyFunSuite {

  lazy val spark = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------ stream_holt_winters

  test("stream holt-winters: drained stream is bit-identical to batch ts_holt_winters") {
    val batch = Round6Ops.tsHoltWinters(spark, sf).collect()
      .map(_.toSeq).sortBy(r => (r.head.asInstanceOf[Long], r(4).asInstanceOf[Int]))
    val stream = graft.streaming.StreamingHolt.streamHoltWinters(spark, sf)
      .collect()
      .map(_.toSeq).sortBy(r => (r.head.asInstanceOf[Long], r(4).asInstanceOf[Int]))
    assert(stream.toSeq == batch.toSeq)
  }

  test("stream holt-winters: fold is arrival-order invariant (reversed input)") {
    import graft.streaming.StreamingHolt
    val ev = graft.sources.Tables.events(spark, sf)
    val fwd = StreamingHolt.finalizeHw(StreamingHolt.hwFold(ev).toDF())
      .collect().map(_.toSeq).toSeq
    val rev = StreamingHolt.finalizeHw(
        StreamingHolt.hwFold(ev.orderBy(col("ts").desc)).toDF())
      .collect().map(_.toSeq).toSeq
    assert(fwd == rev)
  }

  // ------------------------------------------------ orders_rfm_migration

  test("rfm migration: shares sum to 1; half populations reconcile; no phantom flows") {
    val rows = Round6Ops5.ordersRfmMigration(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(!rows.exists(r => r.getString(0) == "ABSENT" && r.getString(1) == "ABSENT"))
    val o = graft.sources.Tables.orders(spark, sf)
    val nCust = o.select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nCust)
    // customers present in the first half = rows whose seg_a != ABSENT
    val mid = o.agg(expr(
      "(min(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000) + " +
      "max(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000)) div 2"))
      .collect()(0).getLong(0)
    val firstHalf = o.filter(
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000") <= mid)
      .select("o_custkey").distinct().count()
    assert(rows.filter(_.getString(0) != "ABSENT").map(_.getLong(2)).sum == firstHalf)
  }

  // ------------------------------------------------ corpus_vocab_growth

  test("vocab growth: both curves monotone; vocab bounded by tokens; beta in a sane band") {
    val rows = Round6Ops5.corpusVocabGrowth(spark, sf).orderBy("decile").collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 9))
    val toks = rows.map(_.getLong(1)); val voc = rows.map(_.getLong(2))
    assert(toks.zip(toks.tail).forall { case (a, b) => b >= a })
    assert(voc.zip(voc.tail).forall { case (a, b) => b >= a })
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val beta = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == beta))
    assert(beta > 0.0 && beta < 1.2, s"beta=$beta")
    // final vocab equals the corpus distinct-token count
    val total = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), " ")).as("t"))
      .filter(length(col("t")) > 0).distinct().count()
    assert(voc.last == total)
  }

  // --------------------------------------------- lineitem_price_variance

  test("price variance: moments replay for one part; extremes bracket the mean; cv nonnegative") {
    val rows = Round6Ops5.lineitemPriceVariance(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= Round6Ops5.PriceVarMinLines)
      assert(r.getDouble(5) <= r.getDouble(2) + 1e-9) // min <= mean
      assert(r.getDouble(6) >= r.getDouble(2) - 1e-9) // max >= mean
      assert(r.getDouble(3) >= 0.0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
    }
    // driver-side replay for the first part
    val pk = rows.head.getLong(0)
    val us = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === pk && col("l_quantity") > 0)
      .select((col("l_extendedprice") / col("l_quantity")).as("u"))
      .collect().map(_.getDouble(0))
    assert(rows.head.getLong(1) == us.length)
    val su = us.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    val mean = Parity.r6d(su.toDouble / us.length)
    assert(rows.head.getDouble(2) == mean)
  }

  // ------------------------------------------------------- emb_hubness

  test("hubness: histogram accounts for every vector; in-degree mass = k x n; one skewness") {
    val rows = graft.operators.Similarity3.embHubness(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n)
    // every kNN edge lands on some vector's in-degree
    val edges = graft.operators.Similarity.knnGraph(spark, sf, 3).count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == edges)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    val sk = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == sk))
  }

  // ------------------------------------------ part_discount_elasticity

  test("elasticity: OLS replay for one brand at 6dp") {
    val rows = Round6Ops5.partDiscountElasticity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(4)).foreach(r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9))
    val brand = rows.head.getString(0)
    val xs = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf)
              .filter(col("p_brand") === brand).select("p_partkey"),
            col("l_partkey") === col("p_partkey"))
      .select("l_discount", "l_quantity").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    def dsum(vs: Seq[Double]) =
      vs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val nn = xs.length.toDouble
    val (sx, sy) = (dsum(xs.map(_._1)), dsum(xs.map(_._2)))
    val sxy = dsum(xs.map(p => p._1 * p._2))
    val sxx = dsum(xs.map(p => p._1 * p._1))
    val slope = Parity.r6d((sxy - sx * sy / nn) / (sxx - sx * sx / nn))
    assert(rows.head.getLong(1) == xs.length)
    assert(rows.head.getDouble(2) == slope)
  }

  // --------------------------------------------- events_session_paths

  test("session paths: at most 20 ranked rows, frequency-ordered, conversion bounded") {
    val rows = Round6Ops5.eventsSessionPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Round6Ops5.SessionPathTop)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getString(0).split(">").length <= Round6Ops5.SessionPathLen)
    }
  }

  // --------------------------------------------- text_boilerplate_share

  test("boilerplate share: complements novelty; bounded; covers every shingled doc") {
    val rows = graft.operators.TextOps2.textBoilerplateShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // every doc with >= 1 shingle (>= 3 tokens) appears exactly once
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(size(split(lower(trim(col("text"))), " ")) >= 3).count()
    assert(rows.length.toLong == docs)
  }

  // --------------------------------------------- corpus_mix_temperature

  test("mix temperature: each tau's weights sum to 1; lower tau flattens toward uniform") {
    val rows = Round6Ops5.corpusMixTemperature(spark, sf).collect()
    val byTau = rows.groupBy(_.getString(0))
    assert(byTau.keySet == Set("1.00", "0.75", "0.50", "0.25"))
    byTau.foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(5)).sum - 1.0) < 1e-4)
    }
    // tau = 1 weights equal the natural shares
    byTau("1.00").foreach(r => assert(math.abs(r.getDouble(5) - r.getDouble(4)) < 2e-6))
    // flattening: max weight shrinks monotonically as tau drops
    val maxW = Seq("1.00", "0.75", "0.50", "0.25")
      .map(t => byTau(t).map(_.getDouble(5)).max)
    assert(maxW.zip(maxW.tail).forall { case (a, b) => b <= a + 1e-9 })
    // epochs > 1 exactly for under-represented groups (weight > share)
    rows.filter(r => !r.isNullAt(6)).foreach { r =>
      assert((r.getDouble(6) > 1.0) == (r.getDouble(5) > r.getDouble(4)))
    }
  }

  // ----------------------------------------------- events_fraud_velocity

  test("fraud velocity: window maxima bounded by totals; flag matches threshold; burst replay") {
    val rows = Round6Ops5.eventsFraudVelocity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getBoolean(4) == (r.getLong(2) >= Round6Ops5.VelocityFlagAt))
    }
    // driver-side replay of the trailing-hour max for one user
    val uid = rows.head.getLong(0)
    val us = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(Parity.epochUs(col("ts")).as("us")).orderBy("us")
      .collect().map(_.getLong(0))
    val maxInHour = us.map(t =>
      us.count(u => u > t - Round6Ops5.VelocityWindowUs && u <= t)).max
    assert(rows.head.getLong(2) == maxInHour)
  }

  // ---------------------------------------- events_dormancy_reactivation

  test("dormancy: buckets respect their day ranges; counts reconcile with a direct gap scan") {
    val rows = Round6Ops5.eventsDormancyReactivation(spark, sf).collect()
    assert(rows.nonEmpty)
    val valid = Set("a_25_48h", "b_49_72h", "c_73h_plus")
    rows.foreach { r =>
      assert(valid.contains(r.getString(0)))
      assert(r.getLong(2) <= r.getLong(1)) // users <= dormancies
      val m = r.getDouble(3)
      r.getString(0) match {
        case "a_25_48h" => assert(m > 24 && m <= 48)
        case "b_49_72h" => assert(m > 48 && m <= 72)
        case _          => assert(m > 72)
      }
    }
    val direct = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Parity.epochUs(col("ts")).as("us"))
      .withColumn("gap", expr(
        "(us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)) div 3600000000"))
      .filter(col("gap") > 24).count()
    assert(rows.map(_.getLong(1)).sum == direct)
  }
}
