package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Analytics2, Relational2}

/** Invariants for the warehouse/pipeline analytics operators (SURVEY §2
  * H + the second TPC-H tranche) — the DuckDB oracle pins exact values;
  * these pin algebraic properties the oracle can't express. */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  private val sf = "/root/testdata/sf0.001"

  test("salted two-phase agg ≡ direct aggregate (decimal associativity)") {
    val salted = Analytics.eventsSaltedAgg(spark, sf)
      .orderBy("event_type").collect()
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(Parity.dsum(col("value"), 4).as("sum_value"),
           count(lit(1)).cast("long").as("n"))
      .orderBy("event_type").collect()
    assert(salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
           direct.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("rollup: grand-total row equals the sum of leaf rows") {
    val out = Analytics.eventsRollup(spark, sf).collect()
    val leaves = out.filter(_.getAs[Long]("gid") == 0L)
    val grand = out.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == leaves.map(_.getAs[Long]("n")).sum)
  }

  test("dedup clusters: edges stay within clusters; representatives are fixpoints") {
    val clusters = Analytics.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.operators.TextOps.dedupNgramJaccard(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b)) }
    // every cluster representative labels itself
    clusters.values.toSet.foreach((c: Long) => assert(clusters(c) == c))
    // cluster id is the minimum member id
    clusters.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c)
    }
  }

  test("stratified sample: en sampled at a visibly lower rate") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Analytics.sampleStratified(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = sampled.getOrElse("en", 0L).toDouble / totals("en")
    val otherRate = (sampled - "en").values.sum.toDouble /
      (totals - "en").values.sum
    assert(enRate < otherRate)
    assert(enRate > 0.0 && enRate < 0.25)
  }

  test("q13 custdist partitions the customer table") {
    val total = graft.sources.Tables.customer(spark, sf).count()
    val dist = Relational2.q13Custdist(spark, sf).collect()
    assert(dist.map(r => r.getAs[Long]("custdist")).sum == total)
  }

  test("anomaly flags are symmetric-tail outliers (|z| > 3)") {
    val out = Analytics.eventsAnomaly(spark, sf).collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("z")) > 3.0))
  }

  test("hll estimate within 3σ (≈40%) of exact for m=64") {
    Analytics2.eventsApproxDistinct(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact < 0.40,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("percentiles are monotone and bracket the group range") {
    Analytics2.eventsPercentiles(spark, sf).collect().foreach { r =>
      val p50 = r.getAs[Double]("p50")
      val p90 = r.getAs[Double]("p90")
      val p99 = r.getAs[Double]("p99")
      assert(p50 <= p90 && p90 <= p99)
    }
  }
}
