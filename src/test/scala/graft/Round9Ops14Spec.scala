package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops14

/** Round-9 batch-14 operators (#334-#335). */
class Round9Ops14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def dayTs(day: Int, k: Int) =
    java.sql.Timestamp.valueOf(f"2024-02-${day + 1}%02d ${8 + (k % 12)}%02d:00:00")

  // Type "flat": exactly 10 events on each of 20 days -> var 0, D 0,
  // z = -sqrt(19/2) ≈ -3.082 -> underdispersed.
  // Type "bursty": alternating 1 and 99 events over 20 days -> D huge
  // -> overdispersed.
  test("events_overdispersion: planted flat and bursty feeds get the right verdicts") {
    import spark.implicits._
    val flat = for (d <- 0 until 20; k <- 0 until 10)
      yield ("flat", dayTs(d, k))
    val bursty = for (d <- 0 until 20;
                      k <- 0 until (if (d % 2 == 0) 1 else 99))
      yield ("bursty", dayTs(d, k))
    val ev = (flat ++ bursty).toDF("event_type", "ts")
    val out = Round9Ops14.overdispersionDf(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val f = out("flat")
    assert(f.getLong(1) == 20 && f.getDouble(2) == 10.0)
    assert(f.getDouble(3) == 0.0 && f.getDouble(4) == 0.0)
    assert(f.getString(6) == "underdispersed")
    val b = out("bursty")
    assert(b.getDouble(4) > 1.0, "variance far above the mean")
    assert(b.getString(6) == "overdispersed")
  }

  test("events_overdispersion: corpus run — one row per type, defined stats") {
    val out = Round9Ops14.eventsOverdispersion(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 1)
      assert(r.getDouble(4) >= 0.0, "dispersion index non-negative")
      assert(Set("poisson", "overdispersed", "underdispersed")
        .contains(r.getString(6)))
    }
  }

  // Uniform docs pack into near-equal shards: straggler factor near 1,
  // no underfull shard except possibly the tail.
  test("corpus_shard_skew: uniform docs pack evenly, a giant doc shows up as skew") {
    import spark.implicits._
    val uniform = (0L until 64L).map(i => (i, "web", "x" * 400))
    val docs = uniform.toDF("doc_id", "source", "text")
    val out = Round9Ops14.shardSkewDf(
      graft.operators.Curation.corpusShardPackDf(docs, 1600L), 1600L).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 16, "64 docs x 400 B at 1600 B -> 16 full shards")
    assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 1.0,
      "uniform packing: zero CV, straggler factor 1")
    assert(r.getDouble(8) == 0.0)
    // one 8 kB doc among small ones -> its shard dominates
    val skewed = (uniform ++ Seq((100L, "web", "y" * 8000)))
      .toDF("doc_id", "source", "text")
    val r2 = Round9Ops14.shardSkewDf(
      graft.operators.Curation.corpusShardPackDf(skewed, 1600L), 1600L)
      .collect()(0)
    assert(r2.getDouble(7) > 1.5, "straggler factor exposes the giant doc")
  }

  test("corpus_shard_skew: corpus run — totals reconcile with the corpus byte mass") {
    import org.apache.spark.sql.functions._
    val out = Round9Ops14.corpusShardSkew(spark, sf)
    val total = out.agg(sum(col("total_bytes"))).collect()(0).getLong(0)
    val direct = graft.sources.Tables.documents(spark, sf)
      .agg(sum(octet_length(col("text").cast("binary")).cast("long")))
      .collect()(0).getLong(0)
    assert(total == direct, "every byte lands in exactly one shard")
    out.collect().foreach { r =>
      assert(r.getDouble(7) >= 1.0 - 1e-9, "max >= mean always")
    }
  }
}
