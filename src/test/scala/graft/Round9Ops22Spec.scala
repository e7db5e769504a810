package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops22

/** Round-9 batch-22 operators (#350-#351). */
class Round9Ops22Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("q1_incremental: state ⊕ delta ≡ full recompute, bit for bit") {
    val full = graft.operators.Relational.q1Pricing(spark, sf)
      .collect().toSeq
    val inc = Round9Ops22.q1Incremental(spark, sf).collect().toSeq
    assert(inc == full)
    // the split must be non-trivial for the test to mean anything
    val cutoffCount = graft.sources.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-03-01").cast("timestamp"))
      .count()
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(cutoffCount > 0 && cutoffCount < total,
      "both the state and the delta slice are non-empty")
  }

  // Arrival order 0,1,2,3 with timestamps 100, 50, 200, 190: running max
  // 100,100,200,200 -> lateness 0,50,0,10.
  test("events_lateness_audit: hand feed — lateness against the running max") {
    import spark.implicits._
    val ev = Seq(
      ("a", 0L, 100L), ("a", 1L, 50L), ("a", 2L, 200L), ("a", 3L, 190L)
    ).map { case (t, id, s) => (t, id, new java.sql.Timestamp(s * 1000L)) }
      .toDF("event_type", "event_id", "ts")
    val r = Round9Ops22.latenessAuditDf(ev).collect()(0)
    assert(r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.5, "half the events arrive late")
    assert(r.getLong(6) == 50, "worst lateness is the 50 s straggler")
    assert(r.getDouble(3) == 5.0, "median of (0, 0, 10, 50)")
  }

  test("events_lateness_audit: two-level watermark — bucketed scan matches the one-bucket plan") {
    import spark.implicits._
    // adversarial feed: two types, ids interleaved, late stragglers at
    // bucket boundaries (id 7→8 crosses the width-4 bucket edge)
    val ev = (0L until 40L).map { id =>
      val t = if (id % 2 == 0) "a" else "b"
      val es = if (id % 7 == 3) id * 10 - 25 else id * 10
      (t, id, new java.sql.Timestamp(es * 1000L))
    }.toDF("event_type", "event_id", "ts")
    val tiny = Round9Ops22.latenessAuditDf(ev, bucketWidth = 4L)
      .collect().toSeq
    val one = Round9Ops22.latenessAuditDf(ev, bucketWidth = 1000000L)
      .collect().toSeq
    assert(tiny == one, "bucketing must not change the watermark")
  }

  test("events_lateness_audit: no fact-side window partitioned by event_type alone") {
    val df = Round9Ops22.eventsLatenessAudit(spark, sf)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        (w.partitionSpec.flatMap(_.references.map(_.name)).toSet, w)
    }
    assert(wins.nonEmpty)
    // the fact-scale window must carry the bucket key; the only
    // type-partitioned window runs over the aggregated bucket maxima
    wins.foreach { case (keys, w) =>
      if (keys == Set("event_type")) {
        val overAgg = w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
        }.isDefined
        assert(overAgg,
          "a type-only window is allowed only over the bucket-maxima rollup")
      } else assert(keys.contains("bkt"),
        s"fact-side window must be bucket-partitioned, got $keys")
    }
  }

  test("events_lateness_audit: corpus run — quantiles ordered, non-negative") {
    val out = Round9Ops22.eventsLatenessAudit(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p95, p99) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p50 >= 0 && p50 <= p95 && p95 <= p99 && p99 <= r.getLong(6))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }
}
