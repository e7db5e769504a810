package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events
import graft.streaming.Streaming

/** Batch↔stream parity: the same logical operation executed through
  * Structured Streaming must agree with its batch expression. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("stream_window_counts: streaming run equals batch run") {
    val batch = Streaming.streamWindowCounts(spark, sf)
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = Streaming.runWindowCountsStream(spark, sf)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(stream == batch)
  }

  test("stream_sessionize: closed sessions equal batch sessions minus each user's open tail") {
    val batch = Events.sessionize(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events")
    // each user's last session never closes while the stream drains
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_start").as("session_start"))
    val expected = batch.join(lastPerUser, Seq("user_id", "session_start"),
        "left_anti")
      .collect().map(_.toSeq).toSet

    val streamed = Streaming.runSessionizeStream(spark, sf, "sess_spec")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet

    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }
}
