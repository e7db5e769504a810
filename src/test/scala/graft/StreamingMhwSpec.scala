package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mhw
import graft.streaming.{MhwStreamState, SevIn, StreamingMhw}

/** Incremental MHW detection: batch ↔ stream parity and the in-order
  * chunking invariance of the stateful fold. */
class StreamingMhwSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  /** Drive the pure fold over chunks through a TestGroupState, exactly
    * as flatMapGroupsWithState would. */
  private def foldChunks(chunks: Seq[Seq[SevIn]]): (Seq[graft.streaming.MhwStreamEvent], Option[MhwStreamState]) = {
    var state: Option[MhwStreamState] = None
    val out = Seq.newBuilder[graft.streaming.MhwStreamEvent]
    chunks.foreach { chunk =>
      val gs = TestGroupState.create[MhwStreamState](
        org.apache.spark.api.java.Optional.fromNullable(state.orNull),
        GroupStateTimeout.NoTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](), false)
      out ++= StreamingMhw.foldMhw(1L, chunk.iterator, gs)
      state = if (gs.exists) Some(gs.get) else None
    }
    (out.result(), state)
  }

  test("foldMhw: emission is invariant to in-order chunking (property)") {
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 200) {
      // random day grid with holes, random severity pattern with bursts
      val nDays = 20 + rnd.nextInt(60)
      val days = (0 until nDays).flatMap { i =>
        if (rnd.nextDouble() < 0.12) None // absent day breaks runs
        else {
          val sev =
            if (rnd.nextDouble() < 0.45) 1.0 + rnd.nextInt(30) / 10.0
            else rnd.nextDouble()
          Some(SevIn(1L, i, math.floor(sev * 3 * 1e6) / 1e6, sev))
        }
      }
      // single-shot reference
      val (oneShot, oneState) = foldChunks(Seq(days))
      // random in-order split into 2-5 chunks
      val nChunks = 2 + rnd.nextInt(4)
      val cuts = Seq.fill(nChunks - 1)(rnd.nextInt(days.size + 1)).sorted
      val bounds = (0 +: cuts) :+ days.size
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => days.slice(a, b) }
      val (multi, multiState) = foldChunks(chunks)
      assert(multi == oneShot, s"trial $trial: emitted events diverge under chunking")
      assert(multiState.map(_.evtBase) == oneState.map(_.evtBase), s"trial $trial: state diverges")
    }
  }

  test("foldMhw: emitted chains equal batch chains minus the open tail") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val days = (0 until 80).flatMap { i =>
        if (rnd.nextDouble() < 0.1) None
        else Some(SevIn(1L, i, rnd.nextDouble(), if (rnd.nextDouble() < 0.5) 1.5 else 0.5))
      }
      val all = StreamingMhw.chains(days.toIndexedSeq)
      val (emitted, _) = foldChunks(Seq(days))
      assert(emitted.map(e => (e.index_start, e.index_end)) == all.dropRight(1))
      assert(emitted.map(_.evt) == (1 to (all.size - 1).max(0)).map(_.toLong))
    }
  }

  test("stream_mhw_events: closed events equal batch events minus each series' last") {
    val batch = Mhw.mhwEvents(spark, sf)
    val lastPerUser = batch.groupBy("user_id").agg(max("evt").as("evt"))
    val expected = batch.join(lastPerUser, Seq("user_id", "evt"), "left_anti")
      .collect().map(_.toSeq).toSet
    val streamed = StreamingMhw.runMhwEventsStream(spark, sf, "mhw_spec")
      .select(batch.columns.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("stream_mhw_events: state carries event chains across micro-batches") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // split the severity table at the median date into two files;
    // maxFilesPerTrigger=1 forces chains spanning the cut to survive a
    // batch boundary in state
    val sev = Mhw.severityChain(spark, sf, 0.6)
    val d0 = sev.agg(min(col("d")).as("d0")).head.getDate(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhw_stream").toString
    val withIdx = sev.select(col("user_id"),
      datediff(col("d"), lit(d0)).as("idx"), col("t_anom"), col("severity"))
    val cut = withIdx.selectExpr("percentile(idx, 0.5)")
      .collect()(0).getDouble(0).toInt
    withIdx.filter(col("idx") <= cut).coalesce(1).write.parquet(s"$dir/in/b=0")
    withIdx.filter(col("idx") > cut).coalesce(1).write.parquet(s"$dir/in/b=1")

    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("idx", IntegerType),
      StructField("t_anom", DoubleType), StructField("severity", DoubleType),
      StructField("b", IntegerType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      .select(col("user_id"), col("idx"), col("t_anom"), col("severity"))
      .as[SevIn]
    val q = src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StreamingMhw.foldMhw _)
      .writeStream.format("memory").queryName("mhw_batches")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.map(_.batchId).distinct.length >= 2)

    val streamed = spark.table("mhw_batches")
      .select("user_id", "evt", "index_start", "index_end", "duration",
              "index_peak", "intensity_max", "intensity_mean", "intensity_cumul")
      .collect().map(_.toSeq).toSet
    val oneShot = StreamingMhw.runMhwEventsStream(spark, sf, "mhw_oneshot")
      .select("user_id", "evt", "index_start", "index_end", "duration",
              "index_peak", "intensity_max", "intensity_mean", "intensity_cumul")
      .collect().map(_.toSeq).toSet
    assert(streamed == oneShot)
    assert(streamed.nonEmpty)
  }
}
