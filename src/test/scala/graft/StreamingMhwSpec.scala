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

  private def d(idx: Int, sev: Double = 2.0): SevIn =
    SevIn(1L, idx, sev * 1.5, sev)

  test("foldMhw late data: out-of-order rows above the horizon are folded " +
       "exactly as if in-order (open-chain region repair)") {
    // in-order reference: one 0..7 run, closed by a later 12..14 run
    val closer = Seq(d(12), d(13), d(14))
    val (ref, refState) = foldChunks(Seq((0 to 7).map(d(_)), closer))
    // days 3 and 5 arrive a chunk LATE, while their chain is still open
    val (late, lateState) = foldChunks(Seq(
      Seq(0, 1, 2, 4, 6, 7).map(d(_)), Seq(d(3), d(5)), closer))
    assert(late == ref, "late-but-above-horizon rows must repair the open chain")
    assert(lateState.map(s => (s.evtBase, s.days)) ==
           refState.map(s => (s.evtBase, s.days)))
  }

  test("foldMhw late data: rows at/before the horizon are dropped — closed " +
       "events are never re-emitted, mutated, or bridged into") {
    // chain A (0..9), closed by chain B (15..17): horizon becomes 14
    val (emitted1, st1) = foldChunks(Seq((0 to 9).map(d(_)), (15 to 17).map(d(_))))
    assert(emitted1.map(e => (e.index_start, e.index_end)) == Seq((0, 9)))
    assert(st1.get.horizon == 14)
    // a late qualifying fragment 11..13 — in-order it would have gap-joined
    // A (11−9 ≤ 2) — arrives after A closed: dropped entirely
    var state = st1
    val gs = TestGroupState.create[MhwStreamState](
      org.apache.spark.api.java.Optional.fromNullable(state.orNull),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), false)
    val lateOut = StreamingMhw.foldMhw(1L, (11 to 13).map(d(_)).iterator, gs).toSeq
    assert(lateOut.isEmpty, "late fragment behind the horizon must not emit")
    state = if (gs.exists) Some(gs.get) else None
    assert(state.map(s => (s.evtBase, s.days, s.horizon)) ==
           st1.map(s => (s.evtBase, s.days, s.horizon)),
      "an entirely-late batch must leave state untouched")
    // subsequent in-order flow closes B at its recorded span — the
    // dropped fragment neither bridged B back to A nor shifted B's start
    val gs2 = TestGroupState.create[MhwStreamState](
      org.apache.spark.api.java.Optional.fromNullable(state.orNull),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), false)
    val out2 = StreamingMhw.foldMhw(1L,
      ((18 to 19).map(d(_)) ++ (25 to 27).map(d(_))).iterator, gs2).toSeq
    assert(out2.map(e => (e.evt, e.index_start, e.index_end)) == Seq((2L, 15, 19)))
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
