package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.sources.Tables

/** #126 stream_holt: the #115 Holt level/trend smoother maintained
  * incrementally over the events stream. The recursion itself is
  * order-sensitive, so the state is NOT (l, b): it is the per-day
  * decimal partials — day → (scale-10 unscaled sum, count) — and each
  * emission re-folds the sorted day axis. That makes the operator
  * arrival-order and chunking INVARIANT (partials commute; late or
  * out-of-order days land in their slot), at O(days) state per key —
  * calendar-bounded, the same boundedness argument as the panel-mean
  * broadcast in ts_cross_corr, and the same emit-cumulative/last-wins
  * protocol as stream_kmv. The re-fold per emission costs O(days) with
  * the identical arithmetic as batch ts_holt (davg per day, 6dp-rounded
  * α/β steps), so the drained stream is BIT-IDENTICAL to the batch
  * operator (spec-pinned) and shares its oracle.
  */
object StreamingHolt {

  private[graft] case class HoltIn(user_id: Long, day: Int, value: Double)
  private[graft] case class HoltState(
      upd: Int, days: Map[Int, (Long, Long)])
  private[graft] case class HoltEmit(
      user_id: Long, upd: Int, n_obs: Long,
      level: Double, trend: Double, forecast: Double)

  import graft.Parity.{dec10Unscaled, dec10ToDouble, r6d}

  /** The batch chain's arithmetic over the day partials: davg per day
    * (decimal sum → double, / count, r6), then the α=0.5/β=0.3 fold. */
  private[graft] def foldDays(days: Map[Int, (Long, Long)])
      : (Long, Double, Double) = {
    val xs = dailySeries(days)
    var l = xs.head; var b = 0.0
    xs.tail.foreach { x =>
      val nl = r6d(0.5 * x + 0.5 * (l + b))
      b = r6d(0.3 * (nl - l) + 0.7 * b); l = nl
    }
    (xs.length.toLong, l, b)
  }

  /** Merge a micro-batch into the day→(decimal sum, count) partials —
    * the shared state transition of every day-grain refold twin
    * (#126 Holt, #143 CUSUM). Returns (sawNewRows, merged). */
  private[graft] def mergeDays(prev: Option[HoltState], rows: Iterator[HoltIn])
      : (Boolean, scala.collection.mutable.HashMap[Int, (Long, Long)]) = {
    val acc = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    prev.foreach(st => acc ++= st.days)
    var any = false
    rows.foreach { r =>
      any = true
      val (su, n) = acc.getOrElse(r.day, (0L, 0L))
      acc(r.day) = (su + dec10Unscaled(r.value), n + 1)
    }
    (any, acc)
  }

  /** The sorted daily series (davg per day, 6dp) from the partials —
    * the refold input both twins share. */
  private[graft] def dailySeries(days: scala.collection.Map[Int, (Long, Long)])
      : IndexedSeq[Double] =
    days.toIndexedSeq.sortBy(_._1).map { case (_, (su, n)) =>
      r6d(dec10ToDouble(su) / n)
    }

  private[graft] def foldHolt(uid: Long, rows: Iterator[HoltIn],
                       state: GroupState[HoltState]): Iterator[HoltEmit] = {
    val (any, acc) = mergeDays(state.getOption, rows)
    if (!any && acc.isEmpty) Iterator.empty
    else {
      val upd = state.getOption.map(_.upd).getOrElse(0) + 1
      state.update(HoltState(upd, acc.toMap))
      val (n, l, b) = foldDays(acc.toMap)
      Iterator.single(HoltEmit(uid, upd, n, l, b, r6d(l + 7 * b)))
    }
  }

  private[graft] def holtFold(ev: DataFrame): Dataset[HoltEmit] = {
    val s = ev.sparkSession
    import s.implicits._
    ev.select(col("user_id"),
              datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
                .as("day"),
              col("value"))
      .as[HoltIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldHolt)
  }

  /** Last emission per user from a drained sink → the batch output
    * shape (user_id, n_obs, level, trend, forecast). */
  private[graft] def finalizeHolt(sink: DataFrame): DataFrame =
    sink.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("upd").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_obs"), col("level"), col("trend"),
              col("forecast"))
      .orderBy(col("user_id"))

  def streamHolt(s: SparkSession, dir: String): DataFrame = {
    val name = s"holt_${System.nanoTime()}"
    Streaming.withStreamPartitions(s) {
      val q = holtFold(Streaming.eventsStream(s, dir))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Streaming.sealResult(s, name, finalizeHolt(s.table(name)))
  }

  /** The batch #115 oracle — identical output contract. */
  val streamHoltSql: String = graft.operators.Round6Ops.tsHoltSql

  // -------------------------------------------- #177 stream_holt_winters

  private[graft] case class HwEmit(
      user_id: Long, upd: Int, n_obs: Long,
      level: Double, trend: Double, seasonals: Seq[Double])

  /** The #174 batch chain's arithmetic over the day partials: davg per
    * day, first-week init, then the α/β/γ rotating-seasonal fold.
    * None below the batch operator's m+1-observation floor. */
  private[graft] def foldDaysHw(days: scala.collection.Map[Int, (Long, Long)])
      : Option[(Long, Double, Double, IndexedSeq[Double])] = {
    import graft.operators.Round6Ops.{HwAlpha, HwBeta, HwGamma, HwSeason}
    val xs = dailySeries(days)
    if (xs.length < HwSeason + 1) None
    else {
      val l0 = r6d(xs.take(HwSeason).foldLeft(0.0)(_ + _) / HwSeason)
      var l = l0; var b = 0.0
      var sArr = xs.take(HwSeason).map(x => r6d(x - l0))
      xs.drop(HwSeason).foreach { x =>
        val sm = sArr.head
        val nl = r6d(HwAlpha * (x - sm) + (1 - HwAlpha) * (l + b))
        val nb = r6d(HwBeta * (nl - l) + (1 - HwBeta) * b)
        val ns = r6d(HwGamma * (x - nl) + (1 - HwGamma) * sm)
        sArr = sArr.tail :+ ns; l = nl; b = nb
      }
      Some((xs.length.toLong, l, b, sArr))
    }
  }

  private[graft] def foldHw(uid: Long, rows: Iterator[HoltIn],
                            state: GroupState[HoltState]): Iterator[HwEmit] = {
    val (any, acc) = mergeDays(state.getOption, rows)
    if (!any && acc.isEmpty) Iterator.empty
    else {
      val upd = state.getOption.map(_.upd).getOrElse(0) + 1
      state.update(HoltState(upd, acc.toMap))
      foldDaysHw(acc).map { case (n, l, b, sArr) =>
        HwEmit(uid, upd, n, l, b, sArr)
      }.iterator
    }
  }

  private[graft] def hwFold(ev: DataFrame): Dataset[HwEmit] = {
    val s = ev.sparkSession
    import s.implicits._
    ev.select(col("user_id"),
              datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
                .as("day"),
              col("value"))
      .as[HoltIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldHw)
  }

  /** Last emission per user → the batch #174 output shape
    * (user_id, n_obs, level, trend, h, forecast). */
  private[graft] def finalizeHw(sink: DataFrame): DataFrame =
    sink.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("upd").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_obs"), col("level"), col("trend"),
              posexplode(col("seasonals")))
      .select(col("user_id"), col("n_obs"), col("level"), col("trend"),
              (col("pos") + 1).cast("int").as("h"),
              graft.Parity.r(col("level") + (col("pos") + 1) * col("trend")
                + col("col"), 6).as("forecast"))
      .orderBy(col("user_id"), col("h"))

  /** #177 stream_holt_winters: the #174 seasonal forecaster maintained
    * incrementally — the same day→(decimal sum, count) partial state as
    * [[streamHolt]] (arrival-order and chunking INVARIANT: partials
    * commute, late days land in their slot), with each emission
    * re-folding the sorted day axis through the #174 α/β/γ recursion.
    * O(days) state per key, calendar-bounded; the drained stream is
    * BIT-IDENTICAL to the batch operator and shares its oracle. */
  def streamHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val name = s"hw_${System.nanoTime()}"
    Streaming.withStreamPartitions(s) {
      val q = hwFold(Streaming.eventsStream(s, dir))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Streaming.sealResult(s, name, finalizeHw(s.table(name)))
  }

  /** The batch #174 oracle — identical output contract. */
  val streamHoltWintersSql: String = graft.operators.Round6Ops.tsHoltWintersSql
}
