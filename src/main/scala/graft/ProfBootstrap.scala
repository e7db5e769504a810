package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** events_bootstrap_ci stage profiler (round-9 verdict task 4 —
  * "profile before the next optimization commit"; the round-9
  * hash-halving bought only 17%, so the md5 was evidently not the
  * dominant cost). Findings at sf0.1 (100 k events, B=100, this host):
  *
  *   regs, .count()            0.6-0.7 s  ← TRAP: count() prunes the
  *                                          hash/decode/sum columns; the
  *                                          first profile measured an
  *                                          empty plan
  *   regs, all columns, 1 part 15-18 s    ← the real cost, and the bug:
  *                                          the ×100 fan inherits the
  *                                          SCAN partitioning (one file →
  *                                          ONE task runs 10 M replicas)
  *   regs, repartition(32)      1.3-2.1 s  13× — parallelism, not CPU
  *   + conv4 (8/md5, int cmp)   1.1-1.6 s
  *   + strcmp (8/md5, hex cmp)  1.0-1.4 s  no base-16 decode at all
  *   + double sums              0.5-1.1 s  rejected: decimal partials
  *                                          are the oracle parity contract
  *
  * Conclusion shipped in Round9Ops21.bootstrapRegisters: pre-fan
  * round-robin repartition (the 13× lever — same fix at 100 TB where a
  * 128 MB split becomes a 12.8 GB fan task) + 8 replicas per md5 with
  * 4-hex string-compare weights (the ~30% lever; also lifts the
  * even-reps API restriction). Bench: events+stream pair 36.4 s →
  * 4.7 s at sf0.1, hash_match preserved (the hex thresholds quantize
  * the Poisson CDF identically in both engines).
  */
object ProfBootstrap {

  private val PoisCdf = Seq(0.367879, 0.735759, 0.919699, 0.981012, 0.99634)
  private val Reps = 100

  /** Stage A: the md5 fan alone (no uniform decode, no weights). */
  def fanHashOnly(ev: DataFrame): DataFrame =
    ev.withColumn("g", explode(array((0 until Reps / 2).map(lit): _*)))
      .withColumn("h", md5(concat(col("event_id").cast("string"), lit(":"),
        col("g").cast("string")).cast("binary")))
      .groupBy(col("event_type"))
      .agg(sum(length(col("h"))).as("x"))

  /** Stage B: current shape — 2 replicas per md5, 15-hex conv decode. */
  def regsCurrent(ev: DataFrame): DataFrame = {
    val fan = ev.withColumn("g",
        explode(array((0 until Reps / 2).map(lit): _*)))
      .withColumn("h", md5(concat(col("event_id").cast("string"), lit(":"),
        col("g").cast("string")).cast("binary")))
      .withColumn("p", explode(array(
        struct((col("g") * 2).as("b"), substring(col("h"), 1, 15).as("hx")),
        struct((col("g") * 2 + 1).as("b"),
               substring(col("h"), 17, 15).as("hx")))))
      .select(col("event_type"), col("value"),
              col("p.b").as("b"), col("p.hx").as("hx"))
    val u = conv(col("hx"), 16, 10).cast("long").cast("double") /
      math.pow(2, 60)
    val w = PoisCdf.zipWithIndex.foldRight(lit(5): Column) {
      case ((t, k), rest) => when(u < t, k).otherwise(rest)
    }
    fan.withColumn("w", w)
      .groupBy(col("event_type"), col("b"))
      .agg(dsum(col("w") * col("value")).as("sv"), sum(col("w")).as("sw"),
           count(lit(1)).as("c"))
  }

  /** Variant C: 8 replicas per md5 (16-bit uniforms), conv-4 decode +
    * integer thresholds. */
  def regsConv4(ev: DataFrame): DataFrame = {
    val nH = (Reps + 7) / 8
    val fan = ev.withColumn("g", explode(array((0 until nH).map(lit): _*)))
      .withColumn("h", md5(concat(col("event_id").cast("string"), lit(":"),
        col("g").cast("string")).cast("binary")))
      .withColumn("o", explode(array((0 until 8).map(lit): _*)))
      .withColumn("b", col("g") * 8 + col("o"))
      .filter(col("b") < Reps)
      .withColumn("hx", substring(col("h"), col("o") * 4 + 1, lit(4)))
    val v = conv(col("hx"), 16, 10).cast("int")
    val w = PoisCdf.zipWithIndex.foldRight(lit(5): Column) {
      case ((t, k), rest) =>
        when(v < math.floor(t * 65536).toInt, k).otherwise(rest)
    }
    fan.withColumn("w", w)
      .groupBy(col("event_type"), col("b"))
      .agg(dsum(col("w") * col("value")).as("sv"), sum(col("w")).as("sw"),
           count(lit(1)).as("c"))
  }

  /** Variant D: 8 replicas per md5, NO numeric decode — the weight
    * thresholds are 4-char lowercase hex literals compared as strings
    * (fixed-width lowercase hex compares lexicographically as the
    * number it encodes). */
  def regsStrcmp(ev: DataFrame): DataFrame = {
    val nH = (Reps + 7) / 8
    val fan = ev.withColumn("g", explode(array((0 until nH).map(lit): _*)))
      .withColumn("h", md5(concat(col("event_id").cast("string"), lit(":"),
        col("g").cast("string")).cast("binary")))
      .withColumn("o", explode(array((0 until 8).map(lit): _*)))
      .withColumn("b", col("g") * 8 + col("o"))
      .filter(col("b") < Reps)
      .withColumn("hx", substring(col("h"), col("o") * 4 + 1, lit(4)))
    val w = PoisCdf.zipWithIndex.foldRight(lit(5): Column) {
      case ((t, k), rest) =>
        when(col("hx") < f"${math.floor(t * 65536).toInt}%04x", k)
          .otherwise(rest)
    }
    fan.withColumn("w", w)
      .groupBy(col("event_type"), col("b"))
      .agg(dsum(col("w") * col("value")).as("sv"), sum(col("w")).as("sw"),
           count(lit(1)).as("c"))
  }

  /** Variant E: like D but double sums instead of decimal partials —
    * isolates the decimal aggregation cost. */
  def regsStrcmpDouble(ev: DataFrame): DataFrame = {
    val nH = (Reps + 7) / 8
    val fan = ev.withColumn("g", explode(array((0 until nH).map(lit): _*)))
      .withColumn("h", md5(concat(col("event_id").cast("string"), lit(":"),
        col("g").cast("string")).cast("binary")))
      .withColumn("o", explode(array((0 until 8).map(lit): _*)))
      .withColumn("b", col("g") * 8 + col("o"))
      .filter(col("b") < Reps)
      .withColumn("hx", substring(col("h"), col("o") * 4 + 1, lit(4)))
    val w = PoisCdf.zipWithIndex.foldRight(lit(5): Column) {
      case ((t, k), rest) =>
        when(col("hx") < f"${math.floor(t * 65536).toInt}%04x", k)
          .otherwise(rest)
    }
    fan.withColumn("w", w)
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("value")).as("sv"), sum(col("w")).as("sw"),
           count(lit(1)).as("c"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val evR = ev.repartition(32)
    // consume EVERY column — count() lets the optimizer prune the
    // hash/decode/sum expressions entirely (the first profile's trap).
    // rows = the summed per-register event count (the real register-table
    // cardinality), not the collected row count of the 1-row aggregate.
    def drain(df: DataFrame): Long = {
      val r = df.agg(sum(col("sv").cast("double")), sum(col("sw")),
                     sum(col("c")).as("rows")).collect().head
      if (r.isNullAt(2)) 0L else r.getLong(2)
    }
    t("warm events scan") { ev.count() }
    (1 to 2).foreach { rep =>
      t(s"B current 1part rep$rep") { drain(regsCurrent(ev)) }
      t(s"B current repart rep$rep") { drain(regsCurrent(evR)) }
      t(s"C conv4 repart rep$rep") { drain(regsConv4(evR)) }
      t(s"D strcmp repart rep$rep") { drain(regsStrcmp(evR)) }
      t(s"E strcmp-dbl repart rep$rep") { drain(regsStrcmpDouble(evR)) }
      t(s"F full current rep$rep") {
        graft.operators.Round9Ops21.eventsBootstrapCi(spark, dir).count()
      }
    }
    spark.stop()
  }
}
