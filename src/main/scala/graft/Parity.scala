package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Cross-engine numeric parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same ANSI SQL. Double summation is order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's scan order — so plain
  * `sum(double)` can differ in the last ulps and flip a rounded digit.
  *
  * Fix: accumulate in DECIMAL(38,10) (exact, order-independent), cast the
  * final value back to double, then round. The oracle SQL does the
  * identical `sum(CAST(x AS DECIMAL(38,10)))` dance, so both engines land
  * on the same bits. Per-row arithmetic (products, divisions) is plain
  * IEEE double — identical on both engines for identical inputs.
  *
  * At cluster scale decimal partial aggregation is still map-side
  * combinable (sum is algebraic over decimals), so this costs a constant
  * factor, not a shuffle.
  */
object Parity {
  private val Dec = DataTypes.createDecimalType(38, 10)

  /** Event-time epoch micros, robust to the column's timestamp flavor.
    * The driver's parquet has shipped `ts` as int64-nanos, TIMESTAMP µs
    * and TIMESTAMP_NTZ µs across regenerations; `unix_micros` resolves
    * only on TIMESTAMP, so cast first — the NTZ→LTZ cast applies the
    * session timezone, which every entrypoint pins to UTC, making it a
    * stable relabeling (and a no-op cast on already-TIMESTAMP input). */
  def epochUs(c: Column): Column = unix_micros(c.cast(DataTypes.TimestampType))

  /** Portable round-half-up: floor(x·10^d + 0.5)/10^d. Spark's `round`
    * (decimal-string HALF_UP) and DuckDB's (binary) disagree when x sits
    * exactly on a .5 boundary — e.g. the mean of two 6dp values — so we
    * round with plain IEEE ops that are bit-identical in both engines. */
  def r(c: Column, d: Int): Column = {
    val m = math.pow(10, d)
    floor(c * m + 0.5) / m
  }

  /** Exact sum via decimal accumulation, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact sum, rounded to `d` places. */
  def dsum(c: Column, d: Int): Column = r(dsum(c), d)

  /** Order-independent mean: exact decimal sum / count, then round. */
  def davg(c: Column, d: Int): Column =
    r(dsum(c) / count(c), d)

  /** Driver-side replica of [[r]] at d = 6 — THE half-up-6dp rounding
    * every JVM-side finalize (streaming folds, MMR greedy) must share
    * with the distributed expressions. */
  def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Spark's double→DECIMAL(38,10) cast (shortest decimal repr, then
    * HALF_UP to scale 10) as an unscaled long — the streaming-state
    * encoding of an exact decimal sum. */
  def dec10Unscaled(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Scale-10 unscaled long back to double (Decimal.toDouble). */
  def dec10ToDouble(u: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 10).doubleValue

  /** Oracle-SQL fragments mirroring the above (DuckDB dialect-safe ANSI). */
  def sqlR(x: String, d: Int): String = {
    val m = s"1e$d"
    s"floor(($x) * $m + 0.5) / $m"
  }
  def sqlSum(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(38,10))) AS DOUBLE)"
  def sqlSum(x: String, d: Int): String = sqlR(sqlSum(x), d)
  def sqlAvg(x: String, d: Int): String =
    sqlR(s"${sqlSum(x)} / count($x)", d)

  /** Linear-interpolation quantile over a PRE-SORTED array column — the
    * explicit numpy-"linear" formula v_l + (v_u − v_l)·f, spelled out
    * (instead of Spark's `percentile`) so the oracle engine computes
    * the bit-identical IEEE expression. The single definition every
    * exact-quantile operator (threshold chain, RFM/Pareto boundaries,
    * event-duration percentiles) shares. */
  def linQuantile(vs: Column, p: Double): Column = {
    val n = size(vs)
    val h = (n - 1) * lit(p)
    val l = floor(h).cast("int")
    val f = h - l
    val vl = element_at(vs, l + 1)
    val vu = element_at(vs, least(l + 2, n))
    // empty input (a group whose values are all null collects to []):
    // NULL, matching the DuckDB mirror, whose out-of-range list index
    // is NULL — Spark's element_at(·, 0) would instead raise
    when(n === 0, lit(null)).otherwise(vl + (vu - vl) * f)
  }

  /** DuckDB mirror of [[linQuantile]] as an aggregate expression over
    * `list_sort(list(x))` (unrounded — wrap with [[sqlR]] at the call
    * site to match the Spark side's stage rounding). */
  def sqlQuantileAgg(x: String, p: Double): String = {
    val l = s"CAST(floor((count($x) - 1) * $p) AS INT)"
    val f = s"((count($x) - 1) * $p - floor((count($x) - 1) * $p))"
    val vs = s"list_sort(list($x))"
    val vl = s"$vs[$l + 1]"
    val vu = s"$vs[LEAST($l + 2, CAST(count($x) AS INT))]"
    s"($vl + ($vu - $vl) * $f)"
  }
}
