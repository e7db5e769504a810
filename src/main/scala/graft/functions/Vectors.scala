package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Vector math over `array<float>` embedding columns, built entirely
  * from codegen'd higher-order functions (zip_with / aggregate) — no
  * UDFs, no explode: one row stays one row.
  *
  * Dot products accumulate in DECIMAL(38,10): per-term double products
  * are IEEE-identical across engines and the decimal sum is
  * order-independent, so results are bit-reproducible (and
  * oracle-checkable) regardless of evaluation order.
  */
object VectorFunctions {

  // Accumulator at (28,10) with (18,10) terms: Spark's decimal `+` at
  // precision 38 would shave a scale digit ((38,10)+(38,10)→(38,9));
  // these widths keep every step exact (|sum| < 1e18) and the merge cast
  // restores the accumulator type losslessly.
  private val DecAcc = DataTypes.createDecimalType(28, 10)
  private val DecTerm = DataTypes.createDecimalType(18, 10)
  private val zeroDec = lit(new java.math.BigDecimal(0)).cast(DecAcc)

  /** Exact (decimal-accumulated) dot product, as double. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(DecTerm)),
      zeroDec, (acc, v) => (acc + v).cast(DecAcc)).cast("double")

  /** Plain-double dot product — fast path for prefilters where last-ulp
    * reproducibility doesn't matter (|error| vs dotDec < ~1e-12). */
  def dotFast(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Exact squared L2 norm. */
  def normSqDec(a: Column): Column = dotDec(a, a)

  /** L2 norm (sqrt of the exact squared norm — IEEE-identical). */
  def norm(a: Column): Column = sqrt(normSqDec(a))

  /** Cosine similarity from exact dot/norms. */
  def cosine(a: Column, b: Column): Column =
    dotDec(a, b) / (norm(a) * norm(b))

  /** Exact (decimal-accumulated) squared L2 distance between two
    * numeric arrays (float or double elements): per-term (x−y)² is one
    * IEEE multiply of one IEEE subtract — identical across engines —
    * and the decimal sum is order-independent. */
  def distSqDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        (d * d).cast(DecTerm)
      }),
      zeroDec, (acc, v) => (acc + v).cast(DecAcc)).cast("double")

  // ------------------------------------------------------- oracle fragments

  /** DuckDB mirror of [[dotDec]] for list columns `a`, `b`. */
  def sqlDotDec(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(range(1, len($a) + 1),
       |  i -> CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(18,10))))
       | AS DOUBLE)""".stripMargin.replace("\n", "")

  def sqlNorm(a: String): String = s"sqrt(${sqlDotDec(a, a)})"

  /** DuckDB mirror of [[distSqDec]] for list columns `a`, `b`. */
  def sqlDistSqDec(a: String, b: String): String = {
    val d = s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))"
    s"""CAST(list_sum(list_transform(range(1, len($a) + 1),
       |  i -> CAST($d * $d AS DECIMAL(18,10))))
       | AS DOUBLE)""".stripMargin.replace("\n", "")
  }

  def sqlCosine(a: String, b: String): String =
    s"${sqlDotDec(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)})"

  /** DuckDB mirror of the native FloatDot expression: strict left-to-
    * right IEEE-double fold (`list_reduce` is a left fold; float×float
    * products are exact in double), so the result is bit-identical to
    * FloatDot for identical float inputs. */
  def sqlDotSeq(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  d -> CAST($a[d] AS DOUBLE) * CAST($b[d] AS DOUBLE)), (x, y) -> x + y)""".stripMargin.replace("\n", "")

  /** DuckDB mirror of a left-fold double sum of squares / 2 (the
    * centroid half-norm in the IVF scorer). */
  def sqlHalfNormSeq(a: String): String =
    s"""(list_reduce(list_transform($a,
       |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v) / 2)""".stripMargin.replace("\n", "")
}
