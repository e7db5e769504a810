package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns
  * as a double, with full whole-stage codegen (`doGenCode` emits a tight
  * primitive loop — no per-element boxing, no lambda dispatch, unlike
  * the `aggregate(zip_with(...))` formulation).
  *
  * Summation is left-to-right IEEE double, bit-identical to
  * `VectorFunctions.dotFast` — FloatDotSpec pins the equivalence. Used
  * on the non-oracle hot paths (LSH bucketing, cosine prefilters); the
  * oracle-checked cosines keep the decimal-exact form.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot expects (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Idempotent per-session registration for sessions NOT built through
  * GraftSession (e.g. a host harness owning its own SparkSession) —
  * operators call this defensively before using the functions. */
object GraftFunctions {
  def ensure(s: org.apache.spark.sql.SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(new FunctionIdentifier("float_dot"))) {
      reg.createOrReplaceTempFunction("float_dot",
        exprs => FloatDot(exprs.head, exprs(1)), "builtin")
      reg.createOrReplaceTempFunction("collect_top_k",
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          exprs.head, exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Boolean], 0, 0), "builtin")
      reg.createOrReplaceTempFunction("winnow_fps",
        exprs => WinnowFps(exprs.head,
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int]), "builtin")
      reg.createOrReplaceTempFunction("rolling_gram_hashes",
        exprs => RollingGramHashes(exprs.head,
          exprs(1).eval().asInstanceOf[Int]), "builtin")
    }
  }
}

/** Session extensions registering graft's native expressions for SQL and
  * `expr(...)` use (`SparkSession.builder().withExtensions(new
  * GraftExtensions)` — GraftSession does this). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children.head, children(1))))
    // Catalyst's partial-aggregating bounded top-k (map-side k-element
    // heaps; the shuffle carries ≤ k rows per partition per group) —
    // shipped in catalyst but not exposed as a SQL function by default.
    e.injectFunction((
      new FunctionIdentifier("collect_top_k"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK].getName,
        "collect_top_k"),
      (children: Seq[Expression]) => {
        // the companion's literal helpers are private[aggregate]; the
        // class itself is public — fold the k/reverse literals directly
        val num = children(1).eval().asInstanceOf[Int]
        val rev = children(2).eval().asInstanceOf[Boolean]
        new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          children.head, num, rev, 0, 0)
      }))
    e.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => WinnowFps(children.head,
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int])))
    e.injectFunction((
      new FunctionIdentifier("rolling_gram_hashes"),
      new ExpressionInfo(classOf[RollingGramHashes].getName,
        "rolling_gram_hashes"),
      (children: Seq[Expression]) => RollingGramHashes(children.head,
        children(1).eval().asInstanceOf[Int])))
  }
}
