package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The native FloatDot expression must be bit-identical to the
  * higher-order dotFast formulation (same left-to-right IEEE sum) and
  * behave sanely at the edges. */
class FloatDotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  test("float_dot equals dotFast bit-for-bit on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(200)
      .select(
        call_function("float_dot", col("embedding"), col("embedding")).as("native"),
        VectorFunctions.dotFast(col("embedding"), col("embedding")).as("ho"))
    assert(e.filter(col("native") =!= col("ho")).count() == 0)
  }

  test("float_dot basics: value, null propagation, SQL registration") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(4.0f, 5.0f, 6.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    val out = df.select(call_function("float_dot", col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
    // registered for SQL too
    df.createOrReplaceTempView("fd")
    assert(spark.sql("SELECT float_dot(a, b) FROM fd").collect()(0).getDouble(0) == 32.0)
  }

  test("float_dot participates in whole-stage codegen") {
    val df = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(call_function("float_dot", col("embedding"), col("embedding")).as("d"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted mode marks whole-stage-codegen stages with `*` and
    // "[codegen id : n]" — the projection containing float_dot must be in one
    assert(p.contains("codegen id"))
    assert(p.contains("* Project"))
  }
}
