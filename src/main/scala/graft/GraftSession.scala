package graft

import org.apache.spark.sql.SparkSession

/** Session defaults shared by every entrypoint (Verify/Bench/tests).
  *
  * - UTC session timezone (oracle parity)
  * - AQE on: runtime coalescing + skew-join handling stand in for manual
  *   partition tuning at scale
  * - nanosAsLong: older testdata generations stored ns timestamps, which
  *   Spark's reader otherwise rejects; Tables.normalizeTs canonicalizes
  *   whichever encoding (ns-long / µs NTZ / µs TIMESTAMP) actually arrives
  * - shuffle.partitions sized to the local core count, NOT the 200
  *   default; on a real cluster this is set ∝ executors
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // static conf, must be set before the first session: the default
      // 100-entry generated-class cache thrashes under this library's
      // ~200 distinct codegen'd plans (Bench warmup + timed passes),
      // recompiling + re-JITing classes that were just evicted
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // AQE re-renders the FULL explain string for the listener bus on
      // every plan update (AdaptiveSparkPlanExec.onUpdatePlan →
      // ExplainUtils.processPlan) even with the UI disabled; on this
      // library's largest expression trees (the 64-register portable
      // HLL, 366-slot circular-smoothing projections) that formatting
      // dominates driver CPU. Cap the rendered length — nothing in a
      // headless run reads it. Plan-shape consumers (PlanSpec,
      // PlanAudit) override via env: the conf is static, so it must be
      // decided before the JVM's first session.
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PLAN_STR", "8192"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
