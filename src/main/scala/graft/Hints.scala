package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side hints whose correct choice depends on deployment scale. */
object Hints {

  /** Conf key gating the forced `broadcast()` of KEY-PROPORTIONAL
    * dimension tables (per-key climatology/threshold tables, per-key
    * fit coefficients, per-key event spans). Unlike genuinely-bounded
    * dims (366-row DOY axis, a handful of query vectors), these grow
    * linearly with series-key cardinality: at bench SF they are KBs and
    * broadcasting skips the fact-side shuffle entirely, but at 10M+ grid
    * cells a forced broadcast is a multi-GB driver/executor OOM. Default
    * true (right for local/bench scale); a large deployment sets it
    * false and lets Catalyst/AQE pick the join strategy from runtime
    * stats — the joins then degrade gracefully to co-partitioned
    * shuffle-hash/sort-merge on the series key, never to a nested-loop
    * or cartesian plan (pinned in PlanSpec). */
  val BroadcastKeyDims = "spark.graft.broadcastKeyDims"

  /** Broadcast `df` only when [[BroadcastKeyDims]] is enabled (default
    * on). With the hint absent, the optimizer still auto-broadcasts
    * below `autoBroadcastJoinThreshold`, so small deployments lose
    * nothing; key cardinality beyond the threshold degrades to a
    * shuffle join instead of an OOM. */
  def keyDim(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(BroadcastKeyDims, "true").toBoolean) broadcast(df)
    else df
}
