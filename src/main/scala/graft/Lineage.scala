package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank rounds,
  * connected-components label propagation, triangle orientation).
  *
  * `localCheckpoint` stores the truncated blocks on executors: fast (no
  * DFS round-trip) and the right default in local mode and for benches,
  * but on a real cluster an executor loss makes the blocks — and with
  * them the whole multi-round job — unrecoverable, because truncation
  * also discarded the lineage needed to recompute them.
  *
  * So the cut respects the session's checkpoint configuration: when a
  * reliable checkpoint directory is set (`sc.setCheckpointDir`, the
  * deploy-time posture on a 1000-executor cluster), use fault-tolerant
  * `checkpoint` — blocks land on the DFS and survive executor loss.
  * Otherwise fall back to `localCheckpoint`. Both are non-eager here:
  * iterative callers materialize each round exactly once anyway, and an
  * eager cut would add a pass.
  */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (Caches.auditing(df.sparkSession)) df
    else if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** Eagerly materialize a frame that several downstream stages consume
    * (input pin). Under [[Caches.PlanAuditConf]] the frame is returned
    * unchanged: PlanAudit only explains — never executes — and a
    * checkpoint would both run a job and replace the real builder plan
    * with an RDD-scan stub, the round-5 audit blind spot. */
  def pin(df: DataFrame): DataFrame =
    if (Caches.auditing(df.sparkSession)) df else df.localCheckpoint()

  /** Non-eager variant of [[pin]] (materializes on first action). */
  def pinLazy(df: DataFrame): DataFrame =
    if (Caches.auditing(df.sparkSession)) df else df.localCheckpoint(false)
}
