package graft

/** Plan hygiene audit: builds every SparkEntry query against a small SF
  * and prints one line per query — exchanges, joins by strategy, scans,
  * window operators — so scale smells (unexpected sort-merge joins,
  * exchange explosions, repeated scans) are visible at a glance.
  * Run: sbt "runMain graft.PlanAudit [sfDir]".
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // explain strings must not truncate (regex-counted below) — the
    // audit session uncaps maxPlanStringLength (static conf, so it is
    // decided via system property before the JVM's first session)
    if (!sys.props.contains("SPARK_GRAFT_MAX_PLAN_STR"))
      sys.props("SPARK_GRAFT_MAX_PLAN_STR") = (64 << 20).toString
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // bypass memoization/persist/localCheckpoint pins: the audit only
    // explains, and a pinned frame's InMemoryRelation / RDD-scan stub
    // hides the real pooling/join chain (the round-5 MHW blind spot —
    // all mhw_* rows read exchanges:0, scans:0)
    spark.conf.set(Caches.PlanAuditConf, "true")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // streaming entries execute eagerly on construction — skip them
      // here (their shapes are pinned in StreamingSpec)
      if (name.startsWith("stream_")) None
      else {
        val qe = fn(spark, sfDir).queryExecution
        val p = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        def n(re: String) = re.r.findAllIn(p).length
        // a LocalRelation/LocalTableScan result means the operator
        // FINALIZES ON THE DRIVER over model-sized data (the MMR greedy
        // rounds) — mark it rather than reporting a misleading 0/0 plan
        val driverFinal =
          qe.optimizedPlan.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
        Some((name, n("\\) Exchange"), n("\\) BroadcastHashJoin"),
              n("\\) SortMergeJoin"), n("\\) ShuffledHashJoin"),
              // exclude WindowGroupLimit: it is Spark's rank-limit
              // PUSHDOWN helper (a streaming top-k filter before the
              // real window sort), not a window execution — counting it
              // double-reported every rank()<=k plan (round-8 fix: the
              // shipped ann_pq plan has exactly 1 WindowExec but
              // regex-read as 2)
              n("\\(\\d+\\) Scan parquet"), n("\\) Window(?!GroupLimit)"),
              driverFinal))
      }
    }
    println(f"${"query"}%-24s exch  bhj  smj  shj  scan  win")
    rows.foreach { case (q, ex, bhj, smj, shj, sc, w, _) =>
      println(f"$q%-24s $ex%4d $bhj%4d $smj%4d $shj%4d $sc%5d $w%4d")
    }
    // durable artifact: plan shapes are deterministic (unlike wall-clock
    // on a shared host), so per-round diffs of this file surface plan
    // regressions — a lost broadcast, an extra exchange — reliably
    val json = rows.map { case (q, ex, bhj, smj, shj, sc, w, dfin) =>
      val extra = if (dfin) ""","driver_finalized":true""" else ""
      s""""$q":{"exchanges":$ex,"bhj":$bhj,"smj":$smj,"shj":$shj,"scans":$sc,"windows":$w$extra}"""
    }.mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "/root/repo/PLAN_AUDIT.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"plan audit write failed: $e") }
    spark.stop()
  }
}
