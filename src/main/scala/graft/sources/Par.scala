package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange

/** Scale-adaptive compute fan-out (optimization guide §2.5 "input
  * skew: one huge unsplittable file … repartition immediately after
  * the read").
  *
  * The driver's testdata ships every table as ONE parquet row group,
  * and Spark cannot split a row group across scan tasks — so every
  * compute-heavy map side (the fused gram/md5 walk, PQ/IVF encode,
  * shingle hashing) runs on a single core until the first exchange,
  * however many executor threads exist. [[fanOut]] inserts a
  * round-robin repartition to the session's core count, but ONLY when
  * the plan's scan parallelism is actually below it — at deployment
  * scale a corpus has thousands of splits, the probe sees
  * partitions ≥ cores, and the call is a no-op (zero added shuffle).
  * That conditionality is what makes the fix scale-correct rather
  * than a local-mode tuning hack: any deployment whose scan
  * parallelism is starved (one .gz shard, a single giant row group,
  * a coalesced upstream write) gets the same unstarving.
  *
  * Probing is plan-inspection only, never execution (round-19 ADVICE):
  * the previous `df.rdd.getNumPartitions` probe forced
  * AdaptiveSparkPlanExec to materialize intermediate query stages on
  * any exchange-bearing input — eagerly running upstream shuffle (and
  * broadcast) jobs whose output the later real action does not reuse —
  * and AQE partition coalescing could report post-exchange counts
  * below `defaultParallelism`, turning the documented "no-op when the
  * chain already has an exchange" into a redundant full shuffle. Now
  * a plan containing any [[Exchange]] or subquery returns unchanged
  * (its downstream parallelism is the session shuffle-partition
  * count, ≥ cores by config), and only a genuinely scan-rooted narrow
  * chain — where building the RDD runs no job — is probed for its
  * split count.
  *
  * Value safety: a keyless repartition only re-buckets rows, so it is
  * result-identical for every downstream whose arithmetic is
  * order-free — the house integer-exact discipline (micro-nat grids,
  * integer sums, tie-broken windows) guarantees exactly that. Callers
  * feeding order-SENSITIVE float accumulations must not use it.
  *
  * Streaming frames pass through untouched (`.rdd` is illegal on a
  * streaming plan, and the repartition would break the audited
  * streaming-legal plan shapes).
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 1) return df
    // Prepared physical plan: building it plans the query but runs
    // nothing. Exchange-or-subquery detection uses AQE's OWN
    // applicability test — InsertAdaptiveSparkPlan wraps the plan in
    // AdaptiveSparkPlanExec exactly when it contains an exchange or a
    // subquery (the cases where a `.rdd` probe would eagerly run query
    // stages). The direct Exchange scan below it covers AQE-off
    // sessions, where EnsureRequirements has already inserted the
    // exchanges into the prepared plan. (`sparkPlan` is NOT enough:
    // it predates EnsureRequirements, so join/aggregate exchanges are
    // not in it yet — only explicit repartitions are.)
    val exec = df.queryExecution.executedPlan
    if (exec.isInstanceOf[
          org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] ||
        exec.exists(_.isInstanceOf[Exchange]))
      df
    // narrow scan-rooted chain: toRdd builds lineage without running a
    // job, and its partition count IS the scan's split count — the
    // starvation signal
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
