package graft.sources

import org.apache.spark.sql.DataFrame

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
    // initial (non-adaptive) partition count: for a scan-rooted narrow
    // chain this is the scan's split count — the starvation signal;
    // for a chain that already contains an exchange it is the shuffle
    // partition count (>= cores by session config), so fanOut no-ops
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
