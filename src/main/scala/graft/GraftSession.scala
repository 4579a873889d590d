package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults — every main/test
  * builder composes this instead of repeating config:
  *   - UTC session timezone (oracle parity for date-derived columns),
  *   - GraftExtensions (native function registration),
  *   - AQE on with skew-join handling (Spark defaults kept explicit
  *     because the engine's scale story depends on them),
  *   - shuffle partitions sized to the local core count (a cluster
  *     deployment overrides via --conf; 200 default partitions on
  *     local[N] just schedules overhead).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom-filter pushdown: shuffle-join probe sides get a
      // build-side bloom filter injected below their scan — a large
      // win for the selective fact⋈fact joins at cluster scale
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
}
