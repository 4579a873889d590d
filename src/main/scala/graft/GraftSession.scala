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
      // shuffle/spill scratch on tmpfs when available: the harness box
      // intermittently throttles block-device writes to ~15 MB/s,
      // which turns every exchange into an IO stall and benches the
      // hypervisor instead of the plan. RAM-backed scratch is the
      // local[N] analog of a cluster's local NVMe — correctness is
      // unaffected (scratch is ephemeral by contract), and local-mode
      // shuffle volumes here are MBs against a 128 GiB box.
      .config("spark.local.dir", localScratchDir)

  /** Prefer /dev/shm (tmpfs) for Spark scratch; fall back to the JVM
    * default temp dir where it doesn't exist or isn't writable.
    */
  private lazy val localScratchDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark-local")
      d.mkdirs()
      d.getAbsolutePath
    } else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  }
}
