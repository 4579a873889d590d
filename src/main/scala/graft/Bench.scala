package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE compact JSON line on stdout
  * (stdout is forwarded verbatim — build.sbt sets run/outputStrategy).
  *
  * Transport contract (round-4 lesson): the driver tail-captures
  * stdout and parses the LAST line as JSON — a bulky line gets its
  * HEAD clipped and the round loses its bench grade. So stdout gets
  * only the compact summary (metric/value/totals/failed/errors/
  * queries); the per-run times map — diagnostic, unbounded — goes to
  * stderr, printed BEFORE the stdout line.
  *
  * A warmup pass at the smallest scale factor runs first (unless
  * SPARK_GRAFT_WARMUP=0): it pays JIT/codegen/classloader costs once so
  * the timed pass measures query execution, not JVM ramp — round 1's
  * first-timed query carried ~5s of warmup noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Timed action: write to the no-op sink, NOT count(). Under count()
    // Catalyst legally deletes the measured work for projection-only
    // pipelines (EliminateSorts drops a trailing orderBy, ColumnPruning
    // drops every projected expression), so text_*/mm_* queries would
    // bench as bare parquet row-counts. The noop sink consumes every
    // row and column, forcing full evaluation while writing nothing.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // dev-only subset knob (the ScalingBench convention): the driver
    // never sets it, so its runs time the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val warmupDir = "/root/testdata/sf0.001"
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0" &&
        new java.io.File(warmupDir).isDirectory) {
      queries.foreach { case (_, fn) =>
        try exec(fn(spark, warmupDir)) catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }

    // best-of-N steady-state timing (N = SPARK_GRAFT_RUNS, default 3,
    // clamped to >= 1 — a junk env value must not kill the bench line):
    // the warmup pass above paid JIT and classloading; the min of the
    // measured runs drops residual GC / scheduler / page-cache noise
    // from the reported figure. Queries whose min still exceeds 1 s get
    // up to N extra runs — the heavy pair miners swing ~2x under
    // ambient load on a shared box, and a wider sample keeps the
    // round-over-round comparison measuring the code, not the neighbor.
    //
    // Failures are NOT swallowed: a throwing query would otherwise
    // bench as ~0 s and read as a speedup. Each query records its
    // error; failed queries are EXCLUDED from value/queries/totals (a
    // near-zero wall time for a crash must not read as a speedup), the
    // JSON carries "failed"/"errors", and the process exits nonzero.
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption).getOrElse(3))
    // 0.5 (was 1.0): round-5 showed mid-weight queries in the
    // 0.5–1 s band drifting ±30% between rounds on 3 samples — ambient
    // noise on a shared box. Doubling their sample count costs ~2 s of
    // bench wall time and makes the round-over-round comparison
    // measure the code, not the neighbor.
    val slowCutoffSec = 0.5
    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val results = queries.map { case (name, fn) =>
      // cached artifacts (pair-miner candidate/signature caches) must
      // not leak across queries: accumulated blocks both distort later
      // timings via memory pressure and spam CacheManager warnings
      spark.catalog.clearCache()
      var err: Option[String] = None
      def timed(): Double = {
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)) } catch {
          case t: Throwable =>
            err = Some((t.getClass.getSimpleName + ": " +
              Option(t.getMessage).getOrElse("")).take(160))
        }
        (System.nanoTime() - t0) / 1e9
      }
      val base = (1 to runs).map(_ => timed())
      val times = if (err.isEmpty && base.min > slowCutoffSec)
        base ++ (1 to runs).map(_ => timed())
      else base
      (name, times, err)
    }
    val ok = results.filter(_._3.isEmpty)
    val best = ok.map { case (name, times, _) => name -> times.min }
    val qs = best.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (name, times, _) =>
      jsonStr(name) + ":" + times.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failures = results.collect { case (name, _, Some(e)) => name -> e }
    val failedJson = failures.map(f => jsonStr(f._1)).mkString("[", ",", "]")
    val errorsJson = failures
      .map { case (n, e) => jsonStr(n) + ":" + jsonStr(e) }
      .mkString("{", ",", "}")
    val total = if (best.nonEmpty) best.map(_._2).sum else 0.0
    // reference-surface queries (t1..t10 + events analogs) vs the
    // extension families — lets the harness compare the reference
    // surface against BASELINE directly
    val core = best.filter { case (k, _) =>
      k.startsWith("t") || k.startsWith("events_") }
    val coreTotal = if (core.nonEmpty) core.map(_._2).sum else 0.0
    // diagnostic per-run times: stderr, BEFORE the stdout line, so the
    // driver's stdout tail-capture sees only the compact summary
    System.err.println(s"""{"bench_runs":$runsJson}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","core_total":$coreTotal,"extension_total":${total - coreTotal},"n_runs":$runs,"failed":$failedJson,"errors":$errorsJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
