package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (stdout is forwarded
  * verbatim — build.sbt sets run/outputStrategy).
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

    val warmupDir = "/root/testdata/sf0.001"
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0" &&
        new java.io.File(warmupDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try exec(fn(spark, warmupDir)) catch { case _: Throwable => () }
      }
    }

    // best-of-N steady-state timing (N = SPARK_GRAFT_RUNS, default 3):
    // the warmup pass above paid JIT and classloading; the min of the
    // measured runs drops residual GC / scheduler / page-cache noise
    // from the reported figure. ALL per-run times are emitted in the
    // JSON ("runs") so ambient-load variance between environments is
    // visible instead of silently folded into the headline number.
    //
    // Failures are NOT swallowed: a throwing query would otherwise
    // bench as ~0 s and read as a speedup. Each query records its
    // error; the JSON carries "failed"/"errors" and the process exits
    // nonzero so a bench-only regression (e.g. OOM at the bench SF but
    // not the correctness SF) is loud.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val results = SparkEntry.queries.map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)) } catch {
          case t: Throwable =>
            err = Some((t.getClass.getSimpleName + ": " +
              Option(t.getMessage).getOrElse("")).take(160))
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times, err)
    }
    val best = results.map { case (name, times, _) => name -> times.min }
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","core_total":$coreTotal,"extension_total":${total - coreTotal},"n_runs":$runs,"failed":$failedJson,"errors":$errorsJson,"queries":$qs,"runs":$runsJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
