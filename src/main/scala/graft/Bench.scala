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

    // best-of-3 steady-state timing: the warmup pass above paid JIT and
    // classloading; the min of three measured runs drops residual GC /
    // scheduler / page-cache noise from the reported figure (a one-off
    // disturbance was observed spanning two consecutive runs)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // reference-surface queries (t1..t10 + events analogs) vs the
    // extension families — lets the harness compare the reference
    // surface against BASELINE directly
    val core = results.filter { case (k, _) =>
      k.startsWith("t") || k.startsWith("events_") }
    val coreTotal = if (core.nonEmpty) core.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","core_total":$coreTotal,"extension_total":${total - coreTotal},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
