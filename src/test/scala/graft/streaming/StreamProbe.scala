package graft.streaming

import org.apache.spark.sql.SparkSession

/** Manual end-to-end drive of the deploy-shaped streaming pipeline
  * (parquet dir → hourly agg → parquet sink + checkpoint), through the
  * library's public API. Run:
  * `sbt "Test/runMain graft.streaming.StreamProbe /root/testdata/sf0.001 /tmp/probe"`
  * Not a ScalaTest; a verification runner.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the events table as micros timestamps (streaming source
    // can't use the nanosAsLong legacy path Tables.events needs)
    val src = s"$workDir/src"
    graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(src)

    val q = EventStreams.startHourlyPipeline(
      spark, src, s"$workDir/sink", s"$workDir/ckpt")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(s"$workDir/sink")
    val batch = EventStreams.hourly(spark.read.parquet(src))
    // append mode can only have flushed windows the watermark passed;
    // everything flushed must match batch exactly, and what's missing
    // must be only the trailing (watermark-held) windows
    val wrong = streamed.except(batch).count()
    val missing = batch.except(streamed).count()
    val maxFlushed = streamed.agg(org.apache.spark.sql.functions.max("hour"))
      .head().get(0)
    val maxBatch = batch.agg(org.apache.spark.sql.functions.max("hour"))
      .head().get(0)
    println(s"STREAM_PROBE flushed=${streamed.count()} batch=${batch.count()} " +
      s"flushed_not_in_batch=$wrong held_back=$missing " +
      s"max_flushed_hour=$maxFlushed max_batch_hour=$maxBatch")

    // exactly-once resume: restarting from the same checkpoint must
    // reprocess nothing and append nothing
    val q2 = EventStreams.startHourlyPipeline(
      spark, src, s"$workDir/sink", s"$workDir/ckpt")
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(s"$workDir/sink").count()
    println(s"STREAM_PROBE_RESUME before=${streamed.count()} after=$after " +
      s"duplicates=${after - streamed.count()}")
    spark.stop()
  }
}
