package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the `Tables.events` contract across both `ts` layouts the driver's
  * testdata has shipped: parquet TIMESTAMP(NANOS) (observed as a raw long
  * under `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS)
  * (observed as TimestampType). The reader must dispatch on the OBSERVED
  * schema so a testdata regeneration can never again break analysis.
  */
class TablesEventsLayoutSpec extends AnyFunSuite with SparkSpec {

  // 2021-01-02T03:04:05.123456 UTC, in micros since epoch.
  private val micros = 1609556645123456L

  private def writeFixture(layout: String): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory(s"events-$layout-").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    // the session is shared across every suite in the forked JVM —
    // snapshot the confs this fixture mutates and restore them after,
    // or later timestamp-writing tests become order-dependent
    val savedOut = s.conf.getOption("spark.sql.parquet.outputTimestampType")
    val savedTz = s.conf.getOption("spark.sql.session.timeZone")
    try writeFixtureInner(layout, path)
    finally {
      savedOut.fold(s.conf.unset("spark.sql.parquet.outputTimestampType"))(
        s.conf.set("spark.sql.parquet.outputTimestampType", _))
      savedTz.fold(s.conf.unset("spark.sql.session.timeZone"))(
        s.conf.set("spark.sql.session.timeZone", _))
    }
    dir.getAbsolutePath
  }

  private def writeFixtureInner(layout: String, path: String): Unit = {
    val s = spark
    import s.implicits._
    layout match {
      case "micros" =>
        // Spark's own TIMESTAMP_MICROS writer — byte-for-byte the layout the
        // regenerated driver testdata uses (pyarrow timestamp[us]).
        s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        s.conf.set("spark.sql.session.timeZone", "UTC")
        Seq((1L, new java.sql.Timestamp(micros / 1000L), 7L, "click", 1.5, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.lit(micros)))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").parquet(path)
      case "ntz" =>
        // pyarrow's layout: TIMESTAMP(MICROS) with isAdjustedToUTC unset,
        // which Spark reads as TIMESTAMP_NTZ — what the driver's
        // regenerated testdata ships (and what broke round 8).
        s.conf.set("spark.sql.session.timeZone", "UTC")
        Seq(1L).toDF("event_id")
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.lit(micros))
            .cast(TimestampNTZType))
          .withColumn("user_id", org.apache.spark.sql.functions.lit(7L))
          .withColumn("event_type", org.apache.spark.sql.functions.lit("click"))
          .withColumn("value", org.apache.spark.sql.functions.lit(1.5))
          .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
          .write.mode("overwrite").parquet(path)
      case "nanosAsLong" =>
        // Spark cannot WRITE parquet TIMESTAMP(NANOS); what matters to the
        // reader is the OBSERVED schema, and under the legacy
        // nanosAsLong conf a NANOS column reads as a raw LongType — which a
        // plain int64 column reproduces exactly.
        Seq((1L, micros * 1000L, 7L, "click", 1.5, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").parquet(path)
    }
  }

  test("micros layout passes through as TimestampType with exact value") {
    val df = Tables.events(spark, writeFixture("micros"))
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(org.apache.spark.sql.functions
      .unix_micros(df("ts"))).head.getLong(0)
    assert(got == micros)
  }

  test("ntz micros layout casts to session-TZ timestamp, micros preserved") {
    val df = Tables.events(spark, writeFixture("ntz"))
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(org.apache.spark.sql.functions
      .unix_micros(df("ts"))).head.getLong(0)
    assert(got == micros)
  }

  test("nanos-as-long layout converts to the same micros timestamp") {
    val df = Tables.events(spark, writeFixture("nanosAsLong"))
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(org.apache.spark.sql.functions
      .unix_micros(df("ts"))).head.getLong(0)
    assert(got == micros)
  }

  test("both layouts analyze under an events-style month/day filter") {
    for (layout <- Seq("micros", "ntz", "nanosAsLong")) {
      val df = Tables.events(spark, writeFixture(layout))
      // The t5a/t5b shape that died in round 8: fn-of-ts filter + grouping.
      val out = df
        .where(org.apache.spark.sql.functions.month(df("ts")) === 1)
        .groupBy(org.apache.spark.sql.functions.dayofmonth(df("ts")).as("d"))
        .count()
        .collect()
      assert(out.length == 1 && out.head.getLong(1) == 1L)
    }
  }
}
