package graft.rideshare

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Typed schemas for the NYC Rideshare 2023 domain.
  *
  * The reference reads both CSVs header-only with no schema, so every column
  * lands as `string` (reference `codes/task1.py:40-41`, confirmed by the
  * golden printSchema screenshot `Images/task1_op1.2.png`). We declare real
  * types at ingest instead: numeric aggregation semantics are preserved
  * (the reference's implicit string→double coercion in sum/avg yields the
  * same doubles we get by typing the column `double` up front), while scans
  * get columnar pruning + pushdown that stringly-typed CSV can't.
  */
object RideshareSchema {

  /** rideshare_data.csv — 15 columns, one row per trip (FIXTURES.md §A1). */
  val tripSchema: StructType = StructType(Seq(
    StructField("business", StringType),            // {Uber, Lyft}
    StructField("pickup_location", IntegerType),    // zone LocationID 1-265
    StructField("dropoff_location", IntegerType),
    StructField("trip_length", DoubleType),         // miles
    StructField("request_to_pickup", DoubleType),   // seconds
    StructField("total_ride_time", DoubleType),
    StructField("on_scene_to_pickup", DoubleType),
    StructField("on_scene_to_dropoff", DoubleType),
    StructField("time_of_day", StringType),         // {morning, afternoon, evening, night}
    StructField("date", LongType),                  // UNIX epoch seconds
    StructField("passenger_fare", DoubleType),
    StructField("driver_total_pay", DoubleType),
    StructField("rideshare_profit", DoubleType),
    StructField("hourly_rate", DoubleType),
    StructField("dollars_per_mile", DoubleType)))

  /** taxi_zone_lookup.csv — 265-row dimension (FIXTURES.md §A2). */
  val zoneSchema: StructType = StructType(Seq(
    StructField("LocationID", IntegerType),
    StructField("Borough", StringType),
    StructField("Zone", StringType),
    StructField("service_zone", StringType)))

  /** CSV scan with header + explicit schema (reference operator S1,
    * `codes/task1.py:40`). The explicit schema keeps the scan single-pass
    * (no inferSchema job) and lets Catalyst prune unparsed columns.
    */
  def readTrips(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(tripSchema).csv(path)

  def readZones(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(zoneSchema).csv(path)
}
