package graft.rideshare

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed facade over the rideshare tables — `Dataset[Trip]` for the
  * call-sites where compile-time field checking beats untyped columns
  * (SURVEY.md §1 row 1). The query library stays DataFrame-based
  * (Catalyst optimizes columns better than opaque lambdas); the typed
  * layer is the boundary API for user code that wants case classes.
  */
object Typed {

  /** rideshare_data row (FIXTURES.md §A1 logical types). */
  final case class Trip(
      business: String,
      pickup_location: Option[Int],
      dropoff_location: Option[Int],
      trip_length: Option[Double],
      request_to_pickup: Option[Double],
      total_ride_time: Option[Double],
      on_scene_to_pickup: Option[Double],
      on_scene_to_dropoff: Option[Double],
      time_of_day: String,
      date: Option[Long],
      passenger_fare: Option[Double],
      driver_total_pay: Option[Double],
      rideshare_profit: Option[Double],
      hourly_rate: Option[Double],
      dollars_per_mile: Option[Double])

  /** taxi_zone_lookup row (FIXTURES.md §A2). */
  final case class Zone(
      LocationID: Option[Int], Borough: String, Zone: String,
      service_zone: String)

  def trips(spark: SparkSession, path: String): Dataset[Trip] = {
    import spark.implicits._
    RideshareSchema.readTrips(spark, path).as[Trip]
  }

  def zones(spark: SparkSession, path: String): Dataset[Zone] = {
    import spark.implicits._
    RideshareSchema.readZones(spark, path).as[Zone]
  }
}
