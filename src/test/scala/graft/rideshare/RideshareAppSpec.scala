package graft.rideshare

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** End-to-end drive of the drop-in replacement app over real CSV files
  * — the surface a reference user actually switches to.
  */
class RideshareAppSpec extends AnyFunSuite with SparkSpec {

  test("seven-task pipeline runs from CSVs and writes the CSV outputs") {
    val dir = Files.createTempDirectory("graft_app").toString
    val tripsCsv =
      """business,pickup_location,dropoff_location,trip_length,request_to_pickup,total_ride_time,on_scene_to_pickup,on_scene_to_dropoff,time_of_day,date,passenger_fare,driver_total_pay,rideshare_profit,hourly_rate,dollars_per_mile
        |Uber,1,2,4.0,400.0,700.0,10.0,710.0,morning,1672531200,25.0,20.0,5.0,60.0,5.0
        |Uber,1,2,2.0,350.0,400.0,10.0,410.0,morning,1672531200,12.0,10.0,2.0,55.0,5.0
        |Lyft,2,1,10.0,100.0,1500.0,20.0,1520.0,evening,1672617600,27.0,30.0,-3.0,70.0,3.0
        |""".stripMargin
    val zonesCsv =
      """LocationID,Borough,Zone,service_zone
        |1,Manhattan,Midtown,Yellow Zone
        |2,Brooklyn,Park Slope,Boro Zone
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/trips.csv"), tripsCsv)
    Files.writeString(java.nio.file.Paths.get(s"$dir/zones.csv"), zonesCsv)

    RideshareApp.run(spark, s"$dir/trips.csv", s"$dir/zones.csv", s"$dir/out")

    val tripCount = spark.read.option("header", "true")
      .csv(s"$dir/out/trip_count").orderBy("business")
      .collect().map(_.toSeq).toSeq
    assert(tripCount === Seq(
      Seq("Lyft", "1", "1"), Seq("Uber", "1", "2")))
    val profit = spark.read.option("header", "true")
      .csv(s"$dir/out/total_profit").orderBy("business")
      .collect().map(_.toSeq).toSeq
    assert(profit === Seq(
      Seq("Lyft", "1", "-3.00"), Seq("Uber", "1", "7.00")))
    val wait = spark.read.option("header", "true")
      .csv(s"$dir/out/avg_waiting_time").orderBy("day")
      .collect().map(_.toSeq).toSeq
    assert(wait === Seq(Seq("1", "375.0"), Seq("2", "100.0")))
  }
}
