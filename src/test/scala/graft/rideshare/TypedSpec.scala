package graft.rideshare

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TypedSpec extends AnyFunSuite with SparkSpec {

  test("typed Dataset[Trip] round-trips the CSV schema with nulls as None") {
    val dir = Files.createTempDirectory("graft_typed").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      """business,pickup_location,dropoff_location,trip_length,request_to_pickup,total_ride_time,on_scene_to_pickup,on_scene_to_dropoff,time_of_day,date,passenger_fare,driver_total_pay,rideshare_profit,hourly_rate,dollars_per_mile
        |Uber,1,2,4.0,400.0,700.0,10.0,710.0,morning,1672531200,25.0,20.0,5.0,60.0,5.0
        |Lyft,,2,,100.0,,,,evening,1672617600,,,,,
        |""".stripMargin)
    val ds = Typed.trips(spark, s"$dir/t.csv")
    val rows = ds.collect().sortBy(_.business)
    assert(rows.length === 2)
    assert(rows(1).business === "Uber")
    assert(rows(1).pickup_location === Some(1))
    assert(rows(0).pickup_location === None) // empty CSV cell → None
    assert(rows(0).trip_length === None)
    // typed transform: compile-checked field access
    val uberMiles = ds.filter(_.business == "Uber")
      .collect().flatMap(_.trip_length).sum
    assert(uberMiles === 4.0)
  }
}
