package graft.rideshare

import java.time.{LocalDate, ZoneOffset}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Golden tests for the reference's seven tasks (SURVEY.md §2.8) over
  * the minimal inline fixture of FIXTURES.md §A4: both businesses, all
  * four time_of_day values, months 1–5, an unmatched location (left-join
  * null path), EWR/Unknown boroughs, negative profit, route ties, and a
  * January day with wait > 300 s. Expected values are hand-computed.
  */
class RideshareTasksSpec extends AnyFunSuite with SparkSpec {

  private def epoch(y: Int, m: Int, d: Int): Long =
    LocalDate.of(y, m, d).atStartOfDay(ZoneOffset.UTC).toEpochSecond

  // (business, pu, do, trip_length, request_to_pickup, time_of_day,
  //  date, driver_total_pay, rideshare_profit)
  private lazy val trips = {
    val rows = Seq(
      ("Uber", 1, 2, 4.0, 400.0, "morning", epoch(2023, 1, 1), 20.0, 5.0),
      ("Uber", 1, 2, 2.0, 350.0, "morning", epoch(2023, 1, 1), 10.0, 2.0),
      ("Lyft", 2, 4, 10.0, 100.0, "evening", epoch(2023, 1, 2), 30.0, -3.0),
      ("Uber", 2, 4, 5.0, 200.0, "night", epoch(2023, 1, 2), 25.0, 4.0),
      ("Uber", 3, 1, 3.0, 150.0, "afternoon", epoch(2023, 2, 10), 15.0, 3.0),
      ("Lyft", 3, 1, 3.0, 250.0, "afternoon", epoch(2023, 2, 10), 18.0, 2.0),
      ("Uber", 5, 6, 8.0, 120.0, "evening", epoch(2023, 3, 5), 40.0, 8.0),
      ("Uber", 99, 1, 1.0, 80.0, "morning", epoch(2023, 3, 5), 5.0, 1.0),
      ("Uber", 1, 1, 2.5, 60.0, "evening", epoch(2023, 4, 20), 12.0, 2.5),
      ("Lyft", 1, 1, 2.5, 90.0, "evening", epoch(2023, 4, 20), 14.0, 2.0),
      ("Uber", 7, 1, 6.0, 300.0, "night", epoch(2023, 5, 15), 22.0, 4.0),
      ("Uber", 2, 3, 7.0, 500.0, "morning", epoch(2023, 5, 15), 28.0, 6.0))
    spark.createDataFrame(rows)
      .toDF("business", "pickup_location", "dropoff_location", "trip_length",
        "request_to_pickup", "time_of_day", "date", "driver_total_pay",
        "rideshare_profit")
  }

  private lazy val zones = {
    val rows = Seq(
      (1, "Manhattan", "Midtown", "Yellow Zone"),
      (2, "Brooklyn", "Park Slope", "Boro Zone"),
      (3, "Queens", "Astoria", "Boro Zone"),
      (4, "Staten Island", "St. George", "Boro Zone"),
      (5, "EWR", "Newark Airport", "EWR"),
      (6, "Unknown", "NA", "NA"),
      (7, "Bronx", "Fordham", "Boro Zone"))
    spark.createDataFrame(rows)
      .toDF("LocationID", "Borough", "Zone", "service_zone")
  }

  private lazy val enriched: DataFrame = Enrich.enrich(trips, zones).cache()

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("T1: enrichment keeps all trips (left join) and formats the date") {
    assert(enriched.count() === 12)
    val first = enriched.filter("pickup_location = 1 AND trip_length = 4.0")
      .select("date", "Pickup_Borough", "Dropoff_Zone").head()
    assert(first === Row("2023-01-01", "Manhattan", "Park Slope"))
    // unmatched pickup location survives with null zone columns
    val orphan = enriched.filter("pickup_location = 99")
      .select("Pickup_Borough", "Pickup_Zone").head()
    assert(orphan === Row(null, null))
  }

  test("T2a: trip counts per (business, month)") {
    val got = rowsOf(RideshareTasks.tripCountsByBusinessMonth(enriched)
      .orderBy("business", "month"))
    assert(got === Seq(
      Seq("Lyft", 1, 1L), Seq("Lyft", 2, 1L), Seq("Lyft", 4, 1L),
      Seq("Uber", 1, 3L), Seq("Uber", 2, 1L), Seq("Uber", 3, 2L),
      Seq("Uber", 4, 1L), Seq("Uber", 5, 2L)))
  }

  test("T2b/T2c: formatted sums incl. negative profit") {
    val profit = rowsOf(RideshareTasks.totalProfitsByBusinessMonth(enriched)
      .orderBy("business", "month"))
    assert(profit.head === Seq("Lyft", 1, "-3.00"))
    assert(profit.contains(Seq("Uber", 1, "11.00")))
    val earn = rowsOf(RideshareTasks.totalEarningsByBusinessMonth(enriched)
      .orderBy("business", "month"))
    assert(earn.contains(Seq("Uber", 1, "55.00"))) // 20+10+25
  }

  test("T3a: dense_rank top-5 keeps ties and the null-borough group") {
    val got = RideshareTasks.topBoroughsPerMonth(enriched, "Pickup")
    assert(got.count() === 8) // Jan 2, Feb 1, Mar 2 (EWR + null), Apr 1, May 2
    val jan = got.filter("month = 1").orderBy("Pickup_Borough").collect()
    assert(jan.map(_.getString(0)).toSeq === Seq("Brooklyn", "Manhattan"))
    assert(jan.forall(_.getLong(2) == 2L)) // tied at rank 1, both kept
  }

  test("T3c: top routes by driver-pay sum") {
    val got = rowsOf(RideshareTasks.topRoutesByProfit(enriched, 2))
    assert(got.head(0) === "Brooklyn to Staten Island") // 30+25=55
    assert(got.head(1) === 55.0)
  }

  test("T4: averages per time_of_day and the joined ratio") {
    val pay = rowsOf(RideshareTasks.avgDriverPayByTimeOfDay(enriched))
    assert(pay.map(_.head) === Seq("evening", "night", "afternoon", "morning"))
    assert(pay.head(1) === 24.0) // (30+40+12+14)/4
    val ratio = RideshareTasks.earningsPerMile(enriched)
      .filter("time_of_day = 'evening'").head().getDouble(1)
    assert(math.abs(ratio - 24.0 / 5.75) < 1e-12)
  }

  test("T5: January daily waits and the >300s day") {
    val daily = rowsOf(RideshareTasks.januaryDailyAvgWait(enriched))
    assert(daily === Seq(Seq(1, 375.0), Seq(2, 150.0)))
    val over = RideshareTasks.daysWithAvgWaitOver(enriched)
      .collect().map(_.getInt(0)).toSeq
    assert(over === Seq(1))
  }

  test("T6: HAVING range, evening literal, Brooklyn→Staten Island") {
    assert(RideshareTasks.lowVolumeBoroughSlots(enriched).count() === 9)
    val evening = rowsOf(RideshareTasks.eveningCountsByBorough(enriched))
    assert(evening === Seq(
      Seq("Brooklyn", "evening", 1L), Seq("EWR", "evening", 1L),
      Seq("Manhattan", "evening", 2L)))
    val bsi = RideshareTasks.brooklynToStatenIsland(enriched)
    assert(bsi.count() === 2)
    assert(rowsOf(bsi.limit(1)).head ===
      Seq("Brooklyn", "Staten Island", "Park Slope"))
  }

  test("T7: pivot by business with explicit values and fillna(0)") {
    val got = RideshareTasks.topRoutesPivotedByBusiness(enriched, 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("Park Slope to St. George") === ((1L, 1L, 2L)))
    assert(got("Midtown to Park Slope") === ((2L, 0L, 2L))) // Lyft filled to 0
    assert(got("Newark Airport to NA") === ((1L, 0L, 1L)))
  }
}
