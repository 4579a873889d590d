package graft.rideshare

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Golden-shaped end-to-end replay of the reference pipeline
  * (VERDICT r9 "what's missing #1"): the published 69.7M-row CSV does
  * not exist in this sandbox, so this spec synthesizes a
  * rideshare-schema CSV whose aggregates are DESIGNED to hit the
  * BASELINE.md format boundaries — comma-grouped `format_number`
  * strings ("1,200,371.25"), negative Lyft profits ("-72,633.50"),
  * full-precision double averages, a >300 s wait day — runs
  * `RideshareApp.run` end-to-end (CSV read → enrich → all seven
  * tasks → CSV sinks), and asserts the written CSV VALUES byte-equal
  * goldens computed independently (hand-written strings and plain
  * Scala folds over the fixture rows — never the operators under
  * test).
  *
  * Determinism of the goldens: every monetary/wait value in the
  * fixture is a multiple of 0.25 — exactly representable in binary,
  * so double sums are exact and ORDER-INDEPENDENT (any plan, any
  * partitioning, same bits), averages are one correctly-rounded
  * division of exact operands, and `format_number`/CSV rendering see
  * exact inputs with no rounding ambiguity.
  */
class RideshareGoldenSpec extends AnyFunSuite with SparkSpec {

  private def epoch(month: Int, day: Int): Long =
    java.time.LocalDate.of(2023, month, day).toEpochDay * 86400L

  /** (business, pu, do, len, wait, tod, date, pay, profit) — the
    * columns the tasks consume; the rest of the 15-column schema is
    * padded with 1.0.
    */
  private case class T(b: String, pu: Int, dl: Int, len: Double,
      waitS: Double, tod: String, date: Long, pay: Double, profit: Double)

  private lazy val fixture: Seq[T] = {
    val bulk = (1 to 1200).map { _ => // Manhattan afternoon block:
      // drives the comma-grouped Uber sums and the T6a >=1000 cutoff
      T("Uber", 1, 1, 2.0, 100.0, "afternoon", epoch(1, 15), 5.25, 1000.25)
    }
    val lyftJan = Seq( // negative profit summing to -72,633.25
      T("Lyft", 4, 4, 3.25, 250.0, "morning", epoch(1, 15), 100.25, -24211.25),
      T("Lyft", 4, 4, 3.25, 250.0, "morning", epoch(1, 15), 50.25, -24211.25),
      T("Lyft", 4, 4, 3.5, 250.0, "morning", epoch(1, 15), 49.5, -24210.75))
    val day1 = Seq( // avg wait 396.583… > 300; two Brooklyn->Staten Island
      T("Uber", 2, 3, 5.0, 350.0, "night", epoch(1, 1), 30.25, 10.25),
      T("Uber", 2, 3, 5.25, 400.0, "night", epoch(1, 1), 20.25, 10.25),
      T("Uber", 2, 2, 5.5, 439.75, "night", epoch(1, 1), 10.0, 10.25))
    val day2 = Seq(
      T("Uber", 2, 2, 6.0, 200.0, "evening", epoch(1, 2), 15.25, 20.25),
      T("Uber", 2, 2, 6.5, 250.0, "evening", epoch(1, 2), 14.75, 20.25))
    val day3 = Seq(
      T("Lyft", 6, 6, 1.0, 100.0, "morning", epoch(1, 3), 9.25, -0.25))
    val feb = (1 to 5).map { _ =>
      T("Uber", 5, 6, 4.0, 150.0, "morning", epoch(2, 15), 20.0, 100.25)
    } ++ Seq(
      T("Lyft", 4, 1, 2.5, 175.0, "evening", epoch(2, 15), 30.5, -50.25),
      T("Lyft", 4, 1, 2.5, 175.0, "evening", epoch(2, 15), 29.5, -49.75))
    bulk ++ lyftJan ++ day1 ++ day2 ++ day3 ++ feb
  }

  private lazy val outRoot: String = {
    val root = Files.createTempDirectory("graft_golden").toString
    val tripsCsv = s"$root/rideshare_data.csv"
    val zonesCsv = s"$root/taxi_zone_lookup.csv"
    val header = "business,pickup_location,dropoff_location,trip_length," +
      "request_to_pickup,total_ride_time,on_scene_to_pickup," +
      "on_scene_to_dropoff,time_of_day,date,passenger_fare," +
      "driver_total_pay,rideshare_profit,hourly_rate,dollars_per_mile"
    val lines = fixture.map { t =>
      s"${t.b},${t.pu},${t.dl},${t.len},${t.waitS},1.0,1.0,1.0,${t.tod}," +
        s"${t.date},1.0,${t.pay},${t.profit},1.0,1.0"
    }
    Files.write(Paths.get(tripsCsv),
      (header +: lines).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(zonesCsv),
      ("""LocationID,Borough,Zone,service_zone
        |1,Manhattan,Midtown,Yellow Zone
        |2,Brooklyn,Bay Ridge,Boro Zone
        |3,Staten Island,St. George,Boro Zone
        |4,Queens,Astoria,Boro Zone
        |5,EWR,Newark Airport,EWR
        |6,Unknown,NA,N/A""").stripMargin.getBytes(StandardCharsets.UTF_8))
    val out = s"$root/out"
    RideshareApp.run(spark, tripsCsv, zonesCsv, out)
    out
  }

  /** Read a writeCsvSingle sink: (header line, body lines sorted). */
  private def readCsv(dir: String): (String, Seq[String]) = {
    val part = new java.io.File(s"$outRoot/$dir").listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val all = new String(Files.readAllBytes(part.toPath),
      StandardCharsets.UTF_8).split("\n").toSeq.filter(_.nonEmpty)
    (all.head, all.tail.sorted)
  }

  private lazy val enriched =
    Enrich.enrich(
      RideshareSchema.readTrips(spark, s"${outRoot.stripSuffix("/out")}/rideshare_data.csv"),
      RideshareSchema.readZones(spark, s"${outRoot.stripSuffix("/out")}/taxi_zone_lookup.csv"))

  test("T1: enriched row count survives the double left join exactly") {
    outRoot // force the end-to-end run
    assert(enriched.count() === 1216L)
    assert(enriched.columns.length === 21)
  }

  test("T2a golden CSV: trip counts per business x month, byte-exact") {
    val (header, body) = readCsv("trip_count")
    assert(header === "business,month,trip_count")
    assert(body === Seq(
      "Lyft,1,4", "Lyft,2,2", "Uber,1,1205", "Uber,2,5").sorted)
  }

  test("T2b golden CSV: comma-grouped and negative profits, byte-exact") {
    val (header, body) = readCsv("total_profit")
    assert(header === "business,month,total_profit")
    // comma-grouped values are quoted by the CSV writer (they contain
    // the delimiter) — the golden strings are hand-computed:
    // Uber m1: 1200*1000.25 + 3*10.25 + 2*20.25 = 1,200,371.25
    // Lyft m1: -24211.25 -24211.25 -24210.75 - 0.25 = -72,633.50
    assert(body === Seq(
      "Uber,1,\"1,200,371.25\"",
      "Uber,2,501.25",
      "Lyft,1,\"-72,633.50\"",
      "Lyft,2,-100.00").sorted)
  }

  test("T2c golden CSV: driver earnings, byte-exact") {
    val (header, body) = readCsv("total_earnings")
    assert(header === "business,month,total_earnings")
    // Uber m1: 1200*5.25 + (30.25+20.25+10.0) + (15.25+14.75) = 6,390.50
    assert(body === Seq(
      "Uber,1,\"6,390.50\"",
      "Uber,2,100.00",
      "Lyft,1,209.25",
      "Lyft,2,60.00").sorted)
  }

  test("T3a/T3b: top boroughs per month with dense_rank ties") {
    val pick = RideshareTasks.topBoroughsPerMonth(enriched, "Pickup")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(pick === Set(
      ("Manhattan", 1, 1200L), ("Brooklyn", 1, 5L), ("Queens", 1, 3L),
      ("Unknown", 1, 1L), ("EWR", 2, 5L), ("Queens", 2, 2L)))
    val drop = RideshareTasks.topBoroughsPerMonth(enriched, "Dropoff")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // Brooklyn and Queens tie at 3 dropoffs in m1 — dense_rank keeps both
    assert(drop === Set(
      ("Manhattan", 1, 1200L), ("Brooklyn", 1, 3L), ("Queens", 1, 3L),
      ("Staten Island", 1, 2L), ("Unknown", 1, 1L),
      ("Unknown", 2, 5L), ("Manhattan", 2, 2L)))
  }

  test("T3c: top routes by driver-pay sum, exact doubles in rank order") {
    val got = RideshareTasks.topRoutesByProfit(enriched).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === Seq(
      ("Manhattan to Manhattan", 6300.0),
      ("Queens to Queens", 200.0),
      ("EWR to Unknown", 100.0),
      ("Queens to Manhattan", 60.0),
      ("Brooklyn to Staten Island", 50.5),
      ("Brooklyn to Brooklyn", 40.0),
      ("Unknown to Unknown", 9.25)))
  }

  test("T4: time-of-day averages at full double precision, ordered desc") {
    // independent fold over the fixture (exact quarter sums)
    def avgBy(f: T => Double)(tod: String): Double = {
      val xs = fixture.filter(_.tod == tod)
      xs.map(f).foldLeft(0.0)(_ + _) / xs.size
    }
    val pay = RideshareTasks.avgDriverPayByTimeOfDay(enriched).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(pay === Seq("morning", "evening", "night", "afternoon")
      .map(t => (t, avgBy(_.pay)(t))))
    val len = RideshareTasks.avgTripLengthByTimeOfDay(enriched).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(len.toMap === Seq("morning", "evening", "night", "afternoon")
      .map(t => (t, avgBy(_.len)(t))).toMap)
    val epm = RideshareTasks.earningsPerMile(enriched).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(epm === Seq("morning", "evening", "night", "afternoon")
      .map(t => (t, avgBy(_.pay)(t) / avgBy(_.len)(t))).toMap)
  }

  test("T5 golden CSV: daily average waits with one >300s day, byte-exact") {
    val (header, body) = readCsv("avg_waiting_time")
    assert(header === "day,average_waiting_time")
    // independent: exact quarter sums, one rounded division, rendered
    // by the same JVM Double.toString the CSV writer uses
    def avgWait(day: Int): Double = {
      val xs = fixture.filter(t => t.date == epoch(1, day))
      xs.map(_.waitS).foldLeft(0.0)(_ + _) / xs.size
    }
    assert(body === Seq(1, 2, 3, 15)
      .map(d => s"$d,${avgWait(d)}").sorted)
    assert(avgWait(1) > 300 && Seq(2, 3, 15).forall(avgWait(_) < 300))
    val over = RideshareTasks.daysWithAvgWaitOver(enriched)
      .collect().map(_.getInt(0)).toSeq
    assert(over === Seq(1))
  }

  test("T6: low-volume slots (HAVING both bounds), evening counts, B->SI") {
    val low = RideshareTasks.lowVolumeBoroughSlots(enriched).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // Manhattan/afternoon (1200) must be EXCLUDED by the upper bound
    assert(low === Seq(
      ("Brooklyn", "evening", 2L), ("Brooklyn", "night", 3L),
      ("EWR", "morning", 5L), ("Queens", "evening", 2L),
      ("Queens", "morning", 3L), ("Unknown", "morning", 1L)))
    val evening = RideshareTasks.eveningCountsByBorough(enriched).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(evening === Seq(
      ("Brooklyn", "evening", 2L), ("Queens", "evening", 2L)))
    val bsi = RideshareTasks.brooklynToStatenIsland(enriched)
    assert(bsi.count() === 2L)
    assert(bsi.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet ===
      Set(("Brooklyn", "Staten Island", "Bay Ridge")))
  }

  test("T7: zone-route pivot with zero-fill, totals as value set") {
    val got = RideshareTasks.topRoutesPivotedByBusiness(enriched).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      ("Midtown to Midtown", 1200L, 0L, 1200L),
      ("Newark Airport to NA", 5L, 0L, 5L),
      ("Bay Ridge to Bay Ridge", 3L, 0L, 3L),
      ("Astoria to Astoria", 0L, 3L, 3L),
      ("Bay Ridge to St. George", 2L, 0L, 2L),
      ("Astoria to Midtown", 0L, 2L, 2L),
      ("NA to NA", 0L, 1L, 1L)))
  }
}
