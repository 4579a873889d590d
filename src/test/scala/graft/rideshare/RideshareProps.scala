package graft.rideshare

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** Property-based invariants over the rideshare task library
  * (SURVEY.md §5): run on generated trip tables so the checks hold for
  * shapes the hand-built fixture doesn't cover (ties, empty groups,
  * unmatched keys, single-business months).
  */
object RideshareProps extends Properties("rideshare") {

  // Spark jobs per case are expensive — a handful of generated tables
  // is plenty to catch structural regressions.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val zones = Seq(
    (1, "Manhattan", "Midtown", "Yellow Zone"),
    (2, "Brooklyn", "Park Slope", "Boro Zone"),
    (3, "Queens", "Astoria", "Boro Zone"))

  private val genTrip: Gen[(String, Int, Int, Double, Double, String, Long, Double, Double)] =
    for {
      business <- Gen.oneOf("Uber", "Lyft")
      pu <- Gen.chooseNum(1, 4) // 4 = unmatched → left-join null path
      dropoff <- Gen.chooseNum(1, 4)
      len <- Gen.chooseNum(1, 20).map(_.toDouble)
      wait <- Gen.chooseNum(10, 600).map(_.toDouble)
      tod <- Gen.oneOf("morning", "afternoon", "evening", "night")
      day <- Gen.chooseNum(0, 150) // ~5 months from 2023-01-01
      pay <- Gen.chooseNum(5, 60).map(_.toDouble)
      profit <- Gen.chooseNum(-20, 20).map(_.toDouble)
    } yield (business, pu, dropoff, len, wait, tod,
      1672531200L + day * 86400L, pay, profit)

  private def enrichedOf(trips: List[(String, Int, Int, Double, Double, String, Long, Double, Double)]) = {
    val t = spark.createDataFrame(trips)
      .toDF("business", "pickup_location", "dropoff_location", "trip_length",
        "request_to_pickup", "time_of_day", "date", "driver_total_pay",
        "rideshare_profit")
    val z = spark.createDataFrame(zones)
      .toDF("LocationID", "Borough", "Zone", "service_zone")
    Enrich.enrich(t, z)
  }

  private val genTrips = Gen.nonEmptyListOf(genTrip)

  property("enrich preserves row count (left-join, unique dim keys)") =
    forAll(genTrips) { trips =>
      enrichedOf(trips).count() == trips.length
    }

  property("top-k per month: kept counts dominate dropped counts") =
    forAll(genTrips) { trips =>
      val enr = enrichedOf(trips)
      val kept = RideshareTasks.topBoroughsPerMonth(enr, "Pickup", k = 2)
        .collect().map(r => (r.getInt(1), r.getLong(2)))
      val all = {
        import org.apache.spark.sql.functions._
        enr.withColumn("month", month(col("date")))
          .groupBy("Pickup_Borough", "month").count()
          .collect().map(r => (r.getInt(1), r.getLong(2)))
      }
      val keptSet = kept.toSet
      val dropped = all.filterNot(keptSet)
      Prop(dropped.forall { case (m, c) =>
        kept.filter(_._1 == m).forall(_._2 >= c)
      }) :| s"kept=${kept.toSeq} dropped=${dropped.toSeq}"
    }

  property("pivot totals: uber+lyft = total, totals sum to row count") =
    forAll(genTrips) { trips =>
      val rows = RideshareTasks
        .topRoutesPivotedByBusiness(enrichedOf(trips), k = 1000).collect()
      val perRow = rows.forall(r => r.getLong(1) + r.getLong(2) == r.getLong(3))
      Prop(perRow && rows.map(_.getLong(3)).sum == trips.length) :|
        s"rows=${rows.length}"
    }

  property("earnings per mile = pay avg / length avg, per time_of_day") =
    forAll(genTrips) { trips =>
      val e = enrichedOf(trips)
      val pay = RideshareTasks.avgDriverPayByTimeOfDay(e).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val len = RideshareTasks.avgTripLengthByTimeOfDay(e).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val ratio = RideshareTasks.earningsPerMile(e).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      Prop(ratio.forall { case (tod, v) =>
        math.abs(v - pay(tod) / len(tod)) < 1e-9
      }) :| s"ratio=$ratio"
    }
}
