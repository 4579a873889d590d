package graft.rideshare

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared enrichment preamble every reference task repeats verbatim
  * (`codes/task1.py:40-69`, byte-identical in task2..task7): fact table
  * left-joined twice against the 265-row zone lookup (pickup side, then
  * dropoff side), prefixed renames, drop of the duplicated join key, and
  * the epoch-seconds → "yyyy-MM-dd" date conversion.
  *
  * Scale design: the zone lookup is a classic tiny dimension, so both
  * joins are explicit `broadcast()` hash joins — the ~100 TB fact table
  * never shuffles for enrichment; each executor streams its scan
  * partitions past two in-memory 265-row hash maps inside one
  * whole-stage-codegen pipeline.
  */
object Enrich {

  /** One prefixed copy of the zone dimension per join side (reference
    * renames post-join, `codes/task1.py:49-51,61-63`; renaming the dim
    * before the join is plan-identical and avoids ambiguous columns).
    */
  private def prefixed(zones: DataFrame, prefix: String): DataFrame =
    zones.select(
      col("LocationID").as(s"${prefix}_LocationID"),
      col("Borough").as(s"${prefix}_Borough"),
      col("Zone").as(s"${prefix}_Zone"),
      col("service_zone").as(s"${prefix}_service_zone"))

  /** trips ⟕ zones(pickup) ⟕ zones(dropoff) + date conversion →
    * the 21-column enriched table (reference `codes/task1.py:45-69`;
    * left-join semantics keep trips with unmatched zone ids as nulls).
    */
  def enrich(trips: DataFrame, zones: DataFrame): DataFrame =
    trips
      .join(broadcast(prefixed(zones, "Pickup")),
        col("pickup_location") === col("Pickup_LocationID"), "left")
      .drop("Pickup_LocationID")
      .join(broadcast(prefixed(zones, "Dropoff")),
        col("dropoff_location") === col("Dropoff_LocationID"), "left")
      .drop("Dropoff_LocationID")
      // epoch seconds → "yyyy-MM-dd" string (reference `codes/task1.py:69`
      // uses from_unixtime the same way; downstream month()/dayofmonth()
      // accept the string via implicit cast, as in the reference).
      .withColumn("date", from_unixtime(col("date"), "yyyy-MM-dd"))
}
