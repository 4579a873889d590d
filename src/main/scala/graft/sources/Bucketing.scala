package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing — the storage-level half of the engine's
  * 100 TB join strategy. The only fact⋈fact join in the library
  * (lineitem⋈orders inside the route queries, SURVEY.md §2.3 J-notes)
  * shuffles both sides on the order key at query time; at cluster
  * scale those tables are written bucketed on that key once, and every
  * subsequent join reads co-partitioned buckets with ZERO exchange —
  * the shuffle is paid at write time, amortized over all queries.
  * BucketingSpec proves the exchange elimination on the physical plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table.
    * Sorting within buckets additionally upgrades the join to a
    * sort-merge with no sort step.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
