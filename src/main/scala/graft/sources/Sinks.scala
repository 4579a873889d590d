package graft.sources

import org.apache.spark.sql.DataFrame

/** Output operators matching the reference's sink surface (SURVEY.md
  * §2.1) plus the parquet path the verify harness uses.
  */
object Sinks {

  /** Reference operator S3 (`codes/task2.py:109-111`,
    * `codes/task5.py:88`): one CSV file with a header row.
    * `coalesce(1)` collapses the final stage to a single task — correct
    * for the reference's small aggregate results (≤ dozens of rows),
    * and exactly what NOT to do for large outputs; use
    * [[writeParquet]] with partitioning for anything sized by the data.
    */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Scale-shaped sink: parquet, optionally hive-partitioned by low-
    * cardinality columns so downstream reads prune partitions.
    */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Reference operator S4: console sink (`show`). */
  def show(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** JSONL sink (one JSON object per line — the interchange format
    * training corpora ship in). Spark's json writer IS line-delimited,
    * so output stays splittable: a downstream 1000-executor read
    * parallelizes by newline with no coordination. Optional
    * partitioning as in [[writeParquet]].
    */
  def writeJsonl(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .json(path)
  }

  /** ORC sink — the other columnar interchange format (Hive-native
    * stacks). Same scale shape as [[writeParquet]]: columnar + striped
    * so downstream scans prune columns and split by stripe; zstd keeps
    * parity with the parquet default. Optional hive partitioning.
    */
  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }
}
