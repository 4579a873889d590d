package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SinksSpec extends AnyFunSuite with SparkSpec {

  private lazy val df = spark.createDataFrame(Seq(
    ("Uber", 1, "11.00"), ("Lyft", 1, "-3.00")))
    .toDF("business", "month", "total_profit")

  test("single-file CSV sink: one part file, header, values round-trip") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Sinks.writeCsvSingle(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(parts.length === 1) // coalesce(1) → a single CSV file
    val back = spark.read.option("header", "true").csv(dir)
      .orderBy("business").collect().map(_.toSeq).toSeq
    assert(back === Seq(Seq("Lyft", "1", "-3.00"), Seq("Uber", "1", "11.00")))
  }

  test("partitioned parquet sink prunes by partition column") {
    val dir = Files.createTempDirectory("graft_pq").toString
    Sinks.writeParquet(df, dir, partitionBy = Seq("business"))
    assert(new java.io.File(s"$dir/business=Uber").isDirectory)
    val uber = spark.read.parquet(dir).filter("business = 'Uber'")
    assert(uber.count() === 1)
    // partition pruning visible in the plan: only one partition dir read
    val scan = uber.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
  }
}
