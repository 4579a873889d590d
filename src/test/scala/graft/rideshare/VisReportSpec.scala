package graft.rideshare

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VisReportSpec extends AnyFunSuite with SparkSpec {

  private lazy val t2a = spark.createDataFrame(Seq(
    ("Uber", 1, 100L), ("Lyft", 1, 80L), ("Uber", 2, 120L), ("Lyft", 2, 90L)))
    .toDF("business", "month", "trip_count")
  // formatted strings, exactly as T2b/T2c emit them
  private lazy val t2b = spark.createDataFrame(Seq(
    ("Uber", 1, "1,234.56"), ("Lyft", 1, "987.65")))
    .toDF("business", "month", "total_profit")
  private lazy val t5a = spark.createDataFrame(Seq(
    ("1", 300.5), ("2", 280.25), ("3", 310.0)))
    .toDF("day", "avg_wait")

  test("writeReports emits the four figures plus a markdown data view") {
    val out = Files.createTempDirectory("vis").toString
    val paths = VisReport.writeReports(t2a, t2b, t2b, t5a, out)
    assert(paths.size === 5)
    paths.foreach(p => assert(Files.size(Paths.get(p)) > 0))
    val md = new String(Files.readAllBytes(Paths.get(out, "vis_report.md")))
    assert(md.contains("![Trips per month by business](t2a_trip_counts.svg)"))
    assert(md.contains("| business | month | trip_count |")) // table view
    assert(md.contains("| Uber | 1 | 100 |"))
  }

  test("renderAll is deterministic: double render is byte-identical") {
    val a = VisReport.renderAll(t2a, t2b, t2b, t5a)
    val b = VisReport.renderAll(t2a, t2b, t2b, t5a)
    assert(a.map(_._1) === Seq("t2a_trip_counts.svg", "t2b_total_profits.svg",
      "t2c_total_earnings.svg", "t5_daily_avg_wait.svg", "vis_report.md"))
    assert(a === b) // what makes vis_report_manifest's hashes diffable
  }

  test("grouped bars: fixed series slots, one bar per (category, series), legend") {
    val svg = VisReport.groupedBarSvg(Seq(
      ("1", "Uber", 100.0), ("1", "Lyft", 80.0),
      ("2", "Uber", 120.0), ("2", "Lyft", 90.0)),
      "t", "trips")
    assert("<rect [^/]*fill=\"#2a78d6\"".r.findAllIn(svg).size === 3) // 2 bars + legend swatch
    assert("<rect [^/]*fill=\"#eb6834\"".r.findAllIn(svg).size === 3)
    assert(svg.contains("<title>Uber · 1: 100</title>")) // native tooltip
    assert(svg.contains(">Uber</text>") && svg.contains(">Lyft</text>"))
  }

  test("formatted number strings parse for charting (the T2b/T2c contract)") {
    val svg = VisReport.groupedBarSvg(Seq(("1", "Uber", 1234.56)), "t", "p")
    assert(svg.contains("1,234.56")) // tooltip re-renders the value
  }

  test("line chart: single series has no legend box, labels only min/max") {
    val svg = VisReport.lineSvg(Seq(("1", 300.5), ("2", 280.25), ("3", 310.0)),
      "t", "seconds")
    assert("<path ".r.findAllIn(svg).size === 1)
    assert("<circle ".r.findAllIn(svg).size === 3)
    // direct labels on the extremes only (310 max, 280.25 min)
    assert("text-anchor=\"middle\">310<".r.findAllIn(svg).size === 1)
    assert(svg.contains(">280.25<"))
  }
}
