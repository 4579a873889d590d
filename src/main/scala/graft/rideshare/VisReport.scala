package graft.rideshare

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}

/** Engine-side counterpart of the reference's visualization notebooks
  * (`/root/reference/codes/task2_vis.ipynb` cells 0–2 and
  * `task5_vis.ipynb` cell 0, rendered in `Images/task2_vis1-3.PNG`,
  * `Images/task5_vis.PNG`): the T2 per-(business, month) bar charts and
  * the T5 January daily-average line, emitted as self-contained SVG
  * plus a markdown table view — no plotting dependency.
  *
  * This is pure PRESENTATION over already-aggregated results (≤ dozens
  * of rows), so the `collect()`s here are the same driver-side step the
  * notebooks' pandas `read_csv` performs — the heavy lifting stayed in
  * the cluster plans that produced the frames.
  *
  * Chart conventions: categorical series colors in fixed slot order
  * (validated for CVD separation and surface contrast), 2px gaps
  * between adjacent bars, recessive axes/grid, text in ink colors
  * (never the series color), a legend when ≥ 2 series plus direct
  * series labels, native SVG `<title>` tooltips per mark, and an
  * accompanying markdown table as the accessible data view.
  */
object VisReport {

  /** Fixed categorical slots (validated palette; light surface). */
  private val SeriesColors = Seq("#2a78d6", "#eb6834", "#1baf7a", "#eda100")
  private val Ink = "#1a1a19"
  private val InkMuted = "#6b6a60"
  private val Grid = "#e5e5e0"

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def num(v: Any): Double = v match {
    case null => 0.0
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case s: String => s.replace(",", "").toDouble
    case other => other.toString.replace(",", "").toDouble
  }

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) f"${v.toLong}%,d" else f"$v%,.2f"

  /** Markdown table of a small result frame (the data view every chart
    * ships with).
    */
  def markdownTable(df: DataFrame, maxRows: Int = 200): String =
    markdownTable(df.columns.toSeq, df.limit(maxRows).collect().toSeq, maxRows)

  /** [[markdownTable]] over pre-collected rows — lets [[renderAll]]
    * execute each input frame exactly once for both its figure and its
    * data view.
    */
  def markdownTable(cols: Seq[String], rows: Seq[Row],
      maxRows: Int): String = {
    val sb = new StringBuilder
    sb.append(cols.mkString("| ", " | ", " |\n"))
    sb.append(cols.map(_ => "---").mkString("| ", " | ", " |\n"))
    rows.take(maxRows).foreach { r =>
      sb.append(cols.indices.map(i => String.valueOf(r.get(i)))
        .mkString("| ", " | ", " |\n"))
    }
    sb.toString
  }

  /** Grouped bar chart over (category, series, value) rows — the shape
    * of every T2 figure (category = month, series = business). Series
    * get palette slots in first-appearance order and keep them
    * regardless of filtering.
    */
  def groupedBarSvg(rows: Seq[(String, String, Double)], title: String,
      yLabel: String): String = {
    val cats = rows.map(_._1).distinct
    val series = rows.map(_._2).distinct
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    val vMax = math.max(rows.map(_._3).max, 1e-9)
    val (w, h, l, r, t, b) = (720, 360, 76, 16, 44, 44)
    val plotW = w - l - r
    val plotH = h - t - b
    val groupW = plotW.toDouble / cats.size
    val barW = math.max(2.0, (groupW - 8) / series.size - 2) // 2px gaps
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif">""")
    sb.append(s"""<rect width="$w" height="$h" fill="#ffffff"/>""")
    sb.append(s"""<text x="$l" y="24" font-size="15" fill="$Ink" font-weight="bold">${esc(title)}</text>""")
    // recessive horizontal gridlines + y ticks
    (0 to 4).foreach { i =>
      val v = vMax * i / 4
      val y = t + plotH - plotH * i / 4
      sb.append(s"""<line x1="$l" y1="$y" x2="${w - r}" y2="$y" stroke="$Grid" stroke-width="1"/>""")
      sb.append(s"""<text x="${l - 6}" y="${y + 4}" font-size="10" fill="$InkMuted" text-anchor="end">${fmt(v)}</text>""")
    }
    // bars with native tooltips
    cats.zipWithIndex.foreach { case (c, ci) =>
      series.zipWithIndex.foreach { case (s, si) =>
        byKey.get((c, s)).foreach { v =>
          val bh = plotH * v / vMax
          val x = l + ci * groupW + 4 + si * (barW + 2)
          val y = t + plotH - bh
          val color = SeriesColors(si % SeriesColors.length)
          sb.append(s"""<rect x="${x.round}" y="${y.round}" width="${barW.round}" height="${bh.round}" fill="$color" rx="2"><title>${esc(s)} · ${esc(c)}: ${fmt(v)}</title></rect>""")
        }
      }
      sb.append(s"""<text x="${(l + ci * groupW + groupW / 2).round}" y="${h - b + 16}" font-size="11" fill="$InkMuted" text-anchor="middle">${esc(c)}</text>""")
    }
    // axis label + legend (>= 2 series), text in ink with color swatch
    sb.append(s"""<text x="14" y="${t - 8}" font-size="10" fill="$InkMuted">${esc(yLabel)}</text>""")
    if (series.size >= 2) series.zipWithIndex.foreach { case (s, si) =>
      val x = l + si * 110
      val color = SeriesColors(si % SeriesColors.length)
      sb.append(s"""<rect x="$x" y="${h - 14}" width="10" height="10" fill="$color" rx="2"/>""")
      sb.append(s"""<text x="${x + 14}" y="${h - 5}" font-size="11" fill="$Ink">${esc(s)}</text>""")
    }
    sb.append("</svg>")
    sb.toString
  }

  /** Single-series line chart over ordered (x, y) rows — the T5 shape
    * (x = January day, y = average wait). One series → the title names
    * it, no legend box; min/max points get selective direct labels.
    */
  def lineSvg(rows: Seq[(String, Double)], title: String,
      yLabel: String): String = {
    val vMax = math.max(rows.map(_._2).max, 1e-9)
    val (w, h, l, r, t, b) = (720, 360, 76, 16, 44, 44)
    val plotW = w - l - r
    val plotH = h - t - b
    def px(i: Int) = l + (if (rows.size == 1) plotW / 2.0
      else plotW.toDouble * i / (rows.size - 1))
    def py(v: Double) = t + plotH - plotH * v / vMax
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif">""")
    sb.append(s"""<rect width="$w" height="$h" fill="#ffffff"/>""")
    sb.append(s"""<text x="$l" y="24" font-size="15" fill="$Ink" font-weight="bold">${esc(title)}</text>""")
    (0 to 4).foreach { i =>
      val v = vMax * i / 4
      val y = py(v)
      sb.append(s"""<line x1="$l" y1="$y" x2="${w - r}" y2="$y" stroke="$Grid" stroke-width="1"/>""")
      sb.append(s"""<text x="${l - 6}" y="${y + 4}" font-size="10" fill="$InkMuted" text-anchor="end">${fmt(v)}</text>""")
    }
    val path = rows.zipWithIndex
      .map { case ((_, v), i) => s"${if (i == 0) "M" else "L"}${px(i).round},${py(v).round}" }
      .mkString(" ")
    sb.append(s"""<path d="$path" fill="none" stroke="${SeriesColors.head}" stroke-width="2"/>""")
    val vMin = rows.map(_._2).min
    rows.zipWithIndex.foreach { case ((x, v), i) =>
      sb.append(s"""<circle cx="${px(i).round}" cy="${py(v).round}" r="4" fill="${SeriesColors.head}"><title>${esc(x)}: ${fmt(v)}</title></circle>""")
      if (v == vMax || v == vMin) // selective direct labels only
        sb.append(s"""<text x="${px(i).round}" y="${(py(v) - 8).round}" font-size="10" fill="$Ink" text-anchor="middle">${fmt(v)}</text>""")
      if (rows.size <= 31 && (i % math.max(1, rows.size / 10) == 0))
        sb.append(s"""<text x="${px(i).round}" y="${h - b + 16}" font-size="10" fill="$InkMuted" text-anchor="middle">${esc(x)}</text>""")
    }
    sb.append(s"""<text x="14" y="${t - 8}" font-size="10" fill="$InkMuted">${esc(yLabel)}</text>""")
    sb.append("</svg>")
    sb.toString
  }

  /** Render the four reference figures + the markdown data view from
    * the T2/T5 result frames (column contracts: T2 frames are
    * (business, month, value); T5 is (day, value)), as in-memory
    * (filename, content) pairs in fixed filename order.
    *
    * Deterministic by construction: the input frames end in total
    * ORDER BYs (the registry contract), `barRows` re-sorts, and the
    * SVG text contains no timestamps or randomness — identical inputs
    * yield byte-identical artifacts, which is what lets the
    * `vis_report_manifest` registry query expose content hashes for
    * round-over-round diffing.
    */
  def renderAll(t2a: DataFrame, t2b: DataFrame, t2c: DataFrame,
      t5a: DataFrame): Seq[(String, String)] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // ONE collect per frame, and the four independent Spark jobs run
    // concurrently (they share the session's scheduler pools): figure
    // and data view render from the same rows, so no input executes
    // twice, and wall-clock is the slowest query instead of the sum
    val frames = Seq(t2a, t2b, t2c, t5a).map(df => df.columns.toSeq -> df)
    val collected = Await.result(
      Future.sequence(frames.map { case (cols, df) =>
        Future(cols -> df.collect().toSeq)
      }), Duration.Inf)
    val Seq(r2a, r2b, r2c, r5a) = collected
    def barRows(rows: Seq[Row]) = rows
      .map(r => (String.valueOf(r.get(1)), String.valueOf(r.get(0)), num(r.get(2))))
      .sortBy(x => (x._1.length, x._1)) // months numeric-ish order
    val figures = Seq(
      ("t2a_trip_counts", "Trips per month by business", "trips",
        groupedBarSvg(barRows(r2a._2), "Trips per month by business", "trips"), r2a),
      ("t2b_total_profits", "Platform profits per month by business", "profit",
        groupedBarSvg(barRows(r2b._2), "Platform profits per month by business", "profit"), r2b),
      ("t2c_total_earnings", "Driver earnings per month by business", "earnings",
        groupedBarSvg(barRows(r2c._2), "Driver earnings per month by business", "earnings"), r2c),
      ("t5_daily_avg_wait", "January daily average waiting time", "seconds",
        lineSvg(r5a._2.map(r =>
          (String.valueOf(r.get(0)), num(r.get(1))))
          .sortBy(_._1.replaceAll("[^0-9]", "").toInt),
          "January daily average waiting time", "seconds"), r5a))
    val md = new StringBuilder("# Rideshare visual report (T2 / T5)\n\n")
    val svgs = figures.map { case (name, titleTxt, _, svg, (cols, rows)) =>
      md.append(s"## $titleTxt\n\n![$titleTxt]($name.svg)\n\n")
      md.append(markdownTable(cols, rows, 200)).append("\n")
      s"$name.svg" -> svg
    }
    svgs :+ ("vis_report.md" -> md.toString)
  }

  /** [[renderAll]] written to `outDir`; returns the written paths. */
  def writeReports(t2a: DataFrame, t2b: DataFrame, t2c: DataFrame,
      t5a: DataFrame, outDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    renderAll(t2a, t2b, t2c, t5a).map { case (name, content) =>
      val p = Paths.get(outDir, name)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      p.toString
    }
  }
}
