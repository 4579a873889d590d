package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: per-column row/null/distinct counts plus numeric
  * min/max — the data-quality sweep run before a corpus enters a
  * training pipeline.
  *
  * Scale shape: ONE aggregation job computes every column's stats
  * (Catalyst's distinct-aggregate expansion handles the per-column
  * `count(distinct)`s in the same pass), then a `stack` unpivots the
  * single result row into one row per column — no per-column scans, no
  * driver loop over columns at execution time (the loop below builds
  * the PLAN, not the work).
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(count(c).as(s"nn_${f.name}"),
        countDistinct(c).as(s"nd_${f.name}"),
        mn.as(s"mn_${f.name}"), mx.as(s"mx_${f.name}"))
    }.toSeq
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = cols.map(f =>
        s"'${f.name}', `nn_${f.name}`, `nd_${f.name}`, `mn_${f.name}`, `mx_${f.name}`")
      .mkString(s"stack(${cols.length}, ", ", ",
        ") as (column, n_nonnull, n_distinct, min_num, max_num)")
    one.select(col("n_rows"), expr(stackExpr))
      .select("column", "n_rows", "n_nonnull", "n_distinct",
        "min_num", "max_num")
      .orderBy("column")
  }
}
