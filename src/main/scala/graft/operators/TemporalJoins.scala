package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form of: backward
  * as-of join and interval (range) join. Both are expressed as compositions
  * of equi-shuffle primitives — never as an inequality theta-join, which
  * Spark can only execute as a broadcast nested loop (quadratic and
  * broadcast-bounded, a non-starter at 100 TB).
  */
object TemporalJoins {

  /** Distributed backward as-of join: for every left row, the single
    * right row with the greatest `rightTs <= leftTs` within the same
    * `on` key group (inclusive at equality), or nulls when none exists.
    *
    * Implementation is the union + window formulation: tag both sides,
    * union them, and carry the latest right-side payload forward with
    * `last(_, ignoreNulls)` over `(on ORDER BY ts, side)`. One shuffle
    * on `on`, sorted once, O(n log n) — the per-key interleave is
    * exactly the merge an as-of join needs, and it inherits Spark's
    * skew handling on the window shuffle. Right rows sort BEFORE left
    * rows at an equal timestamp, which is what makes the match
    * inclusive.
    *
    * The right row travels as ONE struct: `last` per column would mix
    * rows whenever a payload value is legitimately null (ignoreNulls
    * would reach back to an older row for that column only). The
    * struct is null only on left-tagged rows, so the atomic row
    * semantics survive any payload nulls.
    *
    * Null keys follow SQL equi-join/ASOF semantics: NULL never equals
    * NULL, so null-keyed right rows are dropped before the union (they
    * can match nothing), and null-keyed left rows pass through with a
    * null right side (left-join shape).
    *
    * Caller contract: `(on, rightTs)` must be unique on the right
    * (dedupe first — e.g. keep the max-payload row — or the winner at
    * an exactly-tied right timestamp is undefined), and
    * `rightTs +: rightPayload` must not collide with left column names.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(on.contains)
    val payload = struct((rightTs +: rightPayload).map(col): _*)
    val leftStructType = org.apache.spark.sql.types.StructType(
      left.schema.fields.filterNot(f => on.contains(f.name)))
    // SQL null semantics: a null-keyed right row equals no left key.
    // (The window would otherwise group it WITH null-keyed left rows —
    // partitionBy treats nulls as one group — and invent matches.)
    val rightNonNull = on.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
    val r = rightNonNull.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__asof_ts"),
        lit(0).as("__asof_side"),
        payload.as("__asof_right"),
        lit(null).cast(leftStructType).as("__asof_left")): _*)
    val l = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__asof_ts"),
        lit(1).as("__asof_side"),
        lit(null).cast(r.schema("__asof_right").dataType).as("__asof_right"),
        struct(leftRest.map(col): _*).as("__asof_left")): _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__asof_ts"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__asof_match", last(col("__asof_right"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(
        on.map(col) ++
          leftRest.map(c => col(s"__asof_left.$c").as(c)) ++
          (rightTs +: rightPayload).map(c => col(s"__asof_match.$c").as(c)): _*)
  }

  /** Interval (range) join: every `(point, interval)` pair with the same
    * `on` key and `startCol <= point < endCol` — rewritten as an
    * EQUI-join on `(on, time bucket)` plus a residual containment
    * filter, so it shuffles (or broadcasts) like any hash join instead
    * of degenerating into a nested loop.
    *
    * Each interval explodes into the buckets it covers (end exclusive:
    * the last bucket holds `endUs - 1`); each point carries its single
    * bucket, so a pair can meet in at most one exploded row — no
    * post-join dedup. With `bucketSec` at or above the maximum interval
    * length the explode factor is ≤ 2; shorter buckets trade explode
    * rows for smaller per-bucket candidate sets (skew), exactly the
    * knob a 100 TB deployment tunes.
    *
    * Caller contract: interval columns must not collide with point
    * columns; intervals with `end <= start` match nothing (dropped
    * before the explode, which cannot express an empty range).
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      on: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketSec: Long): DataFrame = {
    val wUs = bucketSec * 1000000L
    val p = points.withColumn("__rj_bucket",
      expr(s"unix_micros($pointTs) div $wUs"))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__rj_bucket", explode(sequence(
        expr(s"unix_micros($startCol) div $wUs"),
        expr(s"(unix_micros($endCol) - 1) div $wUs"))))
    p.join(i, on :+ "__rj_bucket")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__rj_bucket")
  }
}
