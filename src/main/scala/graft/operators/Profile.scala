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

  /** Exact linear-interpolated quantiles (SQL `percentile` /
    * `quantile_cont` semantics: value at 0-based rank (n−1)·q of the
    * sorted group, interpolating between the floor and ceil ranks)
    * computed SORT-based instead of via the builtin `percentile`
    * aggregate.
    *
    * Why not the builtin: exact `percentile` accumulates a
    * value→count map per group in the aggregation buffer — at scale
    * the distinct values of a 100 TB column do not fit one buffer, and
    * even at sf0.1 the map-merge dominates (5.1 s → ~1 s here). The
    * sort path is a window rank over a Tungsten radix sort — spills
    * gracefully, no per-group memory proportional to distinct count —
    * then one ordinary aggregate picks the two bracketing ranks per
    * quantile. Same exact result, scale-safe plan.
    */
  def exactQuantiles(df: DataFrame, key: String, value: String,
      qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(key), col(value).cast("double").as("_v"))
    val counts = base.groupBy(key).agg(count(lit(1)).as("_n"))
    val ranked = base.withColumn("_rn",
      row_number().over(Window.partitionBy(key).orderBy("_v")))
    val j = ranked.join(broadcast(counts), key)
    val aggs = qs.map { case (name, q) =>
      val pos = (col("_n") - 1).cast("double") * lit(q)
      val lo = floor(pos)
      val hi = ceil(pos)
      val vLo = max(when(col("_rn") - 1 === lo, col("_v")))
      val vHi = max(when(col("_rn") - 1 === hi, col("_v")))
      round(vLo + (vHi - vLo) * max(pos - lo), 6).as(name)
    }
    j.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact per-column profile. The per-column `countDistinct`s make
    * Catalyst EXPAND the input — one duplicated row per distinct
    * aggregate, i.e. rows × columns — and hold a per-column distinct
    * map during aggregation. Correct, and the right oracle, but a
    * known hazard at 100 TB; [[approxProfile]] is the scale path.
    */
  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(c))

  /** Scale-path profile: identical shape to [[profile]] but distinct
    * counts come from `approx_count_distinct` (HyperLogLog++, default
    * rsd 5%). The sketch is a fixed-size buffer per column — no
    * Expand multiplication, no value→count map — so the whole profile
    * stays ONE single-pass aggregation at any corpus size.
    */
  def approxProfile(df: DataFrame, rsd: Double = 0.05): DataFrame =
    profileWith(df, c => approx_count_distinct(c, rsd))

  /** MERGEABLE per-shard profile: one wide row per `shardCol` value
    * carrying, for every column, the stats whose merge is exact
    * (row/non-null counts → sum, numeric min/max → min/max) plus a
    * DataSketches HLL sketch (`hll_sketch_agg`) for the distinct
    * count — the one statistic a finished number CANNOT merge (two
    * shards' distinct counts don't add), which is exactly why the
    * sketch state, not the estimate, is what a shard publishes.
    *
    * This is the incremental-corpus-stats contract at 100 TB: each
    * arriving batch profiles ITSELF (one aggregation over the batch),
    * appends its row to a tiny stats table, and [[mergeProfile]]
    * folds any subset of shards into a full-corpus profile without
    * rescanning a byte of the corpus.
    */
  def shardProfile(df: DataFrame, shardCol: String): DataFrame = {
    val cols = df.schema.fields.filter(_.name != shardCol)
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(count(c).as(s"nn_${f.name}"),
        hll_sketch_agg(c.cast("string")).as(s"sk_${f.name}"),
        mn.as(s"mn_${f.name}"), mx.as(s"mx_${f.name}"))
    }.toSeq
    df.groupBy(col(shardCol).as("_shard"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Fold shard rows from [[shardProfile]] into the [[profile]] long
    * shape: counts sum, min/max fold, distincts via `hll_union_agg`
    * + estimate (`n_distinct_approx` — the union of register states,
    * so the estimate is the sketch of the WHOLE corpus, not a sum of
    * shard estimates). One aggregation over the shard-count-sized
    * stats frame; the corpus is never touched.
    */
  def mergeProfile(shards: DataFrame): DataFrame = {
    val names = shards.schema.fieldNames
      .collect { case n if n.startsWith("nn_") => n.stripPrefix("nn_") }
    val aggs: Seq[Column] = names.flatMap { n =>
      Seq(sum(col(s"nn_$n")).as(s"nn_$n"),
        hll_sketch_estimate(hll_union_agg(col(s"sk_$n")))
          .as(s"nd_$n"),
        min(col(s"mn_$n")).as(s"mn_$n"),
        max(col(s"mx_$n")).as(s"mx_$n"))
    }.toSeq
    val one = shards.agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
    val stackExpr = names.map(n =>
        s"'$n', `nn_$n`, `nd_$n`, `mn_$n`, `mx_$n`")
      .mkString(s"stack(${names.length}, ", ", ",
        ") as (column, n_nonnull, n_distinct_approx, min_num, max_num)")
    one.select(col("n_rows"), expr(stackExpr))
      .select("column", "n_rows", "n_nonnull", "n_distinct_approx",
        "min_num", "max_num")
      .orderBy("column")
  }

  /** One (row, bucket) cell coordinate per hash row for a token: the
    * j-th row's hash is the shared 60-bit md5 word hash of the
    * row-salted token (`"j:" || token`) — d independent-enough hash
    * functions from ONE portable primitive, reproducible bit-for-bit
    * in the oracle (`('0x'||substr(md5(j||':'||t),1,15))::BIGINT % w`).
    * The 60-bit value is strictly positive, so `%` agrees across
    * engines (no floor-vs-truncate divergence on negatives).
    */
  private def cmBucket(t: Column, j: Int, width: Int): Column =
    graft.functions.TextFunctions.wordHash60(concat(lit(s"$j:"), t)) %
      lit(width.toLong)

  private[graft] def cmCells(t: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(j => struct(lit(j.toLong).as("rw"),
      cmBucket(t, j, width).as("bucket"))): _*)

  /** Count-Min sketch of a token stream (Cormode & Muthukrishnan,
    * J.Alg 2005): a depth×width grid where cell (j, h_j(t)) counts
    * every occurrence whose j-th salted hash lands there. Returned
    * sparse as (rw, bucket, c) rows — at most depth·width of them,
    * whatever the corpus size.
    *
    * This is the frequency counterpart of [[shardProfile]]'s HLL leg:
    * every cell is a SUM, so the sketch is order-independent (hash-
    * exact under any plan) and mergeable — shard sketches fold by
    * cell-wise addition ([[cmMerge]]) without rescanning a byte. At
    * 100 TB the plan is one scan with map-side partial aggregation
    * onto ≤ depth·width keys per task, then a shuffle of sketch-sized
    * (not corpus-sized) partials; exact per-token counts by contrast
    * shuffle the whole vocabulary.
    *
    * `toks` carries one row per token OCCURRENCE in `token`.
    */
  def cmSketch(toks: DataFrame, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1, width >= 2, got $depth/$width")
    toks.select(explode(cmCells(col("token"), depth, width)).as("cell"))
      .groupBy(col("cell.rw").as("rw"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** [[cmSketch]] from an already-aggregated (token, c) count frame —
    * cell (j, h_j(t)) receives Σ c over the tokens hashing there,
    * which is exactly the raw stream's per-cell occurrence count, so
    * `cmSketchOf(counts(toks)) == cmSketch(toks)` (law-tested). Lets a
    * consumer that ALSO needs exact per-token counts (the CM
    * error-grading query) derive both legs from ONE token aggregation
    * — the two identical groupBy subtrees share their exchange
    * (ReuseExchange), so the corpus token stream is exploded once
    * instead of twice (round 19, guide §2.4).
    */
  def cmSketchOf(counts: DataFrame, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1, width >= 2, got $depth/$width")
    counts.select(col("c"),
        explode(cmCells(col("token"), depth, width)).as("cell"))
      .groupBy(col("cell.rw").as("rw"), col("cell.bucket").as("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Cell-wise fold of shard sketches from [[cmSketch]] (sparse union
    * in, sparse sum out) — the merge leg of the mergeable-sketch
    * contract: sketch(A ⊎ B) == cmMerge(sketch(A) ∪ sketch(B)),
    * law-tested in ProfileSpec.
    */
  def cmMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("rw", "bucket").agg(sum("c").as("c"))

  /** Point-estimate candidate token frequencies from a [[cmSketch]]:
    * est(t) = min over rows j of cell(j, h_j(t)) — ≥ the true count
    * always (collisions only ADD), ≤ true + ε·N with probability
    * 1 − δ at depth ⌈ln 1/δ⌉, width ⌈e/ε⌉. A missing sparse cell is a
    * zero counter, so the coalesce happens BEFORE the min (a candidate
    * that misses any row was never seen).
    *
    * Scale shape: the sketch broadcasts (≤ depth·width rows); the
    * candidate frame fans out depth rows each, probes the broadcast
    * map-side, and folds back per token — nothing corpus-sized moves.
    */
  def cmEstimate(sketch: DataFrame, cands: DataFrame, depth: Int = 4,
      width: Int = 512): DataFrame =
    cands.select(col("token"),
        explode(cmCells(col("token"), depth, width)).as("cell"))
      .select(col("token"), col("cell.rw").as("rw"),
        col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("rw", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** Equi-width bin index for one value: floor((v − lo)/step), clamped
    * into [0, bins−1] so out-of-range values land in the edge bins
    * instead of growing the grid. One double subtraction and division
    * against integer literals — the identical IEEE ops replay
    * bit-for-bit in the oracle, so bin assignment is engine-exact.
    * Shared by the batch sketch and the streaming screen
    * ([[graft.streaming.EventStreams.histScreen]]) so the two cannot
    * drift.
    */
  private[graft] def histBin(v: Column, lo: Long, step: Long,
      bins: Int): Column =
    least(lit(bins - 1L), greatest(lit(0L),
      floor((v.cast("double") - lit(lo.toDouble)) / lit(step.toDouble))
        .cast("long")))

  /** Mergeable equi-width histogram sketch of a numeric column, one
    * grid per `key` value: sparse (key, bin, c) rows, at most
    * `bins` per key whatever the corpus size.
    *
    * This is the RANK counterpart of [[cmSketch]]'s frequency leg and
    * [[shardProfile]]'s HLL leg: every cell is a SUM, so the sketch is
    * order-independent (hash-exact under any plan) and shard sketches
    * fold by cell-wise addition ([[histMerge]]) without rescanning a
    * byte. [[exactQuantiles]] needs a global per-group SORT — a full
    * shuffle of the 100 TB column; the histogram path is one scan with
    * map-side partial aggregation onto ≤ bins keys per group, then a
    * shuffle of sketch-sized partials, at the cost of quantiles
    * resolved to a bin edge (error ≤ step, one-sided — see
    * [[histQuantiles]]).
    */
  def histSketch(df: DataFrame, key: String, value: String,
      lo: Long, step: Long, bins: Int): DataFrame = {
    require(step >= 1 && bins >= 2,
      s"need step >= 1, bins >= 2, got $step/$bins")
    df.select(col(key).as("key"),
        histBin(col(value), lo, step, bins).as("bin"))
      .groupBy("key", "bin").agg(count(lit(1)).as("c"))
  }

  /** Cell-wise fold of shard sketches from [[histSketch]] (sparse
    * union in, sparse sum out) — the merge leg of the mergeable-sketch
    * contract: hist(A ⊎ B) == histMerge(hist(A) ∪ hist(B)), law-tested
    * in ProfileHistSpec.
    */
  def histMerge(shards: DataFrame): DataFrame =
    shards.groupBy("key", "bin").agg(sum("c").as("c"))

  /** Approximate quantiles from a [[histSketch]]: for rank fraction
    * q (in permyriad), the estimate is the UPPER EDGE of the first bin
    * whose cumulative count reaches rank ⌈q·n/10⁴⌉ — always ≥ the true
    * type-1 (lower empirical) quantile, and within one `step` of it
    * when the value range is covered, the histogram analogue of
    * [[cmEstimate]]'s one-sided guarantee. All arithmetic integer
    * (rank via positive `div`, edge = lo + (bin+1)·step), so both
    * engines agree on the exact estimate, not just its error band.
    *
    * Scale shape: the cumulative window sorts the SKETCH (≤ |keys|·bins
    * rows), never the corpus — the corpus was consumed by
    * [[histSketch]]'s one aggregated scan.
    */
  def histQuantiles(sketch: DataFrame, lo: Long, step: Long,
      qs: Seq[(String, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 1 && q <= 10000 },
      "quantile ranks must be permyriad values in [1, 10000]")
    val n = sketch.groupBy("key").agg(sum("c").as("n"))
    val cum = sketch
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy("key").orderBy("bin")))
      .join(broadcast(n), "key")
    val aggs = qs.map { case (name, q) =>
      val rank = call_function("div",
        lit(q.toLong) * col("n") + lit(9999L), lit(10000L))
      ((min(when(col("cum") >= rank, col("bin"))) + lit(1L)) * lit(step) +
        lit(lo)).as(name)
    }
    cum.groupBy("key")
      .agg(max(col("n")).as("n"), aggs: _*)
  }

  private def profileWith(df: DataFrame,
      distinctAgg: Column => Column): DataFrame = {
    val cols = df.schema.fields
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(count(c).as(s"nn_${f.name}"),
        distinctAgg(c).as(s"nd_${f.name}"),
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
