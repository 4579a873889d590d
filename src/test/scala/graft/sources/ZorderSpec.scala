package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZorderSpec extends AnyFunSuite with SparkSpec {

  test("morton: hand-checked interleave, a at even bits, b at odd") {
    val s = spark; import s.implicits._
    val got = Seq((3L, 0L), (0L, 3L), (1L, 1L), (5L, 2L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Zorder.morton(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // a=0b11 -> bits 0,2 = 0b0101; b=0b11 -> bits 1,3 = 0b1010
    // a=1,b=1 -> 0b11; a=0b101,b=0b010 -> bits a:0,4 b:3 -> 0b011001
    assert(got === Set((3L, 0L, 5L), (0L, 3L, 10L), (1L, 1L, 3L),
      (5L, 2L, 25L)))
  }

  test("mortonN: 3-key hand interleave, 2-key delegation, int64 budget") {
    val s = spark; import s.implicits._
    // bit i of key j lands at 3i+j: (1,1,1) -> 0b111 = 7;
    // (3,0,0) -> bits 0,3 = 9; (0,0,2) -> bit 1 of c -> 3*1+2 = 0b100000
    val got = Seq((1L, 1L, 1L), (3L, 0L, 0L), (0L, 0L, 2L), (2L, 1L, 4L))
      .toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Zorder.mortonN(Seq(col("a"), col("b"), col("c")), bits = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // (2,1,4): a bit1->pos3, b bit0->pos1, c bit2->pos8 = 256+8+2
    assert(got === Set((1L, 1L, 1L, 7L), (3L, 0L, 0L, 9L),
      (0L, 0L, 2L, 32L), (2L, 1L, 4L, 266L)))
    // bijectivity on the 8x8x8 grid: codes are exactly 0..511
    val grid = (for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val codes = grid.select(Zorder.mortonN(
        Seq(col("a"), col("b"), col("c")), bits = 3))
      .collect().map(_.getLong(0)).sorted
    assert(codes.toSeq === (0L until 512L))
    // the 2-key morton IS mortonN at k=2 (one definition)
    val two = Seq((5L, 2L)).toDF("a", "b")
    assert(two.select(Zorder.morton(col("a"), col("b"))).head.getLong(0)
      === two.select(Zorder.mortonN(Seq(col("a"), col("b")), 16))
        .head.getLong(0))
    // int64 budget enforced: 7 keys x 9 bits = 63 > 62 must refuse
    intercept[IllegalArgumentException] {
      Zorder.mortonN(Seq.fill(7)(col("a")), bits = 9)
    }
    intercept[IllegalArgumentException] { Zorder.mortonN(Seq(col("a")), 4) }
  }

  test("hilbert: bijective over the grid, CONTINUOUS (adjacent codes are grid neighbors)") {
    val s = spark; import s.implicits._
    val bits = 4 // 16x16 = 256 cells
    val grid = (0 until 16).flatMap(a => (0 until 16).map(b =>
      (a.toLong, b.toLong))).toDF("a", "b")
    val got = grid
      .select(col("a"), col("b"),
        Zorder.hilbert(col("a"), col("b"), bits).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    // bijection: codes are exactly 0..255
    assert(got.map(_._1).toSeq === (0L until 256L))
    // continuity — the property Z-order lacks: consecutive codes are
    // Manhattan-distance-1 grid neighbors, every single step
    got.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
    // origin anchors the orientation
    assert(got.head._2 === ((0L, 0L)))
    // eval and codegen agree (collect above ran codegen; spot-check
    // the interpreted runtime directly)
    assert(graft.expressions.HilbertCurve.index(0L, 0L, bits) === 0L)
    assert(got.toMap.apply(255L) ===
      ((0 until 16).flatMap(a => (0 until 16).map(b => (a.toLong, b.toLong)))
        .maxBy(p => graft.expressions.HilbertCurve.index(p._1, p._2, bits))))
  }

  test("hilbertN: Skilling n-D — bijective AND continuous on the 3-D grid") {
    val s = spark; import s.implicits._
    val grid = (for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val got = grid.select(col("a"), col("b"), col("c"),
        Zorder.hilbertN(Seq(col("a"), col("b"), col("c")), bits = 3).as("h"))
      .collect()
      .map(r => (r.getLong(3), (r.getLong(0), r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    // bijection over the 8x8x8 grid: codes exactly 0..511
    assert(got.map(_._1).toSeq === (0L until 512L))
    // continuity — THE Hilbert property, in 3-D: consecutive codes
    // are Manhattan-distance-1 neighbors, every single step
    got.sliding(2).foreach {
      case Array((_, (x1, y1, z1)), (_, (x2, y2, z2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) +
          math.abs(z1 - z2) === 1L)
      case _ => ()
    }
    // and at n=2 Skilling is also a proper Hilbert curve (it orients
    // differently from the classic 2-D walk, so no code equality)
    val grid2 = (for (a <- 0 until 16; b <- 0 until 16)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val got2 = grid2.select(
        Zorder.hilbertN(Seq(col("a"), col("b")), bits = 4).as("h"),
        col("a"), col("b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    assert(got2.map(_._1).toSeq === (0L until 256L))
    got2.sliding(2).foreach {
      case Array((_, (x1, y1)), (_, (x2, y2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
      case _ => ()
    }
    // int64 budget + arity enforced at plan build
    intercept[IllegalArgumentException] { Zorder.hilbertN(Seq(col("a")), 4) }
    intercept[IllegalArgumentException] {
      Zorder.hilbertN(Seq.fill(7)(col("a")), bits = 9)
    }
  }

  test("hilbert_index / hilbert_index_n / mmr_select registered for SQL") {
    val s = spark; import s.implicits._
    Seq((3L, 5L)).toDF("a", "b").createOrReplaceTempView("hn")
    val r = spark.sql(
      "SELECT hilbert_index(a, b, 4) AS h2, " +
        "hilbert_index_n(array(a, b, 2L), 3, 4) AS h3 FROM hn")
      .collect().head
    assert(r.getLong(0) ===
      graft.expressions.HilbertCurve.index(3L, 5L, 4))
    assert(r.getLong(1) ===
      graft.expressions.HilbertCurveN.index(Array(3L, 5L, 2L), 4))
    val m = spark.sql(
      "SELECT mmr_select(array(struct(1L, 10L, array(1.0D)), " +
        "struct(2L, 9L, array(1.0D))), 1) AS p")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(m.map(_.getLong(0)) === Seq(1L)) // highest rel picked first
  }

  test("hilbert layout prunes box queries at least as well as z-order") {
    val s = spark; import s.implicits._
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b =>
      (a.toLong, b.toLong))).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_h").toString
    Zorder.writeZordered(grid, s"$dir/z", col("a"), col("b"),
      nFiles = 16, bits = 6)
    Zorder.writeHilbertOrdered(grid, s"$dir/h", col("a"), col("b"),
      nFiles = 16, bits = 6)
    // file-granularity min/max pruning on a conjunctive box query —
    // the parquet row-group stats decision
    def filesHit(path: String, aLo: Long, aHi: Long, bLo: Long,
        bHi: Long): (Int, Int) = {
      val boxes = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min("a"), max("a"), min("b"), max("b")).collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
      (boxes.count { case (al, ah, bl, bh) =>
        ah >= aLo && al <= aHi && bh >= bLo && bl <= bHi },
        boxes.size)
    }
    // several box queries, including one straddling the 32-boundary
    // diagonal seam where Z-order's long jump hurts
    val boxes = Seq((0L, 7L, 0L, 7L), (28L, 35L, 28L, 35L),
      (0L, 7L, 56L, 63L), (16L, 23L, 16L, 23L))
    boxes.foreach { case (al, ah, bl, bh) =>
      val (zHit, zTotal) = filesHit(s"$dir/z", al, ah, bl, bh)
      val (hHit, hTotal) = filesHit(s"$dir/h", al, ah, bl, bh)
      assert(zTotal >= 8 && hTotal >= 8)
      assert(hHit <= zHit,
        s"box ($al-$ah, $bl-$bh): hilbert hit $hHit files, z-order $zHit")
      assert(hHit * 2 <= hTotal,
        s"box ($al-$ah, $bl-$bh): hilbert pruned only ${hTotal - hHit}")
    }
  }

  test("z-order layout prunes a second-key range scan; a-stripes don't") {
    val s = spark; import s.implicits._
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b =>
      (a.toLong, b.toLong))).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString

    Zorder.writeZordered(grid, s"$dir/z", col("a"), col("b"),
      nFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/astripe")

    // min/max pruning simulation at file granularity: a file is
    // scanned iff its [min, max] box intersects the query box — the
    // exact decision parquet row-group stats drive
    def filesHit(path: String, bLo: Long, bHi: Long): (Int, Int) = {
      val boxes = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min("b"), max("b")).collect()(0)
          (r.getLong(0), r.getLong(1))
        }
      (boxes.count { case (lo, hi) => hi >= bLo && lo <= bHi },
        boxes.size)
    }
    // query on b ALONE (b in [0, 7]): the stripe layout sorted by `a`
    // leaves b unbounded per file -> every file intersects; z-order
    // bounds BOTH keys per file -> most files prune
    val (zHit, zTotal) = filesHit(s"$dir/z", 0L, 7L)
    val (sHit, sTotal) = filesHit(s"$dir/astripe", 0L, 7L)
    assert(zTotal >= 8 && sTotal >= 8) // the writers actually split
    assert(sHit === sTotal, s"a-stripes should not bound b: $sHit/$sTotal")
    assert(zHit * 2 <= zTotal,
      s"z-order pruned only ${zTotal - zHit} of $zTotal files")
  }
}
