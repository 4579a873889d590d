package graft.expressions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws of the Hilbert transform at every grid size 1..7 bits —
  * exhaustive per size (the function is pure, no Spark needed):
  * bijectivity onto 0..4^bits−1, step-1 continuity (the property
  * Z-order lacks and the whole point of the curve), and the low-bit
  * masking contract shared with morton.
  */
object HilbertProps extends Properties("hilbert") {

  private def cells(bits: Int): Seq[(Long, Long)] = {
    val n = 1 << bits
    for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
  }

  property("bijective onto 0..4^bits-1 at every size") =
    forAll(Gen.choose(1, 7)) { bits =>
      val ds = cells(bits).map { case (x, y) =>
        HilbertCurve.index(x, y, bits) }
      ds.sorted == (0L until (1L << (2 * bits))).toList
    }

  property("consecutive codes are Manhattan-1 neighbors at every size") =
    forAll(Gen.choose(1, 7)) { bits =>
      val byD = cells(bits)
        .map { case (x, y) => HilbertCurve.index(x, y, bits) -> (x, y) }
        .sortBy(_._1).map(_._2)
      byD.sliding(2).forall {
        case Seq((x1, y1), (x2, y2)) =>
          math.abs(x1 - x2) + math.abs(y1 - y2) == 1L
        case _ => true
      }
    }

  property("inputs are masked to their low bits (the morton contract)") =
    forAll(Gen.choose(1, 7), Gen.choose(0L, Long.MaxValue / 2),
      Gen.choose(0L, Long.MaxValue / 2)) { (bits, a, b) =>
      val m = (1L << bits) - 1
      HilbertCurve.index(a, b, bits) ==
        HilbertCurve.index(a & m, b & m, bits)
    }

  // ---- Skilling n-D (round 13) — same laws at every (dims, bits)
  // with an exhaustively enumerable grid (dims*bits <= 12)

  private val dimsBits: Gen[(Int, Int)] = for {
    dims <- Gen.choose(2, 4)
    bits <- Gen.choose(1, 12 / dims)
  } yield (dims, bits)

  private def gridN(dims: Int, bits: Int): Seq[Array[Long]] = {
    val n = 1 << bits
    (0 until math.pow(n.toDouble, dims.toDouble).toInt).map { c =>
      Array.tabulate(dims)(i =>
        ((c >> (i * bits)) & (n - 1)).toLong)
    }
  }

  property("n-D: bijective onto 0..2^(dims*bits)-1 at every shape") =
    forAll(dimsBits) { case (dims, bits) =>
      val ds = gridN(dims, bits).map(HilbertCurveN.index(_, bits))
      ds.sorted == (0L until (1L << (dims * bits))).toList
    }

  property("n-D: consecutive codes are Manhattan-1 neighbors at every shape") =
    forAll(dimsBits) { case (dims, bits) =>
      val byD = gridN(dims, bits)
        .map(xs => HilbertCurveN.index(xs, bits) -> xs)
        .sortBy(_._1).map(_._2)
      byD.sliding(2).forall {
        case Seq(a, b) =>
          a.zip(b).map { case (x, y) => math.abs(x - y) }.sum == 1L
        case _ => true
      }
    }

  property("n-D: inputs are masked to their low bits") =
    forAll(dimsBits, Gen.listOfN(4, Gen.choose(0L, Long.MaxValue / 2))) {
      case ((dims, bits), raw) =>
        val m = (1L << bits) - 1
        val xs = raw.take(dims).padTo(dims, 7L).toArray
        HilbertCurveN.index(xs, bits) ==
          HilbertCurveN.index(xs.map(_ & m), bits)
    }
}
