package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** Randomized contracts for the temporal joins: tiny key/timestamp
  * domains force tied timestamps, empty key groups, null keys, and
  * bucket-straddling intervals — the shapes the example specs can't
  * enumerate. References are brute-force driver-side scans.
  */
object TemporalJoinsProps extends Properties("temporal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // keys 0..3 with occasional nulls; seconds 0..30 so ties are common
  private val genKey: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.chooseNum(0L, 3L).map(Some(_)), 1 -> Gen.const(None))
  private val genSec: Gen[Long] = Gen.chooseNum(0L, 30L)

  private val genLeft: Gen[List[(Option[Long], Long)]] =
    Gen.nonEmptyListOf(Gen.zip(genKey, genSec))
  private val genRight: Gen[List[(Option[Long], Long, Double)]] =
    Gen.listOf(Gen.zip(genKey, genSec, Gen.chooseNum(1, 99).map(_.toDouble)))

  property("asOfJoin equals the brute-force latest-at-or-before scan") =
    forAll(genLeft, genRight) { (ls, rsRaw) =>
      import spark.implicits._
      // contract: (key, rt) unique on the right — canonical max-value winner
      val rs = rsRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toList
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("id", "k", "t")
      val right = rs.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rt", "v")
      val got = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
        .orderBy("id").collect()
        .map(r => (r.getLong(r.fieldIndex("id")),
          Option(r.get(r.fieldIndex("rt"))).map(_.asInstanceOf[Timestamp].getTime),
          Option(r.get(r.fieldIndex("v"))).map(_.asInstanceOf[Double])))
        .toSeq
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        // SQL null semantics: a null key matches nothing
        val m = k.flatMap(key => rs.filter(r => r._1.contains(key) && r._2 <= t)
          .sortBy(_._2).lastOption)
        (i.toLong, m.map(_._2 * 1000L), m.map(_._3))
      }
      got == expected
    }

  property("asOfJoin emits every left row exactly once (left-join shape)") =
    forAll(genLeft, genRight) { (ls, rsRaw) =>
      import spark.implicits._
      val rs = rsRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toList
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("id", "k", "t")
      val right = rs.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rt", "v")
      val ids = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      ids == ls.indices.map(_.toLong)
    }

  private val genPoints: Gen[List[(Option[Long], Long)]] =
    Gen.nonEmptyListOf(Gen.zip(genKey, genSec))
  private val genIntervals: Gen[List[(Option[Long], Long, Long)]] =
    Gen.listOf(for {
      k <- genKey
      s <- genSec
      d <- Gen.chooseNum(-2L, 12L) // includes empty (d <= 0) intervals
    } yield (k, s, s + d))

  property("rangeJoin equals brute-force containment at any bucket width") =
    forAll(genPoints, genIntervals, Gen.oneOf(1L, 7L, 3600L)) { (ps, ivs, bucket) =>
      import spark.implicits._
      val points = ps.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("pid", "k", "t")
      val intervals = ivs.zipWithIndex
        .map { case ((k, s, e), i) => (i.toLong, k, ts(s), ts(e)) }
        .toDF("iid", "k", "s", "e")
      val got = TemporalJoins
        .rangeJoin(points, intervals, Seq("k"), "t", "s", "e", bucket)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expected = (for {
        ((pk, t), pi) <- ps.zipWithIndex
        ((ik, s, e), ii) <- ivs.zipWithIndex
        if pk.nonEmpty && pk == ik && s <= t && t < e
      } yield (pi.toLong, ii.toLong)).sorted
      got == expected
    }
}
