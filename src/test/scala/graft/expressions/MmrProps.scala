package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws of the greedy MMR walk (pure runtime, no Spark needed):
  * distinct bounded picks, first-pick relevance argmax with the id
  * tie-break, k ≥ n selects everything, and — the property the
  * operator's correctness rests on, because collect_list order is
  * nondeterministic — input-order independence.
  */
object MmrProps extends Properties("mmr") {

  private case class Cand(id: Long, rel: Long, vec: Array[Double])

  private val candsGen: Gen[List[Cand]] = for {
    n <- Gen.choose(1, 12)
    dim <- Gen.choose(1, 4)
    cs <- Gen.listOfN(n, for {
      rel <- Gen.choose(-1000000L, 1000000L)
      vec <- Gen.listOfN(dim, Gen.choose(-5, 5).map(_.toDouble))
    } yield (rel, vec.toArray))
  } yield cs.zipWithIndex.map { case ((rel, vec), i) =>
    Cand(i.toLong * 3 + 1, rel, vec)
  }

  private def arr(cs: Seq[Cand]): ArrayData =
    new GenericArrayData(cs.map(c => InternalRow(c.id, c.rel,
      new GenericArrayData(c.vec.map(x => x: Any)))).toArray[Any])

  private def picks(cs: Seq[Cand], k: Int): Seq[(Long, Long)] = {
    val out = MmrRuntime.select(arr(cs), k)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
  }

  property("picks are distinct candidate ids, exactly min(k, n) of them") =
    forAll(candsGen, Gen.choose(1, 15)) { (cs, k) =>
      val p = picks(cs, k)
      p.map(_._1).distinct.length == p.length &&
        p.length == math.min(k, cs.length) &&
        p.map(_._1).forall(id => cs.exists(_.id == id))
    }

  property("pick 1 is the relevance argmax, ties to the lower id") =
    forAll(candsGen) { cs =>
      val best = cs.map(_.rel).max
      val want = cs.filter(_.rel == best).map(_.id).min
      val (id, mmr) = picks(cs, 1).head
      id == want && mmr == best
    }

  property("input order never changes the selection") =
    forAll(candsGen, Gen.choose(1, 6), Gen.choose(0L, Long.MaxValue)) {
      (cs, k, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(cs)
        picks(cs, k) == picks(shuffled, k)
    }

  property("k >= n selects every candidate exactly once") =
    forAll(candsGen) { cs =>
      picks(cs, cs.length + 3).map(_._1).sorted == cs.map(_.id).sorted
    }

  property("objectives never increase from pick 2 onward") =
    forAll(candsGen, Gen.choose(3, 6)) { (cs, k) =>
      // from pick 2 on, every candidate's obj = rel - maxSim only
      // shrinks as the picked set grows, so the greedy max is
      // non-increasing. (Pick 1's objective is pure relevance — a
      // NEGATIVE best-sim can push pick 2's objective above it, so
      // the law starts at the second pick.)
      val objs = picks(cs, k).map(_._2).drop(1)
      objs.zip(objs.drop(1)).forall { case (a, b) => b <= a }
    }
}
