package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Profile}
import graft.sources.Tables

/** Cross-operator integration over real testdata: the curation verdicts,
  * dataset splits, cluster labels, and profiling stats must agree with
  * each other — the consistency a pipeline owner relies on when the
  * stages run as one job.
  */
class PipelineIntegrationSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sfDir)

  test("curate + split + clusters + profile stay mutually consistent") {
    val n = docs.count()

    val curated = Curation.curate(docs).cache()
    assert(curated.count() === n) // verdict for every doc
    val kept = curated.filter("keep").count()
    val dups = curated.filter("reject_reason = 'dup'").count()
    val lowQ = curated.filter("reject_reason = 'low_quality'").count()
    assert(kept + dups + lowQ === n)

    // exact-dup survivors in curate == distinct text hashes
    val distinctTexts = Dedup.exact(docs).count()
    assert(n - dups === distinctTexts)

    val splits = Curation.split(docs)
    assert(splits.count() === n)
    val perSplit = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSplit.values.sum === n)
    assert(perSplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(perSplit("train") > perSplit.getOrElse("val", 0L))

    // clusters cover every doc; cluster count <= doc count
    val clusters = Dedup.clusters(docs, Dedup.minhashPairs(docs))
    assert(clusters.count() === n)
    assert(clusters.select("cluster_id").distinct().count() <= n)

    // profile sees the same row count on every column row
    val prof = Profile.profile(docs).collect()
    assert(prof.forall(_.getLong(1) == n))
    curated.unpersist()
  }

  test("approxProfile (HLL scale path) tracks the exact profile") {
    val exact = Profile.profile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.approxProfile(docs).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      // everything except the distinct count is the same aggregation
      assert(r.getLong(1) === e.getLong(1), "n_rows")
      assert(r.getLong(2) === e.getLong(2), "n_nonnull")
      assert(r.get(4) === e.get(4), "min_num")
      assert(r.get(5) === e.get(5), "max_num")
      // HLL++ at rsd=5%: allow a generous envelope so the test is
      // deterministic-but-not-brittle across sketch implementations
      val (nd, end) = (r.getLong(3).toDouble, e.getLong(3).toDouble)
      assert(math.abs(nd - end) <= math.max(5.0, 0.25 * end),
        s"${r.getString(0)}: approx $nd vs exact $end")
    }
  }
}
