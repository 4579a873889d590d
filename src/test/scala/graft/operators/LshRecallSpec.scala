package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Recall gate for the LSH redesign: on the sf0.1 embeddings the
  * corpus-sized random-hyperplane multi-probe config must recover at
  * least as much of the exact top-k as the config it replaced (fixed
  * 16 axis-aligned sign buckets, no probes) — while scoring a bounded
  * fraction of the corpus per query.
  */
class LshRecallSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"

  test("multi-probe random-hyperplane recall >= old axis-aligned 16-bucket recall (sf0.1)") {
    assume(new java.io.File(sfDir).isDirectory)
    val embs = graft.sources.Tables.embeddings(spark, sfDir).cache()
    val nQ = 50
    val k = 10

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(Similarity.bruteForceTopK(embs, nQ, k))
    val fresh = pairs(Similarity.lshTopK(embs, nQ, k)) // auto bits + probes

    // The replaced design, replicated verbatim: bucket = sign of the
    // first 4 coordinates, candidates share the bucket, no probes.
    val oldBucket = (0 until 4).map { i =>
      when(element_at(col("embedding"), i + 1) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = embs.withColumn("bucket", oldBucket)
      .withColumn("norm", sqrt(Similarity.dot(col("embedding"), col("embedding"))))
    val q = bucketed.filter(col("vec_id") < nQ)
      .select(col("bucket"), col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val c = bucketed.select(col("bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    val legacy = pairs(q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("q_emb"), col("c_emb")) /
          (col("q_norm") * col("c_norm")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id"))

    val recallFresh = (fresh intersect exact).size.toDouble / exact.size
    val recallLegacy = (legacy intersect exact).size.toDouble / exact.size
    info(f"recall@$k fresh=$recallFresh%.3f legacy=$recallLegacy%.3f")
    assert(recallFresh >= recallLegacy)

    // and the candidate work stays bounded: with corpus-sized bits the
    // probe set covers (bits+1)/2^bits of the buckets, well under half
    val bits = Similarity.chooseBits(embs.count())
    assert((bits + 1).toDouble / (1L << bits) < 0.5)
    embs.unpersist()
  }

  test("trained-IVF recall is measured vs brute force and grows with nprobe (sf0.1)") {
    assume(new java.io.File(sfDir).isDirectory)
    val embs = graft.sources.Tables.embeddings(spark, sfDir).cache()
    val nQ = 50
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(embs, nQ, k))
    val probe1 = pairs(Similarity.ivfTopK(embs, nQ, k, nprobe = 1))
    val probe2 = pairs(Similarity.ivfTopK(embs, nQ, k, nprobe = 2))
    val r1 = (probe1 intersect exact).size.toDouble / exact.size
    val r2 = (probe2 intersect exact).size.toDouble / exact.size
    info(f"IVF recall@$k nprobe=1: $r1%.3f  nprobe=2: $r2%.3f")
    // more probed cells → candidate superset → recall is monotone
    assert(r2 >= r1)
    assert(r2 > 0.0)
    embs.unpersist()
  }

  test("PQ/IVF-PQ recall vs exact L2: quantization and routing losses bounded (sf0.1)") {
    assume(new java.io.File(sfDir).isDirectory)
    val embs = graft.sources.Tables.embeddings(spark, sfDir).cache()
    val nQ = 50
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth in the ADC metric (integer squared L2 on the
    // scaled image — the space PQ actually approximates; cosine truth
    // would conflate metric mismatch with quantization loss)
    val v = embs.select(col("vec_id"), Similarity.pqVd(col("embedding")).as("vd"))
    val q = v.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("vd").as("qd"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d2"), col("neighbor_id"))
    val exact = pairs(broadcast(q)
      .join(v.select(col("vec_id").as("neighbor_id"), col("vd")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("qd"), col("vd"),
          (a, b) => (a - b) * (a - b)), lit(0d), _ + _).as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id"))
    // the oracle-gated geometry (4 subspaces x 8 centroids = 12
    // bits/vector) is deliberately tiny so DuckDB can replay training
    // — its recall is expectedly poor; the OPERATOR law under test is
    // that recall grows with codebook capacity and that IVF routing
    // loses boundedly more on top of quantization
    val toy = Similarity.pqTrain(embs)
    val fine = Similarity.pqTrain(embs, m = 8, ksub = 16) // 32 bits/vec
    val cents = Similarity.trainIvfCentroids(embs)
    val rToy = {
      val p = pairs(Similarity.pqTopK(embs, toy, nQ, k))
      (p intersect exact).size.toDouble / exact.size
    }
    val rFine = {
      val p = pairs(Similarity.pqTopK(embs, fine, nQ, k))
      (p intersect exact).size.toDouble / exact.size
    }
    val r1 = {
      val p = pairs(Similarity.ivfPqTopKWith(embs, fine, cents,
        nQ, k, nprobe = 1))
      (p intersect exact).size.toDouble / exact.size
    }
    val r2 = {
      val p = pairs(Similarity.ivfPqTopKWith(embs, fine, cents,
        nQ, k, nprobe = 2))
      (p intersect exact).size.toDouble / exact.size
    }
    info(f"recall@$k flat 4x8=$rToy%.3f flat 8x16=$rFine%.3f " +
      f"ivfpq 8x16 nprobe=1: $r1%.3f nprobe=2: $r2%.3f")
    // capacity law: 32 bits/vector must beat 12 bits/vector
    assert(rFine > rToy,
      f"finer codebook did not raise recall: $rFine%.3f <= $rToy%.3f")
    // routing grows monotonically toward the flat scan with nprobe
    assert(r2 >= r1)
    // at nprobe=2 (a quarter of the cells) routing must not give up
    // more than half the flat scan's recall — the compounded-loss
    // bound the flat/routed pair is designed around
    assert(r2 >= rFine / 2, f"routing loss too steep: $r2%.3f vs $rFine%.3f")
    embs.unpersist()
  }

  test("IVF seeding survives adversarial id ordering (clustered appends)") {
    // 8 well-separated clusters × 32 vectors, vec_id SORTED by
    // cluster — the ordering that degenerates id-prefix seeding (all
    // 8 seeds drawn from cluster 0). The md5 rank is order-free: its
    // 8 picks must span many true clusters, and the trained index
    // must still recall well.
    val s = spark; import s.implicits._
    val d = 16
    val rows = (0 until 256).map { id =>
      val cl = id / 32 // ids 0..31 are cluster 0, 32..63 cluster 1, …
      val v = Array.tabulate(d) { j =>
        val base = if (j == cl * 2) 10f else 0f // axis-anchored cluster
        // deterministic jitter, small vs the 10.0 anchor
        base + ((id * 31 + j * 7) % 11 - 5) * 0.05f
      }
      (id.toLong, v)
    }
    val embs = rows.toDF("vec_id", "embedding").cache()
    val seedIds = Similarity.seedOrdered(embs).limit(8)
      .collect().map(_.getLong(0)).toSeq
    val seedClusters = seedIds.map(_ / 32).distinct
    info(s"seed ids: $seedIds -> clusters $seedClusters")
    // id-prefix seeding would give exactly 1 distinct cluster here
    assert(seedClusters.size >= 4,
      s"md5 seeding collapsed to clusters $seedClusters")
    val exact = Similarity.bruteForceTopK(embs, 16, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embs, 16, 5, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    info(f"adversarial-order IVF recall@5: $recall%.3f")
    assert(recall >= 0.6, f"recall $recall%.3f under adversarial ordering")
    embs.unpersist()
  }
}
