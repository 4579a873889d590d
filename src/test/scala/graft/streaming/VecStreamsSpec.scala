package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Similarity

class VecStreamsSpec extends AnyFunSuite with SparkSpec {

  private lazy val ss = graft.SharedSpark.spark

  private lazy val index = Similarity.buildIndex(
    spark.createDataFrame(Seq(
      (100L, Seq(1f, 0f, 0f, 0f), 0),
      (101L, Seq(0.9f, 0.1f, 0f, 0f), 0),
      (102L, Seq(0f, 0f, 1f, 0f), 1)))
      .toDF("vec_id", "embedding", "label"))

  test("stream-static ANN screen emits watermark-finalized top-k matches") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val query = VecStreams.annScreen(
      mem.toDF().toDF("vec_id", "embedding", "ts"), index, k = 2)
      .writeStream.format("memory").queryName("ann_screen")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = Timestamp.valueOf("2023-01-01 10:30:00")
      mem.addData((1L, Seq(1f, 0f, 0f, 0f), t0))
      query.processAllAvailable()
      assert(spark.table("ann_screen").count() === 0) // window still open
      // 3h later: watermark passes the 10:00 window
      mem.addData((2L, Seq(0f, 1f, 0f, 0f),
        Timestamp.valueOf("2023-01-01 13:30:00")))
      query.processAllAvailable()
      mem.addData((3L, Seq(0f, 0f, 0f, 1f),
        Timestamp.valueOf("2023-01-01 16:30:00")))
      query.processAllAvailable()
      val rows = spark.table("ann_screen")
        .filter("vec_id = 1").collect()
      assert(rows.length === 1)
      val matches = rows.head.getSeq[org.apache.spark.sql.Row](2)
        .map(r => (r.getString(1), r.getDouble(0)))
      // query [1,0,0,0]: exact hit on 100, near hit on 101
      assert(matches.map(_._1) === Seq("100", "101"))
      assert(matches.head._2 === 1.0)
    } finally query.stop()
  }

  test("kNN-classify screen: streamed arrivals take their cluster's " +
    "label under the batch propagation tie rule") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    // labeled corpus: cluster 7 around e0 (3 members), cluster 3
    // around e1 (2 members) — at k=3 an arrival near e0 votes (7,3)
    // and one near e1 votes (3,2): its third neighbor is a stray
    // cluster-7 vector at cos ~0, outvoted 2:1 (k must not exceed
    // the smallest relevant cluster by much, the standard kNN-vote
    // caveat — at k=5 the 3-member cluster would outvote everywhere)
    val labeled = Similarity.buildIndexKeeping(
      spark.createDataFrame(Seq(
        (100L, Seq(1f, 0f, 0f, 0f), 7),
        (101L, Seq(0.99f, 0.01f, 0f, 0f), 7),
        (102L, Seq(0.98f, 0.02f, 0f, 0f), 7),
        (200L, Seq(0f, 1f, 0f, 0f), 3),
        (201L, Seq(0f, 0.99f, 0.01f, 0f), 3)))
        .toDF("vec_id", "embedding", "label"), 2, "label")
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val query = VecStreams.knnClassifyScreen(
      mem.toDF().toDF("vec_id", "embedding", "ts"), labeled,
      k = 3, bits = 2)
      .writeStream.format("memory").queryName("knn_classify")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, Seq(1f, 0.01f, 0f, 0f),
        Timestamp.valueOf("2023-01-01 10:30:00")))
      mem.addData((2L, Seq(0f, 1f, 0.01f, 0f),
        Timestamp.valueOf("2023-01-01 10:40:00")))
      query.processAllAvailable()
      mem.addData((9L, Seq(0f, 0f, 0f, 1f),
        Timestamp.valueOf("2023-01-01 16:30:00"))) // advance watermark
      query.processAllAvailable()
      val rows = spark.table("knn_classify")
        .collect().map(r => r.getLong(1) ->
          (r.getLong(2), r.getLong(3))).toMap
      // at bits=2 with Hamming-1 probes all corpus vectors are
      // reachable from any bucket; top-3 vote per the comment above
      assert(rows(1L) === ((7L, 3L)), s"got ${rows.get(1L)}")
      assert(rows(2L) === ((3L, 2L)), s"got ${rows.get(2L)}")
    } finally query.stop()
  }

  test("kNN-classify batch twin: vote equals a hand-computed " +
    "row_number + majority chain, ties to the smaller label") {
    import ss.implicits._
    // two labels with EQUAL votes and equal support at k=2: the
    // arrival is equidistant from one member of each cluster — the
    // tie must break to the smaller label
    val labeled = Similarity.buildIndexKeeping(
      spark.createDataFrame(Seq(
        (100L, Seq(1f, 0f, 0f, 0f), 9),
        (200L, Seq(0f, 1f, 0f, 0f), 4)))
        .toDF("vec_id", "embedding", "label"), 1, "label")
    val arrivals = spark.createDataFrame(Seq(
      (1L, Seq(1f, 1f, 0f, 0f),
        Timestamp.valueOf("2023-01-01 10:30:00"))))
      .toDF("vec_id", "embedding", "ts")
    val got = VecStreams.knnClassifyScreen(arrivals, labeled,
      k = 2, bits = 1).collect()
    assert(got.length === 1)
    val r = got.head
    // cos = 1/√2 to both; (votes 1, support equal) → label 4 wins
    assert(r.getLong(2) === 4L && r.getLong(3) === 1L,
      s"got ${r.mkString(",")}")
  }

  test("filtered screen: the label is a join key — same-bucket cross-label never matches") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    // 100 and 101 share the arrival's bucket (same direction), but
    // 101 carries label 1 — the label key must exclude it where the
    // unfiltered annScreen would rank it second
    val idx = Similarity.buildIndexKeeping(
      spark.createDataFrame(Seq(
        (100L, Seq(1f, 0f, 0f, 0f), 0),
        (101L, Seq(0.9f, 0.1f, 0f, 0f), 1),
        (102L, Seq(0f, 0f, 1f, 0f), 0)))
        .toDF("vec_id", "embedding", "label"), 4, "label")
    val mem = MemoryStream[(Long, Seq[Float], Int, Timestamp)]
    val query = VecStreams.filteredScreen(
      mem.toDF().toDF("vec_id", "embedding", "label", "ts"), idx, k = 2)
      .writeStream.format("memory").queryName("filtered_screen")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, Seq(1f, 0f, 0f, 0f), 0,
        Timestamp.valueOf("2023-01-01 10:30:00")))
      query.processAllAvailable()
      mem.addData((2L, Seq(0f, 1f, 0f, 0f), 0,
        Timestamp.valueOf("2023-01-01 14:30:00"))) // advance watermark
      query.processAllAvailable()
      mem.addData((3L, Seq(0f, 0f, 0f, 1f), 0,
        Timestamp.valueOf("2023-01-01 18:30:00")))
      query.processAllAvailable()
      val rows = spark.table("filtered_screen").filter("vec_id = 1").collect()
      assert(rows.length === 1)
      val matches = rows.head.getSeq[org.apache.spark.sql.Row](3)
        .map(r => r.getString(1).toLong)
      assert(matches === Seq(100L)) // 101 bucket-matched, label-excluded
    } finally query.stop()
  }

  test("SQ8 screen scores bucket-mates in compressed domain, exact integers") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    val sqIdx = Similarity.sqIndex(
      spark.createDataFrame(Seq(
        (100L, Seq(1f, 0f, 0f, 0f), 0),
        (101L, Seq(0.9f, 0.1f, 0f, 0f), 0),
        (102L, Seq(0f, 0f, 1f, 0f), 1)))
        .toDF("vec_id", "embedding", "label"))
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val query = VecStreams.sqScreen(
      mem.toDF().toDF("vec_id", "embedding", "ts"), sqIdx, k = 2)
      .writeStream.format("memory").queryName("sq_screen")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, Seq(1f, 0f, 0f, 0f),
        Timestamp.valueOf("2023-01-01 10:30:00")))
      query.processAllAvailable()
      mem.addData((2L, Seq(0f, 1f, 0f, 0f),
        Timestamp.valueOf("2023-01-01 13:30:00"))) // advance watermark
      query.processAllAvailable()
      mem.addData((3L, Seq(0f, 0f, 0f, 1f),
        Timestamp.valueOf("2023-01-01 16:30:00")))
      query.processAllAvailable()
      val rows = spark.table("sq_screen").filter("vec_id = 1").collect()
      assert(rows.length === 1)
      val matches = rows.head.getSeq[org.apache.spark.sql.Row](2)
        .map(r => (r.getString(1).toLong, r.getDouble(0).toLong))
      // q̂=(127,0,0,0): 100 → 127²·10⁶ exactly; 101 → (q̂·ĉ)·s_c =
      // 127·127·9·10⁵ (ĉ=(127,14,0,0), only dim 0 overlaps)
      assert(matches === Seq(
        (100L, 16129000000L), (101L, 14516100000L)))
    } finally query.stop()
  }

  test("IVF screen routes per-row like the batch assignment and matches") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    // 8+ vectors so the default seed (vec_id < 8) trains: two tight
    // groups on orthogonal axes
    val corpus = spark.createDataFrame((0L until 10L).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f) else Seq(0f, 1f, 0f, 0f)
      (i, base.map(x => x + (i.toFloat / 100f) * x), i.toInt % 2)
    }).toDF("vec_id", "embedding", "label")
    val cents = Similarity.trainIvfCentroids(corpus)
    val cells = Similarity.ivfCellsWith(corpus, cents)

    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val query = VecStreams.ivfScreen(
      mem.toDF().toDF("vec_id", "embedding", "ts"), cells, cents, k = 2)
      .writeStream.format("memory").queryName("ivf_screen")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1000L, Seq(0.95f, 0.05f, 0f, 0f),
        Timestamp.valueOf("2023-01-01 10:30:00")))
      query.processAllAvailable()
      mem.addData((1001L, Seq(0f, 0f, 1f, 0f),
        Timestamp.valueOf("2023-01-01 14:30:00"))) // advance watermark
      query.processAllAvailable()
      mem.addData((1002L, Seq(0f, 0f, 0f, 1f),
        Timestamp.valueOf("2023-01-01 18:30:00")))
      query.processAllAvailable()
      val rows = spark.table("ivf_screen").filter("vec_id = 1000").collect()
      assert(rows.length === 1)
      val matches = rows.head.getSeq[org.apache.spark.sql.Row](2)
        .map(r => r.getString(1))
      // nprobe=2 reaches BOTH cells; best matches are the x-axis
      // vectors nearest [0.95, 0.05]: the top-2 must be x-axis ids
      assert(matches.length === 2)
      assert(matches.forall(m => m.toLong % 2 == 0))
    } finally query.stop()
  }

  test("two-level screen routes coarse-then-fine and equals the batch ranker") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    // 24 vectors in 4 orthogonal directions (6 each) with small jitter
    val corpus = spark.createDataFrame((0 until 24).map { i =>
      val base = Array.fill(8)(0.02f * ((i * 7 % 5) - 2))
      base(i % 4) = 1f
      (i.toLong, base.toSeq, i % 4)
    }).toDF("vec_id", "embedding", "label")
    val (l1, l2) = Similarity.trainIvfTwoLevel(corpus, nL1 = 2, nL2 = 2)
    val cells2 = Similarity.ivf2Cells(corpus, l1, l2, 2)

    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val query = VecStreams.ivf2Screen(
      mem.toDF().toDF("vec_id", "embedding", "ts"), cells2, l1, l2,
      nL2 = 2, k = 3, nprobe1 = 2, nprobe2 = 4)
      .writeStream.format("memory").queryName("ivf2_screen")
      .outputMode(OutputMode.Append).start()
    try {
      val probe = {
        val a = Array.fill(8)(0f); a(1) = 1f; a(5) = 0.01f; a.toSeq
      }
      mem.addData((1000L, probe,
        Timestamp.valueOf("2023-01-01 10:30:00")))
      query.processAllAvailable()
      mem.addData((1001L, Seq.fill(8)(0.1f),
        Timestamp.valueOf("2023-01-01 14:30:00"))) // advance watermark
      query.processAllAvailable()
      mem.addData((1002L, Seq.fill(8)(0.2f),
        Timestamp.valueOf("2023-01-01 18:30:00")))
      query.processAllAvailable()
      val rows = spark.table("ivf2_screen").filter("vec_id = 1000").collect()
      assert(rows.length === 1)
      val got = rows.head.getSeq[org.apache.spark.sql.Row](2)
        .map(r => (r.getString(1), r.getDouble(0)))
      // the stream screen's matches equal an INDEPENDENT plain-Scala
      // re-derivation of the hierarchical routing + exact ranking on
      // the same probe (route nprobe1=2 coarse, nprobe2=4 fine among
      // those cells, exact rounded cosine over the matching ivf2Cells
      // lists, top-3 by sim desc then cand asc)
      val batch = {
        def cos(a: Seq[Float], b: Seq[Double]): Double = {
          val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x).sum)
          val nb = math.sqrt(b.map(y => y * y).sum)
          math.rint(dot / (na * nb) * 1e6) / 1e6
        }
        val l1Ranked = l1.zipWithIndex
          .map { case (c, i) => (i, cos(probe, c.map(_.toDouble))) }
          .sortBy { case (i, s) => (-s, i) }.take(2).map(_._1)
        val fineRanked = l2.zipWithIndex
          .filter { case (_, i) => l1Ranked.contains(i / 2) }
          .map { case (c, i) => (i, cos(probe, c.map(_.toDouble))) }
          .sortBy { case (i, s) => (-s, i) }.take(4).map(_._1).toSet
        val corpusCells = cells2.collect()
          .map(r => r.getLong(1) -> r.getLong(0)).toMap
        corpus.collect().map { r =>
          (r.getLong(0), r.getSeq[Float](1))
        }.filter { case (id, _) => fineRanked.contains(corpusCells(id).toInt) }
          .map { case (id, e) => (id.toString, cos(probe, e.map(_.toDouble))) }
          .sortBy { case (id, s) => (-s, id) }.take(3).toSeq
      }
      assert(got === batch)
    } finally query.stop()
  }

  test("PQ screen: compressed-domain stream equals the batch IVF-PQ ranker") {
    import ss.implicits._
    implicit val sq = ss.sqlContext
    def emb(i: Long) = Seq.tabulate(Similarity.MaxDim)(j =>
      ((i * 13 + j * 5) % 9 - 4).toFloat / 4f)
    val corpus = spark.createDataFrame((0L until 24L).map(i => (i, emb(i))))
      .toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(corpus)
    val cents = Similarity.trainIvfCentroids(corpus, nCells = 3)
    // batch truth: vector 0 as the query, itself excluded
    val batch = Similarity.ivfPqTopKWith(corpus, model, cents,
      nQueries = 1, k = 2, nprobe = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // stream: the SAME embedding arrives under a fresh id against the
    // lists of everything but vector 0 — identical candidate set
    val lists = Similarity.ivfPqLists(
      corpus.filter("vec_id <> 0"), model, cents)
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val query = VecStreams.pqScreen(
      mem.toDF().toDF("vec_id", "embedding", "ts"), lists, cents, model,
      k = 2)
      .writeStream.format("memory").queryName("pq_screen")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1000L, emb(0L), Timestamp.valueOf("2023-01-01 10:30:00")))
      query.processAllAvailable()
      mem.addData((1001L, emb(1L), Timestamp.valueOf("2023-01-01 14:30:00")))
      query.processAllAvailable()
      val rows = spark.table("pq_screen").filter("vec_id = 1000").collect()
      assert(rows.length === 1)
      val matches = rows.head.getSeq[org.apache.spark.sql.Row](2)
        .map(r => (r.getString(1).toLong, (-r.getDouble(0)).toLong))
      assert(matches === batch)
    } finally query.stop()
  }
}
