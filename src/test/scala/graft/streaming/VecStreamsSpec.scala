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
}
