package graft.operators

import org.apache.spark.sql.functions.{col, encode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val payloads = spark.createDataFrame(Seq(
    (0L, "PNGfake-image-bytes-000"),
    (1L, "RIFFfake-audio-bytes-11"),
    (2L, "x")))
    .toDF("doc_id", "text")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("column path and mapPartitions stub decode agree row-for-row") {
    val meta = Multimodal.extractMeta(payloads).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val decoded = Multimodal.decodePartitions(spark, payloads)
      .collect().sortBy(_.doc_id)
      .map(m => (m.doc_id, m.n_bytes, m.magic, m.width, m.height, m.channels))
      .toSeq
    assert(meta === decoded)
  }

  test("frameSample cuts payloads into indexed fixed-size frames") {
    val frames = Multimodal.frameSample(payloads, frameBytes = 8)
      .orderBy("doc_id", "frame_idx").collect()
    // doc 0: 23 bytes → 3 frames of 8/8/7; doc 2: 1 byte → 1 frame
    val d0 = frames.filter(_.getLong(0) == 0L)
    assert(d0.map(_.getLong(2)).toSeq === Seq(8L, 8L, 7L))
    assert(d0.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    assert(frames.count(_.getLong(0) == 2L) === 1)
    assert(frames.forall(_.getString(3).length == 32)) // md5 per frame
  }

  test("resizeMeta preserves aspect ratio into the 64-box") {
    val rows = Multimodal.resizeMeta(payloads).collect()
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.max(ow, oh) === 64L)
      assert(ow === math.floor(w * 64.0 / math.max(w, h)).toLong)
      assert(oh === math.floor(h * 64.0 / math.max(w, h)).toLong)
    }
  }

  test("metadata fields are sane: magic sniff, hash-derived dims in range") {
    val rows = Multimodal.extractMeta(payloads).orderBy("doc_id").collect()
    assert(rows(0).getString(2) === "504E4766") // "PNGf"
    assert(rows(0).getLong(1) === 23L)
    assert(rows.forall { r =>
      val (w, h) = (r.getLong(3), r.getLong(4))
      w >= 64 && w < 512 && h >= 64 && h < 512
    })
  }
}
