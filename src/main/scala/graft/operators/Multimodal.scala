package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them (BASELINE.json
  * extension; the reference is text/CSV-only). The Spark-side shape —
  * schema, batch iteration, partition-local decode — is real; the codec
  * itself is a clearly-marked deterministic stub because no image/audio
  * libraries ship in this container.
  *
  * Scale design: payload bytes never shuffle — every transform below is
  * a narrow map over scan partitions. Metadata (magic, sizes, fake dims)
  * is extracted to plain columns so downstream filters/joins/aggregations
  * touch only those and Parquet never has to materialize the blobs
  * (column pruning drops `payload` unless explicitly selected).
  */
object Multimodal {

  /** Decoded-asset metadata produced by the (stubbed) codec. */
  final case class AssetMeta(
      doc_id: Long,
      n_bytes: Long,
      magic: String,
      width: Long,
      height: Long,
      channels: Long)

  /** Column-only metadata extraction (codegen'd, DuckDB-verifiable):
    * byte length, leading-bytes "magic" signature, and deterministic
    * pseudo-dimensions derived from the content hash — the stand-in for
    * a real header parse.
    */
  def extractMeta(withPayload: DataFrame): DataFrame = {
    val h = md5(col("payload"))
    withPayload.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      (conv(substring(h, 1, 6), 16, 10).cast("long") % 448 + 64).as("width"),
      (conv(substring(h, 7, 6), 16, 10).cast("long") % 448 + 64).as("height"),
      lit(3L).as("channels"))
  }

  /** Partition-local batched "decode": the shape a real codec UDF takes
    * — iterate a partition, decode each payload, emit typed metadata.
    * The pixel decode is STUBBED (deterministic fake derived from the
    * payload bytes; a real deployment swaps `fakeDecode` for an actual
    * image/audio library call). `mapPartitions` keeps per-partition
    * library initialization (codec contexts, model handles) amortized —
    * the pattern `mapInPandas` serves in PySpark.
    */
  def decodePartitions(spark: SparkSession, withPayload: DataFrame): Dataset[AssetMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codec init would happen once per partition, here
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Frame sampling for "video" payloads: every payload is cut into
    * fixed-size frames (one row per frame) — the fan-out shape a real
    * frame extractor produces, with the decode stubbed to a byte slice.
    * Column-only (codegen'd, oracle-verifiable): frame index, length,
    * and content hash per frame. Partition-local and shuffle-free; at
    * scale the explode multiplies rows, not bytes moved (each frame
    * slice is bounded by `frameBytes`).
    */
  def frameSample(withPayload: DataFrame, frameBytes: Int = 256): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble))
      .cast("long")
    withPayload
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), nFrames - 1),
          i => col("payload").substr(
            (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_hash"))
  }

  /** Resize stub: recomputes target metadata for a bounding box while
    * preserving aspect ratio — the arithmetic a real resizer performs,
    * over [[extractMeta]]'s (stubbed) source dims. Integer math only.
    */
  def resizeMeta(withPayload: DataFrame, maxSide: Long = 64): DataFrame =
    extractMeta(withPayload)
      .withColumn("scale_num", lit(maxSide))
      .withColumn("scale_den", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * col("scale_num") / col("scale_den"))
          .cast("long").as("out_width"),
        floor(col("height") * col("scale_num") / col("scale_den"))
          .cast("long").as("out_height"))

  /** STUB codec: deterministic metadata from raw bytes (no real pixel
    * decode — the container has no imaging libraries). Mirrors
    * [[extractMeta]]'s arithmetic so the two paths cross-check in tests.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): AssetMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hx = md.digest(bytes).map("%02x".format(_)).mkString
    val magic = bytes.take(4).map("%02X".format(_)).mkString
    AssetMeta(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      magic = magic,
      width = java.lang.Long.parseLong(hx.substring(0, 6), 16) % 448 + 64,
      height = java.lang.Long.parseLong(hx.substring(6, 12), 16) % 448 + 64,
      channels = 3L)
  }
}
