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

  // ---- REAL codecs for uncompressed formats (pure JVM byte parsing,
  // no libraries needed): binary PPM (P6) images and PCM WAV audio.
  // Compressed formats (JPEG/PNG/MP3/H.264) remain environment-bound —
  // decoding those without a codec library is out of scope, and the
  // dispatch in [[decodeAuto]] names them honestly. ----

  /** Decoded PPM (P6) image: real header parse + pixel statistics. */
  final case class PpmMeta(
      doc_id: Long, width: Long, height: Long, maxval: Long,
      n_pixel_bytes: Long, mean_r: Long, mean_g: Long, mean_b: Long)

  /** Decoded PCM WAV audio: real RIFF chunk walk + sample statistics. */
  final case class WavMeta(
      doc_id: Long, sample_rate: Long, channels: Long, bits: Long,
      n_samples: Long, peak: Long, sum_abs: Long)

  /** Parse a binary-PPM (P6) payload: magic, whitespace/comment-aware
    * header ints (width, height, maxval), then interleaved RGB bytes.
    * Integer-exact outputs (sums + truncating mean) so an oracle that
    * KNOWS the payload construction can verify the decode in closed
    * form — the parser must read the dims and stride the pixel array
    * correctly or the channel means diverge.
    */
  def parsePpm(id: Long, bytes: Array[Byte]): PpmMeta = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"doc $id: not a P6 ppm")
    var pos = 2
    def skipWs(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val b = bytes(pos)
        if (b == ' ' || b == '\n' || b == '\t' || b == '\r') pos += 1
        else if (b == '#') { // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    pos += 1 // the single whitespace byte after maxval (PPM spec)
    val n = w.toLong * h
    require(n > 0, s"doc $id: empty ppm ($w x $h)")
    // P6 allows maxval up to 65535 with TWO bytes per sample — the
    // stride-3 walk below would silently read interleaved halves.
    // Reject rather than misparse; extend here if 16-bit PPMs appear.
    require(mx > 0 && mx <= 255,
      s"doc $id: maxval $mx needs 2-byte samples")
    require(bytes.length - pos >= n * 3,
      s"doc $id: truncated ppm — need ${n * 3} pixel bytes, " +
        s"have ${bytes.length - pos}")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = pos; var k = 0L
    while (k < n) {
      sr += bytes(i) & 255; sg += bytes(i + 1) & 255
      sb += bytes(i + 2) & 255
      i += 3; k += 1
    }
    PpmMeta(id, w, h, mx, bytes.length.toLong - pos,
      sr / n, sg / n, sb / n)
  }

  /** Parse a PCM WAV payload: RIFF/WAVE magic, then a real chunk walk
    * (fmt / data in any order, other chunks skipped by their declared
    * size) — 16-bit little-endian samples; `peak` = max |s|,
    * `sum_abs` = Σ |s| (integer-exact).
    */
  def parseWav(id: Long, bytes: Array[Byte]): WavMeta = {
    def u8(i: Int) = bytes(i) & 255
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int) = new String(bytes.slice(i, i + 4), "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", s"doc $id: not a wav")
    var pos = 12
    var rate = 0L; var ch = 0L; var bits = 0L
    var dataOff = -1; var dataLen = 0L
    while (pos + 8 <= bytes.length) {
      val t = tag(pos); val len = u32(pos + 4)
      // trust nothing declared: a corrupt length must fail loudly, not
      // loop (negative toInt) or walk past the buffer
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"doc $id: chunk '$t' declares $len bytes past the buffer")
      if (t == "fmt ") {
        require(u16(pos + 8) == 1, s"doc $id: not PCM")
        ch = u16(pos + 10).toLong
        rate = u32(pos + 12)
        bits = u16(pos + 22).toLong
      } else if (t == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    require(dataOff >= 0 && bits == 16, s"doc $id: no 16-bit data chunk")
    val n = dataLen / 2
    var peak = 0L; var sum = 0L
    var i = 0L
    while (i < n) {
      val u = u16(dataOff + 2 * i.toInt)
      val s = if (u >= 32768) u - 65536 else u
      val a = math.abs(s).toLong
      if (a > peak) peak = a
      sum += a
      i += 1
    }
    WavMeta(id, rate, ch, bits, n, peak, sum)
  }

  /** Partition-local REAL decode of P6 payloads (the
    * [[decodePartitions]] shape with an actual parser). */
  def decodePpm(spark: SparkSession, withPayload: DataFrame)
      : Dataset[PpmMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => parsePpm(id, b) })
  }

  /** Partition-local REAL decode of PCM WAV payloads. */
  def decodeWav(spark: SparkSession, withPayload: DataFrame)
      : Dataset[WavMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => parseWav(id, b) })
  }

  /** REAL nearest-neighbor resize of a P6 payload: source pixel
    * (sx, sy) = (x·w ÷ outW, y·h ÷ outH) (floor), emitted as a fresh
    * P6 payload. Pure integer index arithmetic over the decoded
    * buffer — deterministic bytes, so downstream content hashes are
    * stable.
    */
  def resizePpmBytes(bytes: Array[Byte], outW: Int, outH: Int)
      : Array[Byte] = {
    val meta = parsePpm(0L, bytes)
    val (w, h) = (meta.width.toInt, meta.height.toInt)
    val pixelOff = bytes.length - meta.n_pixel_bytes.toInt
    val header = s"P6\n$outW $outH\n${meta.maxval}\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + outW * outH * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sx = x * w / outW
        val src = pixelOff + (sy * w + sx) * 3
        val dst = header.length + (y * outW + x) * 3
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize every P6 payload, emitting (doc_id, out_w, out_h,
    * resized payload, content md5). */
  def resizePpm(spark: SparkSession, withPayload: DataFrame,
      outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        (id, resizePpmBytes(b, outW, outH)) })
      .toDF("doc_id", "payload")
      .select(col("doc_id"), lit(outW.toLong).as("out_width"),
        lit(outH.toLong).as("out_height"), col("payload"),
        md5(col("payload")).as("payload_md5"))
  }

  /** STUB codec: deterministic metadata from raw bytes (no real pixel
    * decode for COMPRESSED formats — the container has no imaging
    * libraries; uncompressed P6/WAV have the real parsers above).
    * Mirrors [[extractMeta]]'s arithmetic so the two paths cross-check
    * in tests.
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
