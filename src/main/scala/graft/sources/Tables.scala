package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver's synthetic testdata (TESTDATA.md).
  * Pure `spark.read.parquet` — column pruning and predicate pushdown reach
  * the scan untouched (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet has shipped `ts` in several physical layouts across
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark only reads
    * as a raw long via the legacy conf) and TIMESTAMP(MICROS) — the latter
    * with `isAdjustedToUTC` either set (→ TimestampType) or unset, as
    * pyarrow writes it (→ TimestampNTZType). Dispatch on the OBSERVED
    * schema rather than assuming a layout, and normalize every arm to
    * session-TZ TimestampType so downstream `unix_micros`/window logic
    * sees ONE type:
    *   - LongType → nanos-as-long: convert nanos → micros with exact
    *     integer division (`div`, not `/` — long nanos exceed 2^53 so
    *     double division would lose precision), matching DuckDB's
    *     truncate-to-micros read of the same file;
    *   - TimestampNTZType → cast to TimestampType. The session TZ is
    *     pinned to UTC (GraftSession), so the cast preserves both the
    *     wall-clock fields and the epoch micros — bit-identical to what
    *     DuckDB computes from its naive read of the same file;
    *   - TimestampType → pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        // fail HERE, not three operators downstream: a fifth layout
        // (the round-8 lesson) must name itself at the source
        throw new IllegalStateException(
          s"events.parquet ts has unhandled type $other — teach " +
            "Tables.events this layout (see TablesEventsLayoutSpec)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Canonical schemas for the two corpus tables, for schema-enforced
    * reads of external (non-parquet) copies of them.
    */
  val documentsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
  val embeddingsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")

  /** JSONL reader (one JSON object per line) with an EXPLICIT schema —
    * the ingest format training corpora actually arrive in. Two
    * deliberate choices for the 100 TB read:
    *   - explicit schema, never inference: inference is a full extra
    *     pass over the corpus, and an inferred type can drift per batch
    *     (a shard whose ids all fit int32 silently forks the types);
    *   - `multiLine` stays false (the default): line-delimited JSON
    *     splits on newlines, so the scan parallelizes across executors
    *     at any file size; a multiLine JSON file is unsplittable.
    * Malformed lines surface as nulls (PERMISSIVE) — pass
    * `mode=FAILFAST` via options for strict ingest.
    */
  def jsonl(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    s.read.options(options).schema(schema).json(path)

  /** Schema-enforced JSONL copy of the documents table. */
  def documentsJsonl(s: SparkSession, path: String): DataFrame =
    jsonl(s, path, documentsSchema)

  /** Schema-enforced JSONL copy of the embeddings table. */
  def embeddingsJsonl(s: SparkSession, path: String): DataFrame =
    jsonl(s, path, embeddingsSchema)

  /** ORC reader with an EXPLICIT schema (same ingest discipline as
    * [[jsonl]]: never infer on a corpus-sized read; a missing column
    * surfaces as nulls, a type conflict fails the scan rather than
    * silently widening). ORC scans support the same column pruning +
    * predicate pushdown as parquet (`.explain`: `PushedFilters`),
    * and stripes split across executors at any file size.
    */
  def orc(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).orc(path)

  /** Schema-enforced ORC copy of the documents table. */
  def documentsOrc(s: SparkSession, path: String): DataFrame =
    orc(s, path, documentsSchema)

  /** Schema-enforced ORC copy of the embeddings table. */
  def embeddingsOrc(s: SparkSession, path: String): DataFrame =
    orc(s, path, embeddingsSchema)
}
