package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions — the manual fallback
  * when AQE's runtime skew-join split (on by default in Spark 3.2+)
  * isn't available or the skew is known up front (e.g. a "null-ish"
  * mega-key like the reference dataset's Unknown/NA zones, or a
  * power-law user_id).
  *
  * Shape: the skewed (fact) side gets a deterministic per-row salt in
  * [0, n); the dim side is replicated n× with every salt value; the
  * join key becomes (key, salt). The hot key's rows now spread over n
  * shuffle partitions instead of one straggler.
  *
  * Cost model: dim side inflates n× — appropriate when |dim| ≪ |fact|
  * (if the dim were broadcast-able you wouldn't salt at all; this is
  * for mid-size dims that must shuffle).
  */
object SkewJoin {

  /** Deterministic row salt: xxhash64 over the fact row's key plus a
    * uniquifier column (or all columns), mod n. Deterministic under
    * task retries, unlike `rand()`.
    */
  def salt(cols: Seq[Column], n: Int): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong))

  /** fact ⋈ dim on `key` with `n`-way salting. `uniquifier` should be
    * a column that varies within a key group (defaults to all fact
    * columns via xxhash64) so the hot key actually spreads.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt",
      salt(fact.columns.map(fact(_)).toSeq, n))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
