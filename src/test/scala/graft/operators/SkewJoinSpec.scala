package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of fact rows hammer key 1 — the classic hot-key shape
    val fact = spark.createDataFrame(
      (1 to 200).map(i => (if (i <= 180) 1 else i % 20, s"row$i")))
      .toDF("k", "payload")
    val dim = spark.createDataFrame((0 to 19).map(k => (k, s"dim$k")))
      .toDF("k", "attr")

    val plain = fact.join(dim, Seq("k")).orderBy("payload")
      .collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedJoin(fact, dim, "k", n = 8)
      .orderBy("payload").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("salting cuts the straggler partition on a power-law key distribution") {
    import org.apache.spark.sql.functions.col
    // Zipf-ish corpus shape: key r carries ~3000/r rows — key 1 is the
    // (en, web)-style mega-key that dominates an unsalted shuffle
    val rows = (1 to 40).flatMap(r => (1 to 3000 / r).map(i => (r, s"p${r}_$i")))
    val fact = spark.createDataFrame(rows).toDF("k", "payload")
    def maxPart(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
    val unsalted = maxPart(fact.repartition(32, col("k")))
    val salted = maxPart(fact
      .withColumn("_salt", SkewJoin.salt(Seq(col("k"), col("payload")), 8))
      .repartition(32, col("k"), col("_salt")))
    info(s"max partition rows: unsalted=$unsalted salted=$salted")
    assert(unsalted >= 3000)    // the hot key is one straggler partition
    assert(salted * 3 < unsalted) // salting spreads it by >=3x
  }

  test("salt spreads a hot key over multiple partitions of [0, n)") {
    val fact = spark.createDataFrame(
      (1 to 100).map(i => (1, s"row$i"))).toDF("k", "payload")
    val salts = fact
      .select(SkewJoin.salt(Seq(fact("k"), fact("payload")), 8).as("s"))
      .collect().map(_.getLong(0)).toSet
    assert(salts.size > 4) // 100 rows over 8 salts — must actually spread
    assert(salts.forall(s => s >= 0 && s < 8))
  }
}
