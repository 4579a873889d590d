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
