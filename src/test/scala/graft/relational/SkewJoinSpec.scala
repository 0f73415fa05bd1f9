package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals plain join on a skewed distribution") {
    import spark.implicits._
    // 90% of fact rows hit one hot key — the shape that pins a reducer
    val fact = (1 to 5000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else 1L
      (k, i.toLong, s"v$i")
    }.toDF("k", "id", "payload")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "dim_name")

    val plain = fact.join(dim, Seq("k")).select("k", "id", "payload", "dim_name")
    val salted = SkewJoin.saltedInner(fact, dim, "k", salts = 8)
      .select("k", "id", "payload", "dim_name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // every salt bucket of the hot key actually received rows
    val buckets = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(8L)))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(buckets > 4, s"salt spread only $buckets buckets")
  }
}
