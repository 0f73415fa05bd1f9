package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The native codegen'd SimHash must agree with the interpreted
  * higher-order formulation (which the DuckDB oracle mirrors). */
class NativeExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("SimHash32Expr equals TextHash.simhash32 on varied inputs") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "a a a a a a", "x y z w v u t s r q p o n m",
      "completely different content about catalyst optimizer rules")
      .toDF("text")
    val th = TextHash.tokenHashes(col("text"))
    val both = docs.select(
      GraftFunctions.simhash32(spark, th).as("native"),
      TextHash.simhash32(th).as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() == 0)
    // and codegen path == interpreted path of the native expr itself
    val vals = both.collect().map(_.getLong(0))
    assert(vals.distinct.length > 1) // non-degenerate
  }

  test("MinHashSigExpr equals TextHash.minhashSig on varied inputs") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and then some more words",
      "one two three four", "short", // < 3 tokens → empty shingle set
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .toDF("text")
    val shs = TextHash.shingleSet(col("text"))
    val both = docs.select(
      GraftFunctions.minhash32(spark, shs).as("native"),
      TextHash.minhashSig(shs).as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() == 0)
    // empty shingle set → all-P signature, non-empty ones differ
    val sigs = both.collect().map(_.getSeq[Long](0))
    assert(sigs.exists(_.forall(_ == TextHash.P)))
    assert(sigs.map(_.toVector).distinct.length > 2)
  }

  test("TokenHashesExpr equals TextHash.tokenHashes (per-token md5 mod P)") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox", "", "  padded   whitespace  ",
      "unicode tökens żółw 中文 here",
      "repeated repeated repeated").toDF("text")
    val both = docs.select(
      GraftFunctions.tokenHashes(spark, col("text")).as("native"),
      TextHash.tokenHashes(col("text")).as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() == 0)
  }

  test("ShingleSetExpr equals TextHash.shingleSet incl. first-occurrence order") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and then some more words",
      "a b c a b c a b c a b c", // repeated shingles → dedup path
      "one two three", "short one", "",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa").toDF("text")
    val both = docs.select(
      GraftFunctions.shingleSet(spark, col("text")).as("native"),
      TextHash.shingleSet(col("text")).as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() == 0)
    // non-degenerate: repeated-shingle doc actually exercised dedup
    val sizes = docs.select(size(GraftFunctions.shingleSet(spark, col("text"))))
      .collect().map(_.getInt(0))
    assert(sizes.contains(3) && sizes.contains(0))
  }

  test("PqEncodeExpr equals the interpreted normalize+encode pipeline on real embeddings") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    // the interpreted executable spec: let-bound unit vector → pqCodes
    val interp = TextHash.let(
      TextHash.let(GraftFunctions.l2norm(spark, col("embedding")))(n =>
        transform(col("embedding"), x => x.cast("double") / n)))(u =>
      graft.similarity.Similarity.pqCodes(u))
    val both = e.select(
      GraftFunctions.pqEncode(spark, col("embedding")).as("native"),
      interp.as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() == 0)
    // non-degenerate: codes span more than one centroid index
    val distinct = e.select(explode(
        GraftFunctions.pqEncode(spark, col("embedding"))))
      .distinct().count()
    assert(distinct > 1)
  }

  test("SimHash32Expr of empty token array is 0") {
    import spark.implicits._
    val r = Seq(Seq.empty[Long]).toDF("th")
      .select(GraftFunctions.simhash32(spark, col("th")))
      .collect().head.getLong(0)
    assert(r == 0L)
  }
}
