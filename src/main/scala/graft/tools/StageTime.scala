package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextHash}
import graft.sources.Tables

/** Scratch stage-by-stage timing for the dedup hot paths (local iteration
  * only; not part of the driver contract). */
object StageTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import TextHash._

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val extra = r match { case l: Long => s" -> $l rows"; case _ => "" }
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
    }

    // ---- simhash shape ----
    val docs = Tables.documents(spark, sfDir)
    time("docs")(docs.count())
    val sh = docs.select(
      col("doc_id"),
      GraftFunctions.simhash32(spark, tokenHashes(col("text"))).as("sh"))
      .cache()
    time("distinct sh")(sh.select("sh").distinct().count())
    val groups = sh.groupBy("sh").count()
    time("pairs within identical sh")(
      groups.agg(sum((col("count") * (col("count") - 1) / 2).cast("long"))).collect()(0).getLong(0))
    // per-slice block sizes on DISTINCT sh values
    val vals = sh.groupBy("sh").agg(count(lit(1)).as("cnt"))
    val vslices = vals.select(col("sh"), col("cnt"),
      posexplode(let(col("sh"))(s => transform(sequence(lit(0), lit(3)),
        k => (s.cast("double") / pow(lit(2.0), k * 8)).cast("long") % 256L))))
      .toDF("sh", "cnt", "k", "slice")
    time("distinct-value slice join rows")(
      vslices.as("a").join(vslices.as("b"),
        col("a.k") === col("b.k") && col("a.slice") === col("b.slice") &&
          col("a.sh") < col("b.sh")).count())

    // ---- minhash band shape ----
    val ss = docs.select(col("doc_id"), shingleSet(col("text")).as("shs"))
    val sigd = ss.select(col("doc_id"),
      GraftFunctions.minhash32(spark, col("shs")).as("sig"))
    val bands = sigd.select(col("doc_id"),
      posexplode(let(col("sig"))(sig =>
        transform(sequence(lit(0), lit(7)), b => {
          var acc: org.apache.spark.sql.Column = lit(17L)
          for (k <- 0 until 4)
            acc = (acc * 131L + element_at(sig, b.cast("int") * 4 + k + 1)) % P
          acc
        }))))
      .toDF("doc_id", "band", "band_hash")
    time("band join rows")(
      bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id")).count())

    // ---- ngram shape ----
    val ex = ss.select(col("doc_id"), explode(col("shs")).as("s"))
    time("shingle join rows")(
      ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")).count())
    spark.stop()
  }
}
