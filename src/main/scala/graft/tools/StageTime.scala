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

    // ---- minhash phase decomposition ----
    val docs = Tables.documents(spark, sfDir)
    time("docs")(docs.count())
    val ss = docs.select(col("doc_id"), shingleSet(col("text")).as("shs"))
    time("shingleSet (noop)")(ss.write.format("noop").mode("overwrite").save())
    val sigs = ss.select(col("doc_id"), col("shs"),
      GraftFunctions.minhash32(spark, col("shs")).as("sig"))
      .repartition(col("doc_id"))
    time("sigs (noop)")(sigs.write.format("noop").mode("overwrite").save())
    val sc2 = sigs.cache()
    time("sigs materialize")(sc2.count())
    val bands = sc2.select(col("doc_id"),
      posexplode(let(col("sig"))(sig =>
        transform(sequence(lit(0), lit(7)), b => {
          var acc: org.apache.spark.sql.Column = lit(17L)
          for (k <- 0 until 4)
            acc = (acc * 131L + element_at(sig, b.cast("int") * 4 + k + 1)) % P
          acc
        }))))
      .toDF("doc_id", "band", "band_hash")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2")).distinct()
    time("cand from cached sigs")(cand.count())
    val res = cand
      .join(sc2.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sc2.as("s2"), col("id2") === col("s2.doc_id"))
      .select(col("id1"), col("id2"),
        round(aggregate(zip_with(col("s1.sig"), col("s2.sig"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (a, v) => a + v)
          .cast("double") / 32, 6).as("est_sim"),
        round(size(array_intersect(col("s1.shs"), col("s2.shs"))).cast("double") /
          size(array_union(col("s1.shs"), col("s2.shs"))), 6).as("jaccard"))
    time("verify join from cached")(res.count())
    spark.stop()
  }
}
