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

    // ---- simhash phase decomposition ----
    val docs = Tables.documents(spark, sfDir)
    time("docs")(docs.count())
    val sh = docs.select(
      col("doc_id"),
      GraftFunctions.simhash32(spark, tokenHashes(col("text"))).as("sh"))
    time("sh compute (noop)")(
      sh.write.format("noop").mode("overwrite").save())
    time("sh compute again")(
      sh.write.format("noop").mode("overwrite").save())
    val vals = sh.groupBy(col("sh"))
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 21).as("ids"))
      .repartition(col("sh"))
    time("vals (noop)")(vals.write.format("noop").mode("overwrite").save())
    val vc = vals.cache()
    time("vals materialize")(vc.count())
    val vslices = vc.select(col("sh"), element_at(col("ids"), 1).as("mid"),
      posexplode(let(col("sh"))(s => transform(sequence(lit(0), lit(3)),
        k => (s.cast("double") / pow(lit(2.0), k * 8)).cast("long") % 256L))))
      .toDF("sh", "mid", "k", "slice")
      .repartition(col("k"), col("slice"))
    val vpairs = vslices.as("a").join(vslices.as("b"),
        col("a.k") === col("b.k") && col("a.slice") === col("b.slice") &&
          col("a.sh") < col("b.sh"))
      .select(col("a.k").as("k"), col("a.slice").as("slice"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"),
        hamming(col("a.sh"), col("b.sh")).as("hamming_dist"),
        least(col("a.mid"), col("b.mid")).as("b1"),
        greatest(col("a.mid"), col("b.mid")).as("b2"))
    time("vpairs from cached vals")(vpairs.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("slice"))
      .orderBy(col("hamming_dist"), col("b1"), col("b2"))
    val kept = vpairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("sh1"), col("sh2"), col("hamming_dist")).distinct()
    time("kept from cached vals")(kept.count())
    val inter = kept
      .join(vc.as("v1"), col("sh1") === col("v1.sh"))
      .join(vc.as("v2"), col("sh2") === col("v2.sh"))
      .select(explode(flatten(transform(col("v1.ids"), x =>
        transform(col("v2.ids"), y => struct(
          least(x, y).as("id1"), greatest(x, y).as("id2")))))).as("p"),
        col("hamming_dist"))
      .select(col("p.id1"), col("p.id2"), col("hamming_dist"))
    time("inter from cached vals")(inter.count())
    spark.stop()
  }
}
