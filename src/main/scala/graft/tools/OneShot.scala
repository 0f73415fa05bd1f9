package graft.tools

/** Single-execution timer for registered queries (local iteration only):
  * one cold run each, noop sink, no warm repetitions — for faces whose
  * repeated execution exceeds local scratch space (the sf10 mongo-export
  * JSONL sink: each bench repetition leaves a ~30 GB shuffle generation
  * plus the export's _temporary copy; three repetitions exceed the box).
  * On a real cluster the sink target is HDFS/S3 and repetitions recycle
  * executor-local shuffle dirs — this constraint is the harness's, not
  * the plan's. */
object OneShot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Scale.tuneSessionGrid(spark, sfDir)
    for (q <- args) {
      val t0 = System.nanoTime()
      q match {
        // the mongo-export legs, separately (the sink leg exceeds local
        // scratch when benched with repetitions at sf10 — decompose it)
        case "mongo_docs_noop" =>
          graft.sources.MongoExport
            .docs(graft.transit.TransitTables.fromTpch(spark, sfDir))
            .write.format("noop").mode("overwrite").save()
        case "mongo_write_docs" =>
          graft.sources.MongoExport.writeDocs(spark, sfDir)
        case "mongo_read_flatten" =>
          val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
          val dir = s"target/tmp/mongo_export_$key"
          val schema = graft.sources.MongoExport
            .docs(graft.transit.TransitTables.fromTpch(spark, sfDir)).schema
          val back = spark.read.schema(schema).json(dir)
          back.selectExpr("stop_id", "explode(upcoming_services) as svc")
            .write.format("noop").mode("overwrite").save()
        case _ =>
          graft.SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
      }
      println(f"[oneshot] $q cold=${(System.nanoTime() - t0) / 1e9}%.3f sf=$sfDir")
    }
    spark.stop()
  }
}
