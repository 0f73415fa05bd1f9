package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** A/B probe for the data-sized session tuning (graft.Scale): runs the
  * named queries in a Bench-identical session FIRST with the stock
  * AQE/split/broadcast estimates, THEN with [[graft.Scale.tuneSessionGrid]]
  * applied, and reports warm seconds, scheduled task count, and the join
  * strategies in the executed plan for each side. Local-iteration tool
  * (not part of the driver contract) — built to adjudicate the uniform
  * +0.5–1.4 s shift the round-11 sf1 board refresh showed on ~20
  * sub-second faces.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... TuneProbe q1 q2 ...
  */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    def joinMix(plan: String): String =
      Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin")
        .map(j => s"$j=${j.r.findAllIn(plan).length}")
        .filterNot(_.endsWith("=0")).mkString(",")
    def run(q: String, label: String): Unit = {
      val fn = graft.SparkEntry.queries(q)
      // cold then 2 warm, Bench-style GC quiesce before each timed pass
      var best = Double.MaxValue
      var nTasks = 0L
      var plan = ""
      for (i <- 1 to 3) {
        System.gc(); Thread.sleep(200)
        val before = tasks.get()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 1 && dt < best) { best = dt }
        if (i == 3) { nTasks = tasks.get() - before
          plan = df.queryExecution.executedPlan.toString }
      }
      println(f"[tune-probe] $q%-22s $label%-8s warm=$best%6.2f s tasks=$nTasks%5d  ${joinMix(plan)}")
    }
    val qs = args.toSeq
    qs.foreach(run(_, "stock"))
    val grid = graft.Scale.tuneSessionGrid(spark, sfDir)
    val tunedConfs = Seq(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.sources.fileCompressionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.get(k))
    println(s"[tune-probe] tuned grid=$grid " +
      tunedConfs.map { case (k, v) => s"${k.split('.').last}=$v" }.mkString(" "))
    qs.foreach(run(_, "tuned"))
    // per-knob attribution: reset to stock, then re-apply ONE tuned conf
    // at a time (grid/split/factor/advisory) and re-run the queries
    val stockDefaults = Map(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "32",
      "spark.sql.files.maxPartitionBytes" -> (128L << 20).toString,
      "spark.sql.sources.fileCompressionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (64L << 20).toString)
    for ((k, v) <- tunedConfs) {
      stockDefaults.foreach { case (sk, sv) => spark.conf.set(sk, sv) }
      spark.conf.set(k, v)
      qs.foreach(run(_, s"only:${k.split('.').last.take(8)}"))
    }
    spark.stop()
  }
}
