package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job decomposition of a registered face (local iteration only; not
  * part of the driver contract): runs each named query cold + warm with a
  * SparkListener that records every job's wall duration, so a face's time
  * splits into "few big jobs" (stage work — optimize the plan) vs "many
  * tiny jobs" (fixpoint/driver-loop scheduling overhead — optimize the
  * round structure). Mirrors Bench's session config exactly. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val initParts = graft.Scale.initialShufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Scale.tuneSessionGrid(spark, sfDir)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, Int, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          jobs.add((je.jobId, (System.nanoTime() - t0) / 1e9, 0, desc))
        }
      }
    })

    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      System.gc(); Thread.sleep(200)
      // page-cache quiesce, mirroring Bench: each face pays for its own
      // I/O, not its predecessors' write-back debt
      try new ProcessBuilder("sync").start().waitFor()
      catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for (q <- args) {
      val fn = graft.SparkEntry.queries(q)
      val cold = runOnce(q, fn)
      runOnce(q, fn) // first warm: JIT settles
      Thread.sleep(300) // let the listener bus drain the previous run
      jobs.clear()
      val warm = runOnce(q, fn)
      Thread.sleep(300)
      val snap = jobs.toArray(new Array[(Int, Double, Int, String)](0)).toSeq
      val totalJob = snap.map(_._2).sum
      println(f"[jobprofile] $q%-38s cold=$cold%7.3f warm=$warm%7.3f " +
        f"n_jobs=${snap.size}%3d sum_job=$totalJob%7.3f gap=${warm - totalJob}%6.3f")
      snap.sortBy(-_._2).take(12).foreach { case (id, d, _, desc) =>
        println(f"[jobprofile]   job=$id%4d ${d}%7.3f s  ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
