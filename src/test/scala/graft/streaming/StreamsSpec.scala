package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import Streams._

/** Proves the streaming faces compute the same answers as the batch faces
  * (which are the oracle-checked surface). */
class StreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("streaming windowed counts equal batch windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(61), "click", 4.0),
      (ts(62), "view", 8.0), (ts(125), "view", 16.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val sdf = stream.toDF.toDF("ts", "event_type", "value")
    val q = hourlyByType(sdf).writeStream
      .format("memory").queryName("hourly_test").outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("hourly_test")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = hourlyByType(rows.toDF("ts", "event_type", "value"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 4) // (h0:click), (h1:click), (h1:view), (h2:view)
  }

  test("flatMapGroupsWithState sessionization equals batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000000L
    val base = 1000 * min // off epoch 0: ts <= the initial watermark is late
    // user 1: two sessions (gap 40 min between minute 50 and 90); user 2: one
    val evs = Seq(
      Ev(1, base + 0 * min, 1.0), Ev(1, base + 10 * min, 2.0),
      Ev(1, base + 50 * min, 4.0), Ev(1, base + 90 * min, 8.0),
      Ev(2, base + 5 * min, 16.0), Ev(2, base + 20 * min, 32.0))

    val stream = MemoryStream[Ev]
    val q = sessionizeStreaming(stream.toDS()).writeStream
      .format("memory").queryName("sessions_test").outputMode("append").start()
    try {
      stream.addData(evs: _*)
      q.processAllAvailable()
      // trailing sessions flush via EVENT-TIME TIMEOUT, not future events
      // for those users: a different user's event advances the watermark
      stream.addData(Ev(3, base + 1000 * min, 0.0)) // wm +60min → flushes user 2
      q.processAllAvailable()
      stream.addData(Ev(3, base + 2000 * min, 0.0)) // wm +970min → flushes user 1
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sessions_test")
      .filter($"user_id" <= 2) // user 3 is only the watermark driver
      .select("user_id", "start_us", "duration_us", "n_events", "sum_value")
      .orderBy("user_id", "start_us").collect().toSeq

    val batchDf = sessionizeBatch(
      evs.zipWithIndex
        .map { case (e, i) => (i.toLong, timestampFromUs(e.us), e.user_id, e.value) }
        .toDF("event_id", "ts", "user_id", "value"))
      .select("user_id", "start_us", "duration_us", "n_events", "sum_value")
      .orderBy("user_id", "start_us").collect().toSeq

    assert(streamed == batchDf)
    assert(streamed.map(_.getLong(3)).sum == evs.size)
  }

  private def timestampFromUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }
}
