package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GtfsTimeSpec extends SparkSpec {
  import spark.implicits._

  test("gtfsSeconds parses normal and >24h times") {
    val df = Seq("00:00:00", "08:05:30", "23:59:59", "25:45:00", "28:10:05")
      .toDF("t").select(GtfsTime.gtfsSeconds(col("t")).as("s"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 29130L, 86399L, 92700L, 101405L))
  }

  test("gtfsString round-trips without wrapping; displayString wraps") {
    val df = Seq(92700L, 29130L, 0L).toDF("s").select(
      GtfsTime.gtfsString(col("s")).as("g"),
      GtfsTime.displayString(col("s")).as("d"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("25:45:00", "01:45:00"), ("08:05:30", "08:05:30"),
      ("00:00:00", "00:00:00")))
  }

  test("hourOfDay passes 24 (never the timestamp hour())") {
    val df = Seq(92700L, 86399L, 86400L).toDF("s")
      .select(GtfsTime.hourOfDay(col("s")).as("h"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(25L, 23L, 24L))
  }
}
