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

  test("gtfsString round-trips 3-digit hours (lpad would truncate)") {
    // 360900 s = 100:15:00; lpad(_, 2) would corrupt it to "10:15:00"
    // (re-parsing 90 h early) — format_string("%02d") must not
    val df = Seq(360900L, 3600L * 999 + 59L).toDF("s").select(
      GtfsTime.gtfsString(col("s")).as("g"),
      GtfsTime.gtfsSeconds(GtfsTime.gtfsString(col("s"))).as("rt"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("100:15:00", 360900L), ("999:00:59", 3600L * 999 + 59L)))
  }

  test("gtfsString propagates NULL whole-string (never the literal \"null\")") {
    // ADVICE r13: java.util.Formatter renders a null format arg as the
    // text "null" and concat_ws keeps non-null elements, so an unguarded
    // format_string hour would turn NULL seconds into "null:00:00" while
    // the DuckDB printf mirror yields NULL — a cross-engine divergence on
    // any nullable seconds column
    val df = Seq[Option[Long]](Some(92700L), None).toDF("s")
      .select(GtfsTime.gtfsString(col("s")).as("g"))
    val got = df.collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("25:45:00"), None))
  }

  test("gtfsSecondsLenient NULLs malformed minutes/seconds, keeps valid >24h") {
    val df = Seq("12:99:99", "12:59:60", "25:45:00", "7:05:09", "xx:00:00")
      .toDF("t").select(GtfsTime.gtfsSecondsLenient(col("t")).as("s"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(None, None, Some(92700L), Some(25509L), None))
  }
}
