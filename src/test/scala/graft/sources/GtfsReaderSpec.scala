package graft.sources

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.transit.GtfsFixture

/** Calendar source semantics: real GTFS encodings (1/0 day flags,
  * yyyyMMdd dates) and the service-active-on-date rule. */
class GtfsReaderSpec extends AnyFunSuite with SparkSpec {

  private lazy val cal =
    GtfsReader.readTable(spark, GtfsFixture.feedDir(), "calendar")

  private def active(d: LocalDate): Seq[String] =
    GtfsReader.servicesActiveOn(cal, d).collect().map(_.getString(0)).toSeq

  test("day-of-week flags select the right services") {
    assert(active(LocalDate.of(2025, 6, 4)) == Seq("1"))  // Wednesday
    assert(active(LocalDate.of(2025, 6, 7)) == Seq("2"))  // Saturday
    assert(active(LocalDate.of(2025, 6, 8)) == Seq("3"))  // Sunday
  }

  test("date-range bounds exclude expired services") {
    // service 9 ran every day but only through 2024-06-30; services 1-3
    // start 2025-01-01, so mid-2024 only 9 is active
    assert(active(LocalDate.of(2024, 6, 5)) == Seq("9"))
    assert(!active(LocalDate.of(2025, 6, 4)).contains("9"))
  }

  test("calendar parses GTFS yyyyMMdd dates and 1/0 flags with the declared schema") {
    val rows = cal.collect()
    assert(rows.length == 4)
    val s1 = rows.find(_.getString(0) == "1").get
    assert(s1.getShort(1) == 1 && s1.getShort(6) == 0) // monday=1, sunday=0
    assert(s1.getDate(8).toString == "2025-01-01")
  }
}
