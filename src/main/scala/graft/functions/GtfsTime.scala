package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GTFS time handling — the single most load-bearing utility (SURVEY §7.4).
  *
  * GTFS times run 0–28+ hours ("25:45:00" = 1:45 am next service day,
  * reference `SQL/Q4 Create View.sql:2`), so they are NEVER TimestampType:
  * the canonical representation is an integer seconds-since-midnight column,
  * with strings only at the edges. All builders are plain `functions._`
  * compositions → whole-stage-codegen'd, no UDF.
  */
object GtfsTime {

  /** Parse "HH:MM:SS" (H may be 1-3 digits, value may exceed 24h) → seconds. */
  def gtfsSeconds(t: Column): Column = {
    val p = split(t, ":")
    (p.getItem(0).cast("long") * 3600L +
      p.getItem(1).cast("long") * 60L +
      p.getItem(2).cast("long"))
  }

  /** Tolerant parse for UNTRUSTED feeds: shape-check first, NULL on
    * anything malformed. [[gtfsSeconds]] stays the hot-path form (ANSI
    * cast, fails loudly on engine bugs); this is the ingest-boundary form
    * where a dirty feed must yield a countable NULL, not a crashed scan.
    * CaseWhen evaluates only the matched branch, so the ANSI cast inside
    * never sees a malformed string. */
  def gtfsSecondsLenient(t: Column): Column =
    // [0-5][0-9] on minutes/seconds: "12:99:99" is malformed feed data and
    // must yield NULL, not 49239 — a {2}-digit shape check would count it
    when(t.rlike("^[0-9]{1,3}:[0-5][0-9]:[0-5][0-9]$"), gtfsSeconds(t))

  /** Hour bucket of a seconds column — legitimately 24..28+ (never `hour()`). */
  def hourOfDay(secs: Column): Column = floor(secs / 3600.0).cast("long")

  private def two(c: Column): Column = lpad(c.cast("string"), 2, "0")

  /** Seconds → canonical GTFS string, hours NOT wrapped ("25:45:00").
    * The hour uses `format_string("%02d", …)`, not `lpad(…, 2)`: lpad
    * TRUNCATES strings longer than its length, so a 3-digit hour
    * ("100:15:00" — gtfsSeconds documents 1–3 digit hours) would silently
    * corrupt to "10:15:00" on write and re-parse 90 h early. %02d pads
    * without truncating; the DuckDB oracle mirror uses printf the same
    * way. Minutes/seconds are always < 60, so lpad stays safe there.
    *
    * NULL-guarded (ADVICE r13): java.util.Formatter renders a null arg as
    * the literal "null" and concat_ws keeps non-null elements, so an
    * unguarded format_string turns a NULL seconds input into "null:..:.."
    * — while the lpad components and the DuckDB printf mirror both yield
    * NULL. The when-without-otherwise propagates NULL whole-string,
    * matching the oracle on nullable inputs. */
  def gtfsString(secs: Column): Column =
    when(secs.isNotNull,
      concat_ws(":",
        format_string("%02d", floor(secs / 3600.0).cast("long")),
        two(floor(secs % 3600L / 60.0).cast("long")),
        two(secs % 60L)))

  /** Seconds → reference *display* string with the hour wrapped into 0–23.
    *
    * Reproduces the reference pipeline's `"1 days 03:00:00"` → `"03:00:00"`
    * strip (reference `Mongo/app.py:96-100,176-181`) — including its accepted
    * quirk that wrapped after-midnight times string-sort before late-evening
    * times (SURVEY §2.5 O9 / §7.4 risk 1). Do not "fix". */
  def displayString(secs: Column): Column =
    concat_ws(":",
      two(floor(secs / 3600.0).cast("long") % 24L),
      two(floor(secs % 3600L / 60.0).cast("long")),
      two(secs % 60L))
}
