package graft.transit

/** Query parameters, mirroring the reference API's sanitization rules. */

/** Day-type filter. `'4'` / empty / garbage → WholeWeek ("no filter" sentinel,
  * reference `SQL/sql_utils.py:40-43`, `SQL/static/app.js:8-14`).
  *
  * WholeWeek deliberately has NO shared implementation: the reference gives
  * it three different meanings (unfiltered for Q1/Q3, trip-weighted average
  * for Q2, per-hour sum for Q4 — reference `SQL/generate_csv.py:32-35,
  * 96-106,119-124`), so each query encodes its own strategy.
  */
sealed trait ServiceFilter { def sid: Option[String] }
object ServiceFilter {
  case object Weekday extends ServiceFilter { val sid = Some("1") }
  case object Saturday extends ServiceFilter { val sid = Some("2") }
  case object Sunday extends ServiceFilter { val sid = Some("3") }
  case object WholeWeek extends ServiceFilter { val sid = None }

  val publicServices: Seq[String] = Seq("1", "2", "3")

  def fromParam(p: Option[String]): ServiceFilter = p.map(_.trim) match {
    case Some("1") => Weekday
    case Some("2") => Saturday
    case Some("3") => Sunday
    case _         => WholeWeek // '4', "", None, garbage
  }
}

/** Row limit. Default 20; `"all"` → unlimited; non-positive / garbage → 20
  * (reference `SQL/sql_utils.py:23-37`). */
sealed trait Limit {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    this match {
      case Limit.TopN(n) => df.limit(n)
      case Limit.All     => df
    }
}
object Limit {
  final case class TopN(n: Int) extends Limit
  case object All extends Limit
  val default: Limit = TopN(20)

  def fromParam(p: Option[String]): Limit = p.map(_.trim.toLowerCase) match {
    case Some("all") => All
    case Some(s) =>
      s.toIntOption match {
        case Some(n) if n > 0 => TopN(n)
        case _                => default
      }
    case None => default
  }
}
