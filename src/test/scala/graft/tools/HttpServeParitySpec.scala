package graft.tools

import graft.SparkSpec
import graft.transit._

/** The serving cache must be invisible on the wire: every route the cached
  * listener answers from its driver-side maps must be BYTE-IDENTICAL
  * (status + body) to the live DataFrame path answering the same request —
  * including the fixture's traps (null route_short_name, NOT IN SERVICE
  * headsigns, >24h display times, unknown stops, param sanitization). This
  * is the guard that lets the r12 latency numbers stand for the same
  * responses the engine faces produce. */
class HttpServeParitySpec extends SparkSpec {

  private lazy val t = GtfsFixture.tables(spark)
  private lazy val docs = Timetable.buildStopTimetables(t).cache()
  private lazy val cached = {
    val svc = new QueryService(t)
    HttpServe.start(svc, docs, 0, withCache = true)
  }
  private lazy val live = {
    val svc = new QueryService(t)
    HttpServe.start(svc, docs, 0, withCache = false)
  }

  private def get(server: com.sun.net.httpserver.HttpServer,
      path: String): (Int, String) = {
    val conn = new java.net.URI(
      s"http://127.0.0.1:${server.getAddress.getPort}$path").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    (code, body)
  }

  private def assertParity(paths: Seq[String]): Unit =
    paths.foreach { p =>
      val c = get(cached, p)
      val l = get(live, p)
      assert(c == l, s"cache/live divergence on $p:\ncached: $c\nlive:   $l")
    }

  private val stops = Seq("A", "B", "C", "D", "E", "HUB", "NOPE")

  test("/api/q1..q4: every service/limit face matches the live path") {
    assertParity(for {
      q <- Seq("q1", "q2", "q3", "q4")
      s <- Seq("1", "2", "3", "4", "zzz", "")
      l <- Seq("3", "20", "all", "-7")
    } yield s"/api/$q?service_id=$s&limit=$l")
    assertParity(Seq("/api/q1", "/api/q2", "/api/q3", "/api/q4"))
  }

  test("/get_stops matches") {
    assertParity(Seq("/get_stops"))
  }

  test("/get_timetable: all stops (incl. unknown -> 404, missing param -> 400)") {
    assertParity("/get_timetable" +: stops.map(s => s"/get_timetable?stop_id=$s"))
  }

  test("/get_routes_for_stop: all stops match") {
    assertParity("/get_routes_for_stop" +:
      stops.map(s => s"/get_routes_for_stop?stop_id=$s"))
  }

  test("/get_arrivals grouped: all stop x service faces match") {
    assertParity(for {
      s <- stops
      svc <- Seq("", "1", "2", "3", "4")
    } yield s"/get_arrivals?stop_id=$s&service_id=$svc")
  }

  test("/get_arrivals flat: every (stop, route, headsign) pair incl. traps") {
    // every real pair at every stop, from the engine's own grouped face,
    // plus the NOT IN SERVICE headsign (flat serves it by design) and a
    // nonexistent pair (empty times)
    val pairs = stops.flatMap { sid =>
      Timetable.getArrivalsGrouped(docs, sid).collect().toSeq.map { r =>
        (sid, Option(r.getAs[String]("route_short_name")).getOrElse(""),
          r.getAs[String]("trip_headsign"))
      }
    } ++ Seq(("HUB", "", "NOT IN SERVICE"), ("HUB", "504", "Nowhere"))
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    assertParity(pairs.map { case (sid, short, head) =>
      s"/get_arrivals?stop_id=$sid&route_short_name=${enc(short)}&trip_headsign=${enc(head)}"
    })
  }
}
