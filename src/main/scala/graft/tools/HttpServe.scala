package graft.tools

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.transit._

/** A REAL HTTP listener over the serving layer — the reference exposes its
  * engines through two Flask apps (`SQL/app.py:76-126` — /api/q1..q4 with
  * `service_id`/`limit` params; `Mongo/app.py:47-244` — /get_stops,
  * /get_timetable, /get_routes_for_stop, /get_arrivals). [[ServeDaemon]]
  * measures the engine-side request path; this closes the last gap between
  * "engine analog" and "a user could point curl at it": the same
  * [[QueryService]]/[[Timetable]] plans behind real sockets, query-string
  * parsing, status codes and JSON bodies, on the JDK's built-in
  * `com.sun.net.httpserver` (zero added dependencies — the HTTP layer is
  * presentation, so it must not drag a framework into the engine jar).
  *
  * Route → engine-face mapping (response shapes mirror the reference):
  *  - `GET /api/q{1..4}?service_id=&limit=` → `{"items":[...]}`; params
  *    sanitized by the shared [[ServiceFilter.fromParam]]/[[Limit.fromParam]]
  *    rules ('4'/garbage → whole week; "all"/garbage → 20), exactly the
  *    sanitization `SQL/sql_utils.py:23-43` applies before dispatch.
  *  - `GET /get_stops` → JSON array of {stop_id, stop_name, stop_code},
  *    name-sorted (`Mongo/app.py:56-59`).
  *  - `GET /get_timetable?stop_id=` → nested {route: {headsign: [times]}}
  *    (400 missing param / 404 unknown stop, `Mongo/app.py:66-112`).
  *  - `GET /get_routes_for_stop?stop_id=` → sorted pair list
  *    (`Mongo/app.py:116-149`).
  *  - `GET /get_arrivals?stop_id=&route_short_name=&trip_headsign=&service_id=`
  *    → flat `{"times":[...],"count":n}` when route+headsign are both given,
  *    else grouped `{"groups":[...],"total_count":n}` (`Mongo/app.py:153-244`).
  *
  * Scale note: every handler is a driver-side render of an ALREADY
  * snapshot/cache-served plan ([[QueryService]] serves from pre-aggregated
  * partition-pruned snapshots; timetable lookups are point filters on the
  * pinned document store). The HTTP layer adds O(response) work only — at
  * cluster scale this process is a thin stateless front end replicated
  * behind a load balancer, each replica holding the same cached snapshots,
  * so request fan-out scales with replica count, not data size.
  */
object HttpServe {

  // TCP_NODELAY on every accepted socket: the JDK server writes headers
  // and body as separate segments, and with Nagle on, the body segment
  // waits ~40 ms for the client's delayed ACK of the header segment —
  // measured r12/r13 as a flat 44 ms p50 across EVERY route regardless of
  // response size (a keep-alive generator alone did not move it; the few
  // large responses that filled full segments answered in 3-5 ms).
  // Set at HttpServe CLASS LOAD, not inside start(): the JDK reads the
  // property ONCE, in sun.net.httpserver.ServerConfig's static
  // initializer (first HttpServer use anywhere in the JVM), so a
  // start()-time set is load-order dependent — any embedding JVM that
  // created its own HttpServer first would silently get the Nagle stall
  // back. Every listener in this repo reaches HttpServer.create via this
  // object, so object-init always precedes ServerConfig load here; an
  // embedder with its own earlier listener should pass
  // -Dsun.net.httpserver.nodelay=true on the JVM line instead.
  System.setProperty("sun.net.httpserver.nodelay", "true")

  /** Boundary validation + canonicalization for stop_id request values,
    * keyed to the STORE's id type. Numeric-keyed store (the production
    * transit tables): the live path ANSI-casts the request string for its
    * filter (THROWING on a non-integral value) while the cached maps key
    * on the exact long rendering — so "042"/" 42" canonicalize to
    * Some("42") and "42.0"/"x" become None (handled as "no such stop" per
    * route, identically in both modes). String-keyed store (the GTFS
    * fixture): ids pass through verbatim — string equality is exact in
    * both modes already. */
  private def parseStopId(st: ServingState, raw: String): Option[String] =
    if (!st.numericKey) Some(raw)
    else
      try Some(java.lang.Long.parseLong(raw.trim).toString)
      catch { case _: NumberFormatException => None }

  /** JSON string escape (RFC 8259 minimal set). */
  private def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.append('"').toString
  }

  /** One query-string parse shared by every route (the JDK gives raw
    * query text only). Later duplicates win, matching Flask's
    * `request.args.get` taking the first — order reversed so first wins. */
  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").iterator.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toSeq.reverse.toMap
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handler(f: HttpExchange => (Int, String)): HttpHandler =
    new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        try {
          val (status, body) = f(ex)
          respond(ex, status, body)
        } catch {
          case e: Throwable =>
            respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
        }
    }

  /** Rows → JSON array via Spark's own row serializer (the engine's types
    * decide the JSON types — no reflection layer like the reference's
    * `_to_json_safe` numpy walk, `SQL/app.py:35-57`). */
  private def itemsJson(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** The nested {route: {headsign: [times]}} document, re-assembled at the
    * presentation edge like the reference's defaultdict walk
    * (`Mongo/app.py:87-110`). Rows arrive group-sorted, so adjacent
    * grouping preserves key order; null keys render as the reference's
    * Unknown fallbacks. Shared by the live and cached paths. */
  private[tools] def renderTimetable(
      rows: Seq[(Option[String], Option[String], String)]): String = {
    val nested = rows
      .map { case (route, head, times) =>
        (route.getOrElse("Unknown Route"),
          head.getOrElse("Unknown Direction"), times)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (route, hs) =>
        val dirs = hs.map { case (_, head, times) =>
          s"${jstr(head)}:${times.split(",").map(jstr)
            .mkString("[", ",", "]")}"
        }.mkString(",")
        s"${jstr(route)}:{$dirs}"
      }.mkString(",")
    s"{$nested}"
  }

  /** Grouped-arrivals body: null short names render as "" like the
    * reference's str-or-empty walk (`Mongo/app.py:219-224`). Shared by the
    * live and cached paths. */
  private[tools] def renderGroups(
      rows: Seq[(Option[String], String, Long, String)]): String = {
    val groups = rows.map { case (short, head, n, times) =>
      val arr = if (times.isEmpty) "[]"
                else times.split(",").map(jstr).mkString("[", ",", "]")
      s"""{"route_short_name":${jstr(short.getOrElse(""))},"trip_headsign":${jstr(head)},"times":$arr,"count":$n}"""
    }
    val total = rows.map(_._3).sum
    s"""{"groups":${groups.mkString("[", ",", "]")},"total_count":$total}"""
  }

  private[tools] def renderFlat(times: Seq[String]): String =
    s"""{"times":${times.map(jstr).mkString("[", ",", "]")},"count":${times.length}}"""

  /** What one listener serves from, swappable as ONE unit: the document
    * store, the driver-side maps built from it (None = live path), and
    * the store's measured entry count (the gating probe's evidence,
    * surfaced on `/servez`). Handlers read the CURRENT value per request,
    * so a [[ServingHandle.refresh]] is atomic from the wire's view —
    * in-flight requests finish against the state they started with. */
  private final case class ServingState(
      docs: DataFrame, cache: Option[ServingCache], entries: Long,
      /** Whether the store's stop_id is a numeric column — decides the
        * request-id canonicalization rule (see [[parseStopId]]). */
      numericKey: Boolean)

  /** A running listener plus its staleness contract. The serving maps are
    * built from the store AS OF startup; the engine also ships the feed
    * mutation faces (`transit_feed_upsert`, `transit_snapshot_ivm`) that
    * can change the store under a running listener — [[refresh]] is the
    * documented invalidation hook: hand it the post-upsert store and it
    * re-probes, re-decides cache-vs-live under the SAME mode the listener
    * was started with, rebuilds the maps (two grouped jobs — the same
    * cost as startup), and swaps atomically. Until refresh returns, the
    * listener keeps serving the pre-upsert snapshot — stale-but-consistent,
    * never mixed. */
  final class ServingHandle private[tools] (
      val server: HttpServer,
      svc: QueryService,
      mode: Option[Boolean],
      state: java.util.concurrent.atomic.AtomicReference[ServingState]) {
    def port: Int = server.getAddress.getPort
    /** Whether the CURRENT state serves from driver maps (true) or the
      * live DataFrame path (false). */
    def cached: Boolean = state.get.cache.isDefined
    def refresh(newDocs: DataFrame): Unit =
      state.set(HttpServe.resolveState(svc, newDocs, mode))
    def stop(delaySeconds: Int = 0): Unit = server.stop(delaySeconds)
  }

  /** The measured cache decision + build for one store: probe the entry
    * count, compare against [[ServingCache.maxCacheEntries]] (unless the
    * caller forced a mode), build the maps only when they fit. */
  private def resolveState(svc: QueryService, docs: DataFrame,
      mode: Option[Boolean]): ServingState = {
    val entries = ServingCache.storeEntries(docs)
    val useCache = mode.getOrElse(entries <= ServingCache.maxCacheEntries)
    ServingState(docs,
      if (useCache) Some(ServingCache.build(svc, docs)) else None, entries,
      numericKey = docs.schema("stop_id").dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType])
  }

  /** Start the listener; `port = 0` binds an ephemeral port (tests).
    *
    * `withCache = None` (the default) makes a MEASURED decision: probe
    * the store's schedule-entry count (one sum-of-array-sizes aggregate
    * over the resident store) and precompute the [[ServingCache]] maps
    * only when it fits under [[ServingCache.maxCacheEntries]] — the r12
    * listener collected unconditionally, which at 100× the certified sf1
    * store would collect an oversized store onto the driver by default.
    * Cached mode serves every request from driver memory (no Spark job on
    * the request path — the reference's own precompute-then-slice
    * architecture); over the ceiling the listener falls back to the live
    * DataFrame path (each request a Spark job over the cached store).
    * `Some(true)`/`Some(false)` force either path — the parity baseline
    * (`HttpServeParitySpec` byte-compares them) and the A/B lever.
    * `/servez` reports the decision and the probe's evidence. Handlers
    * run on a small pool — concurrent requests become concurrent lookups
    * (cached) or Spark jobs on the shared session (live). */
  def start(svc: QueryService, timetables: DataFrame, port: Int,
      withCache: Option[Boolean] = None): ServingHandle = {
    val state = new java.util.concurrent.atomic.AtomicReference(
      resolveState(svc, timetables, withCache))
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 64)
    // daemon workers: the listener must never pin the JVM open after
    // server.stop() (the session's lifecycle owns process exit)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"http-serve-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      }))

    val analytic: Map[String, (ServiceFilter, Limit) => DataFrame] = Map(
      "q1" -> (svc.q1(_, _)), "q2" -> (svc.q2(_, _)),
      "q3" -> (svc.q3(_, _)), "q4" -> (svc.q4(_, _)))
    analytic.foreach { case (name, f) =>
      server.createContext(s"/api/$name", handler { ex =>
        val st = state.get
        val p = params(ex)
        val service = ServiceFilter.fromParam(p.get("service_id"))
        val limit = Limit.fromParam(p.get("limit"))
        val items = st.cache match {
          case Some(c) =>
            // the unlimited slice is pre-rendered in canonical order;
            // the limit is a prefix take (the sort is total, so the
            // first n of the full ordering IS limit n)
            val rows = c.api((name, ServingCache.tagOf(service)))
            (limit match {
              case Limit.TopN(n) => rows.take(n)
              case Limit.All     => rows
            }).mkString("[", ",", "]")
          case None => itemsJson(f(service, limit))
        }
        (200, s"""{"items":$items}""")
      })
    }

    server.createContext("/get_stops", handler { _ =>
      val st = state.get
      (200, st.cache.fold(itemsJson(Timetable.getStops(st.docs)))(_.stopsBody))
    })

    server.createContext("/get_timetable", handler { ex =>
      val st = state.get
      params(ex).get("stop_id") match {
        case None =>
          (400, """{"error":"Missing 'stop_id' parameter"}""")
        case Some(raw) => parseStopId(st, raw) match {
          case None =>
            // boundary validation: the store key is BIGINT, so the live
            // path's ANSI comparison would THROW on a non-integral string
            // while the cached maps would 404 — reject it here so both
            // modes answer identically (same wording as unknown id)
            (404, s"""{"error":${jstr(s"Stop ID not found: $raw")}}""")
          case Some(sid) =>
            // engine face returns (route_long_name, trip_headsign, n_times,
            // comma-joined sorted times); [[renderTimetable]] re-assembles
            // the nested document at the presentation edge
            val rows: Seq[(Option[String], Option[String], String)] =
              st.cache match {
                case Some(c) => c.timetableRows(sid).getOrElse(Seq.empty)
                case None =>
                  Timetable.getTimetable(st.docs, sid).collect().toSeq
                    .map(r => (Option(r.getAs[String]("route_long_name")),
                      Option(r.getAs[String]("trip_headsign")),
                      r.getAs[String]("departure_times")))
              }
            if (rows.isEmpty)
              (404, s"""{"error":${jstr(s"Stop ID not found: $raw")}}""")
            else (200, renderTimetable(rows))
        }
      }
    })

    server.createContext("/get_routes_for_stop", handler { ex =>
      val st = state.get
      params(ex).get("stop_id") match {
        case None => (400, """{"error":"Missing 'stop_id' parameter"}""")
        case Some(raw) =>
          // unknown stop answers 200 [] on this route; a non-integral id
          // is the same "no such stop" case (see /get_timetable)
          val body = parseStopId(st, raw) match {
            case None => "[]"
            case Some(sid) => st.cache match {
              case Some(c) =>
                c.routesForStop(sid).map { case (short, head) =>
                  s"""{"route_short_name":${jstr(short)},"trip_headsign":${jstr(head)}}"""
                }.mkString("[", ",", "]")
              case None => itemsJson(Timetable.getRoutesForStop(st.docs, sid))
            }
          }
          (200, body)
      }
    })

    server.createContext("/get_arrivals", handler { ex =>
      val st = state.get
      val p = params(ex)
      p.get("stop_id") match {
        case None => (400, """{"error":"Missing 'stop_id' parameter"}""")
        case Some(raw) =>
          // a non-integral id behaves exactly like an unknown numeric one
          // on this route: empty flat/grouped renders (see /get_timetable)
          val sidOpt = parseStopId(st, raw)
          val service = ServiceFilter.fromParam(p.get("service_id"))
          (p.get("route_short_name"), p.get("trip_headsign")) match {
            case (Some(route), Some(head)) =>
              val times: Seq[String] = sidOpt.fold(Seq.empty[String]) { sid =>
                st.cache match {
                  case Some(c) => c.arrivalsFlat(sid, route, head, service)
                  case None => Timetable.getArrivalsFlat(st.docs, sid, route,
                    head, service).collect().toSeq
                    .map(_.getAs[String]("departure_time"))
                }
              }
              (200, renderFlat(times))
            case _ =>
              val rows: Seq[(Option[String], String, Long, String)] =
                sidOpt.fold(Seq.empty[(Option[String], String, Long, String)]) { sid =>
                  st.cache match {
                    case Some(c) => c.arrivalsGrouped(sid, service)
                    case None =>
                      Timetable.getArrivalsGrouped(st.docs, sid, service)
                        .collect().toSeq
                        .map(r => (Option(r.getAs[String]("route_short_name")),
                          r.getAs[String]("trip_headsign"),
                          r.getAs[Long]("n_arrivals"),
                          r.getAs[String]("departure_times")))
                  }
                }
              (200, renderGroups(rows))
          }
      }
    })

    server.createContext("/healthz", handler { _ => (200, """{"ok":true}""") })

    // the gating decision and its evidence, inspectable on the wire (and
    // asserted by the over-threshold parity face): which path this
    // listener serves from, the probed entry count, and the ceiling it
    // was compared against
    server.createContext("/servez", handler { _ =>
      val st = state.get
      (200, s"""{"cache":${st.cache.isDefined},"store_entries":${st.entries},"max_cache_entries":${ServingCache.maxCacheEntries}}""")
    })

    server.start()
    new ServingHandle(server, svc, withCache, state)
  }

  /** Standalone entry: build snapshots + document store, serve, then fire a
    * real-socket load test at itself and report latency percentiles (the
    * full-stack analog of [[ServeDaemon]]'s engine-side numbers — the delta
    * between the two IS the HTTP layer's cost). `SPARK_GRAFT_SERVE_FOREVER=1`
    * keeps the listener up for interactive use instead. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val port = if (args.length > 0) args(0).toInt else 8181
    val nReqs = if (args.length > 1) args(1).toInt else 1000
    val clients = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      // serving sessions shuffle TINY cached frames (a request touches one
      // stop's document or a pre-aggregated snapshot): 4 reducers keeps
      // per-request task dispatch ~free where the batch engines' 32 would
      // spend more time scheduling than computing. Builds that need width
      // (the one-off snapshot/store ETL) size their own barriers via
      // graft.Scale, so this dial only shapes request plans.
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = TransitTables.fromTpch(spark, sfDir)
    val snapDir = "target/tmp/http_serve_snapshots"
    QueryService.buildAnalyticsSnapshots(t, snapDir)
    val svc = new QueryService(t, Some(snapDir), cacheSnapshots = true)
    // serving copy of the document store: the build runs wide (its own
    // data-sized barrier), but the RESIDENT cache is a few thousand
    // nested rows — collapse to 4 partitions so a point-lookup request
    // schedules 4 scan tasks, not the build's grid
    val timetables = Timetable.buildStopTimetables(t).coalesce(4).cache()
    val stopIds = timetables.select("stop_id").limit(64).collect()
      .map(_.get(0).toString)
    val handle = start(svc, timetables, port)
    val bound = handle.port
    println(s"[http-serve] listening on :$bound (cache=${handle.cached})")

    if (sys.env.get("SPARK_GRAFT_SERVE_FOREVER").contains("1")) {
      Thread.currentThread.join() // serve until killed
      return
    }

    // self-load-test over a deterministic mixed route set
    val routes: IndexedSeq[String] =
      (for (s <- IndexedSeq("1", "2", "3", "4"); q <- Seq("q1", "q2", "q3", "q4"))
        yield s"/api/$q?service_id=$s&limit=20") ++
      stopIds.take(8).flatMap(id => Seq(
        s"/get_timetable?stop_id=$id",
        s"/get_routes_for_stop?stop_id=$id",
        s"/get_arrivals?stop_id=$id")) :+ "/get_stops"
    // Connection-REUSING client (java.net.http pools keep-alive
    // connections per client instance): the r12 generator opened a fresh
    // HttpURLConnection per request and its connection handling flattened
    // every route to a ~44 ms p50 plateau — the published number measured
    // the harness, not the server (two routes that bypassed it showed
    // 2.9-4.9 ms). One client per worker thread keeps each worker on its
    // own persistent connection, so per-route p50s now vary with the
    // actual response work.
    def newClient() = java.net.http.HttpClient.newBuilder()
      .version(java.net.http.HttpClient.Version.HTTP_1_1).build()
    def get(client: java.net.http.HttpClient, path: String): Int =
      client.send(
        java.net.http.HttpRequest.newBuilder(
          new java.net.URI(s"http://127.0.0.1:$bound$path")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray()).body().length
    val warmClient = newClient()
    routes.foreach(get(warmClient, _)) // warm every route once
    val lat = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(clients,
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r); t.setDaemon(true); t
        }
      })
    val perThread = ThreadLocal.withInitial(
      new java.util.function.Supplier[java.net.http.HttpClient] {
        def get(): java.net.http.HttpClient = newClient()
      })
    // wall-clock window bounds to stderr: a GC-log-annotated run (p99
    // tail attribution) needs to intersect pause timestamps with the
    // measured window, not the whole process lifetime (startup ETL GCs
    // would otherwise dominate the correlation)
    System.err.println(s"[http-serve] load_window_start_ms=${System.currentTimeMillis}")
    val t0 = System.nanoTime()
    (0 until nReqs).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val path = routes(i % routes.size)
          val s = System.nanoTime()
          get(perThread.get(), path)
          lat.add((path.drop(1).takeWhile(c => c != '?' && c != '/'),
            (System.nanoTime() - s) / 1e6))
        }
      })
    }.foreach(_.get())
    val wallSec = (System.nanoTime() - t0) / 1e9
    System.err.println(s"[http-serve] load_window_end_ms=${System.currentTimeMillis}")
    pool.shutdown()
    handle.stop()

    import scala.jdk.CollectionConverters._
    val all = lat.asScala.toVector
    def pct(xs: Vector[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, (p * s.size).toInt))
    }
    val perRoute = all.groupBy(_._1).toSeq.sortBy(_._1).map { case (r, vs) =>
      val xs = vs.map(_._2)
      f""""$r":{"n":${xs.size},"p50_ms":${pct(xs, 0.50)}%.1f,"p95_ms":${pct(xs, 0.95)}%.1f}"""
    }.mkString(",")
    val xs = all.map(_._2)
    val json =
      f"""{"metric":"http_serve","sf":"$sfDir","n":$nReqs,"clients":$clients,"req_per_sec":${nReqs / wallSec}%.1f,"p50_ms":${pct(xs, 0.50)}%.1f,"p95_ms":${pct(xs, 0.95)}%.1f,"p99_ms":${pct(xs, 0.99)}%.1f,$perRoute}"""
    println(json)
    // one JSONL row per measured scale (the sf1 cert must not clobber the
    // sf0.1 row): replace any prior row for THIS sfDir, keep the rest
    val out = java.nio.file.Paths.get("reports/http_serve.json")
    java.nio.file.Files.createDirectories(out.getParent)
    val prior =
      if (java.nio.file.Files.exists(out))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(out)).asScala.toSeq
          .filterNot(l => l.contains("\"sf\":\"" + sfDir + "\"") || l.isBlank)
      else Seq.empty
    java.nio.file.Files.write(out,
      ((prior :+ json).mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
