package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** Covers `tools/standing_scaling.py --cross-round` (VERDICT r14 asks
  * #1b + #5) — the same-SF board-pair comparator whose transfer check
  * flags same-code board divergence (total ratio > 1.15x) REGARDLESS of
  * probe agreement: the r14 driver/builder sf0.1 pair diverged 23% while
  * every probe component sat inside tolerance, so probe agreement alone
  * must never certify two boards as comparable. The spec drives the real
  * script through python3 on fixture sidecars; it cancels (not fails) on
  * a box without python3 — the tool itself is driver-side tooling, not
  * engine code.
  *
  * Real-pair validation lives in reports/cross_round_r14_builder_vs_driver
  * .json (the archived r14 sidecars); this spec pins the decision logic
  * on minimal fixtures. */
class CrossRoundToolSpec extends AnyFunSuite {

  private val om = new ObjectMapper()

  private def havePython: Boolean =
    try new ProcessBuilder("python3", "--version").start().waitFor() == 0
    catch { case _: Exception => false }

  /** A minimal sidecar: two queries, a probe, an sf tag. */
  private def sidecar(dir: Path, name: String, q1: Double, q2: Double,
      probe: Option[(Double, Double, Double, Double)],
      sf: String = "/x/testdata/sf0.1"): Path = {
    val probeJson = probe.map { case (c, d, p, r) =>
      f""""epoch_probe":{"cpu_sec":$c%.3f,"disk_sec":$d%.3f,"par_cpu_sec":$p%.3f,"rfsync_sec":$r%.3f},"""
    }.getOrElse("")
    val body =
      f"""{"metric":"total_query_time","value":${q1 + q2}%.3f,"unit":"sec",$probeJson"sf":"$sf","queries":{"fam1_a":{"cold":${q1 * 2}%.3f,"warm":$q1%.3f},"fam2_b":{"cold":${q2 * 2}%.3f,"warm":$q2%.3f}}}"""
    val p = dir.resolve(name)
    Files.write(p, body.getBytes(UTF_8))
    p
  }

  private def run(a: Path, b: Path, out: Path, extra: Seq[String] = Nil): (Int, String) = {
    val pb = new ProcessBuilder(
      (Seq("python3", "tools/standing_scaling.py",
        "--cross-round", a.toString, b.toString, "--out", out.toString)
        ++ extra): _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val text = new String(proc.getInputStream.readAllBytes(), UTF_8)
    (proc.waitFor(), text)
  }

  private def runTool(args: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(
      (Seq("python3", "tools/standing_scaling.py") ++ args): _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val text = new String(proc.getInputStream.readAllBytes(), UTF_8)
    (proc.waitFor(), text)
  }

  test("diverging totals flag BOARD DIVERGENCE even when probes agree (r14 class)") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_spec")
    try {
      val probe = Some((7.4, 2.0, 2.2, 0.46))
      // 23% total divergence, identical probes — the exact r14 shape
      val a = sidecar(dir, "a.json", 10.0, 10.0, probe)
      val b = sidecar(dir, "b.json", 12.3, 12.3, probe)
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out)
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(node.get("board_divergence").asBoolean,
        "1.23x same-code total must flag regardless of probe agreement")
      assert(!node.get("epoch").get("cross_epoch").asBoolean)
      assert(math.abs(node.get("total_ratio").asDouble - 1.23) < 0.01)
      assert(text.contains("BOARD DIVERGENCE"))
      assert(text.contains("under-resolution"),
        "probe-agreed divergence must name the r14 under-resolution class")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("agreeing totals with diverging probes flag CROSS-EPOCH, not divergence") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_spec2")
    try {
      val a = sidecar(dir, "a.json", 10.0, 10.0, Some((7.4, 2.0, 2.2, 0.46)))
      // totals within 1.15x but the rfsync leg 1.6x out (a device epoch)
      val b = sidecar(dir, "b.json", 10.5, 10.5, Some((7.4, 2.0, 2.2, 0.74)))
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out)
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(!node.get("board_divergence").asBoolean)
      assert(node.get("epoch").get("cross_epoch").asBoolean)
      val comp = node.get("epoch").get("components").get("rfsync_sec")
      assert(comp.get("flag").asBoolean)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("all-non-positive probe reads as missing, not as a passing epoch check") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_spec3")
    try {
      // the writeArtifacts default when a caller omits the probe
      val a = sidecar(dir, "a.json", 10.0, 10.0, Some((0.0, 0.0, 0.0, 0.0)))
      val b = sidecar(dir, "b.json", 10.0, 10.0, Some((7.4, 2.0, 2.2, 0.46)))
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out)
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(!node.get("epoch").get("comparable").asBoolean,
        "zeroed probe must be treated as missing (ADVICE r14)")
      assert(node.get("epoch").get("reason").asText.contains("non-positive"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("epoch flag is symmetric in ratio space (ADVICE r15)") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_sym")
    try {
      // rfsync tol 0.20: a 0.80x-FASTER leg is a 1.25x gap and must flag —
      // the old abs(r-1) form passed it while flagging its 1.21x mirror
      val a = sidecar(dir, "a.json", 10.0, 10.0, Some((7.4, 2.0, 2.2, 0.46)))
      val b = sidecar(dir, "b.json", 10.0, 10.0, Some((7.4, 2.0, 2.2, 0.368)))
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out)
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(node.get("epoch").get("cross_epoch").asBoolean,
        "a faster-direction epoch gap must flag like its slower mirror")
      assert(node.get("epoch").get("components").get("rfsync_sec")
        .get("flag").asBoolean)
      assert(!node.get("board_divergence").asBoolean)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("a zero-warm leg with real cost on the other side is a divergent face (ADVICE r15)") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_zero")
    try {
      val probe = Some((7.4, 2.0, 2.2, 0.46))
      // fam1_a: 0.0 -> 5.0 s — ratio undefined, but the MOST divergent
      // possible shape; the old truthiness filter silently dropped it
      val a = sidecar(dir, "a.json", 0.0, 10.0, probe)
      val b = sidecar(dir, "b.json", 5.0, 10.0, probe)
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out)
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(node.get("divergent_faces").has("fam1_a"),
        "ratio-less zero-small faces must not vanish from the report")
      assert(node.get("divergent_faces").get("fam1_a").get("ratio").isNull)
      assert(text.contains("no ratio"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("empirical face bands: in-band fsync swing passes, out-of-band cpu swing flags (VERDICT r15 ask #1)") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_bands")
    try {
      val probe = Some((7.4, 2.0, 2.2, 0.46))
      // three same-code boards: fam1_a (an fsync-family face) swings 2.8x
      // across them; fam2_b (cpu-bound) holds within 1.02x
      val s1 = sidecar(dir, "s1.json", 1.0, 10.0, probe)
      val s2 = sidecar(dir, "s2.json", 2.0, 10.0, probe)
      val s3 = sidecar(dir, "s3.json", 2.8, 10.2, probe)
      val bands = dir.resolve("bands.json")
      val (brc, btext) = runTool(Seq("--face-bands", s1.toString, s2.toString,
        s3.toString, "--out", bands.toString))
      assert(brc == 0, btext)
      val bnode = om.readTree(Files.readAllBytes(bands))
      assert(math.abs(bnode.get("faces").get("fam1_a").get("swing").asDouble - 2.8) < 0.01)
      assert(math.abs(bnode.get("faces").get("fam2_b").get("swing").asDouble - 1.02) < 0.01)
      // the transfer check consuming the bands: fam1_a moves 2.5x (INSIDE
      // its 2.8*1.25=3.5x allowance — the flat 2x cut over-flagged exactly
      // this shape) while fam2_b moves 1.5x (OUTSIDE its tight band, which
      // floors at 1.3x since 1.02*1.25 < 1.3 — the flat cut missed it)
      val a = sidecar(dir, "a.json", 1.0, 10.0, probe)
      val b = sidecar(dir, "b.json", 2.5, 15.0, probe)
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out,
        extra = Seq("--bands", bands.toString))
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(!node.get("divergent_faces").has("fam1_a"),
        "a swing inside the face's own measured band must not flag")
      assert(node.get("divergent_faces").has("fam2_b"),
        "a swing outside a tight band must flag even under the flat 2x cut")
      assert(node.get("divergent_faces").get("fam2_b").get("allowed").asDouble == 1.3)
      assert(node.get("face_cut").get("mode").asText == "empirical_bands")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("ledger-derived probe tolerances: outlier rows excluded, tolerances feed epoch_cmp (VERDICT r15 ask #4)") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_ledger")
    try {
      // fixture ledger: three idle pinned-size rows, one pre-pin outlier
      // (the real ledger carries four such rows measured at smaller leg
      // sizes before the size-pin landed — they must not widen the band),
      // and one probe bracketing a load experiment (idle-context filter:
      // deliberately-loaded readings must not widen the band either)
      val ledger = dir.resolve("ledger.jsonl")
      val rows = Seq(
        """{"ts_ms":1,"cpu_sec":7.2,"disk_sec":2.0,"par_cpu_sec":2.2,"rfsync_sec":0.45,"context":"bench:sf0.1"}""",
        """{"ts_ms":2,"cpu_sec":7.4,"disk_sec":2.1,"par_cpu_sec":2.25,"rfsync_sec":0.46,"context":"standalone"}""",
        """{"ts_ms":3,"cpu_sec":7.5,"disk_sec":2.2,"par_cpu_sec":2.3,"rfsync_sec":0.47,"context":"repeatability-1"}""",
        """{"ts_ms":4,"cpu_sec":3.0,"disk_sec":0.9,"par_cpu_sec":1.05,"rfsync_sec":0.02,"context":"repeatability-0-pre-pin"}""",
        """{"ts_ms":5,"cpu_sec":8.9,"disk_sec":3.4,"par_cpu_sec":3.3,"rfsync_sec":1.8,"context":"gtfs-ab-post"}""")
      Files.write(ledger, rows.mkString("", "\n", "\n").getBytes(UTF_8))
      val tolPath = dir.resolve("tol.json")
      val (lrc, ltext) = runTool(Seq("--ledger-bands", ledger.toString,
        "--out", tolPath.toString))
      assert(lrc == 0, ltext)
      val tnode = om.readTree(Files.readAllBytes(tolPath))
      assert(tnode.get("n_rows_idle").asInt == 4,
        "the loaded gtfs-ab bracket row must be dropped by context")
      assert(tnode.get("contexts_dropped").get(0).asText == "gtfs-ab-post")
      val cpu = tnode.get("legs").get("cpu_sec")
      assert(cpu.get("n_used").asInt == 3)
      assert(cpu.get("n_excluded").asInt == 1,
        "the pre-pin 3.0s row must be median-filtered out, not widen the band")
      // tight idle spread floors at 0.05 — tighter than the hand-pinned 0.10
      assert(cpu.get("tolerance").asDouble == 0.05)
      assert(ltext.contains("hand-pinned"), "provenance must be printed")
      // wiring: a cpu gap of 1.07x sits INSIDE the hand tolerance (0.10)
      // but OUTSIDE the ledger-derived 0.05 — passing --tolerances must
      // flip the verdict to cross-epoch
      val a = sidecar(dir, "a.json", 10.0, 10.0, Some((7.0, 2.0, 2.2, 0.46)))
      val b = sidecar(dir, "b.json", 10.0, 10.0, Some((7.5, 2.0, 2.2, 0.46)))
      val outHand = dir.resolve("out_hand.json")
      val (rc1, t1) = run(a, b, outHand)
      assert(rc1 == 0, t1)
      assert(!om.readTree(Files.readAllBytes(outHand))
        .get("epoch").get("cross_epoch").asBoolean)
      val outLedger = dir.resolve("out_ledger.json")
      val (rc2, t2) = run(a, b, outLedger,
        extra = Seq("--tolerances", tolPath.toString))
      assert(rc2 == 0, t2)
      val node = om.readTree(Files.readAllBytes(outLedger))
      assert(node.get("epoch").get("cross_epoch").asBoolean)
      assert(node.get("epoch").get("components").get("cpu_sec")
        .get("tolerance").asDouble == 0.05)
      assert(node.get("epoch_tolerances_source").asText == tolPath.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("per-query divergent faces and probe-normalized totals are reported") {
    assume(havePython, "python3 not on PATH")
    val dir = Files.createTempDirectory("cross_round_spec4")
    try {
      // one face 3x out, one flat; cpu probe 1.1x out (but inside tol)
      val a = sidecar(dir, "a.json", 2.0, 10.0, Some((7.0, 2.0, 2.2, 0.46)))
      val b = sidecar(dir, "b.json", 6.0, 10.0, Some((7.5, 2.0, 2.2, 0.46)))
      val out = dir.resolve("out.json")
      val (rc, text) = run(a, b, out)
      assert(rc == 0, text)
      val node = om.readTree(Files.readAllBytes(out))
      assert(node.get("divergent_faces").has("fam1_a"))
      assert(!node.get("divergent_faces").has("fam2_b"))
      assert(math.abs(node.get("family_ratios").get("fam1").get("ratio").asDouble - 3.0) < 0.01)
      val norm = node.get("total_ratio_probe_normalized")
      assert(norm.has("cpu_sec") && norm.get("cpu_sec").asDouble > 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
