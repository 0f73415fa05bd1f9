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

  private def run(a: Path, b: Path, out: Path): (Int, String) = {
    val pb = new ProcessBuilder("python3", "tools/standing_scaling.py",
      "--cross-round", a.toString, b.toString, "--out", out.toString)
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
