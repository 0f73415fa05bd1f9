package graft.tools

/** Standalone runner for the box-epoch calibration probe
  * ([[graft.Bench.epochProbe]]): prints the same four-leg
  * `{cpu_sec, disk_sec, par_cpu_sec, rfsync_sec}` shape the bench
  * contract line embeds, so a quiet-box check or an adjudication note can
  * measure "is the box in the same epoch as that board?" without running
  * a board. Every reading also appends to the standing ledger
  * (`reports/epoch_ledger.jsonl`), building the time-series that locates
  * epoch flips. An optional first arg names the reading's context in the
  * ledger (default "standalone"). */
object EpochProbe {
  def main(args: Array[String]): Unit = {
    val context = args.headOption.getOrElse("standalone")
    val probe = graft.Bench.epochProbe()
    graft.Bench.appendEpochLedger(probe, context)
    println(s"""{"metric":"epoch_probe",${probe.json.stripPrefix("{")}""")
  }
}
