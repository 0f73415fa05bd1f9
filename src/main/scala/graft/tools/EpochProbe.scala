package graft.tools

/** Standalone runner for the box-epoch calibration probe
  * ([[graft.Bench.epochProbe]]): prints the same `{cpu_sec, disk_sec}`
  * shape the bench contract line embeds, so a quiet-box check or an
  * adjudication note can measure "is the box in the same epoch as that
  * board?" without running a board. Every reading also appends to the
  * standing ledger (`reports/epoch_ledger.jsonl`), building the
  * time-series that locates epoch flips. */
object EpochProbe {
  def main(args: Array[String]): Unit = {
    val (cpu, disk) = graft.Bench.epochProbe()
    graft.Bench.appendEpochLedger(cpu, disk, "standalone")
    println(f"""{"metric":"epoch_probe","cpu_sec":$cpu%.3f,"disk_sec":$disk%.3f}""")
  }
}
