package graft

/** The data-sized parallelism dials: floors keep small scales on today's
  * plans, caps bound runaway inputs, and the session-geometry tuner derives
  * its knobs from ROW counts (byte stats are encoding-blind — the round-10
  * sf10 finding: 86.6 M rows pack into 274 MB of parquet, so every
  * byte-derived decision sat at its floor while stages collapsed to one
  * task). */
class ScaleSpec extends SparkSpec {

  test("partitionsForRows: floor at session grid, linear above, capped") {
    val floor = spark.sessionState.conf.numShufflePartitions
    // small inputs stay on the session grid — today's plans bit-for-bit
    assert(Scale.partitionsForRows(spark, 0L, 160000L) == floor)
    assert(Scale.partitionsForRows(spark, 160000L * floor, 160000L) == floor)
    // 60 M rows at 160 k/task (the sf10 document build) → 375 tasks
    assert(Scale.partitionsForRows(spark, 60000000L, 160000L) == 375)
    // a mis-stated input cannot schedule a million tasks
    assert(Scale.partitionsForRows(spark, Long.MaxValue / 4, 1L) ==
      Scale.DefaultMaxPartitions)
  }

  test("partitionsForChars: gram volume in ~1M-char tasks") {
    val floor = spark.sessionState.conf.numShufflePartitions
    assert(Scale.partitionsForChars(spark, 1L << 20) == floor)
    // the sf10 corpus (246 M chars) → ~235 gram-barrier tasks
    val sf10 = Scale.partitionsForChars(spark, 246000000L)
    assert(sf10 > 200 && sf10 < 300, sf10.toString)
  }

  test("tuneSessionGrid: small dirs keep the floor AND stock scan geometry") {
    val floor = spark.sessionState.conf.numShufflePartitions
    val stockSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val stockFactor = spark.conf.get("spark.sql.sources.fileCompressionFactor")
    val stockAdvisory =
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val grid = Scale.tuneSessionGrid(spark, "/root/testdata/sf0.001")
    assert(grid == floor, s"sf0.001 must stay on the session grid, got $grid")
    // the r12 generalized deadband: below grid activation, EVERY session
    // knob stays at stock — the small-SF board must not pay the
    // heavy-pipeline insurance premium (the r11 sf0.1 +5.7% regression)
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == stockSplit)
    assert(spark.conf.get("spark.sql.sources.fileCompressionFactor") == stockFactor)
    assert(spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      == stockAdvisory)
  }

  test("grid deadband: floor until 4x, data-sized above") {
    // sub-4x grids pay the per-shuffle fan-out tax on every query for a
    // benefit that only exists once floor tasks outgrow ~4 advisory units
    assert(Scale.deadband(33, 32) == 32)
    assert(Scale.deadband(65, 32) == 32)   // the measured sf1 case
    assert(Scale.deadband(127, 32) == 32)
    assert(Scale.deadband(128, 32) == 128) // exactly 4x activates
    assert(Scale.deadband(650, 32) == 650) // the sf10 regime
  }

  test("deadband activates on the pre-clamp value, then clamps") {
    // the r11 ADVICE case: cap below 4x floor. The post-clamp form could
    // never see a value >= 4x floor and pinned the grid to the floor at
    // every data size; activation must read the RAW data-sized value.
    assert(Scale.deadbandThenClamp(650L, 32, 100) == 100)
    assert(Scale.deadbandThenClamp(5000L, 1024, 2048) == 2048)
    // below 4x floor the deadband still holds the floor
    assert(Scale.deadbandThenClamp(65L, 32, 100) == 32)
    assert(Scale.deadbandThenClamp(127L, 32, 4096) == 32)
    // at/above 4x floor with room under the cap: data-sized wins
    assert(Scale.deadbandThenClamp(128L, 32, 4096) == 128)
    assert(Scale.deadbandThenClamp(650L, 32, 4096) == 650)
  }

  test("tuneSessionGrid: >=2M rows activates the knobs under a floor grid") {
    // the r12 sf1 chain-leg lesson: gating the scan/shuffle knobs on the
    // GRID deadband alone cost +57 s at sf1 — the grid holds the floor
    // until ~17 M rows while the stock 64 MB AQE advisory already packs
    // sf1's mid-size iterative shuffles into 1-3 reduce tasks on 32 cores.
    // rows >= KnobRowsFloor must activate the knobs with the grid still
    // at the floor.
    val keys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.sources.fileCompressionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val stock = keys.map(k => k -> spark.conf.get(k))
    val dir = java.nio.file.Files.createTempDirectory("scale_knobs").toString
    try {
      // 2.05 M rows: above KnobRowsFloor (2 M) while the rows-sized grid
      // (2.05M*64*8/64MB = 15) still sits under this session's deadband
      // (4*floor=16 at the test floor of 4) — the exact regime the fix
      // exists for: knobs on, grid at the floor
      spark.range(2050000L).selectExpr("id as o_orderkey",
        "cast(id % 997 as string) as o_comment")
        .write.parquet(s"$dir/orders.parquet")
      val floor = spark.sessionState.conf.numShufflePartitions
      val grid = Scale.tuneSessionGrid(spark, dir)
      assert(grid == floor, s"2.05 M rows must stay under the grid deadband, got $grid")
      assert(spark.conf.get(keys.head) != stock.head._2,
        ">=2M rows must re-size the scan split despite the floor grid")
      val split = spark.conf.get(keys.head).toLong
      assert(split >= (4L << 20) && split < (128L << 20), split.toString)
      assert(spark.conf.get(keys(1)).toDouble >= 1.0)
      assert(spark.conf.get(keys(2)).toLong <= (64L << 20))
    } finally {
      stock.foreach { case (k, v) => spark.conf.set(k, v) }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tuneSessionGrid: a missing dir is a safe no-op at the floor") {
    val floor = spark.sessionState.conf.numShufflePartitions
    assert(Scale.tuneSessionGrid(spark, "/nonexistent/dir") == floor)
  }
}
