package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-sized parallelism dials — the generalization of
  * `Dedup.ccPartitions` (partitions from data volume, floored at the
  * session's cluster-size dial, capped) to every heavy pipeline.
  *
  * The round-9 sf10 rehearsal showed why a FIXED
  * `spark.sql.shuffle.partitions` fails at scale: with 32 reducers over
  * 100× the tuned volume, per-task aggregation state outgrows the
  * execution-memory pool's per-task share and tasks serialize on memory
  * acquisition (thread-dump: 18 of 19 task threads parked, one runnable).
  * The engine doctrine — "size shuffle partitions so partitions fit
  * executor memory" — has to be wired, not configured by hand per run:
  *
  *  1. [[initialShufflePartitions]] sizes the SESSION's AQE starting grid
  *     (`spark.sql.adaptive.coalescePartitions.initialPartitionNum`) from
  *     the input directory's file bytes. AQE then coalesces small
  *     shuffles back down at runtime from REAL sizes — so small-SF runs
  *     keep today's plans bit-for-bit while sf10+ shuffles fan out.
  *  2. [[shufflePartitionsFor]] sizes an EXPLICIT repartition barrier from
  *     a frame's Catalyst scan statistics (parquet file bytes — no job
  *     runs), for pipelines whose shuffled volume EXPANDS past the input
  *     (gram explodes: ~1.3 hash-bytes per text byte, plus hash-agg
  *     state) and whose barrier doubles as the shared exchange both the
  *     aggregate and the join-back consumer reuse.
  *
  * Neither dial moves any value: partitioning never changes a registered
  * query's rows, so CORRECTNESS hashes are untouched by construction.
  */
object Scale {

  /** Post-shuffle bytes a single task should own — matches AQE's
    * advisoryPartitionSizeInBytes default (64 MB): comfortably inside an
    * executor-core's memory share even with hash-agg overhead. */
  val BytesPerPartition: Long = 64L << 20

  /** Ceiling on any data-sized partition count — the cluster-size guard
    * against a mis-stated input size scheduling a million tasks. At the
    * cap, one stage is 4096 × 64 MB = 256 GB of post-shuffle state; a
    * 100 TB corpus shuffling more than that per stage should raise the
    * cap via `graft.scale.maxShufflePartitions`, not silently exceed it. */
  val MaxPartitionsKey = "graft.scale.maxShufflePartitions"
  val DefaultMaxPartitions = 4096

  /** Worst-case bytes a heavy pipeline shuffles per input byte — gram
    * explodes emit ~1.3 hash bytes per text byte and aggregation state
    * triples it; 8 covers every registered pipeline with slack. Used for
    * the session grid, which must be sized for the LARGEST shuffle (AQE
    * only coalesces DOWN from the initial grid, never splits UP). */
  val MaxExpansion = 8L

  private def cap(spark: SparkSession): Int =
    spark.conf.getOption(MaxPartitionsKey).map(_.toInt)
      .getOrElse(DefaultMaxPartitions)

  private def clamp(scaled: Long, floor: Int, cap: Int): Int =
    math.max(floor.toLong, math.min(cap.toLong, scaled)).toInt

  /** Session AQE starting grid from the input directory's on-disk bytes:
    * ceil(bytes · [[MaxExpansion]] / 64 MB), floored at `floor` (the
    * core count / configured shuffle.partitions — today's behavior at
    * small SF), capped at [[DefaultMaxPartitions]]. Call at session build,
    * before a SparkSession exists — hence the raw-file walk and the
    * default cap. */
  def initialShufflePartitions(sfDir: String, floor: Int): Int = {
    val bytes =
      try {
        val root = java.nio.file.Paths.get(sfDir)
        if (!java.nio.file.Files.isDirectory(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      } catch { case _: Throwable => 0L }
    clamp((bytes * MaxExpansion + BytesPerPartition - 1) / BytesPerPartition,
      floor, DefaultMaxPartitions)
  }

  /** Explicit-repartition size for a heavy stage fed by `df`: scan bytes
    * (Catalyst plan statistics — parquet footer sizes, no job) times the
    * stage's expansion factor, in 64 MB units, floored at the session's
    * shuffle.partitions, capped. Expansion ≈ shuffled bytes per scanned
    * byte INCLUDING aggregation-state overhead (gram pipelines use 4:
    * ~1.3 hash bytes per text byte × ~3× hash-map overhead). */
  def shufflePartitionsFor(df: DataFrame, expansion: Double = 4.0): Int = {
    val spark = df.sparkSession
    val floor = spark.sessionState.conf.numShufflePartitions
    val bytes = BigDecimal(df.queryExecution.optimizedPlan.stats.sizeInBytes)
    val scaled = (bytes * expansion / BytesPerPartition)
      .setScale(0, BigDecimal.RoundingMode.CEILING)
    clamp(if (scaled.isValidLong) scaled.toLong else Long.MaxValue,
      floor, cap(spark))
  }
}
