package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine inputs come through here so scans stay uniform: parquet
  * relations with full filter/column pushdown (Catalyst `PushedFilters`
  * and `ReadSchema` pruning apply automatically — verified via
  * `.explain("formatted")` in the specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred schema per (sfDir, table), cached for the life of the JVM
    * (r16, guide §1.2 — per-task work includes the DRIVER's): a bare
    * `spark.read.parquet(path)` runs footer schema inference on EVERY
    * construction — measured ~0.25 s per call on this box — and a 296-
    * query board constructs each base table thousands of times (a single
    * dedup face constructs `documents` 3–5×). The schema of a driver-
    * provided table never changes within a run, so one inference per
    * (dir, table) is the honest cost; this caches METADATA only — no
    * result rows, no statistics — and the construction becomes
    * `spark.read.schema(cached).parquet(path)`, byte-identical plans.
    * Keyed by sfDir so multi-SF sessions (Verify at one SF + a bench at
    * another) can never cross-wire schemas. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val sch = schemaCache.computeIfAbsent((sfDir, name),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` has shipped as two physical types across driver data
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses to read natively,
    * [PARQUET_TYPE_ILLEGAL] — read nanos as long and convert with integer
    * division, never through double: ~1.7e18 ns exceeds the 2^53
    * exact-double range) and plain TIMESTAMP(MICROS) without the UTC
    * adjustment flag (surfaces as TIMESTAMP_NTZ). Normalize both to
    * session-zoned TimestampType here so every downstream operator sees one
    * schema; all entry points pin `spark.sql.session.timeZone=UTC`, so the
    * NTZ cast is value-preserving and matches DuckDB's naive read. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // SCOPED to this read, not leaked session-wide: the legacy flag is
    // consulted at schema-inference time only (verified against a genuine
    // TIMESTAMP(NANOS) file: inference under the flag reads LongType and
    // execution after restore still succeeds), and leaving it set would
    // silently read any OTHER nanos column in the session as raw longs —
    // the exact misinterpretation hazard this loader exists to absorb.
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    val raw =
      try load(spark, sfDir, "events")
      finally prev match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None    => spark.conf.unset(nanosKey)
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // fail LOUDLY on the next schema drift: a catch-all cast (e.g. from
        // string) would yield silent NULLs — the exact hazard this loader
        // exists to absorb
        throw new IllegalStateException(
          s"events.ts shipped as unexpected physical type $other; " +
            "extend Tables.events with an explicit, value-preserving conversion")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
