package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Parquet table loaders for the driver corpus (TESTDATA.md).
  *
  * All queries read through here so column pruning / predicate pushdown
  * behavior is uniform. At 100 TB these reads become partitioned parquet
  * scans on a cluster; nothing here assumes local mode.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** `events.ts` has shipped in three physical encodings across driver
    * corpus versions: TIMESTAMP(NANOS) (read as raw int64 nanos via the
    * legacy conf), TIMESTAMP_NTZ micros, and TZ-adjusted TIMESTAMP
    * micros. Normalize all three to a session-TZ TimestampType whose
    * epoch equals the file's wall-clock read as UTC — every downstream
    * `unix_timestamp(ts)` is then TZ-free and matches DuckDB's
    * `epoch(ts)` on the same file. Callers must run with
    * `spark.sql.session.timeZone=UTC` (Verify/Bench/specs all do). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Exact-sum helper: doubles summed across partitions are
    * order-dependent; converting each term to int64 "cents" first makes
    * the aggregate exact and bit-identical to any other engine (the
    * per-row double expression is deterministic IEEE arithmetic; only the
    * accumulation order varies). Use for every order-sensitive money/qty
    * sum that must hash-match the DuckDB oracle.
    */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** cents → double dollars; exact int64 → double conversion is
    * well-defined and identical across engines. */
  def dollars(c: Column): Column = c.cast("double") / lit(100.0)
}
