package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Initial-snapshot scan: every existing row becomes a synthetic INSERT
  * change (reference triggers.go:225-321, SURVEY.md §2.1 S3-S5).
  *
  * The reference walks each table serially with keyset pagination — and
  * has a composite-key bug: its next-page predicate `a > ? AND b > ?` is
  * not a lexicographic row-value comparison and can skip rows
  * (triggers.go:557-564; SURVEY.md §3.3). Spark replaces the serial walk
  * with a partition-parallel scan, which eliminates the pagination
  * cursor entirely — there is no predicate to get wrong, and the scan
  * parallelizes across executors (each JDBC partition reads one key
  * range; for parquet snapshots the splits are free).
  */
object Bootstrap {

  /** Project a snapshot DataFrame to Change records.
    *
    * BLOB (binary) columns follow reference semantics: dropped unless
    * blobSupport, hex()-encoded upper-case when enabled (reference
    * triggers.go:464-481; Spark's `hex` matches SQLite's, both upper).
    *
    * `timestamp`: the reference stamps bootstrap changes with the engine
    * clock at scan time (triggers.go:259-265). Injectable here — pass a
    * fixed instant for deterministic replays; defaults to now().
    */
  def snapshotToChanges(
      table: String,
      snapshot: DataFrame,
      blobSupport: Boolean = false,
      timestamp: Option[java.sql.Timestamp] = None): Dataset[Change] = {
    val spark = snapshot.sparkSession
    import spark.implicits._
    val imageCols: Seq[Column] = snapshot.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case BinaryType if !blobSupport => None
        case BinaryType                 => Some(hex(col(f.name)).as(f.name))
        case _                          => Some(col(f.name))
      }
    }
    val ts = timestamp.getOrElse(new java.sql.Timestamp(System.currentTimeMillis()))
    snapshot.select(
      lit(table).as("table"),
      lit(ts).as("timestamp"),
      lit(Operation.Insert.name).as("operation"),
      lit(null).cast("string").as("before"),
      to_json(struct(imageCols: _*)).as("after"))
      .as[Change]
  }

  /** Snapshot a table over JDBC with partition-parallel reads. For rowid
    * tables partition on rowid bounds; for WITHOUT-ROWID tables pass the
    * first PK column. This subsumes the reference's keyset pagination
    * (S4) — partition bounds are computed once from min/max, and each
    * partition is an independent range scan. */
  def snapshotJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame = {
    // min/max bounds via a 1-row pushed query (driver-side, cheap)
    val bounds = spark.read.format("jdbc").option("url", url)
      .option("query", s"SELECT MIN($partitionColumn) lo, MAX($partitionColumn) hi FROM $table")
      .load().collect().head
    if (bounds.isNullAt(0)) spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
    else spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", bounds.get(0).toString)
      .option("upperBound", bounds.get(1).toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }
}
