package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The change-log relation: one append-only, totally-ordered stream of
  * changes from all monitored tables (reference triggers.go:410-419).
  * `id` is the offset — directly analogous to a Kafka offset.
  *
  * Two implementations:
  *  - [[JdbcChangeLog]]: the log lives in the source database (SQLite in
  *    real deployments; any JDBC database structurally). This is the
  *    reference's own topology.
  *  - [[ParquetChangeLog]]: the log landed in parquet. This is the 100 TB
  *    topology — a single SQLite file caps throughput, so the scale
  *    design drains the SQLite log into partitioned parquet early and
  *    does all heavy processing there (SURVEY.md §7.4).
  */
trait ChangeLog {
  /** Ordered batch: log rows with id > afterId, ascending, at most
    * `limit` (reference drainChanges, triggers.go:164-223). */
  def readBatch(spark: SparkSession, afterId: Long, limit: Int): DataFrame

  /** Full log contents past an offset (no limit) — used by streaming
    * consumers that manage their own batching. */
  def readFrom(spark: SparkSession, afterId: Long): DataFrame

  /** Ack: changes up to and including uptoId are delivered; they may be
    * physically deleted or logically retired (at-least-once contract,
    * reference triggers.go:209-221). */
  def truncate(uptoId: Long): Unit

  /** Low-water mark: offsets <= this are already delivered. */
  def committedOffset: Long
}

/** Parquet-backed change log. Appends land as parquet files; delivery
  * offsets are tracked in a small watermark file next to the data
  * ("truncation" is logical — parquet is immutable; physical retention is
  * a separate compaction concern, same at-least-once contract).
  *
  * At scale: the directory would be partitioned by id-range/date so the
  * `id > offset` filter prunes whole files (min/max stats), and the
  * watermark lives in the streaming checkpoint instead.
  */
class ParquetChangeLog(dir: String) extends ChangeLog {
  private val watermarkPath = Paths.get(dir, "_committed_offset")

  override def committedOffset: Long =
    if (Files.exists(watermarkPath))
      new String(Files.readAllBytes(watermarkPath), StandardCharsets.UTF_8).trim.toLong
    else -1L

  private def data(spark: SparkSession): DataFrame =
    if (Files.exists(Paths.get(dir, "data")))
      spark.read.schema(Change.logSchema).parquet(s"$dir/data")
    else // empty log: no appends yet
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        Change.logSchema)

  override def readBatch(spark: SparkSession, afterId: Long, limit: Int): DataFrame =
    data(spark).filter(col("id") > math.max(afterId, committedOffset))
      .orderBy(col("id")).limit(limit)

  override def readFrom(spark: SparkSession, afterId: Long): DataFrame =
    data(spark).filter(col("id") > math.max(afterId, committedOffset))

  override def truncate(uptoId: Long): Unit = {
    val tmp = Paths.get(dir, "_committed_offset.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, uptoId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, watermarkPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Append a batch of log rows (capture side / test fixture side). */
  def append(df: DataFrame): Unit =
    df.select(Change.logSchema.fieldNames.map(col).toSeq: _*)
      .write.mode("append").parquet(s"$dir/data")

  /** The log as a Structured Streaming source: Spark's file source picks
    * up newly landed parquet files; downstream gets a Dataset of log rows
    * (SURVEY.md §2.1 S2 mapping, option (a)). */
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.schema(Change.logSchema).parquet(s"$dir/data")
}

/** JDBC-backed change log — the log table lives in the source database.
  *
  * `limitClause` covers dialect differences (SQLite/standard `LIMIT n`
  * vs Derby/ANSI `FETCH FIRST n ROWS ONLY`); everything else is plain
  * SQL-92 so the same engine runs against SQLite in production and
  * embedded Derby in tests.
  *
  * Reads go through spark.read.jdbc with the offset predicate *inside*
  * the pushed query, so SQLite does an index-ordered seek (keyset
  * pagination, no OFFSET scan — reference triggers.go:539-568 rationale).
  */
class JdbcChangeLog(
    url: String,
    connProps: java.util.Properties = new java.util.Properties(),
    logTable: String = CdcDdl.DefaultLogTable,
    limitClause: Int => String = n => s"LIMIT $n",
    connectionInit: Seq[String] = Nil) extends ChangeLog {

  @volatile private var committed: Long = -1L
  override def committedOffset: Long = committed

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url, connProps)
    try {
      connectionInit.foreach { sql =>
        val st = c.createStatement(); try st.execute(sql) finally st.close()
      }
      f(c)
    } finally c.close()
  }

  /** Lower-case aliases keep the result schema identical across dialects
    * ("timestamp" is reserved in some; unquoted identifiers fold to upper
    * case in others). */
  private val selectList =
    Seq("id", "timestamp", "tablename", "operation", "before", "after")
      .map(c => s""""$c" AS "$c"""").mkString(", ")

  /** One JDBC reader shape for every read path: credentials in connProps
    * and the connectionInit PRAGMAs (as sessionInitStatement) must apply
    * to readBatch and readFrom alike.
    */
  private def jdbcRead(spark: SparkSession, query: String): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(scala.jdk.CollectionConverters.PropertiesHasAsScala(connProps)
        .asScala.map { case (k, v) => (k.toString, v.toString) }.toMap)
    connectionInit.headOption
      .fold(reader)(_ => reader
        .option("sessionInitStatement", connectionInit.mkString("; ")))
      .load()
  }

  override def readBatch(spark: SparkSession, afterId: Long, limit: Int): DataFrame =
    jdbcRead(spark, s"SELECT $selectList " +
      s"FROM $logTable WHERE \"id\" > $afterId ORDER BY \"id\" ASC ${limitClause(limit)}")

  override def readFrom(spark: SparkSession, afterId: Long): DataFrame =
    jdbcRead(spark, s"SELECT $selectList FROM $logTable WHERE \"id\" > $afterId")

  override def truncate(uptoId: Long): Unit = {
    withConn { c =>
      c.setAutoCommit(false)
      val st = c.createStatement()
      try { st.executeUpdate(s"DELETE FROM $logTable WHERE \"id\" <= $uptoId"); c.commit() }
      catch { case e: Throwable => c.rollback(); throw e }
      finally st.close()
    }
    committed = math.max(committed, uptoId)
  }

  /** Execute setup/teardown DDL in one transaction (reference
    * triggers.go:334-395). */
  def executeDdl(statements: Seq[String]): Unit = withConn { c =>
    c.setAutoCommit(false)
    val st = c.createStatement()
    try { statements.foreach(st.execute); c.commit() }
    catch { case e: Throwable => c.rollback(); throw e }
    finally st.close()
  }
}
