package graft.streaming

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** E2E for the cdc-log Structured Streaming source over a real JDBC
  * database (embedded Derby — same topology as production SQLite: log
  * table in the source DB, id-offset range reads, delete-after-commit).
  */
class CdcLogSourceSpec extends SparkSpecBase {

  private def newDerby(): String = {
    val dir = Files.createTempDirectory("derby-stream").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def createLog(url: String): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("""CREATE TABLE CDC_LOG (
        "id" BIGINT PRIMARY KEY, "timestamp" VARCHAR(30) NOT NULL,
        "tablename" VARCHAR(128) NOT NULL, "operation" VARCHAR(10) NOT NULL,
        "before" CLOB, "after" CLOB)""")
      st.close()
    } finally c.close()
  }

  private def insertRows(url: String, ids: Range): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement("INSERT INTO CDC_LOG VALUES (?, ?, ?, ?, ?, ?)")
      ids.foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, f"2024-05-06 00:00:${i % 60}%02d.000")
        ps.setString(3, "t")
        ps.setString(4, "INSERT")
        ps.setString(5, null)
        ps.setString(6, s"""{"pk":$i}""")
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally c.close()
  }

  private def countLog(url: String): Int = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM CDC_LOG")
      rs.next(); rs.getInt(1)
    } finally c.close()
  }

  private def stream(url: String, extra: (String, String)*) = {
    val base = spark.readStream.format("cdc-log")
      .option("url", url).option("logTable", "CDC_LOG")
    extra.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("micro-batch stream drains the log in admission-controlled ordered batches") {
    val url = newDerby(); createLog(url); insertRows(url, 0 until 120)
    val q = stream(url, "maxBatchSize" -> "50")
      .writeStream.format("memory").queryName("cdc_all")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("cdc_all").orderBy("id").collect()
    assert(rows.length == 120)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 120L))
    assert(rows.forall(_.getString(3) == "INSERT"))
    // admission control: 120 rows at maxBatchSize=50 → ≥3 micro-batches
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected ≥3 micro-batches, saw $batches")
    // no truncation by default
    assert(countLog(url) == 120)
  }

  test("truncateOnCommit deletes delivered rows once their batch is committed") {
    val url = newDerby(); createLog(url); insertRows(url, 0 until 30)
    val out = Files.createTempDirectory("cdc-trunc-out").toString
    val ckpt = Files.createTempDirectory("cdc-trunc-ckpt").toString
    def runOnce(): Unit = {
      val q = stream(url, "truncateOnCommit" -> "true", "maxBatchSize" -> "10")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 30)
    // Source.commit(n) fires as batch n+1 starts, so retention lags
    // delivery by exactly the in-flight batch (at-least-once, never
    // loss; the v1 CdcEngine loop is the strict delete-after-every-ack
    // path). After draining 30 rows in 10-row batches, only the final
    // batch awaits its successor's commit.
    assert(countLog(url) == 10, "all but the final batch truncated")
    insertRows(url, 30 until 45) // 15 more → batches (30,40], (40,45]
    runOnce()
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 45L), "everything delivered exactly once")
    assert(countLog(url) == 5, "only the new final batch awaits commit")
  }

  test("checkpointed restart resumes from the committed offset (no redelivery)") {
    val url = newDerby(); createLog(url); insertRows(url, 0 until 40)
    val out = Files.createTempDirectory("cdc-out").toString
    val ckpt = Files.createTempDirectory("cdc-ckpt").toString
    def runOnce(): Unit = {
      val q = stream(url)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 40)
    insertRows(url, 40 until 55) // writer keeps appending
    runOnce()
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.length == 55, "second run delivers only the 15 new rows")
    assert(ids.toSeq == (0L until 55L))
  }

  test("numPartitions splits a batch into parallel range reads with identical results") {
    val url = newDerby(); createLog(url); insertRows(url, 0 until 97)
    val q = stream(url, "numPartitions" -> "8", "maxBatchSize" -> "1000")
      .writeStream.format("memory").queryName("cdc_par")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.table("cdc_par").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 97L))
  }

  test("admission control is row-exact across id gaps (post-truncation log shape)") {
    val url = newDerby(); createLog(url)
    // sparse ids — what a log looks like after partial truncation
    insertRows(url, 0 until 300 by 7)
    val q = stream(url, "maxBatchSize" -> "10")
      .writeStream.format("memory").queryName("cdc_gaps")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.table("cdc_gaps").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0 until 300 by 7).map(_.toLong))
    // row-exact batches: 43 rows at maxBatchSize=10 → ≥5 micro-batches,
    // none larger than 10 rows
    val sizes = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
    assert(sizes.forall(_ <= 10), s"batch sizes $sizes")
    assert(sizes.length >= 5)
  }

  test("batch (bounded) read of the same relation") {
    val url = newDerby(); createLog(url); insertRows(url, 0 until 10)
    val df = spark.read.format("cdc-log")
      .option("url", url).option("logTable", "CDC_LOG").load()
    assert(df.count() == 10)
    assert(df.schema == graft.cdc.Change.logSchema)
  }
}
