package graft.cdc

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpecBase

/** E2E over a real JDBC database. SQLite's driver isn't shipped in this
  * environment, so the generic-JDBC path runs against embedded Derby —
  * same topology as production SQLite (log table in the source DB,
  * offset-predicate reads pushed into the database, transactional
  * delete-after-ack). The SQLite-specific SQL surface (PRAGMAs, trigger
  * DDL) is covered by CdcDdlSpec as pure functions. */
class JdbcChangeLogSpec extends SparkSpecBase {

  private def newDerby(): String = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def setupLog(url: String, rows: Int): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      // lower-case quoted identifiers: match what JdbcChangeLog's
      // dialect-neutral select list references (SQLite is caseless here;
      // Derby is case-sensitive for quoted names)
      st.execute("""CREATE TABLE CDC_LOG (
        "id" BIGINT PRIMARY KEY, "timestamp" VARCHAR(30) NOT NULL,
        "tablename" VARCHAR(128) NOT NULL, "operation" VARCHAR(10) NOT NULL,
        "before" CLOB, "after" CLOB)""")
      val ps = c.prepareStatement("INSERT INTO CDC_LOG VALUES (?, ?, ?, ?, ?, ?)")
      (0 until rows).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, f"2024-05-06 00:00:${i % 60}%02d.000")
        ps.setString(3, "t")
        ps.setString(4, if (i % 3 == 0) "INSERT" else if (i % 3 == 1) "UPDATE" else "DELETE")
        ps.setString(5, if (i % 3 == 0) null else s"""{"pk":$i,"v":0}""")
        ps.setString(6, if (i % 3 == 2) null else s"""{"pk":$i,"v":1}""")
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally c.close()
  }

  private def derbyLog(url: String) = new JdbcChangeLog(
    url, logTable = "CDC_LOG",
    limitClause = n => s"FETCH FIRST $n ROWS ONLY")

  test("offset-range batch read pushes predicate + order + limit into the DB") {
    val url = newDerby(); setupLog(url, 25)
    val log = derbyLog(url)
    val batch = log.readBatch(spark, afterId = 9, limit = 10).collect()
    assert(batch.length == 10)
    assert(batch.map(_.getLong(0)).toSeq == (10L to 19L))
  }

  test("full engine drain over JDBC: ordered batches, transactional ack deletes the log") {
    val url = newDerby(); setupLog(url, 103)
    val rec = new RecordingHandler
    val engine = new CdcEngine(spark, derbyLog(url), rec, maxBatchSize = 25)
    val n = engine.cdcAvailableNow()
    assert(n == 103)
    assert(rec.batches.map(_.size) == Seq(25, 25, 25, 25, 3))
    // null-image semantics survived the round-trip (P7)
    assert(rec.all.filter(_.operation == "INSERT").forall(_.before.isEmpty))
    assert(rec.all.filter(_.operation == "DELETE").forall(_.after.isEmpty))
    assert(rec.all.filter(_.operation == "UPDATE")
      .forall(c => c.before.nonEmpty && c.after.nonEmpty))
    // log fully truncated after acks (delete-after-ack, triggers.go:209-221)
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM CDC_LOG")
      rs.next()
      assert(rs.getInt(1) == 0)
    } finally c.close()
  }

  test("live appends between drains are picked up (CDC tail)") {
    val url = newDerby(); setupLog(url, 10)
    val rec = new RecordingHandler
    val log = derbyLog(url)
    val engine = new CdcEngine(spark, log, rec)
    engine.cdcAvailableNow()
    assert(rec.all.size == 10)
    // writer appends more rows after the first drain
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute(
      "INSERT INTO CDC_LOG VALUES (100, '2024-05-06 00:01:00.000', 't', 'INSERT', NULL, '{\"pk\":100}')")
    finally c.close()
    val rec2 = new RecordingHandler
    new CdcEngine(spark, log, rec2).cdcAvailableNow()
    assert(rec2.all.map(_.after.get) == Seq("""{"pk":100}"""))
  }
}
