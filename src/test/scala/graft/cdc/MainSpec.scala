package graft.cdc

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpecBase

/** End-to-end tests of the operational CLI (reference
  * cmd/sqlite-cdc/main.go parity): every mode is driven through the real
  * arg parser and [[Main.run]]. The change log is parquet (or Derby via
  * --db) because no SQLite driver exists in the build sandbox; the
  * SQLite-dialect DDL a setup/teardown invocation would execute is
  * captured via the injectable executor and asserted against CdcDdl. */
class MainSpec extends SparkSpecBase {
  import scala.jdk.CollectionConverters._

  private def newDir(): String = Files.createTempDirectory("cli").toString

  private def logRows(ids: Range, table: String = "t"): Seq[Row] =
    ids.map { i =>
      Row(i.toLong, f"2024-05-06 00:03:${i % 60}%02d.123", table, "INSERT",
        null, s"""{"pk":$i}""")
    }

  private def withStdout[A](f: => A): (A, Seq[String]) = {
    val buf = new ByteArrayOutputStream()
    val r = Console.withOut(new PrintStream(buf, true, "UTF-8"))(f)
    (r, buf.toString("UTF-8").linesIterator.toSeq)
  }

  // ---- parser ----

  test("parse: reference flag surface and defaults") {
    val c = Main.parse(Seq("--db", "jdbc:derby:memory:x", "--cdc")).toOption.get
    assert(c.batchSize == 256 && c.logTable == "__cdc_log" && c.output == "-")
    assert(!c.blobs && !c.disableSubsec && !c.setup && !c.teardown && !c.bootstrap)
  }

  test("parse: all flags round-trip") {
    val c = Main.parse(Seq(
      "--log-dir", "/tmp/log", "--snapshot-dir", "/tmp/snap",
      "--table", "a", "--table", "b", "--log-table", "cdc2",
      "--bootstrap", "--cdc", "--output", "json",
      "--batch-size", "7", "--disable-subsec", "--blobs",
      "--poll-ms", "5", "--available-now",
      "--dead-letter", "json")).toOption.get
    assert(c.tables == Seq("a", "b") && c.logTable == "cdc2" &&
      c.batchSize == 7 && c.output == "json" && c.blobs && c.disableSubsec &&
      c.bootstrap && c.cdc && c.availableNow && c.pollMs == 5L &&
      c.deadLetter.contains("json"))
    val s = Main.parse(Seq("--db", "u", "--table", "t", "--setup", "--cdc",
      "--watch", "/x/a.db", "--ignore-drift")).toOption.get
    assert(s.setup && s.watchFile.contains("/x/a.db") && s.ignoreDrift)
  }

  test("parse: rejections match the reference's contract") {
    // at least one of cdc or bootstrap (main.go:137)
    assert(Main.parse(Seq("--db", "u")).isLeft)
    // but teardown alone is a complete invocation (main.go:113-118)
    assert(Main.parse(Seq("--db", "u", "--teardown", "--table", "t")).isRight)
    assert(Main.parse(Seq("--cdc")).isLeft) // no source
    assert(Main.parse(Seq("--db", "u", "--log-dir", "d", "--cdc")).isLeft)
    assert(Main.parse(Seq("--db", "u", "--cdc", "--batch-size", "x")).isLeft)
    assert(Main.parse(Seq("--db", "u", "--cdc", "--bogus")).isLeft)
    assert(Main.parse(Seq("--log-dir", "d", "--bootstrap")).isLeft) // no snapshot-dir
    assert(Main.parse(Seq("--db", "u", "--setup", "--cdc")).isLeft) // setup needs tables
  }

  test("parse: degenerate numerics and mode/topology mismatches are rejected") {
    assert(Main.parse(Seq("--db", "u", "--cdc", "--batch-size", "0")).isLeft)
    assert(Main.parse(Seq("--db", "u", "--cdc", "--batch-size", "-5")).isLeft)
    assert(Main.parse(Seq("--db", "u", "--cdc", "--poll-ms", "0")).isLeft)
    // setup/teardown need the source database, not the parquet log
    assert(Main.parse(Seq("--log-dir", "d", "--table", "t", "--setup", "--cdc")).isLeft)
    assert(Main.parse(Seq("--log-dir", "d", "--table", "t", "--teardown")).isLeft)
  }

  test("db-params separator follows the driver (sqlite '?', others ';')") {
    def url(db: String, p: String) =
      Main.jdbcUrl(Main.Config(db = Some(db), dbParams = Some(p)))
    assert(url("jdbc:sqlite:/x/a.db", "journal_mode=WAL") ==
      "jdbc:sqlite:/x/a.db?journal_mode=WAL")
    assert(url("jdbc:sqlite:/x/a.db?cache=shared", "journal_mode=WAL") ==
      "jdbc:sqlite:/x/a.db?cache=shared&journal_mode=WAL")
    assert(url("jdbc:derby:memory:m", "create=true") ==
      "jdbc:derby:memory:m;create=true")
    assert(url("jdbc:derby:memory:m", ";create=true") ==
      "jdbc:derby:memory:m;create=true") // explicit separator respected
  }

  test("output flag selects the handler (main.go:86-97)") {
    assert(Main.handlerFor("-").isInstanceOf[ConsoleHandler])
    assert(Main.handlerFor("json").isInstanceOf[JsonConsoleHandler])
    assert(Main.handlerFor("http://x/y").isInstanceOf[HttpPostHandler])
  }

  // ---- modes, end-to-end through parse + run ----

  test("cdc mode drains a parquet log to stdout and acks (delete-after-ack)") {
    val dir = newDir()
    val log = new ParquetChangeLog(dir)
    log.append(spark.createDataFrame(logRows(0 until 30).asJava, Change.logSchema))
    val c = Main.parse(Seq("--log-dir", dir, "--cdc", "--available-now",
      "--batch-size", "10")).toOption.get
    val (n, out) = withStdout(Main.run(c, spark))
    assert(n == 30)
    assert(out.size == 30)
    assert(out.head == "2024-05-06T00:03:00.123Z: t INSERT")
    assert(new ParquetChangeLog(dir).committedOffset == 29)
  }

  test("--dead-letter routes poison rows end-to-end through the CLI: main " +
      "output clean, both channels on stdout, log fully acked") {
    val dir = newDir()
    val log = new ParquetChangeLog(dir)
    val rows = logRows(0 until 5) ++ Seq(
      org.apache.spark.sql.Row(5L, "garbage ts", "t", "INSERT", null,
        """{"pk":5}""")) ++
      logRows(6 until 10).map(r => org.apache.spark.sql.Row(
        r.getLong(0) + 6L, r.getString(1), r.getString(2), r.getString(3),
        r.get(4), r.getString(5)))
    log.append(spark.createDataFrame(rows.asJava, Change.logSchema))
    val c = Main.parse(Seq("--log-dir", dir, "--cdc", "--available-now",
      "--output", "json", "--dead-letter", "json")).toOption.get
    val (n, out) = withStdout(Main.run(c, spark))
    assert(n == 10)
    // all ten rows surfaced (9 main + 1 dead-lettered, both json sinks;
    // row images are JSON strings, so their quotes arrive escaped)
    assert(out.size == 10)
    assert(out.count(_.contains("\\\"pk\\\":5")) == 1, out.mkString("\n"))
    // (null-timestamp preservation on the dead-letter channel is
    // pinned at the engine level in CdcEngineSpec)
    // nothing wedged: the whole log acked
    assert(new ParquetChangeLog(dir).committedOffset == 15L)
  }

  test("bootstrap mode snapshots parquet tables as INSERTs (json output)") {
    val c = Main.parse(Seq("--log-dir", newDir(), "--snapshot-dir", sf,
      "--table", "nation", "--bootstrap", "--output", "json")).toOption.get
    val (n, out) = withStdout(Main.run(c, spark))
    assert(n == 25)
    assert(out.size == 25)
    assert(out.forall(_.contains("\"operation\":\"INSERT\"")))
    assert(out.exists(_.contains("NATION_0")))
  }

  test("bootstrap-and-cdc delivers the snapshot before the log tail") {
    val dir = newDir()
    val log = new ParquetChangeLog(dir)
    log.append(spark.createDataFrame(logRows(0 until 8).asJava, Change.logSchema))
    val c = Main.parse(Seq("--log-dir", dir, "--snapshot-dir", sf,
      "--table", "region", "--bootstrap", "--cdc", "--available-now",
      "--output", "json")).toOption.get
    val (n, out) = withStdout(Main.run(c, spark))
    assert(n == 5 + 8)
    assert(out.take(5).forall(_.contains("r_name")))
    // the log row image is a JSON string field, so its quotes arrive escaped
    assert(out.drop(5).forall(l => l.contains("pk") && l.contains("\"table\":\"t\"")))
  }

  test("setup/teardown execute the CdcDdl statements for the introspected schema") {
    val meta = SqliteCatalog.TableMeta("t", withoutRowId = false,
      Seq(SqliteCatalog.ColumnMeta("id", "INTEGER", 1),
        SqliteCatalog.ColumnMeta("v", "TEXT", 0)))
    val fakeIntrospect = (_: java.sql.Connection, tables: Seq[String]) =>
      SqliteCatalog.DbMeta("f", "wal", tables.map(_ => meta))
    var executed = Seq.empty[Seq[String]]
    val record = (_: JdbcChangeLog, stmts: Seq[String]) => {
      executed = executed :+ stmts; ()
    }
    val opts = CdcDdl.Options(blobSupport = true)
    // Derby in-memory URL: real DriverManager connection, fake pragma layer
    val url = "jdbc:derby:memory:clisetup;create=true"
    val c = Main.parse(Seq("--db", url, "--table", "t", "--setup", "--teardown",
      "--blobs")).toOption.get
    val n = Main.run(c, spark, introspect = fakeIntrospect, execDdl = record)
    assert(n == 0)
    assert(executed.size == 2)
    assert(executed(0) == CdcDdl.setupStatements(Seq(meta), opts))
    assert(executed(1) == CdcDdl.teardownStatements(Seq(meta), opts))
    assert(executed(0).exists(_.startsWith("CREATE TABLE IF NOT EXISTS \"__cdc_log\"")))
    assert(executed(1).exists(_.contains("DROP TRIGGER")))
  }

  test("teardown prevents any other action (main.go:113-118)") {
    val dir = newDir()
    val log = new ParquetChangeLog(dir)
    log.append(spark.createDataFrame(logRows(0 until 5).asJava, Change.logSchema))
    // --teardown with --cdc: no drain must happen
    val c = Main.parse(Seq("--db", "jdbc:derby:memory:clitd;create=true",
      "--table", "t", "--teardown", "--cdc")).toOption.get
    val fakeIntrospect = (_: java.sql.Connection, _: Seq[String]) =>
      SqliteCatalog.DbMeta("f", "wal", Seq.empty)
    val n = Main.run(c, spark, introspect = fakeIntrospect,
      execDdl = (_, _) => ())
    assert(n == 0)
    assert(new ParquetChangeLog(dir).committedOffset == -1L) // untouched
  }

  test("CLI diagnostic falls back to the class name for message-less exceptions") {
    // an NPE has a null message — the CLI must not print "graft-cdc: null"
    assert(Main.diagnostic(new NullPointerException()) ==
      "java.lang.NullPointerException")
    assert(Main.diagnostic(new IllegalStateException("boom")) == "boom")
  }

  test("cdc continuous mode stops via engine close (SIGINT path)") {
    val dir = newDir()
    val log = new ParquetChangeLog(dir)
    log.append(spark.createDataFrame(logRows(0 until 4).asJava, Change.logSchema))
    val c = Main.parse(Seq("--log-dir", dir, "--cdc", "--poll-ms", "10",
      "--output", "json")).toOption.get
    @volatile var engine: CdcEngine = null
    val t = new Thread(() => {
      val (_, _) = withStdout(Main.run(c, spark, onEngine = e => engine = e))
    })
    t.start()
    // the loop drains, then keeps polling until close() — the shutdown
    // hook calls exactly this
    val deadline = System.currentTimeMillis() + 30000
    while ((engine == null || new ParquetChangeLog(dir).committedOffset < 3L)
      && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(new ParquetChangeLog(dir).committedOffset == 3L)
    engine.close()
    t.join(30000)
    assert(!t.isAlive, "cdc loop did not stop after close()")
  }
}
