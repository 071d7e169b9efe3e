package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import SqliteCatalog._

class CdcDriftSpec extends SparkSpecBase {

  private val metaV1 = TableMeta("t", withoutRowId = false, Seq(
    ColumnMeta("id", "INTEGER", 1),
    ColumnMeta("v", "TEXT", 0)))
  // the same table after `ALTER TABLE t ADD COLUMN w REAL`
  private val metaV2 = metaV1.copy(columns =
    metaV1.columns :+ ColumnMeta("w", "REAL", 0))
  private val opts = CdcDdl.Options()

  test("no drift when installed triggers match the current schema") {
    val exp = CdcDrift.expectedTriggers(Seq(metaV1), opts)
    assert(CdcDrift.diff(exp, exp).isEmpty)
  }

  test("ALTERed table → every trigger reports stale") {
    val installed = CdcDrift.expectedTriggers(Seq(metaV1), opts)
    val expected = CdcDrift.expectedTriggers(Seq(metaV2), opts)
    val drifts = CdcDrift.diff(expected, installed)
    assert(drifts.map(_.kind) == Seq("stale", "stale", "stale"))
    assert(drifts.forall(_.table == "t"))
    assert(drifts.head.toString.contains("ALTER TABLE"))
  }

  test("missing trigger is reported as missing, not stale") {
    val expected = CdcDrift.expectedTriggers(Seq(metaV1), opts)
    val installed = expected - CdcDdl.triggerName("t", Operation.Update)
    val drifts = CdcDrift.diff(expected, installed)
    assert(drifts.map(_.kind) == Seq("missing"))
    assert(drifts.head.trigger == "t__cdc_update")
  }

  test("declared-type change (INTEGER -> TEXT) drifts even though trigger text is identical") {
    // `ALTER` the id column's declared type: non-BLOB types render the
    // same capture DDL, so trigger-text comparison alone is blind here —
    // the setup-frozen schema is what catches it (frozen-schema
    // semantics, reference dbmeta.go:46 + triggers.go:69).
    val metaRetyped = metaV1.copy(columns = metaV1.columns.map(c =>
      if (c.name == "id") c.copy(declType = "TEXT") else c))
    assert(CdcDrift.expectedTriggers(Seq(metaV1), opts) ==
      CdcDrift.expectedTriggers(Seq(metaRetyped), opts),
      "fixture invalidated: a type change now alters trigger DDL")
    val frozen = Map("t" -> metaV1.columns)
    val drifts = CdcDrift.schemaDiff(frozen, Seq(metaRetyped))
    assert(drifts.size == 1)
    assert(drifts.head.kind == "declared type changed since setup (INTEGER -> TEXT)")
    assert(drifts.head.toString.contains("column id"))
    // and the full check() reports it (trigger text clean, schema dirty)
    val checked = CdcDrift.check(null, Seq("t"), opts,
      introspect = (_, _) => DbMeta("f", "wal", Seq(metaRetyped)),
      readTriggers = (_, _) => CdcDrift.expectedTriggers(Seq(metaRetyped), opts),
      readSchema = (_, _, _) => Some(frozen))
    assert(checked.map(_.kind) ==
      Seq("declared type changed since setup (INTEGER -> TEXT)"))
  }

  test("type change to BLOB affinity is caught by trigger text AND the frozen schema") {
    val metaBlobbed = metaV1.copy(columns = metaV1.columns.map(c =>
      if (c.name == "v") c.copy(declType = "BLOB") else c))
    val frozen = Map("t" -> metaV1.columns)
    val checked = CdcDrift.check(null, Seq("t"), opts,
      introspect = (_, _) => DbMeta("f", "wal", Seq(metaBlobbed)),
      readTriggers = (_, _) => CdcDrift.expectedTriggers(Seq(metaV1), opts),
      readSchema = (_, _, _) => Some(frozen))
    // BLOB-ness changes the image expression → all three triggers stale
    assert(checked.count(_.kind == "stale") == 3)
    assert(checked.exists(_.kind.startsWith("declared type changed")))
  }

  test("no frozen schema (pre-freeze setup) falls back to trigger-text drift only") {
    val metaRetyped = metaV1.copy(columns = metaV1.columns.map(c =>
      if (c.name == "id") c.copy(declType = "TEXT") else c))
    val checked = CdcDrift.check(null, Seq("t"), opts,
      introspect = (_, _) => DbMeta("f", "wal", Seq(metaRetyped)),
      readTriggers = (_, _) => CdcDrift.expectedTriggers(Seq(metaRetyped), opts),
      readSchema = (_, _, _) => None)
    assert(checked.isEmpty) // blind, but doesn't fail-stop a legacy install
  }

  test("frozen schema read round-trips through a real JDBC database") {
    val url = "jdbc:derby:memory:freeze;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // side table absent → None (legacy install)
      assert(CdcDrift.frozenSchema(conn, Seq("t"), opts).isEmpty)
      val st = conn.createStatement()
      // Derby accepts the generated DDL/DML shape (TEXT → VARCHAR here,
      // but the statement STRUCTURE is what this test pins)
      st.execute("""CREATE TABLE "__cdc_log_schema" (tablename VARCHAR(128),
        name VARCHAR(128), decltype VARCHAR(128), pk INT)""")
      st.execute("""INSERT INTO "__cdc_log_schema" VALUES
        ('t', 'id', 'INTEGER', 1), ('t', 'v', 'TEXT', 0), ('other', 'x', 'REAL', 0)""")
      st.close()
      val frozen = CdcDrift.frozenSchema(conn, Seq("t"), opts)
      assert(frozen.map(_.keySet).contains(Set("t"))) // 'other' filtered out
      assert(frozen.get("t").toSet == metaV1.columns.toSet)
      assert(CdcDrift.schemaDiff(frozen.get, Seq(metaV1)).isEmpty)
    } finally conn.close()
  }

  test("frozenSchema: quote-bearing names escape; real read errors propagate (no fail-open)") {
    val url = "jdbc:derby:memory:freeze2;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // evil log-table name: the SELECT must double the embedded quote
      val evil = CdcDdl.Options(logTable = "my\"log")
      assert(CdcDrift.frozenSchema(conn, Seq("t"), evil).isEmpty) // absent ≠ error
      val st = conn.createStatement()
      st.execute("""CREATE TABLE "my""log_schema" (tablename VARCHAR(128),
        name VARCHAR(128), decltype VARCHAR(128), pk INT)""")
      st.execute("""INSERT INTO "my""log_schema" VALUES ('t', 'id', 'INTEGER', 1)""")
      // default side table present but with an unreadable shape: the
      // guard must FAIL, not silently disable declared-type detection
      st.execute("""CREATE TABLE "__cdc_log_schema" (wrong INT)""")
      st.close()
      val frozen = CdcDrift.frozenSchema(conn, Seq("t"), evil)
      assert(frozen.map(_.keySet).contains(Set("t")))
      intercept[java.sql.SQLException] {
        CdcDrift.frozenSchema(conn, Seq("t"), CdcDdl.Options())
      }
    } finally conn.close()
  }

  test("comparison is whitespace- and IF-NOT-EXISTS-insensitive (sqlite_master text)") {
    val exp = CdcDrift.expectedTriggers(Seq(metaV1), opts)
    // SQLite may store the statement re-flowed; simulate that
    val installed = exp.map { case (k, v) =>
      k -> v.replace("IF NOT EXISTS ", "").replaceAll("\\s+", " ")
    }
    assert(CdcDrift.diff(exp, installed).isEmpty)
  }

  test("engine start fail-stops on drift; --ignore-drift proceeds (ALTERed table)") {
    val url = "jdbc:derby:memory:drift;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE TABLE t (id INT)") catch { case _: Throwable => () }
      st.execute("INSERT INTO t VALUES (1), (2), (3)")
      st.close()
    } finally conn.close()
    val introspectV2 = (_: java.sql.Connection, _: Seq[String]) =>
      DbMeta("f", "wal", Seq(metaV2))
    val staleInstalled = (_: java.sql.Connection, _: Seq[String]) =>
      CdcDrift.expectedTriggers(Seq(metaV1), opts)
    val c = Main.parse(Seq("--db", url, "--table", "t", "--bootstrap")).toOption.get
    val e = intercept[IllegalStateException] {
      Main.run(c, spark, introspect = introspectV2, readTriggers = staleInstalled)
    }
    assert(e.getMessage.contains("schema drift") && e.getMessage.contains("t__cdc_insert"))
    // --ignore-drift: warn and continue; the bootstrap actually runs
    val c2 = Main.parse(Seq("--db", url, "--table", "t", "--bootstrap",
      "--ignore-drift", "--output", "json")).toOption.get
    val n = Console.withOut(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream())) {
      Main.run(c2, spark, introspect = introspectV2, readTriggers = staleInstalled)
    }
    assert(n == 3)
  }
}
