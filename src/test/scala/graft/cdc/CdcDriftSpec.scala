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
