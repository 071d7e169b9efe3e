package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import SqliteCatalog._

class CdcDdlSpec extends AnyFunSuite {

  private val simple = TableMeta("my_table", withoutRowId = false, Seq(
    ColumnMeta("id", "INTEGER", 1),
    ColumnMeta("username", "TEXT", 0),
    ColumnMeta("email", "VARCHAR(255)", 0),
    ColumnMeta("avatar", "BLOB", 0),
    ColumnMeta("balance", "REAL", 0)))

  test("log table DDL matches reference shape (triggers.go:410-419)") {
    val ddl = CdcDdl.createLogTable()
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS \"__cdc_log\""))
    for (c <- Seq("id INTEGER PRIMARY KEY", "timestamp TEXT NOT NULL",
      "tablename TEXT NOT NULL", "operation TEXT NOT NULL", "before TEXT", "after TEXT"))
      assert(ddl.contains(c), s"missing: $c")
  }

  test("insert trigger: NEW image only, before NULL, blob skipped by default") {
    val ddl = CdcDdl.createInsertTrigger(simple)
    assert(ddl.contains("AFTER INSERT ON \"my_table\""))
    assert(ddl.contains("'INSERT', NULL, json_object("))
    assert(ddl.contains("NEW.\"username\""))
    assert(!ddl.contains("OLD."))
    assert(!ddl.contains("avatar"), "blob column must be skipped without blob support")
    assert(ddl.contains("datetime('now','subsec')"))
  }

  test("update trigger carries both images; delete trigger has after NULL") {
    val up = CdcDdl.createUpdateTrigger(simple)
    assert(up.contains("OLD.\"username\"") && up.contains("NEW.\"username\""))
    val del = CdcDdl.createDeleteTrigger(simple)
    assert(del.contains("OLD.\"username\"") && del.contains("'DELETE'"))
    assert(del.matches("(?s).*json_object\\(.*\\), NULL\\);.*"),
      s"delete after-image must be NULL:\n$del")
  }

  test("blob support: hex() wrapping (triggers.go:466-469)") {
    val ddl = CdcDdl.createInsertTrigger(simple, CdcDdl.Options(blobSupport = true))
    assert(ddl.contains("hex(NEW.\"avatar\")"))
  }

  test("subsec compat mode (triggers.go:39-44)") {
    val ddl = CdcDdl.createInsertTrigger(simple, CdcDdl.Options(subsecTimestamps = false))
    assert(ddl.contains("datetime('now')") && !ddl.contains("subsec"))
  }

  test("wide tables chunk json_object at 63 pairs and merge with json_patch") {
    def meta(n: Int) = TableMeta("wide", withoutRowId = false,
      (0 until n).map(i => ColumnMeta(s"col$i", "INT", 0)))
    // ≤63 → single json_object, no json_patch
    val small = CdcDdl.rowImageExpr(meta(63), "NEW", CdcDdl.Options())
    assert(!small.contains("json_patch"))
    // 64 → exactly one merge
    val wide = CdcDdl.rowImageExpr(meta(64), "NEW", CdcDdl.Options())
    assert(wide.contains("json_patch"))
    // 1000 (reference ceiling): 16 chunks, 15 patches, all columns present
    val max = CdcDdl.rowImageExpr(meta(1000), "NEW", CdcDdl.Options())
    assert("json_patch".r.findAllIn(max).size == 15)
    (0 until 1000).foreach(i => assert(max.contains(s"'col$i'")))
    // SQLite arg-limit invariant: no json_object call exceeds 127 args
    "json_object\\(([^)]*)\\)".r.findAllMatchIn(max).foreach { m =>
      assert(m.group(1).split(",").length <= 126)
    }
    assertThrows[IllegalArgumentException](
      CdcDdl.rowImageExpr(meta(1001), "NEW", CdcDdl.Options()))
  }

  // ---- golden parity: byte-exact DDL against the reference templates ----
  // No SQLite driver exists in the sandbox, so the generated SQL cannot be
  // executed here; these goldens freeze it byte-for-byte against the
  // reference's templates (triggers.go:410-437 log table + triggers,
  // triggers.go:459-518 json image). Deliberate divergences, each pinned
  // below: (1) identifiers are quoted (the reference interpolates raw
  // names and breaks on reserved words); (2) json_patch chunk merges nest
  // left instead of right (associative for disjoint keys);
  // (3) chunk boundaries count EMITTED pairs, not column offsets, so
  // skipped BLOBs don't shrink chunks; (4) a skipped BLOB in last
  // position emits no dangling comma — the reference's builder leaves
  // `json_object('a', NEW.a, )` (triggers.go:482-505: the continue skips
  // the separator bookkeeping), which is invalid SQLite.

  test("golden: log table DDL is byte-stable (triggers.go:410-419)") {
    assert(CdcDdl.createLogTable() ==
      """CREATE TABLE IF NOT EXISTS "__cdc_log" (
        |  id INTEGER PRIMARY KEY,
        |  timestamp TEXT NOT NULL,
        |  tablename TEXT NOT NULL,
        |  operation TEXT NOT NULL,
        |  before TEXT,
        |  after TEXT
        |)""".stripMargin)
  }

  test("golden: insert trigger with blob support (triggers.go:420-426, 464-481)") {
    assert(CdcDdl.createInsertTrigger(simple, CdcDdl.Options(blobSupport = true)) ==
      """CREATE TRIGGER IF NOT EXISTS "my_table__cdc_insert"
        |AFTER INSERT ON "my_table"
        |FOR EACH ROW
        |BEGIN
        |  INSERT INTO "__cdc_log" (timestamp, tablename, operation, before, after)
        |  VALUES (datetime('now','subsec'), 'my_table', 'INSERT', NULL, json_object('id', NEW."id", 'username', NEW."username", 'email', NEW."email", 'avatar', hex(NEW."avatar"), 'balance', NEW."balance"));
        |END""".stripMargin)
  }

  test("golden: update/delete triggers without blob support (triggers.go:427-437)") {
    assert(CdcDdl.createUpdateTrigger(simple) ==
      """CREATE TRIGGER IF NOT EXISTS "my_table__cdc_update"
        |AFTER UPDATE ON "my_table"
        |FOR EACH ROW
        |BEGIN
        |  INSERT INTO "__cdc_log" (timestamp, tablename, operation, before, after)
        |  VALUES (datetime('now','subsec'), 'my_table', 'UPDATE', json_object('id', OLD."id", 'username', OLD."username", 'email', OLD."email", 'balance', OLD."balance"), json_object('id', NEW."id", 'username', NEW."username", 'email', NEW."email", 'balance', NEW."balance"));
        |END""".stripMargin)
    assert(CdcDdl.createDeleteTrigger(simple) ==
      """CREATE TRIGGER IF NOT EXISTS "my_table__cdc_delete"
        |AFTER DELETE ON "my_table"
        |FOR EACH ROW
        |BEGIN
        |  INSERT INTO "__cdc_log" (timestamp, tablename, operation, before, after)
        |  VALUES (datetime('now','subsec'), 'my_table', 'DELETE', json_object('id', OLD."id", 'username', OLD."username", 'email', OLD."email", 'balance', OLD."balance"), NULL);
        |END""".stripMargin)
  }

  test("golden: wide-table chunk merge shape (triggers.go:459-518, 64 cols)") {
    val t = TableMeta("wide", withoutRowId = false,
      (0 until 64).map(i => ColumnMeta(s"c$i", "INT", 0)))
    val img = CdcDdl.rowImageExpr(t, "NEW", CdcDdl.Options())
    val chunk1 = (0 until 63).map(i => s"'c$i', NEW.\"c$i\"").mkString(", ")
    assert(img == s"""json_patch(json_object($chunk1), json_object('c63', NEW."c63"))""")
  }

  test("golden: skipped trailing BLOB leaves no dangling comma (reference bug fixed)") {
    val t = TableMeta("t", withoutRowId = false,
      Seq(ColumnMeta("a", "TEXT", 0), ColumnMeta("payload", "BLOB", 0)))
    // The reference's string builder emits `json_object('a', NEW.a, )`
    // here (the skip path bypasses separator cleanup) — invalid SQLite.
    assert(CdcDdl.rowImageExpr(t, "NEW", CdcDdl.Options()) ==
      """json_object('a', NEW."a")""")
  }

  test("golden: teardown statements (triggers.go:444-458, + schema-freeze drop)") {
    assert(CdcDdl.teardownStatements(Seq(simple)) == Seq(
      """DROP TRIGGER IF EXISTS "my_table__cdc_insert"""",
      """DROP TRIGGER IF EXISTS "my_table__cdc_update"""",
      """DROP TRIGGER IF EXISTS "my_table__cdc_delete"""",
      """DROP TABLE IF EXISTS "__cdc_log"""",
      """DROP TABLE IF EXISTS "__cdc_log_schema""""))
  }

  test("setup/teardown statement sets are symmetric, in-order") {
    val setup = CdcDdl.setupStatements(Seq(simple))
    // log table + 3 triggers + schema-freeze (create + delete + 5 inserts)
    assert(setup.length == 4 + 2 + simple.columns.length)
    assert(setup.head.contains("CREATE TABLE"))
    val teardown = CdcDdl.teardownStatements(Seq(simple))
    assert(teardown.length == 5) // 3 drops + log drop + schema drop
    assert(teardown.last.contains("DROP TABLE"))
    for (op <- Seq("insert", "update", "delete"))
      assert(teardown.exists(_.contains(s"my_table__cdc_$op")))
  }

  test("schema freeze records every column's declared type and pk position") {
    val stmts = CdcDdl.schemaFreezeStatements(Seq(simple))
    assert(stmts.head.contains("""CREATE TABLE IF NOT EXISTS "__cdc_log_schema""""))
    assert(stmts(1) == """DELETE FROM "__cdc_log_schema" WHERE tablename = 'my_table'""")
    val inserts = stmts.drop(2)
    assert(inserts.length == simple.columns.length)
    assert(inserts.head.contains("VALUES ('my_table', 'id', 'INTEGER', 1)"))
    assert(inserts.exists(_.contains("('my_table', 'email', 'VARCHAR(255)', 0)")))
    // re-running --setup re-freezes: the DELETE precedes the INSERTs
    assert(stmts.indexWhere(_.startsWith("DELETE")) <
      stmts.indexWhere(_.startsWith("INSERT")))
  }

  test("identifiers and string literals are escaped") {
    val evil = TableMeta("""we"ird'tbl""", withoutRowId = false,
      Seq(ColumnMeta("""c"ol""", "TEXT", 0)))
    val ddl = CdcDdl.createInsertTrigger(evil)
    assert(ddl.contains("\"we\"\"ird'tbl\""))
    assert(ddl.contains("'we\"ird''tbl'"))
    assert(ddl.contains("\"c\"\"ol\""))
  }

  test("property: every affinity maps and every generated trigger is well-formed") {
    val colGen = for {
      name <- Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(10))
      typ <- Gen.oneOf("INT", "INTEGER", "BIGINT", "TEXT", "VARCHAR(10)", "CLOB",
        "BLOB", "REAL", "DOUBLE", "FLOAT", "NUMERIC", "DECIMAL(10,5)", "BOOLEAN",
        "DATE", "DATETIME", "")
    } yield ColumnMeta(name, typ, 0)
    val prop = Prop.forAll(Gen.nonEmptyListOf(colGen), Gen.oneOf(true, false)) {
      (cols: List[ColumnMeta], blobs: Boolean) =>
        val t = TableMeta("t", withoutRowId = false, cols.distinctBy(_.name))
        val opts = CdcDdl.Options(blobSupport = blobs)
        Seq(CdcDdl.createInsertTrigger(t, opts),
          CdcDdl.createUpdateTrigger(t, opts),
          CdcDdl.createDeleteTrigger(t, opts)).forall { ddl =>
          ddl.startsWith("CREATE TRIGGER IF NOT EXISTS") &&
            ddl.trim.endsWith("END") &&
            ddl.count(_ == '(') == ddl.count(_ == ')') // balanced parens proxy
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("affinity rules match SQLite datatype3 §3.1 on the 27-type test table") {
    import Affinity._
    val expect = Map(
      "INT" -> Integer, "INTEGER" -> Integer, "TINYINT" -> Integer,
      "SMALLINT" -> Integer, "MEDIUMINT" -> Integer, "BIGINT" -> Integer,
      "UNSIGNED BIG INT" -> Integer, "INT2" -> Integer, "INT8" -> Integer,
      "CHARACTER(20)" -> Text, "VARCHAR(255)" -> Text,
      "VARYING CHARACTER(255)" -> Text, "NCHAR(55)" -> Text,
      "NATIVE CHARACTER(70)" -> Text, "NVARCHAR(100)" -> Text,
      "TEXT" -> Text, "CLOB" -> Text,
      "BLOB" -> Blob, "" -> Blob,
      "REAL" -> Real, "DOUBLE" -> Real, "DOUBLE PRECISION" -> Real, "FLOAT" -> Real,
      "NUMERIC" -> Numeric, "DECIMAL(10,5)" -> Numeric, "BOOLEAN" -> Numeric,
      "DATE" -> Numeric, "DATETIME" -> Numeric)
    expect.foreach { case (t, a) =>
      assert(SqliteCatalog.affinityOf(t) == a, s"affinity($t)")
    }
  }

  test("operation parse is unknown-safe (triggers.go:589-599)") {
    assert(Operation.parse("insert") == Operation.Insert)
    assert(Operation.parse(" UPDATE ") == Operation.Update)
    assert(Operation.parse("DELETE") == Operation.Delete)
    assert(Operation.parse("TRUNCATE") == Operation.Unknown("TRUNCATE"))
  }
}
