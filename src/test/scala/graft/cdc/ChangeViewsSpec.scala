package graft.cdc

import org.apache.spark.sql.Row

import graft.SparkSpecBase
import graft.streaming.StreamOps
import SqliteCatalog._

class ChangeViewsSpec extends SparkSpecBase {
  import scala.jdk.CollectionConverters._

  private val meta = TableMeta("users", withoutRowId = false, Seq(
    ColumnMeta("id", "INTEGER", 1),
    ColumnMeta("name", "TEXT", 0),
    ColumnMeta("score", "REAL", 0),
    ColumnMeta("avatar", "BLOB", 0)))

  private def log(rows: (Long, String, Option[String], Option[String])*): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      rows.map { case (id, op, before, after) =>
        Row(id, "2024-05-06 00:00:00.000", "users", op,
          before.orNull, after.orNull)
      }.asJava, Change.logSchema)

  private def img(id: Long, name: String, score: Double, hex: String = "FF00") =
    s"""{"id":$id,"name":"$name","score":$score,"avatar":"$hex"}"""

  test("typed: images parse with the introspected schema; blobs as hex text") {
    val df = ChangeViews.typed(
      log((1L, "INSERT", None, Some(img(7, "ada", 1.5)))), meta)
    val r = df.select("after_row.id", "after_row.name", "after_row.score",
      "after_row.avatar").collect().head
    assert(r.getLong(0) == 7L && r.getString(1) == "ada" &&
      r.getDouble(2) == 1.5 && r.getString(3) == "FF00")
    assert(df.select("before_row").collect().head.isNullAt(0))
  }

  test("materialize applies the ordered log: newest wins, DELETE removes") {
    val rows = log(
      (1L, "INSERT", None, Some(img(1, "a", 1.0))),
      (2L, "INSERT", None, Some(img(2, "b", 2.0))),
      (3L, "INSERT", None, Some(img(3, "c", 3.0))),
      (4L, "UPDATE", Some(img(2, "b", 2.0)), Some(img(2, "b2", 2.5))),
      (5L, "DELETE", Some(img(3, "c", 3.0)), None),
      (6L, "UPDATE", Some(img(2, "b2", 2.5)), Some(img(2, "b3", 2.9))))
    val out = ChangeViews.materialize(rows, meta)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 1.0), (2L, "b3", 2.9)))
  }

  test("materialize keys on the before image for DELETE (after is NULL)") {
    val rows = log(
      (1L, "INSERT", None, Some(img(9, "x", 1.0))),
      (2L, "DELETE", Some(img(9, "x", 1.0)), None))
    assert(ChangeViews.materialize(rows, meta).isEmpty)
  }

  test("schema evolution: images from BEFORE an additive ALTER materialize " +
      "under the post-ALTER schema with nulls for the new column; extra " +
      "unknown image fields are ignored") {
    // day-2 reality: the log spans an ALTER TABLE users ADD COLUMN —
    // early images lack 'score'; a foreign producer even wrote a field
    // the schema never had. Typed decode is from_json against the
    // CURRENT introspected schema, so old rows surface with null for
    // the late column, new rows carry it, and unknown fields drop —
    // replaying a mixed-era log needs no migration pass.
    val rows = log(
      (1L, "INSERT", None,
        Some("""{"id":1,"name":"old","avatar":"AA"}""")),          // pre-ALTER
      (2L, "INSERT", None,
        Some(img(2, "new", 2.0))),                                 // post-ALTER
      (3L, "UPDATE", Some("""{"id":1,"name":"old","avatar":"AA"}"""),
        Some("""{"id":1,"name":"old2","avatar":"AA","ghost":9}"""))) // unknown field
    val out = ChangeViews.materialize(rows, meta).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(r.fieldIndex("score"))))).toMap
    assert(out(1L) == (("old2", None)),
      "pre-ALTER rows must materialize with null for the late column")
    assert(out(2L) == (("new", Some(2.0))))
    assert(!out.contains(9L), "unknown image fields must not leak")
  }

  test("materialize refuses bare-rowid tables (no stable key in images)") {
    val noPk = meta.copy(columns = meta.columns.map(_.copy(pkOrdinal = 0)))
    assertThrows[IllegalArgumentException](
      ChangeViews.materialize(log(), noPk))
  }

  test("streaming materialized view equals batch materialize on bounded replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions.{col, desc, row_number}
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import ChangeViewsSpec.LogRow
    val rows = Seq(
      LogRow(1L, "2024-05-06 00:00:00.000", "users", "INSERT", None, Some(img(1, "a", 1.0))),
      LogRow(2L, "2024-05-06 00:00:00.000", "users", "INSERT", None, Some(img(2, "b", 2.0))),
      LogRow(3L, "2024-05-06 00:00:00.000", "users", "INSERT", None, Some(img(3, "c", 3.0))),
      LogRow(4L, "2024-05-06 00:00:00.000", "users", "UPDATE",
        Some(img(2, "b", 2.0)), Some(img(2, "b2", 2.5))),
      LogRow(5L, "2024-05-06 00:00:00.000", "users", "DELETE",
        Some(img(3, "c", 3.0)), None),
      LogRow(6L, "2024-05-06 00:00:00.000", "users", "UPDATE",
        Some(img(2, "b2", 2.5)), Some(img(2, "b3", 2.9))))
    val in = MemoryStream[LogRow]
    val q = StreamOps.materializedView(in.toDF(), "users", Seq("id"))
      .writeStream.format("memory").queryName("mv")
      .outputMode(OutputMode.Update()).start()
    rows.grouped(3).foreach { c => in.addData(c); q.processAllAvailable() }
    q.stop()
    // final state per key = the max-id emission for that key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk")).orderBy(desc("id"))
    val fin = spark.table("mv")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("pk", "after").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fin == Map(
      """{"id":"1"}""" -> Some(img(1, "a", 1.0)),
      """{"id":"2"}""" -> Some(img(2, "b3", 2.9)),
      """{"id":"3"}""" -> None))
    // and the live rows agree with the batch apply
    val batch = ChangeViews.materialize(log(
      rows.map(r => (r.id, r.operation, r.before, r.after)): _*), meta)
      .collect().map(r => s"""{"id":"${r.getLong(0)}"}""").toSet
    assert(fin.filter(_._2.nonEmpty).keySet == batch)
  }

  test("streaming view keeps collision-prone composite pks distinct, matching batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import ChangeViewsSpec.LogRow
    // composite key (a,b): ("1","23") vs ("12","3") — a concat-built
    // state key collapses both to "123" and merges the rows.
    def cimg(a: String, b: String, v: Double) =
      s"""{"a":"$a","b":"$b","v":$v}"""
    val rows = Seq(
      LogRow(1L, "2024-05-06 00:00:00.000", "t", "INSERT", None, Some(cimg("1", "23", 1.0))),
      LogRow(2L, "2024-05-06 00:00:00.000", "t", "INSERT", None, Some(cimg("12", "3", 2.0))),
      LogRow(3L, "2024-05-06 00:00:00.000", "t", "UPDATE",
        Some(cimg("1", "23", 1.0)), Some(cimg("1", "23", 1.5))))
    val in = MemoryStream[LogRow]
    val q = StreamOps.materializedView(in.toDF(), "t", Seq("a", "b"))
      .writeStream.format("memory").queryName("mv_composite")
      .outputMode(OutputMode.Update()).start()
    rows.grouped(2).foreach { c => in.addData(c); q.processAllAvailable() }
    q.stop()
    import org.apache.spark.sql.functions.{col, desc, row_number}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk")).orderBy(desc("id"))
    val fin = spark.table("mv_composite")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("pk", "after").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // two DISTINCT live keys, each with its own newest image
    assert(fin == Map(
      """{"a":"1","b":"23"}""" -> Some(cimg("1", "23", 1.5)),
      """{"a":"12","b":"3"}""" -> Some(cimg("12", "3", 2.0))))
    // batch twin agrees on the live key tuples
    val cmeta = TableMeta("t", withoutRowId = false, Seq(
      ColumnMeta("a", "TEXT", 1), ColumnMeta("b", "TEXT", 2),
      ColumnMeta("v", "REAL", 0)))
    val batch = ChangeViews.materialize(spark.createDataFrame(
      rows.map(r => Row(r.id, r.timestamp, r.tablename, r.operation,
        r.before.orNull, r.after.orNull)).asJava, Change.logSchema), cmeta)
      .collect().map(r => s"""{"a":"${r.getString(0)}","b":"${r.getString(1)}"}""").toSet
    assert(fin.keySet == batch)
  }

  test("streaming view fails loudly on a null/missing pk field") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import ChangeViewsSpec.LogRow
    val in = MemoryStream[LogRow]
    val q = StreamOps.materializedView(in.toDF(), "t", Seq("a", "b"))
      .writeStream.format("memory").queryName("mv_nullpk")
      .outputMode(OutputMode.Update()).start()
    in.addData(Seq(LogRow(1L, "2024-05-06 00:00:00.000", "t", "INSERT",
      None, Some("""{"a":"1","v":9.0}""")))) // pk field b missing
    val ex = intercept[StreamingQueryException](q.processAllAvailable())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("null or missing pk field 'b'")))
    q.stop()
  }

  test("end-to-end: engine-drained parquet log materializes to current state") {
    val dir = java.nio.file.Files.createTempDirectory("cv").toString
    val plog = new ParquetChangeLog(dir)
    plog.append(log(
      (1L, "INSERT", None, Some(img(1, "a", 1.0))),
      (2L, "UPDATE", Some(img(1, "a", 1.0)), Some(img(1, "a2", 1.1)))))
    val out = ChangeViews.materialize(plog.readFrom(spark, -1L), meta)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a2")))
  }
}

object ChangeViewsSpec {
  case class LogRow(id: Long, timestamp: String, tablename: String,
    operation: String, before: Option[String], after: Option[String])
}
