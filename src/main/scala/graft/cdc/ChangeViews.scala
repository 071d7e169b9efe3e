package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SqliteCatalog.TableMeta

/** Consumer-side typed views over the change log — the APPLY half of
  * CDC the reference leaves to its users: the log carries full-row
  * images as JSON text (reference change.go:15-17); a consumer wants
  * typed columns and, usually, the CURRENT state of each table.
  *
  * Scale notes (100 TB): `typed` is a narrow from_json projection (the
  * schema comes from PRAGMA introspection, so no inference pass over
  * the data); `materialize` is one shuffle on the primary key + a
  * latest-per-key window — the same shape as the e5 latest-state
  * operator, partition-parallel across keys, AQE-skew-safe. Run it over
  * a [[ParquetChangeLog]] directory and it IS the warehouse
  * change-data-apply job.
  */
object ChangeViews {

  /** Typed per-table view over raw log rows (Change.logSchema): the
    * before/after JSON images parsed against the table's introspected
    * schema. BLOBs arrive hex-encoded in the images (reference
    * triggers.go:466-469), so they surface as hex strings by default. */
  def typed(logRows: DataFrame, t: TableMeta, blobsAsHex: Boolean = true): DataFrame = {
    val schema = SqliteCatalog.sparkSchema(t, blobsAsHex)
    logRows.filter(col("tablename") === t.name)
      .withColumn("before_row", from_json(col("before"), schema))
      .withColumn("after_row", from_json(col("after"), schema))
  }

  /** Current-state materialization: apply the ordered log per primary
    * key — the newest change wins, DELETE removes the row. Requires an
    * explicit primary key in the images (a bare-rowid table's images
    * carry no stable key — same limitation the reference's consumers
    * have; declare INTEGER PRIMARY KEY to capture it). */
  def materialize(logRows: DataFrame, t: TableMeta, blobsAsHex: Boolean = true): DataFrame = {
    require(t.pkColumns.nonEmpty,
      s"materialize needs an explicit primary key on ${t.name}: bare-rowid " +
        "images carry no stable row identity")
    val keyed = typed(logRows, t, blobsAsHex)
      .select(Seq(col("id"), col("operation"), col("after_row")) ++
        t.pkColumns.map(c =>
          coalesce(col(s"after_row.${c.name}"), col(s"before_row.${c.name}"))
            .as(s"__k_${c.name}")): _*)
    val w = Window
      .partitionBy(t.pkColumns.map(c => col(s"__k_${c.name}")): _*)
      .orderBy(col("id").desc)
    keyed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= Operation.Delete.name)
      .select(col("after_row.*"))
  }
}
