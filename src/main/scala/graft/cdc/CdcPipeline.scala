package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType, TimestampType}

import graft.operators.{Dedup, Warehouse}

/** The day-2 COMPOSITION the library's two halves exist for: change
  * CAPTURE (a [[CdcEngine]]'s ordered at-least-once batches) feeding
  * CURATION (the standing near-dup index of
  * [[graft.operators.Warehouse.writePostingsIndex]]). Each delivered
  * batch's INSERT after-images become new documents; the batch is
  * near-dup-checked against the persisted postings index via
  * [[graft.operators.Dedup.incrementalFromPostings]] — new×corpus and
  * new×new pairs only, never corpus×corpus, and the corpus side of the
  * join never shuffles (WarehouseSpec's bucketed-layout contract).
  * After the sink consumes a batch's candidates, the batch's own
  * postings are APPENDED to the index, so later batches also pair
  * against earlier ones — a replay of the batches therefore
  * reproduces exactly the one-shot d8 answer over the union batch
  * (pinned by CdcPipelineSpec).
  *
  * Scale notes (100 TB): per batch the work is one narrow
  * signature/banding map over the batch plus a bucket-local join that
  * moves only the batch's (bands × docs) rows; the index grows by
  * appended bucket files, keeping the pay-the-shuffle-once layout. The
  * engine's fail-stop contract carries through: a sink error
  * propagates before the index append, the batch is not acked, and
  * at-least-once redelivery re-runs it against an un-advanced index.
  */
object CdcPipeline {

  /** Schema of a curated document row inside the change images. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** INSERT after-images of `table` in a delivered batch, parsed to
    * (doc_id, text) rows — the same narrow from_json projection
    * [[ChangeViews.typed]] uses, restricted to what the dedup path
    * consumes. */
  def insertedDocs(changes: Dataset[Change], table: String): DataFrame =
    changes.toDF()
      .filter(col("table") === table &&
        col("operation") === Operation.Insert.name)
      .select(from_json(col("after"), DocSchema).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))

  /** Schema of an event row inside the change images — the e-family
    * shape the aggregation path consumes. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  /** INSERT after-images of `table` parsed to event rows — the
    * aggregation-path twin of [[insertedDocs]]. Works identically on a
    * bounded frame or the unbounded `cdc-log` stream: composing it
    * with [[graft.streaming.StreamOps.deltaAggStream]] wires CAPTURE
    * into incremental AGGREGATE MAINTENANCE (each delivered batch's
    * partial sums absorb into the standing rollup), with exactly-once
    * absorption from the stream's checkpointed batch ids + the store's
    * version-bounded base reads — proven end-to-end over a real JDBC
    * log in CdcPipelineSpec. */
  def insertedEvents(changes: Dataset[Change], table: String): DataFrame =
    changes.toDF()
      .filter(col("table") === table &&
        col("operation") === Operation.Insert.name)
      .select(from_json(col("after"), EventSchema).as("r"))
      .select(col("r.ts").as("ts"), col("r.event_type").as("event_type"),
        col("r.value").as("value"))

  /** One delivered batch → near-dup candidates against the persisted
    * standing index (plus within-batch pairs) — the capture→curation
    * hand-off, run per batch. */
  def incrementalDedupBatch(s: SparkSession, changes: Dataset[Change],
      table: String, postingsTable: String,
      maxBucket: Option[Int] = None): DataFrame =
    Dedup.incrementalFromPostings(s.table(postingsTable),
      Dedup.lshIndex(insertedDocs(changes, table)), maxBucket)

  /** A [[ChangesHandler]] wiring the hand-off end-to-end: for every
    * delivered batch, compute the batch's candidates, hand them to
    * `sink`, then append the batch's postings to the standing index so
    * subsequent batches pair against this one too.
    *
    * `sink` MUST consume the frame before returning (collect or write):
    * the index append happens after `sink` returns, and a frame
    * evaluated later would read the already-advanced index. A sink
    * error propagates before the append and before the engine's ack —
    * fail-stop with at-least-once redelivery against an unchanged
    * index. `nBuckets` must match the index's write-time bucketing. */
  def dedupHandler(s: SparkSession, table: String, postingsTable: String,
      nBuckets: Int, maxBucket: Option[Int] = None)(
      sink: DataFrame => Unit): ChangesHandler =
    ChangesHandler { changes =>
      sink(incrementalDedupBatch(s, changes, table, postingsTable, maxBucket))
      Warehouse.appendPostingsIndex(
        Dedup.corpusPostings(Dedup.lshIndex(insertedDocs(changes, table))),
        postingsTable, nBuckets)
    }
}
