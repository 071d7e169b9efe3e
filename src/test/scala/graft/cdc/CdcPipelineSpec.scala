package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{Dedup, Warehouse}

/** The end-to-end day-2 story: documents arriving THROUGH the CDC
  * engine (ordered insert batches off the change log) are near-dup
  * checked against the persisted standing postings index, and the
  * per-batch replay reproduces exactly the one-shot d8 batch answer —
  * capture feeds curation, proven, not implied. */
class CdcPipelineSpec extends SparkSpecBase {
  import scala.jdk.CollectionConverters._

  private def key(r: Row) =
    (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("n_sig_match"), r.getAs[Long]("est_jaccard_e6"))

  test("capture feeds curation: CDC-inserted docs vs standing index ≡ d8's one-shot answer") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // standing corpus: everything below the d8 split, persisted bucketed
    Warehouse.writePostingsIndex(
      Dedup.corpusPostings(
        Dedup.lshIndex(docs.filter(col("doc_id") < Dedup.IncrementalSplit))),
      "wh_cdc_postings", 4)
    try {
      // the new batch ARRIVES THROUGH CDC: one INSERT per doc ≥ split,
      // after-image = the row as JSON — the trigger-written shape
      val images = docs.filter(col("doc_id") >= Dedup.IncrementalSplit)
        .orderBy(col("doc_id"))
        .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
        .collect().map(_.getString(0)).toSeq
      val rows = images.zipWithIndex.map { case (j, i) =>
        Row(i.toLong, f"2024-05-06 00:03:${i % 60}%02d.123", "documents",
          "INSERT", null, j)
      }
      val log = new ParquetChangeLog(Files.createTempDirectory("cdclog").toString)
      log.append(spark.createDataFrame(rows.asJava, Change.logSchema))
      // drain through the pipeline handler — default 50-row batches, so
      // the 100 new docs cross a batch boundary: batch 2 must pair
      // against batch 1 through the APPENDED index, not just the corpus
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
      var batches = 0
      val handler = CdcPipeline.dedupHandler(
        spark, "documents", "wh_cdc_postings", 4) { df =>
        batches += 1
        got ++= df.collect().map(key)
      }
      val n = new CdcEngine(spark, log, handler).cdcAvailableNow()
      assert(n == images.size)
      assert(batches == 2, s"expected the 100 docs in 2 engine batches, got $batches")
      // per-batch replay ≡ the one-shot d8 incremental answer
      val want = Dedup.d8IncrementalLsh(spark, sf).collect().map(key).toSet
      assert(want.nonEmpty, "fixture has no incremental candidates")
      assert(got.toSet == want,
        s"pipeline diverges from d8: extra=${(got.toSet -- want).take(3)} " +
          s"missing=${(want -- got.toSet).take(3)}")
      // the appended index really carries both batches now: the same
      // docs re-checked as a fresh batch also pair against themselves
      // through the index (strictly more candidates than the replay)
      val again = Dedup.incrementalFromPostings(
        spark.table("wh_cdc_postings"),
        Dedup.lshIndex(docs.filter(col("doc_id") >= Dedup.IncrementalSplit)),
        maxBucket = None)
      assert(again.count() >= want.size.toLong,
        "appended index lost the first batches")
    } finally {
      spark.sql("DROP TABLE IF EXISTS wh_cdc_postings"): Unit
    }
  }
}
