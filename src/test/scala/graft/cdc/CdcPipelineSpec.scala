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

  test("capture feeds the multimodal pipeline: cdc-log stream → typed " +
      "inserts → image + text ingest twins → crossModalManifest ≡ batch " +
      "m17 once both stores drain; while the TEXT store lags, its " +
      "missing docs ride the manifest as img-only singletons") {
    import java.sql.DriverManager
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamOps
    import graft.operators.{Components, Multimodal}
    import spark.implicits._

    val dbDir = Files.createTempDirectory("derby-mm").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val c0 = DriverManager.getConnection(url)
    try {
      c0.createStatement().execute("""CREATE TABLE CDC_LOG (
        "id" BIGINT PRIMARY KEY, "timestamp" VARCHAR(30) NOT NULL,
        "tablename" VARCHAR(128) NOT NULL, "operation" VARCHAR(10) NOT NULL,
        "before" CLOB, "after" CLOB)""")
    } finally c0.close()

    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
    // after-images exactly as the triggers would write them
    val images = docs
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("text"))).as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val split = images(images.length / 2)._1
    var nextLogId = 0L
    def insertDocs(part: Array[(Long, String)]): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val ps = c.prepareStatement("INSERT INTO CDC_LOG VALUES (?, ?, ?, ?, ?, ?)")
        part.foreach { case (_, j) =>
          ps.setLong(1, nextLogId)
          ps.setString(2, f"2024-05-06 00:00:${nextLogId % 60}%02d.000")
          ps.setString(3, "documents")
          ps.setString(4, "INSERT")
          ps.setString(5, null)
          ps.setString(6, j)
          ps.addBatch()
          nextLogId += 1
        }
        ps.executeBatch(); ps.close()
      } finally c.close()
    }

    val imgStore = Files.createTempDirectory("mm-imgstore").toString
    val txtStore = Files.createTempDirectory("mm-txtstore").toString
    val ckptImg = Files.createTempDirectory("mm-ckpt-img").toString
    val ckptTxt = Files.createTempDirectory("mm-ckpt-txt").toString
    def logStream() = StreamOps.changes(spark.readStream.format("cdc-log")
      .option("url", url).option("logTable", "CDC_LOG").load())
    // the two modality streams read the SAME change log at independent
    // offsets — each drain advances only its own checkpoint
    def drainImg(): Unit = {
      val q = StreamOps.imgDedupIngest(
        CdcPipeline.insertedDocs(logStream(), "documents")
          .select(col("doc_id")).as[Long], imgStore)
        .option("checkpointLocation", ckptImg)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def drainTxt(): Unit = {
      val q = StreamOps.textDedupIngest(
        CdcPipeline.insertedDocs(logStream(), "documents")
          .select(col("doc_id"), col("text")), txtStore)
        .option("checkpointLocation", ckptTxt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    def manifest() = StreamOps.crossModalManifest(spark, txtStore, imgStore)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[java.lang.Long]("text_cluster")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("img_cluster")).map(_.toLong),
          r.getAs[Long]("n_joint"), r.getAs[Long]("canonical_id"),
          r.getAs[Long]("keep")))).toMap
    // batch twins over an arbitrary doc frame, for mid-stream prefixes
    def batchTxtClusters(d: org.apache.spark.sql.DataFrame) =
      Dedup.dupClusters(d)
        .select(col("doc_id"), col("cluster_rep").as("text_cluster"))
    def batchImgClusters(d: org.apache.spark.sql.DataFrame) = {
      val hs = Multimodal.imgHash(d.select(col("doc_id")).as[Long])
      Components.connectedComponents(
          d.select(col("doc_id").as("id")),
          Multimodal.imgNearDupPairs(hs, None).select(col("a"), col("b")))
        .select(col("id").as("doc_id"), col("rep").as("img_cluster"))
    }
    def expect(txt: org.apache.spark.sql.DataFrame,
        img: org.apache.spark.sql.DataFrame) =
      Multimodal.jointKeepOne(txt, img).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((Option(r.getAs[java.lang.Long]("text_cluster")).map(_.toLong),
            Option(r.getAs[java.lang.Long]("img_cluster")).map(_.toLong),
            r.getAs[Long]("n_joint"), r.getAs[Long]("canonical_id"),
            r.getAs[Long]("keep")))).toMap

    val prefix = docs.filter(col("doc_id") < split)
    // tranche 1 arrives; both modalities drain and agree with the
    // batch composition over the prefix
    insertDocs(images.filter(_._1 < split))
    drainImg(); drainTxt()
    assert(manifest() == expect(batchTxtClusters(prefix), batchImgClusters(prefix)),
      "caught-up prefix manifest diverged from the batch composition")
    // tranche 2 arrives; only the IMAGE stream drains — the text store
    // lags, and the manifest must keep the img-only docs as singletons
    insertDocs(images.filter(_._1 >= split))
    drainImg()
    val lagged = manifest()
    assert(lagged == expect(batchTxtClusters(prefix), batchImgClusters(docs)),
      "lagging-text manifest diverged from the batch composition")
    val imgOnly = lagged.filter { case (_, (t, _, _, _, _)) => t.isEmpty }
    assert(imgOnly.nonEmpty && imgOnly.keySet == images.map(_._1).filter(_ >= split).toSet,
      "tranche-2 docs did not surface as img-only rows")
    assert(imgOnly.values.forall { case (_, i, n, _, keep) =>
      i.nonEmpty && n == 1L && keep == 1L },
      s"img-only docs not kept as singletons: ${imgOnly.take(3)}")
    // text catches up: the composed manifest is exactly batch m17
    drainTxt()
    val m17 = Multimodal.m17CrossModalManifest(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[java.lang.Long]("text_cluster")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("img_cluster")).map(_.toLong),
          r.getAs[Long]("n_joint"), r.getAs[Long]("canonical_id"),
          r.getAs[Long]("keep")))).toMap
    assert(manifest() == m17, "caught-up manifest diverged from batch m17")
  }

  test("capture feeds the alignment gate: cdc-log stream → typed inserts → " +
      "alignFilterStream ≡ batch m18 over the replayed docs") {
    import java.sql.DriverManager
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps
    import graft.operators.Multimodal
    import spark.implicits._

    val dbDir = Files.createTempDirectory("derby-align").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val c0 = DriverManager.getConnection(url)
    try {
      c0.createStatement().execute("""CREATE TABLE CDC_LOG (
        "id" BIGINT PRIMARY KEY, "timestamp" VARCHAR(30) NOT NULL,
        "tablename" VARCHAR(128) NOT NULL, "operation" VARCHAR(10) NOT NULL,
        "before" CLOB, "after" CLOB)""")
    } finally c0.close()

    val images = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("text"))).as("j"))
      .orderBy(col("doc_id")).limit(80)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    var nextLogId = 0L
    def insertDocs(part: Array[(Long, String)]): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val ps = c.prepareStatement("INSERT INTO CDC_LOG VALUES (?, ?, ?, ?, ?, ?)")
        part.foreach { case (_, j) =>
          ps.setLong(1, nextLogId)
          ps.setString(2, f"2024-05-06 00:00:${nextLogId % 60}%02d.000")
          ps.setString(3, "documents")
          ps.setString(4, "INSERT")
          ps.setString(5, null)
          ps.setString(6, j)
          ps.addBatch()
          nextLogId += 1
        }
        ps.executeBatch(); ps.close()
      } finally c.close()
    }

    val txtFold = Multimodal.textFold(graft.Tables.embeddings(spark, sf))
    val q = StreamOps.alignFilterStream(
      CdcPipeline.insertedDocs(
        StreamOps.changes(spark.readStream.format("cdc-log")
          .option("url", url).option("logTable", "CDC_LOG").load()),
        "documents")
        .select(col("doc_id")).as[Long], txtFold)
      .writeStream.format("memory").queryName("cdc_align")
      .outputMode(OutputMode.Append()).start()
    // two tranches; stateless, so each tranche's decisions land in its
    // own drain — no state, no watermark, the decode at ingest
    val (t1, t2) = images.splitAt(images.length / 2)
    insertDocs(t1); q.processAllAvailable()
    assert(spark.table("cdc_align").count() == t1.length.toLong)
    insertDocs(t2); q.processAllAvailable()
    q.stop()
    val got = spark.table("cdc_align").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("align_e6"), r.getAs[Long]("keep"))).toMap
    val ids = images.map(_._1).toSet
    val want = Multimodal.m18AlignmentFilter(spark, sf).collect()
      .filter(r => ids(r.getAs[Long]("doc_id")))
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("align_e6"), r.getAs[Long]("keep"))).toMap
    assert(got == want, {
      val bad = want.keys.filter(k => got.get(k) != want.get(k)).take(3)
      s"capture-fed alignment diverged from batch m18 at " +
        s"${bad.map(k => (k, got.get(k), want(k))).mkString(", ")}"
    })
  }

  test("capture feeds aggregation: cdc-log stream → delta-IVM rollup ≡ one-shot " +
      "aggregate, content exactly-once across drains and empty restarts") {
    import java.sql.DriverManager
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamOps

    val dbDir = Files.createTempDirectory("derby-ivm").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val c0 = DriverManager.getConnection(url)
    try {
      c0.createStatement().execute("""CREATE TABLE CDC_LOG (
        "id" BIGINT PRIMARY KEY, "timestamp" VARCHAR(30) NOT NULL,
        "tablename" VARCHAR(128) NOT NULL, "operation" VARCHAR(10) NOT NULL,
        "before" CLOB, "after" CLOB)""")
    } finally c0.close()

    def evJson(i: Int): (String, String, Double) = {
      val hour = f"2024-05-06 ${i / 25}%02d:00:00"
      val typ = if (i % 3 == 0) "click" else "view"
      val v = (i % 7) + 0.25
      (hour, typ, v)
    }
    def insertEvents(ids: Range): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val ps = c.prepareStatement("INSERT INTO CDC_LOG VALUES (?, ?, ?, ?, ?, ?)")
        ids.foreach { i =>
          val (hour, typ, v) = evJson(i)
          ps.setLong(1, i.toLong)
          ps.setString(2, f"2024-05-06 00:00:${i % 60}%02d.000")
          ps.setString(3, "events")
          ps.setString(4, "INSERT")
          ps.setString(5, null)
          ps.setString(6,
            s"""{"event_id":$i,"ts":"$hour","event_type":"$typ","value":$v}""")
          ps.addBatch()
        }
        ps.executeBatch(); ps.close()
      } finally c.close()
    }

    val store = Files.createTempDirectory("ivm-store").toString
    val ckpt = Files.createTempDirectory("ivm-ckpt").toString
    def drain(): Unit = {
      val log = spark.readStream.format("cdc-log")
        .option("url", url).option("logTable", "CDC_LOG").load()
      val events = CdcPipeline.insertedEvents(StreamOps.changes(log), "events")
      val q = StreamOps.deltaAggStream(events, store)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rollup() = StreamOps.deltaAggCurrent(spark, store).collect()
      .map(r => (r.getAs[Long]("hour_s"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toMap
    def oneShot(n: Int) = {
      import spark.implicits._
      graft.operators.Events.hourlyPartial(
        (0 until n).map { i =>
          val (hour, typ, v) = evJson(i)
          (java.sql.Timestamp.valueOf(hour), typ, v)
        }.toDF("ts", "event_type", "value")).collect()
        .map(r => (r.getAs[Long]("hour_s"), r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toMap
    }

    insertEvents(0 until 100)
    drain()
    assert(rollup() == oneShot(100), "first drain diverges from one-shot")
    // day-2 growth: a later batch absorbs on top of the standing store
    insertEvents(100 until 150)
    drain()
    assert(rollup() == oneShot(150), "second drain diverges")
    // an empty restart must not change the rollup content
    drain()
    assert(rollup() == oneShot(150), "empty restart mutated the rollup")
  }
}
