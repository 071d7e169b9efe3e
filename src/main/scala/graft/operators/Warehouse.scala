package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DotFp9

/** The physical-layout half of the 100 TB story. The operator scale
  * notes (Similarity, Dedup) say "at real scale the corpus is written
  * bucketed, making the probe a partition-pruned read instead of a
  * filter" — this module is that layout, implemented and plan-audited
  * (WarehouseSpec) rather than asserted in comments.
  *
  *  - Vector corpus: directory-partitioned by the sign-LSH bucket
  *    (Similarity.s4's signature). A kNN probe then reads 1/2^NPlanes
  *    of the corpus — `PartitionFilters` in the scan, zero rows from
  *    other buckets ever leave parquet.
  *  - Fact tables: hash-bucketed by join key (`bucketBy` + sorted).
  *    Two tables bucketed the same way join with NO exchange on either
  *    side — the shuffle that dominates fact-fact joins at scale is
  *    paid once at write time, then amortized over every query.
  */
object Warehouse {

  /** Sign-LSH bucket column over `embedding` — identical construction
    * to Similarity.s4 (NPlanes md5-derived hyperplanes, fixed-point
    * dot), so buckets written here serve s4-style probes. The 'b'
    * prefix keeps partition-directory type inference from reading the
    * bit string as an integer (which would drop leading zeros). */
  def vectorBucket: org.apache.spark.sql.Column =
    concat(lit("b") +: (0 until Similarity.NPlanes).map { h =>
      when(Similarity.dotFp9(col("embedding"),
        array(Similarity.planeWeights(h).map(lit): _*)) >= 0L, "1").otherwise("0")
    }: _*)

  /** Driver-side twin of [[vectorBucket]] for probe-time bucket lookup:
    * same fixed-point rounding as the DotFp9 kernel, so the query vector
    * lands in exactly the bucket its stored copy would. */
  def bucketOf(v: Seq[Float]): String =
    "b" + (0 until Similarity.NPlanes).map { h =>
      val w = Similarity.planeWeights(h)
      var sum = 0L
      var j = 0
      while (j < math.min(v.length, w.length)) {
        sum += DotFp9.roundHalfAway(v(j).toDouble * w(j).toDouble * 1e9)
        j += 1
      }
      if (sum >= 0L) "1" else "0"
    }.mkString

  /** Write a vector corpus directory-partitioned by sign-LSH bucket. */
  def writeVectors(e: DataFrame, path: String): Unit =
    e.withColumn("bucket", vectorBucket)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Top-k cosine probe against a bucketed corpus: the bucket equality
    * filter prunes partitions at planning time — the scan touches only
    * the query's bucket directory. Exact within the bucket (same
    * recall contract as s4). */
  def knnProbe(s: SparkSession, path: String, query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qNorm = {
      var sum = 0L
      query.foreach(x => sum += DotFp9.roundHalfAway(x.toDouble * x.toDouble * 1e9))
      sum
    }
    s.read.parquet(path)
      .filter(col("bucket") === lit(bucketOf(query)))
      .withColumn("dot", Similarity.dotFp9(col("embedding"), q))
      .withColumn("norm", Similarity.normFp9(col("embedding")))
      .withColumn("cos", Similarity.cosine(col("dot"), lit(qNorm), col("norm")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Driver-side fixed-point dot (DotFp9 rounding) — probe-list math
    * over a driver-sized codebook. */
  private def dotFpOf(a: Seq[Float], b: Seq[Float]): Long = {
    var s = 0L
    var j = 0
    while (j < math.min(a.length, b.length)) {
      s += DotFp9.roundHalfAway(a(j).toDouble * b(j).toDouble * 1e9)
      j += 1
    }
    s
  }

  /** The `nprobe` nearest clusters of `query` in `cents`, by
    * (cos desc, cid) — the same ranking [[Similarity.probeClusters]]
    * computes in-plan, evaluated driver-side because the probe list
    * must exist BEFORE planning to become partition-filter literals.
    * Returned as the 'c'-prefixed directory labels [[writeIvf]] wrote. */
  private[graft] def ivfProbeLabels(cents: Seq[Similarity.Centroid],
      query: Seq[Float], nprobe: Int): Seq[String] = {
    val qNorm = dotFpOf(query, query)
    cents.map { c =>
      val cos = dotFpOf(query, c.emb).toDouble /
        (math.sqrt(qNorm.toDouble) * math.sqrt(c.normFp.toDouble))
      (c.cid, cos)
    }.sortBy { case (cid, cos) => (-cos, cid) }
      .take(nprobe).map("c" + _._1)
  }

  /** Write a vector corpus directory-partitioned by IVF cluster — the
    * layout s2's scale note calls for. Assignment is
    * [[Similarity.assignClusters]]' zero-exchange narrow projection
    * (trained or stand-in codebook), feeding the partitioned write
    * directly; norm_fp is stored so probes skip recomputing it. The
    * 'c' prefix keeps partition-directory type inference from reading
    * the cluster id as an integer. */
  def writeIvf(e: DataFrame, cents: Seq[Similarity.Centroid], path: String): Unit =
    Similarity.assignClusters(Similarity.withNorm(e), cents)
      .withColumn("cluster", concat(lit("c"), col("cluster")))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Top-k cosine probe against an IVF-partitioned corpus: the nprobe
    * nearest clusters are ranked DRIVER-side over the codebook and
    * pinned as partition-filter literals, so the scan lists and reads
    * ONLY those cluster directories (plan-asserted in WarehouseSpec) —
    * nprobe/nlist of the corpus instead of a full-corpus filter. Exact
    * within the probed clusters (s2's recall contract). */
  def ivfProbe(s: SparkSession, path: String, cents: Seq[Similarity.Centroid],
      query: Seq[Float], k: Int, nprobe: Int = Similarity.NProbe): DataFrame = {
    val q = array(query.map(lit): _*)
    val qNorm = dotFpOf(query, query)
    s.read.parquet(path)
      .filter(col("cluster").isin(ivfProbeLabels(cents, query, nprobe): _*))
      .withColumn("cos", Similarity.cosine(
        Similarity.dotFp9(col("embedding"), q), lit(qNorm), col("norm_fp")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Write a vector corpus as an IVFPQ index: directory-partitioned by
    * IVF cluster, rows carrying ONLY (vec_id, PQ codes, recon_norm) —
    * the raw embedding is dropped at write time, so the at-rest format
    * is ~8 bytes of codes per vector instead of the 256-byte float
    * vector (the s8 compression claim made physical; the probe's
    * ReadSchema is embedding-free, plan-asserted in WarehouseSpec). */
  def writeIvfPq(e: DataFrame, cents: Seq[Similarity.Centroid],
      cb: Map[Int, Seq[Similarity.SubCent]], path: String): Unit =
    Similarity.withPqCodes(
        Similarity.assignClusters(Similarity.withNorm(e), cents), cb)
      .withColumn("cluster", concat(lit("c"), col("cluster")))
      .drop("embedding", "norm_fp")
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Top-k ADC probe against an IVFPQ index: the nprobe nearest
    * clusters pin as partition-filter literals (only those directories
    * are read), the per-query LUT is computed DRIVER-side over the
    * codebook and inlined (PqSubs × PqK longs), and each scanned row
    * costs PqSubs lookups on its stored codes — the scan never touches
    * a float vector. Includes the query's own stored copy if probed
    * (callers exclude by vec_id as needed). */
  def ivfPqProbe(s: SparkSession, path: String,
      cents: Seq[Similarity.Centroid], cb: Map[Int, Seq[Similarity.SubCent]],
      query: Seq[Float], k: Int, nprobe: Int = Similarity.NProbe): DataFrame = {
    val qnorm = dotFpOf(query, query)
    val luts = (0 until Similarity.PqSubs).map { i =>
      val qSub = query.slice(i * Similarity.PqSubDim, (i + 1) * Similarity.PqSubDim)
      cb(i).map(c => dotFpOf(qSub, c.emb))
    }
    val adot = (0 until Similarity.PqSubs).map { i =>
      element_at(array(luts(i).map(lit): _*), col(s"code_$i").cast("int") + 1)
    }.reduce(_ + _)
    s.read.parquet(path)
      .filter(col("cluster").isin(ivfProbeLabels(cents, query, nprobe): _*))
      .withColumn("cos", Similarity.cosine(adot, lit(qnorm), col("recon_norm")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Write a table hash-bucketed + sorted by `key` (`nBuckets` files per
    * partition, one hash class each). Requires a catalog table —
    * bucketing metadata lives in the catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Persist the standing MinHash dedup index ([[Dedup.corpusPostings]])
    * hash-bucketed + sorted by its join key (band_idx, band_key). The
    * daily incremental run ([[Dedup.incrementalFromPostings]] over
    * `spark.table(table)`) then joins the new batch against the corpus
    * side with NO exchange on the corpus side (plan-asserted in
    * WarehouseSpec) — at 100 TB the corpus-side shuffle is the cost
    * that matters, and this layout pays it once at index-build time
    * instead of on every incremental run. */
  def writePostingsIndex(postings: DataFrame, table: String, nBuckets: Int): Unit =
    postings.write.mode("overwrite")
      .bucketBy(nBuckets, "band_idx", "band_key")
      .sortBy("band_idx", "band_key")
      .format("parquet").saveAsTable(table)

  /** Persist the per-doc MinHash signature base
    * ([[Dedup.sweepSigBase]]: doc_id, distinct shingles, 12-long sig)
    * bucketed by doc_id — the d20 design sweep's production posture:
    * the signature pipeline runs ONCE at write time, and every
    * audited banding config (plus the exact-Jaccard ground truth)
    * re-reads stored sigs instead of re-executing the shingle→hash→
    * minhash chain per consumer (the inline sweep's documented
    * bounded-linear-passes trade, eliminated here). */
  def writeSigTable(base: DataFrame, table: String, nBuckets: Int): Unit =
    base.write.mode("overwrite")
      .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(table)

  /** APPEND a batch's postings to an existing standing index (same
    * bucketing — `nBuckets` must match the write-time layout). A band
    * key can then appear in several posting rows (one per appended
    * batch); [[graft.operators.Dedup.incrementalFromPostings]]'s join
    * matches each of them, so candidate generation stays correct
    * without re-grouping the corpus — the day-2 index growth path
    * ([[graft.cdc.CdcPipeline]]). Periodic compaction (re-run
    * [[writePostingsIndex]] over the union) restores one-row-per-key
    * when the fragment count starts to matter. */
  def appendPostingsIndex(postings: DataFrame, table: String, nBuckets: Int): Unit =
    postings.write.mode("append")
      .bucketBy(nBuckets, "band_idx", "band_key")
      .sortBy("band_idx", "band_key")
      .format("parquet").saveAsTable(table)

  /** Persist the standing IMAGE-HASH index
    * ([[Multimodal.imgIndexKeys]] layout) bucketed + sorted by the
    * (band, v) join key — the same pay-the-shuffle-once contract as
    * [[writePostingsIndex]], for
    * [[Multimodal.imgIncrementalFromIndex]]'s ingest join
    * (exchange-free corpus side asserted in WarehouseSpec). Append a
    * batch's [[Multimodal.imgIndexKeys]] with the same bucketing for
    * day-2 growth, exactly like [[appendPostingsIndex]]. */
  def writeImgIndex(index: DataFrame, table: String, nBuckets: Int): Unit =
    index.write.mode("overwrite")
      .bucketBy(nBuckets, "band", "v").sortBy("band", "v")
      .format("parquet").saveAsTable(table)

  /** Persist the standing hourly rollup ([[Events.hourlyPartial]]
    * schema) hash-bucketed + sorted by the merge key (hour_s,
    * event_type). Delta-IVM absorption ([[Events.absorbDelta]])
    * against the table then plans its full-outer SortMergeJoin with NO
    * exchange on the rollup side (asserted in WarehouseSpec): the
    * merge costs exactly the delta's shuffle — the scale contract the
    * streaming maintainer
    * ([[graft.streaming.StreamOps.deltaAggStream]]) states. Each
    * absorption writes the successor rollup to a NEW table (the base
    * is read lazily; alternate A/B tables in steady state, the same
    * versioning discipline as the stream's parquet store). */
  def writeRollup(rollup: DataFrame, table: String, nBuckets: Int): Unit =
    rollup.write.mode("overwrite")
      .bucketBy(nBuckets, "hour_s", "event_type")
      .sortBy("hour_s", "event_type")
      .format("parquet").saveAsTable(table)

  /** Persist the standing CONTAINMENT pair stage
    * ([[Dedup.containmentPairs]] schema, `n_b` included) hash-bucketed
    * + sorted by `a` — the directed pair set's consumer key: d15's
    * best-container pick windows per `a`, so over this layout the
    * whole subsumption decision plans with NO exchange above the
    * bucketed scan (asserted in WarehouseSpec), and d9's listing is a
    * straight scan. The Σdf² pair join is the cost that matters at
    * 100 TB; this pays it once at write time and every later session
    * reads the standing table ([[Dedup.sharedContainment]]). */
  def writeContainment(pairs: DataFrame, table: String, nBuckets: Int): Unit =
    // align tasks with buckets before the write: bucketBy alone makes
    // EVERY task write its own file per bucket (tasks × buckets small
    // files); one hash repartition on the bucket key yields exactly
    // nBuckets files and a listing-cheap read-back
    pairs.repartition(nBuckets, col("a"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "a").sortBy("a", "b")
      .format("parquet").saveAsTable(table)

  /** Persist the standing contamination index
    * ([[TextAnalysis.trainShingleIndex]]) hash-bucketed + sorted by
    * shingle — the same pay-the-shuffle-once contract as
    * [[writePostingsIndex]], for the
    * [[TextAnalysis.contaminationFromIndex]] join. */
  def writeShingleIndex(index: DataFrame, table: String, nBuckets: Int): Unit =
    index.write.mode("overwrite")
      .bucketBy(nBuckets, "shingle").sortBy("shingle")
      .format("parquet").saveAsTable(table)

  /** Get-or-create a STANDING pure-stage table — the
    * pay-the-shuffle-once discipline generalized from the containment
    * family so any heavy pure function of a corpus directory (pair
    * stages, decoded-hash stages, component resolutions) persists
    * across sessions:
    *
    *  - table name = `<prefix>_<md5(source)>` — a REAL 128-bit digest
    *    of the corpus directory, not String.hashCode (31-bit silent
    *    collisions would hand a later session the WRONG corpus's
    *    rows);
    *  - the source path (and any posture knobs in `props`) ride
    *    TBLPROPERTIES and are VALIDATED before a pre-existing table
    *    is trusted — a mismatch refuses loudly rather than serving
    *    another corpus's / another posture's rows;
    *  - a previous JVM's orphaned managed LOCATION (in-memory catalog
    *    gone, directory left under the warehouse dir) is cleared
    *    before the create, or saveAsTable throws
    *    LOCATION_ALREADY_EXISTS;
    *  - `write(table)` materializes the stage (bucketed saveAsTable —
    *    the caller picks the consumer join key), run ONCE; every
    *    later session on the same catalog reads the standing table.
    */
  def standingTable(s: SparkSession, prefix: String, source: String,
      props: Map[String, String] = Map.empty)(write: String => Unit): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(source.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"${prefix}_$digest"
    val want = props + ("graft.source" -> source)
    // a table that exists WITHOUT graft.source is a half-created
    // orphan — a crash landed between saveAsTable's commit and the
    // one ALTER that stamps every property (no validated writer ever
    // leaves the key absent). Drop and rebuild rather than refusing:
    // a refusal here would permanently brick the whole query family
    // on this catalog, with nothing left to protect (the row content
    // is untrusted precisely because the stamp never landed).
    def sourceProp(): Option[String] = scala.util.Try(
      s.sql(s"SHOW TBLPROPERTIES $table ('graft.source')")
        .collect().headOption.map(_.getString(1))
        // the engine answers a MISSING key with a "does not have
        // property" message row, not an absent row — only a real
        // path/posture value counts as stamped
        .filterNot(_.contains("does not have property"))).toOption.flatten
    if (s.catalog.tableExists(table) && sourceProp().isEmpty)
      s.sql(s"DROP TABLE $table")
    if (s.catalog.tableExists(table)) {
      def prop(k: String) = scala.util.Try(
        s.sql(s"SHOW TBLPROPERTIES $table ('$k')")
          .collect().headOption.map(_.getString(1))).toOption.flatten
      want.foreach { case (k, v) =>
        val got = prop(k)
        require(got.contains(v),
          s"standing table $table carries $k=$got, expected $v — " +
            "refusing to serve another corpus's/posture's rows")
      }
    } else {
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(
          s.sessionState.catalog.getDefaultDBPath("default")), table)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      write(table)
      val kv = want.toSeq.sortBy(_._1)
        .map { case (k, v) => s"'$k' = '${v.replace("'", "''")}'" }
        .mkString(", ")
      s.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kv)")
    }
    s.table(table)
  }

  /** Bucketed standing-stage write: one hash repartition on the bucket
    * key first, so the write yields exactly `nBuckets` files (bucketBy
    * alone makes every task write its own file per bucket) and the
    * read-back is listing-cheap. */
  def writeStanding(df: DataFrame, table: String, keys: Seq[String],
      nBuckets: Int): Unit =
    df.repartition(nBuckets, keys.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Join two co-bucketed catalog tables on their bucket key. With equal
    * bucket counts Spark plans a SortMergeJoin with NO Exchange on
    * either side (asserted in WarehouseSpec) — the write-time layout
    * replaces the per-query shuffle. */
  def coLocatedJoin(s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), key)

  /** Per-doc curation signals joined over a doc_id-bucketed documents
    * table. The signal stages used here (quality bands, language id)
    * are NARROW maps, so each preserves the write-time bucketing and
    * the joins back to the docs plan with no Exchange on any side
    * (asserted in WarehouseSpec) — the x10 manifest's join fabric with
    * its per-query doc_id shuffle paid once at write time. Corpus-wide
    * signals (the exact-dup window, cluster resolution) still shuffle
    * on their own keys; bucketing cannot absorb a grouping on a
    * different key. */
  def curationSignalJoin(s: SparkSession, table: String): DataFrame = {
    val docs = s.table(table)
    // no separate doc_id anchor: each signal frame is a per-doc
    // projection (one row per doc), so their join already covers the
    // corpus — an anchor leg would be a third scan + join for nothing
    TextAnalysis.qualitySignals(docs)
      .select(col("doc_id"), col("quality_e3"))
      .join(TextAnalysis.langIdSignals(docs)
        .select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
  }
}
