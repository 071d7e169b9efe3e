package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis, Warehouse}

/** Plan-audited proof of the write-time layouts the scale notes promise:
  * partition-pruned vector probes and exchange-free co-bucketed joins. */
class WarehouseSpec extends SparkSpecBase {

  test("bucketed vector corpus: probe is partition-pruned and exact within the bucket") {
    val dir = Files.createTempDirectory("graft-vec-wh").toFile.getAbsolutePath
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    Warehouse.writeVectors(e, dir)

    val query = e.filter(col("vec_id") === 3L)
      .select(col("embedding")).head.getSeq[Float](0)
    val probe = Warehouse.knnProbe(spark, dir, query, 5)

    // planning-time pruning: the scan's PartitionFilters pins the exact
    // bucket literal — only that partition directory is listed/read
    // (DataFrame.inputFiles can't show this; it lists pre-pruning)
    val b = Warehouse.bucketOf(query)
    val plan = planOf(probe)
    assert(plan.contains("PartitionFilters") && plan.contains(b),
      s"probe not partition-pruned to bucket $b:\n$plan")

    // exact within the bucket: same result as filtering the full corpus
    // by the driver-computed bucket (vec_id 3 itself ranks first, cos=1)
    val expect = e.withColumn("bucket", Warehouse.vectorBucket)
      .filter(col("bucket") === lit(b))
      .withColumn("dot", Similarity.dotFp9(col("embedding"),
        array(query.map(lit): _*)))
      .withColumn("norm", Similarity.normFp9(col("embedding")))
      .withColumn("qnorm", Similarity.normFp9(array(query.map(lit): _*)))
      .withColumn("cos", Similarity.cosine(col("dot"), col("qnorm"), col("norm")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"), round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .collect().toSeq
    assert(probe.collect().toSeq == expect)
    assert(expect.head.getLong(0) == 3L, "query vector should rank first in its own bucket")
  }

  test("IVF-partitioned corpus: probe prunes to the nprobe cluster directories") {
    val dir = Files.createTempDirectory("graft-ivf-wh").toFile.getAbsolutePath
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainCodebook(e)
    Warehouse.writeIvf(e, cents, dir)

    val query = e.filter(col("vec_id") === 3L)
      .select(col("embedding")).head.getSeq[Float](0)
    val labels = Warehouse.ivfProbeLabels(cents, query, Similarity.NProbe)
    val probe = Warehouse.ivfProbe(spark, dir, cents, query, 5)
    val plan = planOf(probe)
    assert(plan.contains("PartitionFilters"),
      s"IVF probe not partition-pruned:\n$plan")
    labels.foreach(l => assert(plan.contains(l),
      s"probed cluster $l not pinned in the scan:\n$plan"))

    // exact within the probed clusters: same result as assigning the
    // full corpus in-plan and filtering to the probe list
    val ids = labels.map(_.drop(1).toLong)
    val expect = Similarity.assignClusters(Similarity.withNorm(e), cents)
      .filter(col("cluster").isin(ids: _*))
      .withColumn("cos", Similarity.cosine(
        Similarity.dotFp9(col("embedding"), array(query.map(lit): _*)),
        Similarity.normFp9(array(query.map(lit): _*)), col("norm_fp")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"), round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .collect().toSeq
    assert(probe.collect().toSeq == expect)
    assert(expect.head.getLong(0) == 3L,
      "query vector should rank first in its own cluster")
  }

  test("doc_id-bucketed documents: narrow signal maps join exchange-free") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Warehouse.writeBucketed(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")),
        "wh_docs", "doc_id", 4)
      val joined = Warehouse.curationSignalJoin(spark, "wh_docs")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed signal join still shuffles:\n$plan")
      // signal values match the unbucketed stages
      val want = operators.TextAnalysis.x2Quality(spark, sf)
        .select(col("doc_id"), col("quality_e3")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = joined.collect()
      assert(got.length == want.size)
      got.foreach { r =>
        assert(r.getAs[Long]("quality_e3") == want(r.getAs[Long]("doc_id")))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_docs")
    }
  }

  test("IVFPQ layout: probe never reads a float vector, prunes partitions, matches s8") {
    val dir = Files.createTempDirectory("graft-ivfpq-wh").toFile.getAbsolutePath
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val en = Similarity.withNorm(e)
    val cents = Similarity.collectCodebook(en)
    val cb = Similarity.collectPqCodebook(en)
    Warehouse.writeIvfPq(e, cents, cb, dir)

    val query = e.filter(col("vec_id") === 3L)
      .select(col("embedding")).head.getSeq[Float](0)
    // one extra slot: the query's own stored copy may rank anywhere
    val probe = Warehouse.ivfPqProbe(spark, dir, cents, cb, query,
      Similarity.TopK + 1)
    val plan = planOf(probe)
    assert(plan.contains("PartitionFilters"), s"IVFPQ probe not pruned:\n$plan")
    Warehouse.ivfProbeLabels(cents, query, Similarity.NProbe)
      .foreach(l => assert(plan.contains(l), s"cluster $l not pinned:\n$plan"))
    // the at-rest format IS the index: the scan's schema carries codes +
    // recon_norm only — no embedding column exists to read
    assert(!plan.contains("embedding"),
      s"IVFPQ probe reads a float vector:\n$plan")

    // cross-check against the IN-PLAN s8 (different code path: driver
    // LUT literals + pruned coded read vs in-plan LUTs + full scan)
    val got = probe.collect().filter(_.getLong(0) != 3L).take(Similarity.TopK)
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Similarity.s8KnnIvfPq(spark, sf)
      .filter(col("qid") === 3L).orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("nid"), r.getAs[Long]("cos_e6"))).toSeq
    assert(got == want, s"coded probe diverged from s8: got=$got want=$want")
  }

  /** Shuffle count in a physical-plan string — scoped no-Exchange
    * assertions compare a bucketed-read plan against the identical
    * query over a plain parquet round-trip of the same index: the only
    * difference is the index-side shuffle bucketing eliminates. */
  private def nShuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("bucketed postings index: incremental dedup join never shuffles the corpus side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val corpusIx = Dedup.lshIndex(docs.filter(col("doc_id") < Dedup.IncrementalSplit))
      val newIx = Dedup.lshIndex(docs.filter(col("doc_id") >= Dedup.IncrementalSplit))
      Warehouse.writePostingsIndex(Dedup.corpusPostings(corpusIx), "wh_postings", 4)
      // the same standing index through a PLAIN parquet round-trip: the
      // queries differ only in the index read's write-time layout
      val dir = Files.createTempDirectory("graft-postings-plain").toFile.getAbsolutePath
      Dedup.corpusPostings(corpusIx).write.mode("overwrite").parquet(dir)

      val bucketed = Dedup.incrementalFromPostings(
        spark.table("wh_postings"), newIx, maxBucket = None)
      val plain = Dedup.incrementalFromPostings(
        spark.read.parquet(dir), newIx, maxBucket = None)
      val bPlan = planOf(bucketed)
      assert(bPlan.contains("wh_postings"), s"bucketed index not in plan:\n$bPlan")
      // bucketing must eliminate exactly the corpus-side hash exchange;
      // everything on the batch side is identical between the plans
      assert(nShuffles(bPlan) == nShuffles(planOf(plain)) - 1,
        s"corpus side still shuffles over the bucketed index:\n$bPlan")
      // ... and the layout must not change WHICH candidates come back
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("n_sig_match"), r.getAs[Long]("est_jaccard_e6"))).toSet
      val got = rows(bucketed)
      assert(got.nonEmpty, "no incremental candidates to compare")
      assert(got == rows(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_postings")
    }
  }

  test("bucketed containment pairs: the subsumption pick never shuffles " +
      "the pair side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      Warehouse.writeContainment(
        Dedup.containmentPairs(docs, maxDf = None), "wh_contain", 4)
      val dir = Files.createTempDirectory("graft-contain-plain").toFile.getAbsolutePath
      Dedup.containmentPairs(docs, maxDf = None).write.mode("overwrite").parquet(dir)

      val bucketed = Dedup.subsumptionFrom(spark.table("wh_contain"), docs)
      val plain = Dedup.subsumptionFrom(spark.read.parquet(dir), docs)
      val bPlan = planOf(bucketed)
      assert(bPlan.contains("wh_contain"), s"bucketed pairs not in plan:\n$bPlan")
      // bucketing by `a` must eliminate exactly the window's pair-side
      // hash exchange; the sizes join is identical between the plans
      assert(nShuffles(bPlan) == nShuffles(planOf(plain)) - 1,
        s"pair side still shuffles over the bucketed table:\n$bPlan")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("subsumed"),
          Option(r.getAs[java.lang.Long]("subsumed_by")))).toSet
      val got = rows(bucketed)
      assert(got.exists(_._2), "no subsumed doc in the fixture corpus")
      assert(got == rows(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_contain")
    }
  }

  test("standing containment table: md5-digest name + graft.source " +
      "property — a mismatched pre-existing table is refused, a matching " +
      "one is reused without rebuild") {
    import spark.implicits._
    def digest(d: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // poisoned: the table name for dirA exists but carries another
    // corpus's source path — sharedContainment must refuse to serve it
    val dirA = "/no/such/corpus/a"
    val tA = s"graft_containment_${digest(dirA)}"
    val fake = Seq((1L, 2L, 3L, 3L, 1000000L))
      .toDF("a", "b", "n_shared", "n_a", "containment_e6")
    try {
      Warehouse.writeContainment(fake, tA, 4)
      spark.sql(s"ALTER TABLE $tA SET TBLPROPERTIES " +
        "('graft.source' = '/somewhere/else', 'graft.maxdf' = 'none')")
      val e = intercept[IllegalArgumentException] {
        Dedup.sharedContainment(spark, dirA).collect()
      }
      assert(e.getMessage.contains("refusing"), e.getMessage)
      // matching: fixing the property makes the standing table served
      // as-is — no rebuild (dirA has no parquet; a rebuild would throw).
      // A validly-stamped table also carries the staleness props
      // (fingerprint 'na' for the nonexistent path, current build
      // stamp); without them the table reads as STALE and rebuilds.
      spark.sql(s"ALTER TABLE $tA SET TBLPROPERTIES ('graft.source' = '$dirA', " +
        s"'graft.fingerprint' = 'na', 'graft.algover' = '${Warehouse.standingVer}')")
      val served = Dedup.sharedContainment(spark, dirA).collect()
      assert(served.length == 1 && served(0).getAs[Long]("a") == 1L,
        "matching standing table was not reused")
      // cap-posture fence: the same table must NOT serve a capped ask —
      // its graft.maxdf says 'none', d16's posture says '3'
      val e2 = intercept[IllegalArgumentException] {
        // a capped ask resolves to a DIFFERENT table name, so poison
        // that name too: right source, wrong (missing→'none') cap
        val tCap = s"graft_containment_cap${Dedup.D16MaxDf}_${digest(dirA)}"
        try {
          Warehouse.writeContainment(fake, tCap, 4)
          spark.sql(s"ALTER TABLE $tCap SET TBLPROPERTIES " +
            s"('graft.source' = '$dirA', 'graft.maxdf' = 'none')")
          Dedup.sharedContainment(spark, dirA, Some(Dedup.D16MaxDf)).collect()
        } finally spark.sql(
          s"DROP TABLE IF EXISTS graft_containment_cap${Dedup.D16MaxDf}_${digest(dirA)}")
      }
      assert(e2.getMessage.contains("graft.maxdf"), e2.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tA")
  }

  test("standing table self-heal: a half-created table (saveAsTable " +
      "committed, properties never stamped) is dropped and rebuilt, " +
      "not refused forever") {
    import spark.implicits._
    val dirA = "/no/such/corpus/heal"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dirA.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val t = s"graft_containment_$digest"
    try {
      // simulate the crash window: the table committed, the ALTER that
      // stamps graft.source never ran
      Warehouse.writeContainment(
        Seq((1L, 2L, 3L, 3L, 1000000L))
          .toDF("a", "b", "n_shared", "n_a", "containment_e6"), t, 4)
      // the retry must take the REBUILD path (which here fails on the
      // nonexistent corpus path), never the refusal — a refusal would
      // brick the family on this catalog with nothing to protect
      val e = intercept[Exception] {
        Dedup.sharedContainment(spark, dirA).collect()
      }
      assert(!e.getMessage.contains("refusing"),
        s"half-created table refused instead of healed: ${e.getMessage}")
      assert(!spark.catalog.tableExists(t) ||
        !e.getMessage.contains("does not have property"),
        "half-created table survived the heal")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("capped containment standing table: d16's kernel is paid once — " +
      "the second read is a bucketed scan with no pair-stage recompute") {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"graft_containment_cap${Dedup.D16MaxDf}_$digest"
    try {
      val first = Dedup.d16ContainmentCapped(spark, sf).collect()
      assert(first.nonEmpty, "capped containment produced no pairs")
      // the second ask plans a catalog-table scan, not the Σdf² join:
      // the executed plan names the standing table and contains no
      // shingle explode / aggregate barrier
      val again = Dedup.d16ContainmentCapped(spark, sf)
      val plan = planOf(again)
      assert(plan.contains(table), s"capped read-back not from $table:\n$plan")
      assert(!plan.toLowerCase.contains("generate"),
        s"capped read-back re-runs the shingle explode:\n$plan")
      assert(again.collect().toSeq == first.toSeq,
        "standing capped table drifted from the first materialization")
      // capped vs uncapped must stay distinguishable (the ARMED-cap
      // contract d16 gates on): pair sets differ at this corpus
      val uncapped = Dedup.d9Containment(spark, sf).collect()
      assert(uncapped.length != first.length,
        "cap is not armed at this corpus — capped == uncapped pair count")
    } finally {
      // leave the standing table in place: the session cache still
      // points at it, and the next JVM's orphan-location cleanup
      // (sharedContainment) handles the leftover warehouse directory
    }
  }

  test("multimodal standing stages: a FRESH session on the same catalog " +
      "serves the manifests from standing tables — no codec re-run, no " +
      "pair-join or CC recompute, identical rows") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Long]("canonical_id"), r.getAs[Long]("keep"))).toSeq
    // session A pays the builds (decode -> pairs -> components per
    // modality) and persists the standing tables
    val a14 = rows(Multimodal.m14ImgManifest(spark, sf))
    val a15 = rows(Multimodal.m15AudioManifest(spark, sf))
    val a16 = rows(Multimodal.m16VideoManifest(spark, sf))
    assert(a14.nonEmpty && a15.nonEmpty && a16.nonEmpty)
    // a FRESH session: shares the catalog (SharedState), misses every
    // session cache — the standing tables are the only carry-over
    val s2 = spark.newSession()
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for ((q, want) <- Seq(
        Multimodal.m14ImgManifest(s2, sf) -> a14,
        Multimodal.m15AudioManifest(s2, sf) -> a15,
        Multimodal.m16VideoManifest(s2, sf) -> a16)) {
      val plan = planOf(q)
      // reads standing tables; never re-runs the decode mapPartitions
      // (no object serialization boundary) or the probe-fan explode
      assert(plan.contains(digest), s"fresh session not on standing tables:\n$plan")
      assert(!plan.contains("MapPartitions") && !plan.contains("Generate"),
        s"fresh session re-ran a decode/probe stage:\n$plan")
      // the whole fresh-session manifest carries exactly ONE hash
      // exchange — the per-cluster keep-one window, irreducible by
      // doc_id bucketing; the metric join rides broadcast here and
      // the co-bucketed (32 = 32) scans past broadcast size
      assert(nShuffles(plan) <= 1,
        s"fresh-session manifest shuffles beyond the cluster window:\n$plan")
      assert(rows(q) == want, "standing-table read drifted from the build")
    }
    // and the hash listing itself is a bucketed scan in the new session
    val hplan = planOf(Multimodal.m6ImgHash(s2, sf))
    assert(hplan.contains(s"graft_mm_imghash_$digest"), hplan)
    // the TEXT closure rides the same discipline: d6 in the fresh
    // session is a bucketed scan of the standing table — no SimHash
    // explode, no CC loop
    val aTxt = Dedup.d6DupClusters(spark, sf).collect().map(_.toString).toSeq
    val txt2 = Dedup.d6DupClusters(s2, sf)
    val tplan = planOf(txt2)
    assert(tplan.contains(s"graft_textcomp_$digest"), tplan)
    assert(!tplan.contains("Generate"), s"text closure re-ran a pair stage:\n$tplan")
    assert(txt2.collect().map(_.toString).toSeq == aTxt)
  }

  test("bucketed shingle index: contamination join never shuffles the index side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val train = docs.filter(col("doc_id") < 400L)
      val test = docs.filter(col("doc_id") >= 400L)
      Warehouse.writeShingleIndex(TextAnalysis.trainShingleIndex(train), "wh_shingles", 4)
      val dir = Files.createTempDirectory("graft-shingles-plain").toFile.getAbsolutePath
      TextAnalysis.trainShingleIndex(train).write.mode("overwrite").parquet(dir)

      val bucketed = TextAnalysis.contaminationFromIndex(spark.table("wh_shingles"), test)
      val plain = TextAnalysis.contaminationFromIndex(spark.read.parquet(dir), test)
      val bPlan = planOf(bucketed)
      assert(bPlan.contains("wh_shingles"), s"bucketed index not in plan:\n$bPlan")
      assert(nShuffles(bPlan) == nShuffles(planOf(plain)) - 1,
        s"index side still shuffles over the bucketed index:\n$bPlan")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("test_doc"), r.getAs[Long]("train_doc"),
          r.getAs[Long]("shared_shingles"))).toSet
      val got = rows(bucketed)
      assert(got.nonEmpty, "no contaminated pairs to compare")
      assert(got == rows(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_shingles")
    }
  }

  test("standing shingle inverted index: d4's exact-Jaccard self-join " +
      "reads graft_shinv with NO exchange on either join side") {
    import graft.operators.TextOps
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Dedup.d4JaccardTopK(spark, sf)
      val plan = planOf(out)
      assert(plan.contains("graft_shinv"),
        s"standing inverted index not in plan:\n$plan")
      // shingle-bucketed layout absorbs BOTH self-join exchanges: the
      // only hash exchange left is the per-pair groupBy
      assert(nShuffles(plan) == 1,
        s"expected only the pair-aggregation exchange:\n$plan")
      // values match a fresh inline derivation of the same pipeline
      val docSh = Tables.documents(spark, sf)
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .select(col("doc_id"),
          array_distinct(TextOps.shingles3(col("ws"))).as("sh"))
        .select(col("doc_id"), col("sh"),
          size(col("sh")).cast("long").as("n_sh"))
      val inv = docSh.select(col("doc_id"), col("n_sh"),
        explode(col("sh")).as("shingle"))
      val fresh = inv.select(col("shingle"), col("doc_id").as("a"),
          col("n_sh").as("na"))
        .join(inv.select(col("shingle"), col("doc_id").as("b"),
          col("n_sh").as("nb")), "shingle")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("shared"))
        .select(col("a"), col("b"),
          TextOps.idiv(col("shared") * 1000000L,
            col("na") + col("nb") - col("shared")).as("jaccard_e6"))
        .orderBy(col("jaccard_e6").desc, col("a"), col("b")).limit(20)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("jaccard_e6"))).toSeq
      assert(rows(out) == rows(fresh),
        "standing-index d4 diverged from the inline derivation")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("standing shingle inverted index, second consumer: x11's " +
      "train-test contamination join reads graft_shinv exchange-free " +
      "and matches the inline derivation") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = TextAnalysis.x11Contamination(spark, sf)
      val plan = planOf(out)
      assert(plan.contains("graft_shinv"),
        s"standing inverted index not in plan:\n$plan")
      // the shingle equi-join is exchange-free over the bucketed scans;
      // the per-pair count and the per-test-doc window still shuffle
      assert(nShuffles(plan) <= 2,
        s"contamination join grew an exchange beyond count+window:\n$plan")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("test_doc"), r.getAs[Long]("n_train_docs"),
          r.getAs[Long]("top_train_doc"), r.getAs[Long]("top_shared"))).toSeq
      val got = rows(out)
      assert(got.nonEmpty, "no contaminated pairs")
      assert(got == rows(TextAnalysis.contamination(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")),
        maxDf = None)),
        "standing-index x11 diverged from the inline derivation")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("standing shingle inverted index, third consumer: x45's novelty " +
      "curve aggregates graft_shinv exchange-free on the shingle side " +
      "and matches the inline derivation") {
    import graft.operators.TextOps
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = TextAnalysis.x45NoveltyCurve(spark, sf)
      val plan = planOf(out)
      assert(plan.contains("graft_shinv"),
        s"standing inverted index not in plan:\n$plan")
      // both shingle-keyed aggregates (distinct-presence, first-batch
      // minimum) ride the bucket layout; the only hash exchanges are
      // the four B-group finals (docs-side, incidences, distinct,
      // novel) — the B-row joins reuse the agg partitioning and the
      // cum window / presentation sort are not hash exchanges
      assert(nShuffles(plan) <= 4,
        s"a shingle-keyed aggregate grew a corpus-sized exchange:\n$plan")
      // values match a fresh inline derivation off the raw corpus
      val cnt = Tables.documents(spark, sf).count()
      val b = TextAnalysis.NoveltyBatches
      def batchOf(id: org.apache.spark.sql.Column) =
        least(lit(b - 1L), TextOps.idiv(id * b, lit(cnt)))
      val g = Tables.documents(spark, sf)
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .select(col("doc_id"),
          array_distinct(TextOps.shingles3(col("ws"))).as("sh"))
        .select(batchOf(col("doc_id")).as("batch"),
          explode(col("sh")).as("shingle"))
      val nDocs = Tables.documents(spark, sf)
        .groupBy(batchOf(col("doc_id")).as("batch"))
        .agg(count(lit(1)).as("n_docs"))
      val incid = g.groupBy(col("batch")).agg(count(lit(1)).as("n_incidences"))
      val dis = g.distinct().groupBy(col("batch"))
        .agg(count(lit(1)).as("n_distinct"))
      val novel = g.groupBy(col("shingle")).agg(min(col("batch")).as("batch"))
        .groupBy(col("batch")).agg(count(lit(1)).as("novel_grams"))
      val freshRows = nDocs.join(incid, Seq("batch"), "left")
        .join(dis, Seq("batch"), "left").join(novel, Seq("batch"), "left")
        .orderBy(col("batch")).collect()
        .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_incidences"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("novel_grams"))).toSeq
      val gotRows = out.collect()
        .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_incidences"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("novel_grams"))).toSeq
      assert(gotRows.nonEmpty && gotRows == freshRows,
        "standing-index x45 diverged from the inline derivation")
      // the cumulative column is the running sum of the novel column
      val cums = out.collect().map(r => (r.getAs[Long]("novel_grams"),
        r.getAs[Long]("cum_grams"))).toSeq
      assert(cums.scanLeft(0L)(_ + _._1).tail == cums.map(_._2),
        "cum_grams is not the running sum of novel_grams")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("co-bucketed tables join without an exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Warehouse.writeBucketed(
        Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice")),
        "wh_orders", "o_orderkey", 4)
      Warehouse.writeBucketed(
        Tables.lineitem(spark, sf)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "wh_lineitem", "o_orderkey", 4)
      val joined = Warehouse.coLocatedJoin(spark, "wh_orders", "wh_lineitem", "o_orderkey")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join still shuffles:\n$plan")
      // same row count as the plain (shuffling) join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_orders")
      spark.sql("DROP TABLE IF EXISTS wh_lineitem")
    }
  }

  test("bucketed image-hash index: incremental image join never shuffles the corpus side") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hs = Multimodal.imgHash(
        Tables.documents(spark, sf).select(col("doc_id")).as[Long])
      val mx = hs.agg(max(col("doc_id"))).first().getLong(0)
      val corpus = hs.filter(col("doc_id") * 10 < mx * 9)
      val batch = hs.filter(col("doc_id") * 10 >= mx * 9)
        .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"))
      Warehouse.writeImgIndex(Multimodal.imgIndexKeys(corpus), "wh_img_index", 4)
      val dir = Files.createTempDirectory("graft-imgix-plain").toFile.getAbsolutePath
      Multimodal.imgIndexKeys(corpus).write.mode("overwrite").parquet(dir)

      val bucketed = Multimodal.imgIncrementalFromIndex(
        spark.table("wh_img_index"), batch)
      val plain = Multimodal.imgIncrementalFromIndex(
        spark.read.parquet(dir), batch)
      val bPlan = planOf(bucketed)
      assert(bPlan.contains("wh_img_index"), s"bucketed index not in plan:\n$bPlan")
      def nShuf(p: String) = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nShuf(bPlan) == nShuf(planOf(plain)) - 1,
        s"corpus side still shuffles over the bucketed image index:\n$bPlan")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("hamming"))).toSet
      val got = rows(bucketed)
      assert(got.nonEmpty, "no incremental image pairs to compare")
      assert(got == rows(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_img_index")
    }
  }

  test("standing image index: gated m8 probes graft_mm_imgidx with no " +
      "corpus-side exchange and matches the inline corpus∪batch build") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Multimodal.m8ImgIncremental(spark, sf)
      val plan = planOf(out)
      assert(plan.contains("graft_mm_imgidx"),
        s"standing image index not in plan:\n$plan")
      // the index side rides the write-time (band, v) bucketing; the
      // only hash exchanges are the batch-sized probe shuffle and the
      // pair distinct — the presentation sort is a range exchange
      assert(nShuffles(plan) <= 2,
        s"corpus-side exchange crept back into gated m8:\n$plan")
      // value-parity against the inline index build over corpus∪batch
      val hs = Multimodal.imgHash(
        Tables.documents(spark, sf).select(col("doc_id")).as[Long])
      val mx = hs.agg(max(col("doc_id"))).first().getLong(0)
      val inline = Multimodal.imgNearDupIncremental(
        hs.filter(col("doc_id") * 10 < mx * 9),
        hs.filter(col("doc_id") * 10 >= mx * 9)).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("hamming"))).toSet
      val got = out.collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("hamming"))).toSet
      assert(got.nonEmpty && got == inline,
        s"standing-index m8 diverged: got-only=${got -- inline}, " +
          s"missing=${inline -- got}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("stored signature table: the d20 design sweep reads sigs without " +
      "recomputing any signature kernel and matches the inline sweep") {
    try {
      val docs = Tables.documents(spark, sf)
      Warehouse.writeSigTable(Dedup.sweepSigBase(docs), "wh_sweep_sigs", 4)
      val stored = Dedup.lshScurveFrom(spark.table("wh_sweep_sigs"),
        tauE6 = Dedup.D14TauE6)
      val plan = planOf(stored)
      assert(plan.contains("wh_sweep_sigs"), s"stored sigs not in plan:\n$plan")
      // the stored sweep computes band keys (md5 over stored sigs) but
      // never a signature kernel: no shingle hashing, no minhash
      assert(!plan.contains("shingle_hash32") && !plan.contains("minhash_sig"),
        "stored sweep re-ran the signature pipeline")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) ->
          (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"),
            r.getAs[Long]("tp"))).toMap
      assert(rows(stored) == rows(Dedup.lshScurve(docs, Dedup.D14TauE6)),
        "stored sweep diverged from the inline sweep")
    } finally spark.sql("DROP TABLE IF EXISTS wh_sweep_sigs")
  }

  test("cluster-bucketed corpus: SemDeDup's pair self-join never shuffles") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = Similarity.withNorm(Tables.embeddings(spark, sf))
      val assigned = Similarity.assignClusters(e, Similarity.collectCodebook(e))
        .select(col("vec_id"), col("embedding"), col("norm_fp"), col("cluster"))
      Warehouse.writeBucketed(assigned, "wh_sem_corpus", "cluster", 4)
      val dir = Files.createTempDirectory("graft-sem-plain").toFile.getAbsolutePath
      assigned.write.mode("overwrite").parquet(dir)

      val bucketed = Similarity.withinClusterPairs(spark.table("wh_sem_corpus"))
      val plain = Similarity.withinClusterPairs(spark.read.parquet(dir))
      val bPlan = planOf(bucketed)
      assert(bPlan.contains("wh_sem_corpus"), s"bucketed corpus not in plan:\n$bPlan")
      // the bucketed self-join drops BOTH sides' exchanges
      assert(nShuffles(bPlan) == nShuffles(planOf(plain)) - 2,
        s"pair self-join still shuffles over the bucketed corpus:\n$bPlan")
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
      val got = pairs(bucketed)
      assert(got == pairs(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_sem_corpus")
    }
  }

  test("bucketed rollup: delta-IVM absorb never shuffles the base side") {
    import graft.operators.Events
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ev = Tables.events(spark, sf)
      val base = Events.hourlyPartial(ev.filter(col("event_id") % 10L =!= 0L))
      val delta = Events.hourlyPartial(ev.filter(col("event_id") % 10L === 0L))
      Warehouse.writeRollup(base, "wh_rollup", 4)
      val dir = Files.createTempDirectory("graft-rollup-plain").toFile.getAbsolutePath
      base.write.mode("overwrite").parquet(dir)

      val bucketed = Events.absorbDelta(spark.table("wh_rollup"), delta)
      val plain = Events.absorbDelta(spark.read.parquet(dir), delta)
      val bPlan = planOf(bucketed)
      assert(bPlan.contains("wh_rollup"), s"bucketed rollup not in plan:\n$bPlan")
      // the write-time layout must eliminate exactly the base-side hash
      // exchange; the delta still pays its own shuffle
      assert(nShuffles(bPlan) == nShuffles(planOf(plain)) - 1,
        s"base side still shuffles over the bucketed rollup:\n$bPlan")
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("hour_s"), r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toMap
      val got = m(bucketed)
      assert(got.nonEmpty)
      assert(got == m(plain))
      // absorption ≡ the one-shot aggregate over the union feed
      assert(got == m(Events.hourlyPartial(ev)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_rollup")
    }
  }

  test("standing PageRank edges: a loop round's contribution join plans " +
      "with NO exchange above the standing bucketed edge scan — the " +
      "'edge list bucketed by src' posture executed, not asserted") {
    import graft.operators.Relational
    val (ed, nodes) = Relational.sharedPrInvariants(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rank = nodes.withColumn("rank", lit(Relational.PrScale))
      val round = ed.join(rank, ed("src") === rank("node"))
      val plan = planOf(round)
      assert(plan.contains("graft_predges"),
        s"round join not over the standing edge table:\n$plan")
      // exactly one exchange: the node-sized rank side repartitions to
      // the bucket width; the edge side rides the write-time layout
      assert(nShuffles(plan) <= 1,
        s"edge side shuffles over the standing scan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("standing registry is CROSS-JVM: a catalog that forgot the table " +
      "(the fresh-JVM in-memory-catalog case) ADOPTS the registry " +
      "artifact — schema, rows and bucket layout intact, no rebuild") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-standing-src").toFile.getAbsolutePath
    Files.write(java.nio.file.Paths.get(corpus, "part.txt"), "abc".getBytes)
    var builds = 0
    def stage(): org.apache.spark.sql.DataFrame =
      Warehouse.standingTable(spark, "graft_teststage", corpus) { t =>
        builds += 1
        Warehouse.writeStanding(
          Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"),
          t, Seq("k"), 4)
      }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpus.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"graft_teststage_$digest"
    try {
      val first = stage().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(builds == 1 && first == Set((1L, 10L), (2L, 20L), (3L, 30L)))
      // simulate the new JVM: the in-memory catalog forgets the table
      // (external — the registry directory survives the drop)
      spark.sql(s"DROP TABLE $table")
      val again = stage()
      assert(builds == 1, "catalog-less read re-ran the build instead of adopting")
      assert(again.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == first)
      // the adopted table keeps the write-time bucket layout: grouping
      // on the bucket key plans without a shuffle above the scan
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = planOf(again.groupBy(col("k")).agg(sum(col("v"))))
        assert(!plan.contains("Exchange"),
          s"adopted table lost its bucket spec — the groupBy shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("standing registry staleness: a corpus regenerated at the SAME " +
      "path (content fingerprint changed) rebuilds instead of serving " +
      "the old corpus's rows; a markerless half-build is cleared") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-standing-src2").toFile.getAbsolutePath
    val f = java.nio.file.Paths.get(corpus, "part.txt")
    Files.write(f, "v1".getBytes)
    var builds = 0
    def stage(): org.apache.spark.sql.DataFrame =
      Warehouse.standingTable(spark, "graft_teststale", corpus) { t =>
        builds += 1
        Warehouse.writeStanding(Seq((builds.toLong, 1L)).toDF("k", "v"),
          t, Seq("k"), 2)
      }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpus.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"graft_teststale_$digest"
    try {
      assert(stage().collect().map(_.getLong(0)).toSeq == Seq(1L) && builds == 1)
      stage()
      assert(builds == 1, "unchanged corpus re-ran the build")
      // regenerate the corpus in place: same path, new content
      Files.write(f, "v2-longer".getBytes)
      assert(stage().collect().map(_.getLong(0)).toSeq == Seq(2L),
        "stale standing rows served after the corpus changed")
      assert(builds == 2)
      // the stale case must also hold across a catalog loss: change
      // the corpus AND drop the table — the registry artifact's
      // fingerprint mismatches, so adoption is refused and it rebuilds
      Files.write(f, "v3".getBytes)
      spark.sql(s"DROP TABLE $table")
      assert(stage().collect().map(_.getLong(0)).toSeq == Seq(3L) && builds == 3)
      // markerless half-build: junk at the registry location without a
      // marker is a crashed write — cleared and rebuilt
      spark.sql(s"DROP TABLE $table")
      val loc = new java.io.File(
        Warehouse.standingRoot(spark), table)
      org.apache.commons.io.FileUtils.deleteDirectory(loc)
      loc.mkdirs()
      Files.write(loc.toPath.resolve("junk.parquet"), "nope".getBytes)
      assert(stage().collect().map(_.getLong(0)).toSeq == Seq(4L) && builds == 4)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("standing-build lease: two racing writers on a shared registry " +
      "root converge to ONE artifact with ONE build; the loser adopts") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val corpus = Files.createTempDirectory("graft-lease-src").toFile.getAbsolutePath
    Files.write(java.nio.file.Paths.get(corpus, "part.txt"), "v1".getBytes)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def stage(): Seq[Long] =
      Warehouse.standingTable(spark, "graft_testlease", corpus) { t =>
        builds.incrementAndGet()
        Thread.sleep(800) // widen the race window: the loser MUST wait
        Warehouse.writeStanding(Seq((42L, 1L)).toDF("k", "v"), t, Seq("k"), 2)
      }.collect().map(_.getLong(0)).toSeq
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpus.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"graft_testlease_$digest"
    try {
      val a = Future(stage())
      val b = Future(stage())
      val (ra, rb) = (Await.result(a, 120.seconds), Await.result(b, 120.seconds))
      assert(ra == Seq(42L) && rb == Seq(42L),
        s"racing writers diverged: $ra vs $rb")
      assert(builds.get() == 1,
        s"lease did not serialize the builders: ${builds.get()} builds ran")
      // the winner released: no lease file left behind
      val lease = new java.io.File(Warehouse.standingRoot(spark),
        s".lease_$table")
      assert(!lease.exists(), s"lease file leaked: $lease")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("lease breaker: a failed acquire never deletes a FRESH lease; a " +
      "stale lease is broken via tombstone with none left behind, and " +
      "the next acquire wins") {
    val root = new java.io.File(Warehouse.standingRoot(spark))
    root.mkdirs()
    val leaseF = new java.io.File(root, ".lease_tombtest")
    val fs = new org.apache.hadoop.fs.Path(root.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaseP = new org.apache.hadoop.fs.Path(leaseF.toString)
    def tombs() = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".lease_tombtest.tomb_"))
    try {
      // fresh lease: acquire fails and the file SURVIVES (the r15
      // check-then-delete TOCTOU killed exactly this case's twin)
      Files.write(leaseF.toPath, "live\n".getBytes)
      assert(!Warehouse.tryAcquireLease(fs, leaseP))
      assert(leaseF.exists(), "a failed acquire deleted a FRESH lease")
      // stale lease: broken (not acquired — the breaker re-races),
      // tombstone cleaned up, next acquire succeeds
      assert(leaseF.setLastModified(
        System.currentTimeMillis() - Warehouse.LeaseTtlMs - 60000L))
      assert(!Warehouse.tryAcquireLease(fs, leaseP),
        "breaking must report NOT acquired")
      assert(!leaseF.exists(), "stale lease not broken")
      assert(tombs().isEmpty, s"tombstone left behind: ${tombs().toSeq}")
      assert(Warehouse.tryAcquireLease(fs, leaseP),
        "re-race after the break failed")
    } finally {
      leaseF.delete()
      tombs().foreach(_.delete())
    }
  }

  test("standing-build lease: a waiter blocks while the lease is held, " +
      "proceeds when released; a STALE lease (crashed holder) is broken") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val corpus = Files.createTempDirectory("graft-lease-src2").toFile.getAbsolutePath
    Files.write(java.nio.file.Paths.get(corpus, "part.txt"), "v1".getBytes)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def stage(): Seq[Long] =
      Warehouse.standingTable(spark, "graft_testlease2", corpus) { t =>
        builds.incrementAndGet()
        Warehouse.writeStanding(Seq((7L, 1L)).toDF("k", "v"), t, Seq("k"), 2)
      }.collect().map(_.getLong(0)).toSeq
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpus.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"graft_testlease2_$digest"
    val root = new java.io.File(Warehouse.standingRoot(spark))
    root.mkdirs()
    val lease = new java.io.File(root, s".lease_$table")
    try {
      // a FRESH lease held by a (simulated) live writer: the caller
      // must wait, not build and not throw
      Files.write(lease.toPath, "someone-else\n".getBytes)
      val waiter = Future(stage())
      Thread.sleep(1500)
      assert(builds.get() == 0,
        "writer built through a live holder's lease")
      assert(!waiter.isCompleted, "waiter did not block on the held lease")
      // holder releases → the waiter acquires and builds
      assert(lease.delete())
      assert(Await.result(waiter, 120.seconds) == Seq(7L) && builds.get() == 1)
      // STALE lease: simulate a crashed holder by an old mtime — the
      // next writer breaks it instead of waiting out the TTL
      spark.sql(s"DROP TABLE $table")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root, table))
      Files.write(lease.toPath, "crashed-holder\n".getBytes)
      assert(lease.setLastModified(
        System.currentTimeMillis() - Warehouse.LeaseTtlMs - 60000L))
      assert(stage() == Seq(7L) && builds.get() == 2,
        "stale lease was not broken")
      assert(!lease.exists(), "broken stale lease left behind")
    } finally {
      lease.delete()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("pruneSuperseded: removes old-build / moved-corpus artifacts and " +
      "TTL-expired debris, keeps current artifacts, fresh leases and " +
      "fresh markerless staging") {
    import spark.implicits._
    val root = new java.io.File(Warehouse.standingRoot(spark))
    root.mkdirs()
    val old = System.currentTimeMillis() - Warehouse.LeaseTtlMs - 60000L
    def props(dir: java.io.File, kv: Map[String, String]): Unit = {
      dir.mkdirs()
      val p = new java.util.Properties()
      kv.foreach { case (k, v) => p.setProperty(k, v) }
      val out = new java.io.FileOutputStream(
        new java.io.File(dir, "_graft_standing.properties"))
      try p.store(out, "test marker") finally out.close()
    }
    // a CURRENT artifact: real standing build over a live corpus
    val corpus = Files.createTempDirectory("graft-prune-src").toFile.getAbsolutePath
    Files.write(java.nio.file.Paths.get(corpus, "part.txt"), "v1".getBytes)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpus.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val table = s"graft_testprune_$digest"
    Warehouse.standingTable(spark, "graft_testprune", corpus) { t =>
      Warehouse.writeStanding(Seq((1L, 1L)).toDF("k", "v"), t, Seq("k"), 2)
    }
    val keepDir = new java.io.File(root, table)
    // superseded: marker from another build stamp
    val oldBuild = new java.io.File(root, "graft_oldbuild_feedface")
    props(oldBuild, Map("graft.source" -> corpus,
      "graft.fingerprint" -> Warehouse.sourceFingerprint(spark, corpus),
      "graft.algover" -> "not-this-build", "graft.schema.ddl" -> "k BIGINT"))
    // superseded: corpus moved on since the artifact was stamped
    val movedSrc = new java.io.File(root, "graft_movedsrc_feedface")
    props(movedSrc, Map("graft.source" -> corpus,
      "graft.fingerprint" -> "stale-fingerprint",
      "graft.algover" -> Warehouse.standingVer, "graft.schema.ddl" -> "k BIGINT"))
    // TTL-expired debris + fresh things that must survive
    val oldHalf = new java.io.File(root, "graft_halfbuild_feedface")
    oldHalf.mkdirs(); oldHalf.setLastModified(old)
    val freshHalf = new java.io.File(root, ".copy_graft_live")
    freshHalf.mkdirs()
    val staleLease = new java.io.File(root, ".lease_gone")
    Files.write(staleLease.toPath, "x\n".getBytes); staleLease.setLastModified(old)
    val staleTomb = new java.io.File(root, ".lease_gone.tomb_abcd1234")
    Files.write(staleTomb.toPath, "x\n".getBytes); staleTomb.setLastModified(old)
    val freshLease = new java.io.File(root, ".lease_live")
    Files.write(freshLease.toPath, "x\n".getBytes)
    try {
      // 5 prunable entries: old-build artifact, moved-corpus artifact,
      // TTL-expired half-build, stale lease, stale tombstone
      val n = Warehouse.pruneSuperseded(spark)
      assert(n == 5L, s"pruned $n entries, wanted 5")
      assert(keepDir.exists(), "pruned a CURRENT artifact")
      assert(!oldBuild.exists(), "old-build artifact survived")
      assert(!movedSrc.exists(), "moved-corpus artifact survived")
      assert(!oldHalf.exists(), "TTL-expired half-build survived")
      assert(freshHalf.exists(), "fresh staging directory pruned")
      assert(!staleLease.exists() && !staleTomb.exists(),
        "stale lease debris survived")
      assert(freshLease.exists(), "fresh lease pruned")
      // idempotent: a second pass finds nothing
      assert(Warehouse.pruneSuperseded(spark) == 0L)
      // the surviving artifact still serves (catalog intact)
      assert(spark.table(table).collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      Seq(freshHalf, freshLease).foreach(
        f => if (f.isDirectory) org.apache.commons.io.FileUtils
          .deleteDirectory(f) else { f.delete(); () })
    }
  }
}
