package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-linearity probe (dev tool, like Probe): re-lists the same
  * parquet files N times to multiply input cardinality without writing
  * anything, then times the heavy query shapes. If a plan's cost grows
  * super-linearly in N, it would not survive the 100 TB scale-up —
  * results recorded in BASELINE.md.
  *
  * Usage: runMain graft.ScaleProbe [multiplier] [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val m = if (args.nonEmpty) args(0).toInt else 4
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed-index shapes write catalog tables — scratch, not repo
      .config("spark.sql.warehouse.dir", TempPath.scratch("scaleprobe-wh"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm parquet reader, codegen, shuffle machinery (as Bench does)
    spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    def x(name: String): DataFrame =
      spark.read.parquet(Seq.fill(m)(s"$d/$name.parquet"): _*)

    // optional comma-separated shape filter (dev tool: probe one shape
    // without paying for the whole suite); filtered shapes report -1
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def wanted(name: String): Boolean = only.forall(_.contains(name))

    def time(name: String)(df: => DataFrame): (String, Double) = {
      if (!wanted(name)) return name -> -1.0
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }

    // side-effecting shapes (store absorbs) — times the body itself
    def timeUnit(name: String)(body: => Unit): (String, Double) = {
      if (!wanted(name)) return name -> -1.0
      val t0 = System.nanoTime()
      body
      name -> (System.nanoTime() - t0) / 1e9
    }

    // setup for the ANN probe shapes (untimed): a 100k×m-vector corpus
    // written (a) partitioned by sign-LSH bucket and (b) IVF-partitioned
    // by a TRAINED spherical k-means codebook, plus a query vector taken
    // from the base table. Scratch dirs are cleaned at JVM exit.
    // (lazy: a name-filtered run that skips the ANN probes skips this)
    lazy val base = spark.read.parquet(s"$d/embeddings.parquet")
    lazy val bigCorpus = base.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0L), lit(200L * m - 1L))).as("c"))
      .select((col("vec_id") * lit(200L * m) + col("c")).as("vec_id"),
        col("embedding"))
    lazy val probeQuery = base.filter(col("vec_id") === 3L)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    lazy val vectorDir = {
      val dir = TempPath.scratch("scaleprobe-vectors")
      operators.Warehouse.writeVectors(bigCorpus, dir)
      dir
    }
    // codebook trained on the base table (the trainer's cost is
    // corpus-linear per round and probed separately by `components`-like
    // shapes; here the PROBE against the trained layout is the target)
    lazy val trainedCents = operators.Similarity.trainCodebook(
      base.select(col("vec_id"), col("embedding")))
    lazy val ivfDir = {
      val dir = TempPath.scratch("scaleprobe-ivf")
      operators.Warehouse.writeIvf(bigCorpus, trainedCents, dir)
      dir
    }

    // setup for the incremental-dedup shape (untimed): a 50k×m-doc
    // synthetic corpus (unique text per doc: near-zero cross-overlap)
    // whose LSH postings index is PERSISTED BUCKETED by band key — the
    // standing-index layout writePostingsIndex builds; the timed probe
    // is a FIXED 500-doc batch of exact twins of corpus docs 0..499
    // (each finds exactly its twin) joined via incrementalFromPostings.
    // Per-batch cost should track the batch, not m: the batch-side
    // signature map is fixed-size and bucketing removes the corpus-side
    // shuffle, leaving only the co-located postings scan to grow with m.
    def synthText(idCol: org.apache.spark.sql.Column) = concat_ws(" ",
      concat(lit("a"), idCol), concat(lit("b"), idCol), concat(lit("c"), idCol),
      concat(lit("d"), idCol), concat(lit("e"), idCol))
    val nDocs = 50000L * m
    lazy val postingsTable = {
      spark.sql("DROP TABLE IF EXISTS scaleprobe_postings")
      operators.Warehouse.writePostingsIndex(
        operators.Dedup.corpusPostings(operators.Dedup.lshIndex(
          spark.range(nDocs).select(col("id").as("doc_id"),
            synthText(col("id")).as("text")))),
        "scaleprobe_postings", 32)
      "scaleprobe_postings"
    }
    lazy val dedupBatch = spark.range(500L)
      .select((col("id") + nDocs).as("doc_id"), synthText(col("id")).as("text"))

    // containment-probe corpus (see the containment_* entries below):
    // every 50th doc opens with the boilerplate trigram, groups of 4
    // share one trigram, everything else is doc-unique
    def containDocs(mult: Int): DataFrame = {
      val n = 20000L * mult
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ",
          when(col("id") % 50L === 0L, lit("b1"))
            .otherwise(concat(lit("u1x"), col("id"))),
          when(col("id") % 50L === 0L, lit("b2"))
            .otherwise(concat(lit("u2x"), col("id"))),
          when(col("id") % 50L === 0L, lit("b3"))
            .otherwise(concat(lit("u3x"), col("id"))),
          concat(lit("p"), expr("id DIV 4")), concat(lit("q"), expr("id DIV 4")),
          concat(lit("r"), expr("id DIV 4")),
          concat(lit("x"), col("id")), concat(lit("y"), col("id")),
          concat(lit("z"), col("id"))).as("text"))
    }

    // force the lazy index builds UNTIMED for the shapes that probe
    // against them — the probe measures the READ path, the build is
    // the amortized standing-index cost (the lazy wrapping only
    // exists so name-filtered runs can skip builds entirely)
    if (wanted("bucketed_knn_probe")) { vectorDir; () }
    if (wanted("ivf_trained_probe")) { ivfDir; () }
    if (wanted("incremental_dedup")) { postingsTable; dedupBatch; () }

    val results = Seq(
      // q1 shape: full-scan groupBy-agg over lineitem×m
      time("agg") {
        x("lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(Tables.cents(col("l_quantity"))).as("q"),
            count(lit(1)).as("n"))
      },
      // q3 shape: fact-fact join + agg (orders×m ⋈ lineitem×m)
      time("join_agg") {
        x("lineitem").select(col("l_orderkey"),
            Tables.cents(col("l_extendedprice")).as("c"))
          .join(x("orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey")).agg(sum(col("c")).as("rev"))
      },
      // q5 shape: window over orders×m
      time("window") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        x("orders").withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
      },
      // dedup-index shape: signature pipeline over documents×m
      time("minhash_index") {
        operators.Dedup.lshIndex(
          x("documents").select(
            monotonically_increasing_id().as("doc_id"), col("text")))
          .select(col("doc_id"), col("bands"))
      },
      // s3 shape: tiled exact pair join over embeddings×m (pair count
      // grows m² — the probe shows the tiles absorb it in parallel)
      time("tiled_pairs") {
        operators.Similarity.cosinePairs(
          x("embeddings").select(
            monotonically_increasing_id().as("vec_id"), col("embedding")),
          spark.sparkContext.defaultParallelism)
      },
      // q13 shape: histogram-based exact quantiles over lineitem×m
      time("hist_quantile") {
        operators.Relational.q13Pipeline(x("lineitem"))
      },
      // x8 shape: tagged n-gram explode + two-level count over docs×m
      time("repetition") {
        operators.TextAnalysis.repetitionSignals(
          x("documents").select(
            monotonically_increasing_id().as("doc_id"), col("text")))
      },
      // x9 shape: per-shard greedy packing over docs×m
      time("seq_pack") {
        operators.TextAnalysis.packSequences(
          x("documents").select(
            monotonically_increasing_id().as("doc_id"), col("text")),
          spark.sparkContext.defaultParallelism,
          operators.TextAnalysis.PackBudget)
      },
      // x11/d4 shape: inverted-index shared-shingle join over a
      // synthetic FIXED-OVERLAP corpus — groups of 4 docs share exactly
      // one 3-gram, every other shingle is doc-unique, so per-doc
      // overlap stays constant while n grows 50k×m. Re-listing real
      // docs would multiply every shingle's DF by m (the boilerplate
      // blowup maxDf exists to cap), conflating overlap growth with
      // corpus growth; this isolates the join shape itself.
      time("inverted_index") {
        val n = 50000L * m
        operators.TextAnalysis.contamination(
          spark.range(n).select(col("id").as("doc_id"),
            concat_ws(" ",
              concat(lit("p"), expr("id DIV 4")),
              concat(lit("q"), expr("id DIV 4")),
              concat(lit("r"), expr("id DIV 4")),
              concat(lit("x"), col("id")),
              concat(lit("y"), col("id")),
              concat(lit("z"), col("id"))).as("text")),
          maxDf = None)
      },
      // x15 shape: duplicate-span removal over the same fixed-overlap
      // construction — every group of 4 docs shares its first 5-token
      // segment (df=4 > maxDf → dropped from all four), the second
      // segment is doc-unique (kept). Cost is the segment-DF groupBy +
      // rejoin + per-doc reassembly; should grow linearly in n with the
      // per-doc overlap held constant.
      time("span_dedup") {
        val n = 50000L * m
        operators.TextAnalysis.spanDedup(
          spark.range(n).select(col("id").as("doc_id"),
            concat_ws(" ",
              concat(lit("p"), expr("id DIV 4")),
              concat(lit("q"), expr("id DIV 4")),
              concat(lit("r"), expr("id DIV 4")),
              concat(lit("s"), expr("id DIV 4")),
              concat(lit("t"), expr("id DIV 4")),
              concat(lit("x"), col("id")), concat(lit("y"), col("id")),
              concat(lit("z"), col("id")), concat(lit("w"), col("id")),
              concat(lit("v"), col("id"))).as("text")),
          maxDf = 3L)
      },
      // x35 shape: OVERLAPPING-window substring dedup over the same
      // fixed-overlap construction — each group of 4 docs shares a
      // 7-token prefix (two duplicated 6-token windows per doc, merged
      // into one span), unique tails. Window census + count join +
      // per-doc islands: linear in n with constant per-doc overlap.
      time("substring_dedup") {
        val n = 50000L * m
        operators.TextAnalysis.substringDedup(
          spark.range(n).select(col("id").as("doc_id"),
            concat_ws(" ",
              concat(lit("p"), expr("id DIV 4")),
              concat(lit("q"), expr("id DIV 4")),
              concat(lit("r"), expr("id DIV 4")),
              concat(lit("s"), expr("id DIV 4")),
              concat(lit("t"), expr("id DIV 4")),
              concat(lit("u"), expr("id DIV 4")),
              concat(lit("v"), expr("id DIV 4")),
              concat(lit("x"), col("id")), concat(lit("y"), col("id")),
              concat(lit("z"), col("id")), concat(lit("w"), col("id")),
              concat(lit("k"), col("id"))).as("text")),
          minCount = 2L)
      },
      // x36 shape: the HLL aggregate over a growing all-distinct value
      // stream — per-partition state is the constant 64-long buffer, so
      // cost must track the narrow md5 scan (linear), never the
      // cardinality (an exact distinct would shuffle all n keys)
      time("hll_sketch") {
        val n = 2000000L * m
        spark.range(n)
          .select((col("id") % 8L).cast("string").as("source"),
            concat(lit("g"), col("id")).as("g"))
          .select(col("source"),
            operators.TextAnalysis.hllHash(col("g")).as("h"))
          .groupBy(col("source"))
          .agg(graft.functions.GraftFunctions.hll_sketch(col("h"),
            operators.TextAnalysis.HllM).as("regs"))
      },
      // d19 shape: a growing incoming batch tested against a FIXED
      // standing corpus's window bloom — the corpus side collapses to
      // one 32 KB broadcast bitset; incoming cost is a narrow window
      // explode + per-window bit test, and the exact verification join
      // touches only the planted ~25% overlap. Must stay linear in the
      // batch — never batch × corpus.
      time("bloom_novelty") {
        def doc7(key: Column, id: Column): Column = concat_ws(" ",
          concat(lit("p"), key), concat(lit("q"), key),
          concat(lit("r"), key), concat(lit("s"), key),
          concat(lit("t"), key), concat(lit("u"), key),
          concat(lit("v"), key),
          concat(lit("x"), id), concat(lit("y"), id),
          concat(lit("z"), id), concat(lit("w"), id),
          concat(lit("k"), id))
        val corpus = spark.range(20000L)
          .select(col("id").as("doc_id"),
            doc7(col("id").cast("string"), col("id")).as("text"))
        val inc = spark.range(50000L * m)
          .select((col("id") + 1000000L).as("doc_id"),
            doc7(expr("CASE WHEN id % 4 = 0 THEN CAST((id DIV 4) % 20000 AS STRING) " +
              "ELSE concat('n', id) END"), col("id") + 1000000L).as("text"))
        operators.Dedup.bloomNovelty(corpus, inc)
      },
      // m13 shape: temporal-offset voting over per-frame signatures —
      // each pair of clips shares a planted aligned 4-run, all other
      // frames unique. One sig equi-join (postings of 2) + pair-space
      // vote groupBy + mergeable argmax: linear in clips, and the
      // production sig cap is ARMED (count-first) like the real run.
      time("temporal_votes") {
        val n = 50000L * m
        val f = spark.range(n)
          .select(col("id").as("doc_id"),
            explode(expr("sequence(0, 15)")).as("fi"))
          .select(col("doc_id"), col("fi").cast("long").as("frame_idx"),
            expr("CASE WHEN fi < 4 THEN (doc_id DIV 2) * 16 + fi " +
              "ELSE 1000000000 + doc_id * 16 + fi END").as("sig"))
        operators.Multimodal.temporalNearDup(f, maxSig = Some(8L))
      },
      // warehouse ANN shape: probe a sign-LSH-partitioned corpus of
      // 100k×m vectors (written untimed above). Probe wall time should
      // stay ~flat in m: the scan partition-prunes to the query's
      // bucket directory (≈ bucket fraction of the corpus)
      time("bucketed_knn_probe") {
        operators.Warehouse.knnProbe(spark, vectorDir, probeQuery, 5)
      },
      // trained-IVF ANN shape: probe the same corpus IVF-partitioned by
      // a trained codebook. Wall time should track the pruned fraction
      // (nprobe/nlist of the corpus), not the corpus: the probe list is
      // pinned driver-side as partition-filter literals
      time("ivf_trained_probe") {
        operators.Warehouse.ivfProbe(spark, ivfDir, trainedCents, probeQuery, 5)
      },
      // d8 shape: FIXED 500-doc batch vs the m×-corpus postings index
      // read back from its bucketed layout — per-batch cost should
      // track batch size (fixed signature map + co-located join), with
      // only the postings scan growing in m
      time("incremental_dedup") {
        operators.Dedup.incrementalFromPostings(
          spark.table(postingsTable),
          operators.Dedup.lshIndex(dedupBatch), maxBucket = None)
      },
      // q20 shape: exact global rank over a 1M×m-row synthetic frame
      // (multiplicative-hash values, heavy ties at small m) — the
      // range-repartition + per-partition row_number + literal-offset
      // formulation. Should grow ~linearly in n: one range shuffle, one
      // pid-hash shuffle, narrow everything else — the single-partition
      // window it replaces would flatline one core here and die at scale
      time("global_rank") {
        val n = 1000000L * m
        operators.Relational.globalRank(
          spark.range(n).select(col("id"),
            expr("(id * 2654435761) % 1000000").as("v")),
          Seq(col("v").asc, col("id").asc))
      },
      // x16 shape: bigram-LM scoring over a 50k×m-doc synthetic corpus
      // with a bounded shared vocabulary plus one doc-unique token per
      // doc — so the bigram model grows ~linearly in n (the realistic
      // O(unique pairs) regime) and the (w1,w2) scoring join's BOTH
      // sides grow with the corpus. Expect ~linear total
      time("bigram_score") {
        val n = 50000L * m
        operators.TextAnalysis.bigramScore(
          spark.range(n).select(col("id").as("doc_id"),
            concat_ws(" ",
              concat(lit("w"), expr("id % 997")),
              concat(lit("w"), expr("id % 89")),
              concat(lit("w"), expr("id % 997")),
              concat(lit("u"), col("id")),
              concat(lit("w"), expr("id % 89")),
              concat(lit("w"), expr("id % 7"))).as("text")))
      },
      // d9 shape, the maxDf production posture measured: directed
      // containment over a corpus with one deliberate BOILERPLATE
      // shingle (df = n/50 — every 50th doc opens with the same three
      // tokens) on top of constant per-group overlap (df = 4).
      // UNCAPPED, the boilerplate posting alone expands to (n/50)²
      // pair rows — super-linear by construction, the Σdf² hazard d9's
      // scaladoc warns about; with the cap engaged the posting is
      // dropped and the cost tracks n. Same corpus, same query, one
      // knob — the capped row is the library-default posture.
      time("containment_capped") {
        operators.Dedup.containmentPairs(containDocs(m), maxDf = Some(100L))
      },
      time("containment_uncapped") {
        operators.Dedup.containmentPairs(containDocs(m), maxDf = None)
      },
      // the count-first cap's own hazard shape: ONE shingle with
      // df = n (every doc opens with the same three tokens — the
      // crawl-scale `<html>` boilerplate case). The OLD collect-then-
      // filter form had to materialize that whole posting as a single
      // unspillable array in one task before the cap could see it;
      // count-first drops the key with constant aggregation state, so
      // the BUILD stage survives and total cost tracks n. The
      // per-group probes above can't see this (their df maxes at
      // n/50); this one exists to pin the build-stage bound itself.
      time("postings_megakey") {
        val n = 1000000L * m
        val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", lit("h1"), lit("h2"), lit("h3"),
            concat(lit("x"), col("id")), concat(lit("y"), col("id")),
            concat(lit("z"), col("id"))).as("text"))
        operators.Dedup.containmentPairs(docs, maxDf = Some(64L))
      },
      // d6/d7 shape: alternating-star connected components over a
      // synthetic 50k×m-node graph of 64-chains — fixed round count
      // (O(log diameter)), so the probe isolates per-round linearity
      time("components") {
        val n = 50000L * m
        operators.Components.connectedComponents(
          spark.range(n).select(col("id")),
          spark.range(n - 1).filter(col("id") % 64L =!= 63L)
            .select(col("id").as("a"), (col("id") + 1L).as("b")))
      },
      // textDedupIngest's pair shape: a FIXED 1k batch probes its
      // 33-key hamming balls against an m×-sized standing signature
      // log — the probe fan is batch-sized and BROADCASTS, so the
      // standing side streams without a shuffle (measured flat:
      // 1.86 → 1.81 s at m=1→10); past broadcast size the persisted
      // key-bucketed index (the d8 postings contract) carries the
      // same no-corpus-shuffle property
      time("simhash_incremental") {
        val n = 1000000L * m
        val standing = spark.range(n).select(col("id").as("doc_id"),
          pmod(col("id") * 2654435761L, lit(1L << 32)).as("bits"))
        val batch = spark.range(1000L).select((col("id") + n).as("doc_id"),
          pmod(col("id") * 1099511628211L, lit(1L << 32)).as("bits"))
        operators.Dedup.simhashIncrementalPairs(standing, batch)
      },
      // Components.absorb shape: a FIXED batch (1k new nodes + 2k
      // edges touching random standing ids) absorbed into an m×-sized
      // STANDING resolution (1M×m ids in 10-node components) — the
      // rep-graph CC and remap are batch-sized, so growth in m should
      // track only the three shuffle-free broadcast-probe scans of the
      // standing side, far below the `components` re-resolve line
      time("components_absorb") {
        val n = 1000000L * m
        val standing = spark.range(n)
          .select(col("id"), (col("id") - pmod(col("id"), lit(10L))).as("rep"))
        val batch = spark.range(n, n + 1000L).select(col("id"))
        val edges = spark.range(2000L).select(
          (col("id") / 2L + n).as("a"),
          pmod(col("id") * 2654435761L, lit(n)).as("b"))
        operators.Components.absorb(standing, batch, edges)
      },
      // e15 shape: a FIXED 100k-change feed collapsed (one max_by agg)
      // and merged into an m×-sized base — cost should track the base
      // scan + its one key shuffle, with the collapse fixed (at real
      // scale the bucketed base drops its shuffle too and the merge is
      // O(batch))
      time("cdc_merge") {
        val base = spark.range(1000000L * m)
          .select(col("id").as("key"), (col("id") % 1000L).as("bal_c"))
        val feed = spark.range(100000L).select(
          (col("id") % 500000L).as("key"),
          when(col("id") % 10L === 0L, "D").otherwise("U").as("op"),
          (col("id") % 777L).as("val_c"),
          timestamp_seconds(col("id") % 100000L).as("ts"),
          col("id").as("event_id"))
        base.join(operators.Events.collapseFeed(feed), Seq("key"), "full_outer")
          .select(col("key"),
            coalesce(col("last_val_c"), col("bal_c")).as("v"),
            coalesce(col("n_changes"), lit(0L)).as("n"))
      },
      // e16 shape: a FIXED 100k-row delta's partial aggregates merged
      // into an m×-row STORED aggregate (the production IVM posture —
      // no base recompute); should track the stored-side scan+shuffle
      time("delta_agg_merge") {
        val n = 1000000L * m
        val stored = spark.range(n).select(col("id").as("k"),
          lit(5L).as("n_b"), (col("id") % 997L).as("c_b"))
        val delta = spark.range(100000L)
          .select((col("id") * 37L % n).as("k"), col("id"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_d"), sum(col("id")).as("c_d"))
        stored.join(delta, Seq("k"), "full_outer")
          .select(col("k"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_d"), lit(0L))).as("c"))
      },
      // e33 shape: a fixed-size ±1 delta absorbed into a GROWING
      // stored support table (the retractable-distinct auxiliary
      // state) — one delta partial agg + one full-outer merge +
      // transition tallies; must track the stored-table scan
      // (linear in n), never recompute a corpus distinct
      time("delta_distinct_merge") {
        val n = 1000000L * m
        val base = spark.range(n).select((col("id") % 720L).as("hour_s"),
          col("id").as("user_id"), col("id").as("event_id"),
          lit("click").as("event_type"))
        val ins = spark.range(100000L)
          .select((col("id") % 720L).as("hour_s"),
            (col("id") + n).as("user_id"), (col("id") + n).as("event_id"),
            lit("click").as("event_type"))
        val del = base.filter(col("user_id") % 13L === 0L)
        operators.Events.deltaDistinct(base, ins, del)
      },
      // native as-of shape: sort-merge as-of of n×m probes vs n×m
      // quotes over 100k keys — one exchange+sort per side then a
      // linear O(1)-state merge; should track n (the composed
      // union+window twin pays the same exchanges plus a window pass
      // over the union)
      time("asof_native") {
        val n = 1000000L * m
        val l = spark.range(n).select((col("id") % 100000L).as("k"),
          (col("id") * 7919L % 1000000L).as("ts"), col("id").as("lid"))
        val r = spark.range(n).select((col("id") % 100000L).as("k"),
          (col("id") * 104729L % 1000000L).as("ts"),
          (col("id") % 997L).as("pay"))
        graft.plans.AsOfMergeJoin.asof(l, r, "k", "ts", Seq("pay"))
      },
      // d12 shape: SemDeDup's within-cluster pair join over an n×m
      // synthetic corpus pre-assigned to √n-ish clusters of FIXED size
      // 64 — pair work is Σ|cluster|² = 64·n, so the probe should
      // track n (the method's point: cluster count grows, cluster
      // size doesn't)
      time("semdedup_pairs") {
        val n = 100000L * m
        val dim = 8
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(dim)),
            j => (((col("id") * 37L + j * 11L) % 97L + 1L) / 98.0d)
              .cast("float"))
            .as("embedding"),
          (col("id") % (n / 64L)).as("cluster"))
        val e = operators.Similarity.withNorm(corpus)
        operators.Similarity.withinClusterPairs(e)
      },
      // d12 DEGENERATE case: ONE mega-cluster of 1000·m near-identical
      // vectors (the boilerplate-embedding failure mode). Uncapped
      // pair work is n²/2 — quadratic in m by construction; the
      // maxCluster=64 sub-sharding bounds per-shard work to ~64·n/2,
      // so capped should track m while uncapped tracks m². The
      // capped-vs-uncapped ratio at m is the knob's measured value.
      time("semdedup_mega_uncapped") {
        val n = 1000L * m
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(8)),
            j => (lit(0.5d) + (col("id") % 13L).cast("double") / 1e5)
              .cast("float")).as("embedding"),
          lit(0L).as("cluster"))
        operators.Similarity.withinClusterPairs(
          operators.Similarity.withNorm(corpus), None)
      },
      time("semdedup_mega_capped64") {
        val n = 1000L * m
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(8)),
            j => (lit(0.5d) + (col("id") % 13L).cast("double") / 1e5)
              .cast("float")).as("embedding"),
          lit(0L).as("cluster"))
        operators.Similarity.withinClusterPairs(
          operators.Similarity.withNorm(corpus), Some(64))
      },
      // s35 shape: multiprobe sign-LSH range search — the query side
      // is a fixed NQueries·(NPlanes+1) broadcast, so cost must track
      // the corpus scan + probed-bucket pair work (linear in m for
      // balanced sign buckets), never corpus × queries
      time("range_lsh") {
        val n = 200000L * m
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(operators.Similarity.Dim)),
            j => (((col("id") * 37L + j * 11L) % 97L - 48L) / 49.0d)
              .cast("float")).as("embedding"))
        operators.Similarity.rangeLshWith(
          operators.Similarity.withNorm(corpus))
      },
      // d23 long-doc shape: the banded edit tier's WORST case — docs
      // long enough (~8 200 chars) that the length-relative band hits
      // the D23LevClamp ceiling, so every in-band pair pays the full
      // O(clamp·min_len) strip (~34M cell ops/pair; the clamp is the
      // bound that keeps one pair from owning an executor). Half the
      // pairs are in-band near-dups (tail edit), half are over-gap
      // (one side truncated to a quarter) and must be rejected by the
      // kernel's O(len) char-count early-out, never the DP. Pair count
      // grows with m; expect linear growth — the per-pair cost is
      // CONSTANT by the clamp, which is exactly what this probes.
      time("edit_verify_longdoc") {
        val n = 100L * m
        def body(key: Column): Column = array_join(
          transform(sequence(lit(1), lit(800)),
            j => concat(lit("tokn"), pmod(key * 31L + j.cast("long"),
              lit(99991L)))), " ")
        val left = spark.range(n).select(col("id").as("doc_id"),
          body(col("id")).as("text"))
        val right = spark.range(n).select((col("id") + n).as("doc_id"),
          when(col("id") % 2L === 0L,
            concat(body(col("id")), lit(" changed tail")))
            .otherwise(substring(body(col("id")), 1, 2000)).as("text"))
        val cands = spark.range(n)
          .select(col("id").as("a"), (col("id") + n).as("b"))
        operators.Dedup.editVerifyCapped(cands, left.unionByName(right))
      },
      // x45 shape: the novelty census over an n-row (shingle, batch)
      // incidence frame — two shingle-keyed aggregates (distinct
      // presence, first-batch min) plus the B-group finals. The
      // shuffle payload is the incidence frame itself (here unbucketed
      // — the worst case; the gated query rides graft_shinv's bucket
      // layout and pays NO shingle exchange), so expect linear in m.
      // Gram universe ~n/3 (corpus-like: most grams rare), 10 batches.
      time("novelty_census") {
        val n = 2000000L * m
        val gb = spark.range(n).select(
          concat(lit("g"), pmod(col("id") * 2654435761L, lit(n / 3L)))
            .as("shingle"),
          pmod(col("id"), lit(10L)).as("batch"))
        val nDocs = spark.range(10L).select(col("id").as("batch"),
          lit(n / 10L).as("n_docs"))
        operators.TextAnalysis.noveltyFromIncidence(nDocs, gb)
      },
      // x46 sketch shape: the SAME incidence frame through the KMV
      // path — per-partition partial sketches reduce the exchange to
      // B·k hashes per partition regardless of n (the bounded-memory
      // contrast to novelty_census's corpus-sized shuffle; expect
      // near-FLAT in m once the scan is the only linear stage)
      time("novelty_sketch") {
        val n = 2000000L * m
        val gb = spark.range(n).select(
          concat(lit("g"), pmod(col("id") * 2654435761L, lit(n / 3L)))
            .as("shingle"),
          pmod(col("id"), lit(10L)).as("batch"))
        operators.TextAnalysis.noveltySketchFromIncidence(gb,
          operators.TextAnalysis.KmvK)
      },
      // s24/nnDescent shape: one NN-descent round over a synthetic
      // GraphK-regular graph on n×m vectors — the candidate expansion
      // is ≤ k² + 2k per vector BY CONSTRUCTION (graph-sized, never
      // corpus²), and the re-score is two hash joins moving candidate
      // rows; expect ~linear in m. The convergence loop is this round
      // iterated a small constant number of times.
      time("nn_descent_round") {
        val n = 20000L * m
        val dim = 8
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(dim)),
            j => (((col("id") * 37L + j * 11L) % 97L + 1L) / 98.0d)
              .cast("float")).as("embedding"))
        val e = operators.Similarity.withNorm(corpus)
        val g0 = spark.range(n).select(col("id").as("src"),
            explode(sequence(lit(1L),
              lit(operators.Similarity.GraphK.toLong))).as("i"))
          .select(col("src"), col("i").as("rank"),
            pmod(col("src") + col("i"), lit(n)).as("nid"),
            lit(0L).as("cos_e6"))
        operators.Similarity.nnDescentRound(e, g0)
      },
      // x40 ingest shape: ONE fixed 100-doc batch decided against an
      // m×-re-listed standing corpus. This session form rebuilds the
      // standing artifacts (test-split grams, bigram model, tertile
      // boundaries) per call — a real deployment persists them — so
      // the probe measures the WORST-case per-batch cost: standing
      // scans are linear in m, batch-sided joins stay batch-sized.
      time("ingest_decide") {
        val docs = x("documents")
        val split = operators.Dedup.IncrementalSplit
        val standing = docs.filter(col("doc_id") < split)
        val batch = spark.read.parquet(s"$d/documents.parquet")
          .filter(col("doc_id") >= split)
          .orderBy(col("doc_id")).limit(100)
        operators.TextAnalysis.ingestDecideBatch(
          standing.select(col("doc_id"), col("text")),
          batch.select(col("doc_id"), col("text")),
          standing.select(col("doc_id"), col("text")))
      },
      // s27 search shape: a FIXED query set (the operator's 10) beam-
      // searched over a standing n×m-edge graph. Per-hop work is one
      // hash join of a query-sized frontier against the k-bounded edge
      // list — the graph side is scanned (linear in m here; bucketed
      // by src at warehouse scale), never expanded, and the visited/
      // re-score frames stay query-sized at every m.
      time("graph_search") {
        val n = 20000L * m
        val dim = 8
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(dim)),
            j => (((col("id") * 37L + j * 11L) % 97L + 1L) / 98.0d)
              .cast("float")).as("embedding"))
        val e = operators.Similarity.withNorm(corpus)
        val g0 = spark.range(n).select(col("id").as("src"),
            explode(sequence(lit(1L),
              lit(operators.Similarity.GraphK.toLong))).as("i"))
          .select(col("src"), col("i").as("rank"),
            pmod(col("src") + col("i"), lit(n)).as("nid"),
            lit(0L).as("cos_e6"))
        operators.Similarity.graphSearch(e, g0)
      },
      // knnGraphStream ingest shape: ONE micro-batch (1000 vectors)
      // absorbed against a standing n×m store seeded directly in the
      // store's own layout (admitted/ by assigned cluster, postings/
      // by probe cluster — plain parquet, so seeding bypasses the
      // absorb path). nlist follows the production √n rule, so
      // per-batch cost tracks batch × cluster size ≈ batch × √n ×
      // nprobe — expect ~√m growth, never corpus² and never a full
      // corpus scan (the partition-pruned isin reads only the batch's
      // clusters).
      (if (!wanted("knn_graph_absorb")) "knn_graph_absorb" -> -1.0
       else {
        // untimed seeding: the standing store in its own layout
        val n = 20000L * m
        val dim = 8
        def synth(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
          ids.select(
            col("id").as("vec_id"),
            transform(sequence(lit(1), lit(dim)),
              j => (((col("id") * 37L + j * 11L) % 97L + 1L) / 98.0d)
                .cast("float")).as("embedding"))
        val corpus = synth(spark.range(n))
        val k = math.max(16, math.sqrt(n.toDouble).toInt)
        val cents = operators.Similarity.trainCodebook(corpus, k, iters = 0)
        val store = TempPath.scratch(s"knn-absorb-$m")
        val seeded = operators.Similarity.assignWithProbes(
          operators.Similarity.withNorm(corpus), cents)
        seeded.write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$store/admitted")
        seeded.select(explode(col("probes")).as("pcluster"), col("vec_id"),
            col("embedding"), col("norm_fp"), col("cluster"))
          .write.mode("overwrite").partitionBy("pcluster")
          .parquet(s"$store/postings")
        val batch = synth(spark.range(n, n + 1000L))
        timeUnit("knn_graph_absorb") {
          streaming.StreamOps.knnGraphAbsorb(batch, store, 7L, cents)
        }
      }),
      // e19 DEGENERATE case: ONE hyperactive user with n×m events
      // (bot / replay loop). The former collect_list form buffered the
      // whole history in a single task array; the streamed fold pays a
      // spill-capable sort + an O(1)-state scan — expect ~linear in m,
      // bounded task memory by construction
      time("pattern_hyperkey") {
        val n = 1000000L * m
        val ev = spark.range(n).select(
          lit(7L).as("user_id"),
          timestamp_micros(col("id") * 1000L + 1700000000000000L).as("ts"),
          col("id").as("event_id"),
          element_at(
            array(lit("click"), lit("view"), lit("purchase"), lit("other")),
            (pmod(col("id"), lit(4L)) + 1L).cast("int")).as("event_type"))
        operators.Events.patternCount(ev,
          Seq("click", "view", "purchase"))
      },
      // d14 shape: the verified-dedup recipe (LSH candidates →
      // exact-Jaccard verify → CC → keep-one) over 50k×m docs where
      // each doc has exactly one exact twin — candidates stay ~n/2
      // (unique text elsewhere), verification is candidate-bound, CC
      // is twin-pair-sized; expect ~linear in m with the maxBucket
      // cap armed (the production posture; the query row runs
      // uncapped for oracle parity like d3/d9)
      time("verified_dedup") {
        val n = 50000L * m
        val docs = spark.range(n).select(col("id").as("doc_id"),
          synthText(pmod(col("id"), lit(n / 2))).as("text"))
        operators.Dedup.verifiedManifest(docs,
          operators.Dedup.lshCandidatesRaw(
            operators.Dedup.lshIndex(docs), maxBucket = Some(64)))
      },
      // x14 vs x23 DEGENERATE case: ONE source holding all n×m docs —
      // the rank form's per-source window funnels the whole corpus
      // through a single task's sort; the threshold form histograms,
      // finds the boundary bucket, ranks only ~1/256 of the source
      time("mix_rank_window") {
        val docs = spark.range(1000000L * m).select(
          col("id").as("doc_id"), lit("web").as("source"))
        operators.TextAnalysis.sourceMix(docs)
          .groupBy(col("source"))
          .agg(count(when(col("keep"), lit(1))).as("n_kept"))
      },
      time("mix_threshold") {
        val docs = spark.range(1000000L * m).select(
          col("id").as("doc_id"), lit("web").as("source"))
        operators.TextAnalysis.sourceMixThreshold(docs)
      },
      // q24 shape: one PageRank round over an n×m-edge ring graph —
      // per-round cost is the edge shuffle + combined sum; rounds are
      // a constant multiplier, so probe one
      time("pagerank_round") {
        val n = 1000000L * m
        val e = spark.range(n).select(col("id").as("src"),
          ((col("id") + 1L) % n).as("dst"))
        operators.Relational.pageRank(e, 1)
      },
      // x31 shape: stride-overlap chunking over 200k×m synthetic docs
      // of ~200 words — a narrow generate, expected flat-to-linear
      time("chunk_windows") {
        val n = 200000L * m
        val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 200).map(i =>
            concat(lit(s"w$i"), col("id") % 97L)): _*).as("text"))
        operators.TextAnalysis.chunkDocs(docs, 64L, 48L)
      },
      // x33 shape: token-budget threshold selection over 1M×m docs —
      // the histogram discipline's cost is one rollup + the boundary
      // bucket's rank (~n/65536 rows), so growth should track the
      // scan, never a global sort
      time("budget_threshold") {
        val n = 1000000L * m
        val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", lit("a"), lit("b"), lit("c"),
            concat(lit("d"), col("id"))).as("text"))
        operators.TextAnalysis.budgetSelect(docs)
      },
      // x18 shape: the BATCHED BPE trainer (production mode) taking a
      // 1024-merge vocabulary off a 200k×m-doc corpus with a ~50k-word
      // vocabulary — the r10 watch item was one driver round-trip PER
      // MERGE (32k jobs for a real tokenizer); batched mode accepts
      // every pairwise-disjoint top pair per round, so driver rounds
      // are ~k/batch and the wall clock is minutes, not hours. The
      // trainer's per-round cost is symbol-table-sized (distinct
      // words), so growth in m comes only from the one corpus-wide
      // word count at the front.
      time("bpe_batched_1024") {
        val n = 200000L * m
        val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ",
            concat(lit("al"), pmod(col("id") * 7L, lit(50021L))),
            concat(lit("be"), pmod(col("id") * 13L, lit(50021L))),
            concat(lit("ga"), pmod(col("id") * 31L, lit(50021L))),
            concat(lit("de"), pmod(col("id") * 61L, lit(50021L)))).as("text"))
        val merges = operators.TextAnalysis.trainBpeBatched(
          docs, 1024, scanWidth = 4096, exact = false)
        import spark.implicits._
        merges.toDF("a", "b")
      },
      // m7 shape (codec-free): MIH pair stage over 200k×m synthetic
      // hashes built to carry constant per-doc true-pair density (each
      // doc's twin at id+100k×m differs in 1 bit; multiplicative-hash
      // halves otherwise) — candidates should track n plus the
      // blocking's ~0.1% random-collision floor, not n²/256
      time("img_band_pairs") {
        val n = 200000L * m
        val hs = spark.range(n).select(col("id").as("doc_id"),
          expr(s"(id % ${n / 2}) * 2654435761 % 4294967296").as("ahash_hi"),
          expr(s"((id % ${n / 2}) * 40503 % 4294967296) ^ " +
            s"CASE WHEN id >= ${n / 2} THEN 1 ELSE 0 END").as("ahash_lo"))
        operators.Multimodal.imgNearDupPairs(hs, maxBucket = None)
      })

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"probe":"scale","multiplier":$m,"queries":$qs}""")
    spark.stop()
  }
}
