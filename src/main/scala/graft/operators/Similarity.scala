package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import TextOps.idiv

/** Similarity search over the `embeddings` table (`Array[Float]`
  * vectors): brute-force cosine top-k as the exact baseline, an
  * IVF-style (inverted-file) probe as the approximate scale path, and
  * cosine near-dup pairs.
  *
  * Numeric determinism: float sums are order-dependent, so dot products
  * and norms are computed in fixed-point — each term is rounded to an
  * integer at 1e9 scale and summed as BIGINT (associative ⇒ identical on
  * any partitioning/engine). The final cosine is then a pure function of
  * two exact integers: IEEE double division/sqrt are correctly rounded,
  * so every engine produces the same bits. Precision loss (~1e-9 per
  * term) is far below any ranking gap in the data.
  *
  * Scale notes (100 TB):
  *  - brute-force top-k broadcasts the (small) query set and streams the
  *    corpus once: no shuffle except the final per-query top-k, which is
  *    a partial top-k per partition (TakeOrdered-style) — linear scan,
  *    embarrassingly parallel;
  *  - IVF: the codebook is tiny by construction, so it is collected
  *    once and inlined as literals — centroid assignment and the
  *    query probe list are NARROW projections (argmax over a sorted
  *    literal array), zero exchanges; the probe then touches only
  *    nprobe/nlist of the corpus. At real scale the corpus is written
  *    partitioned by cluster id (Warehouse.writeIvf) and the probe is
  *    a partition-pruned read (Warehouse.ivfProbe, plan-asserted);
  *  - near-dup pairs use the same fixed-point cosine; production would
  *    bucket by sign-LSH first (see Dedup scale notes).
  */
object Similarity {

  val NQueries = 10
  val TopK = 5
  val NCentroids = 8
  val NProbe = 2

  /** Fixed-point (1e9) dot product of two float-array columns — native
    * codegen'd Catalyst expression ([[graft.functions.DotFp9]]). */
  def dotFp9(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_fp9(a, b)

  /** Reference higher-order-function formulation of [[dotFp9]] — kept
    * (and tested) as the semantic spec of the native expression; ~50×
    * slower interpreted, never used in the query paths. */
  def dotFp9Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * y.cast("double") * 1e9).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Fixed-point (1e9) squared norm. */
  def normFp9(a: Column): Column = dotFp9(a, a)

  /** Cosine from fixed-point dot and squared norms — exact-input double
    * math, bit-identical across engines. */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Corpus prep: compact the vector (parquet list elements are
    * declared nullable; array_compact flips containsNull to false,
    * unlocking DotFp9's bulk-copy codegen path for every downstream
    * PAIR evaluation) and attach the fixed-point squared norm.
    *
    * Compaction SHIFTS positions when a null element actually exists,
    * which would silently misalign every dot product — so the no-null
    * assumption is enforced, not hoped: a vector whose compacted length
    * differs fails the job with a clear message (per-ROW check, amortized
    * over millions of per-PAIR evaluations).
    *
    * Zero-norm vectors fail loudly too: cosine against them is 0/0, and
    * NaN ordering DIVERGES between the ranking formulations this engine
    * deliberately keeps equivalent (NaN sorts largest under
    * `orderBy(cos.desc)` but its negation sorts LAST in an ascending
    * array_sort), so a degenerate vector must never reach a ranking. */
  private[graft] def withNorm(df: DataFrame): DataFrame =
    df.filter(
      when(exists(col("embedding"), _.isNull),
        raise_error(concat(
          lit("embedding with null elements at vec_id="), col("vec_id"))))
        .otherwise(lit(true)))
      .withColumn("embedding", array_compact(col("embedding")))
      .withColumn("norm_fp", normFp9(col("embedding")))
      .filter(
        when(col("norm_fp") === 0L,
          raise_error(concat(
            lit("zero-norm embedding at vec_id="), col("vec_id"))))
          .otherwise(lit(true)))

  /** s1: brute-force cosine top-k — queries are vec_id < NQueries; for
    * each, the TopK nearest neighbors (self excluded) by exact cosine. */
  def s1KnnBrute(s: SparkSession, d: String): DataFrame =
    knnBruteWith(withNorm(embeddings(s, d)))

  /** The s1 pipeline over any [[withNorm]]-prepared frame — the exact
    * ground truth the recall specs/probes measure every ANN variant
    * against, on real or synthetic corpora. */
  private[graft] def knnBruteWith(e: DataFrame): DataFrame = {
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Sign sketch of every vector as an NPlanes-bit '0'/'1' string —
    * s4's bucket stage factored out so the kNN rung (s4) and the
    * range-search scale path (s35) sign against the SAME plane
    * family. */
  private[graft] def signBucketed(e: DataFrame): DataFrame = {
    val sigBit = (h: Int) =>
      when(dotFp9(col("embedding"),
        array(planeWeights(h).map(lit): _*)) >= 0L, "1").otherwise("0")
    e.withColumn("bucket", concat((0 until NPlanes).map(sigBit): _*))
  }

  /** s35: LSH-BUCKETED RANGE SEARCH — the SCALE PATH of s10's exact
    * ε-ball (s10 scores every (query, corpus) pair; at 100 TB the
    * corpus side of a threshold search must be PRUNED before any dot
    * product runs). Candidates come from MULTIPROBE sign-LSH: each
    * query probes its own [[NPlanes]]-bit sign bucket plus every
    * 1-bit flip (the d5 hamming-ball trick applied to sketches —
    * NPlanes+1 probe keys per query, and a corpus vector within
    * hamming ≤ 1 of the query's sketch matches EXACTLY one key, so no
    * dedup stage); survivors are verified by the exact e6-rounded
    * cosine ≥ [[RadiusE6]] — the same τ as s10, so output ⊆ s10 row
    * for row and the spec MEASURES the recall the 1-probe budget buys
    * (recorded honestly; pairs whose sketches differ in ≥ 2 bits are
    * the documented miss class — more probes or more tables buy them
    * back, the standard multiprobe trade). Plan: corpus scan ⨝
    * broadcast probe keys (NQueries·(NPlanes+1) rows) → exact-verify
    * filter — NO hash exchange, pair work Σ|bucket| over probed
    * buckets instead of |corpus|·|queries|. */
  def s35RangeLsh(s: SparkSession, d: String): DataFrame =
    rangeLshWith(withNorm(embeddings(s, d)))

  /** s36: RANGE-SEARCH RECALL LADDER — s18's self-measuring discipline
    * applied to the s35 scale path (VERDICT r16 #5): per probe radius
    * r ∈ {1, 2}, the fraction of s10's exact ε-ball the multiprobe
    * LSH recovered, as an oracle-gated NUMBER. The s35 output is
    * exact-verified (cos ≥ τ) and therefore a subset of s10 row for
    * row, so recall is a pure count ratio — n_hit/n_exact in e6 — and
    * the oracle derives VERBATIM from the s10 and s35 statements (the
    * same CTE text, radius-2 keys appended), so the ladder can never
    * drift from the search it measures. Radius 2 is the recall knob's
    * next rung: +C(NPlanes,2) probe keys per query buys back the
    * 2-bit-sketch miss class (measured at sf0.001: radius 1 recovers
    * ~24% of the ball, radius 2 ~49% — the s35 spec's 1-probe figure
    * now rides the correctness gate).
    *
    * Scale notes (100 TB): both rungs are the s35 plan (corpus scan ⨝
    * broadcast probe keys, no exchange); the exact side is s10's
    * broadcast scan. Counts are driver-side singletons (three jobs),
    * never collected row sets. */
  def s36RangeRecall(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val nExact = s10RadiusSearch(s, d).count()
    require(nExact > 0, s"s36: empty exact ε-ball at $d — " +
      "recall denominators need at least one exact neighbor")
    val rows = Seq(1, 2).map { r =>
      (r.toLong, nExact, rangeLshWith(e, r).count())
    }
    val sp = s
    import sp.implicits._
    rows.toDF("probe_radius", "n_exact", "n_hit")
      .withColumn("recall_e6",
        call_function("div", col("n_hit") * lit(1000000L), col("n_exact")))
      .orderBy(col("probe_radius"))
  }

  /** One sign-bucket bit flip at 0-based position `i` — the multiprobe
    * key constructor, position-independent so flips compose. */
  private def flipAt(b: Column, i: Int): Column = concat(
    substring(b, 1, i),
    when(substring(b, i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
    substring(b, i + 2, NPlanes))

  /** Multiprobe key set of a sign bucket at probe radius 1 or 2: the
    * identity bucket, every 1-bit flip, and (radius 2) every 2-bit
    * flip — 1 + NPlanes (+ C(NPlanes,2)) DISTINCT keys, so a corpus
    * vector within hamming ≤ radius of the query's sketch matches
    * EXACTLY one key (its own bucket) and no dedup stage is needed. */
  private def probeKeys(bucket: Column, radius: Int): Seq[Column] = {
    require(radius == 1 || radius == 2, s"probe radius $radius unsupported")
    val idx = 0 until NPlanes
    val singles = idx.map(i => Seq(i))
    val pairs = for { i <- idx; j <- idx if j > i } yield Seq(i, j)
    val sets = Seq(Seq.empty[Int]) ++ singles ++
      (if (radius >= 2) pairs else Nil)
    sets.map(_.foldLeft(bucket)(flipAt))
  }

  /** The s35 pipeline over any [[withNorm]]-prepared frame (queries =
    * vec_id < NQueries, the standard convention) — probed for
    * corpus-linearity by ScaleProbe's `range_lsh` shape. `radius` is
    * the multiprobe recall knob s36 measures: radius 2 probes the
    * 2-bit hamming ball (22 keys/query at NPlanes = 6 — still a
    * broadcast-trivial probe side) and buys back the ≥2-bit-sketch
    * miss class radius 1 documents. */
  private[graft] def rangeLshWith(e: DataFrame, radius: Int = 1): DataFrame = {
    val eb = signBucketed(e)
    val c = eb.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("bucket"))
    val probes = eb.filter(col("vec_id") < NQueries.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"),
        explode(array(probeKeys(col("bucket"), radius): _*)).as("bucket"))
    c.join(broadcast(probes), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos_e6",
        round(cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")) * 1e6).cast("long"))
      .filter(col("cos_e6") >= RadiusE6)
      .select(col("qid"), col("nid"), col("cos_e6"))
      .orderBy(col("qid"), col("cos_e6").desc, col("nid"))
  }

  /** A collected codebook entry: centroid id, compacted embedding,
    * fixed-point squared norm. The codebook is tiny BY CONSTRUCTION
    * (NCentroids rows — a trained IVF codebook is likewise a few
    * thousand rows at most), so it is collected once at query build and
    * inlined as literals, the same way [[s4KnnSignLsh]] inlines its
    * hyperplanes. */
  private[graft] case class Centroid(cid: Long, emb: Seq[Float], normFp: Long)

  /** Collect the codebook (vectors with vec_id < NCentroids) from a
    * [[withNorm]]-prepared frame — one tiny job. */
  private[graft] def collectCodebook(e: DataFrame): Seq[Centroid] =
    e.filter(col("vec_id") < NCentroids.toLong)
      .select(col("vec_id"), col("embedding"), col("norm_fp"))
      .collect().toSeq
      .map(r => Centroid(r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
      .sortBy(_.cid)

  /** The CANONICAL corpus codebook, collected once per (session, dir)
    * — the shared-stage pay-once discipline applied to the driver-side
    * collects: ~10 gated s-queries each re-ran the identical
    * NCentroids-row collect job per execution (1-2 scheduler
    * round-trips apiece at bench scale; at warehouse scale, repeated
    * footer-to-driver scans of the same frozen codebook). Pipelines
    * over non-canonical frames (augmented/permuted/synthetic) keep
    * calling [[collectCodebook]] directly. */
  private[graft] def sharedCodebook(s: SparkSession, d: String): Seq[Centroid] =
    SessionCaches.getOrBuildVal(cbCache, s, s"ivfcb|$d")(
      collectCodebook(withNorm(embeddings(s, d))))

  private val cbCache = SessionCaches.newValCache[Seq[Centroid]]()

  /** Every codebook cosine of (emb, normFp), ranked (cos desc, cid asc),
    * as ONE narrow array-of-structs expression. Struct ordering is
    * lexicographic by field, so sorting (-cos, cid) ascending reproduces
    * exactly the (cos DESC, cid) order the window formulation used —
    * double negation is exact, ties still break on cid. */
  private def rankedCentroids(cents: Seq[Centroid], emb: Column,
      normFp: Column): Column =
    array_sort(array(cents.map { c =>
      struct(
        (-cosine(dotFp9(emb, array(c.emb.map(lit): _*)), normFp,
          lit(c.normFp))).as("neg_cos"),
        lit(c.cid).as("cid"))
    }: _*))

  /** The argmin entry of [[rankedCentroids]] WITHOUT the sort:
    * array_min over the same (neg_cos, cid) structs — identical
    * lexicographic struct ordering, so identical value to
    * element_at(array_sort(...), 1), but array_min is a regular
    * codegen expression while array_sort is a HigherOrderFunction
    * (CodegenFallback): on a corpus-wide projection the sort variant
    * drops the whole expression tree out of whole-stage codegen and
    * re-evaluates every dotFp9 interpreted, with no subexpression
    * elimination (measured r17: the s8 encode stage alone was ~1.4 s
    * of single-task CPU at sf0.1 before this change). */
  private def minCentroid(cents: Seq[Centroid], emb: Column,
      normFp: Column): Column =
    array_min(array(cents.map { c =>
      struct(
        (-cosine(dotFp9(emb, array(c.emb.map(lit): _*)), normFp,
          lit(c.normFp))).as("neg_cos"),
        lit(c.cid).as("cid"))
    }: _*))

  /** IVF centroid-assignment stage: nearest codebook centroid per
    * vector as a NARROW projection over the literal-inlined codebook —
    * zero exchanges (plan-pinned by PipelineOpsSpec). The previous
    * formulation (corpus ⨯ broadcast(codebook) + row_number over
    * vec_id) replicated every corpus row ×NCentroids and then shuffled
    * the whole expanded corpus just to take an argmax; at 100 TB that
    * exchange dominates the query. The argmax itself is [[minCentroid]]
    * (codegen-friendly array_min), not a sort. */
  private[graft] def assignClusters(e: DataFrame, cents: Seq[Centroid]): DataFrame =
    e.withColumn("cluster",
      minCentroid(cents, col("embedding"), col("norm_fp")).getField("cid"))

  /** Assignment AND probe list in one ranked-codebook pass — the
    * admission projection of the streaming kNN-graph maintainer
    * ([[graft.streaming.StreamOps.knnGraphStream]]): `cluster` is the
    * argmax (= probes head), `probes` the `nprobe` nearest cids in
    * s23's exact order. Stored at admission because both are pure
    * functions of (vector, pinned codebook) — the standing corpus then
    * serves the existing→new probe direction without re-ranking. */
  private[graft] def assignWithProbes(e: DataFrame, cents: Seq[Centroid],
      nprobe: Int = NProbe): DataFrame =
    e.withColumn("rc", rankedCentroids(cents, col("embedding"), col("norm_fp")))
      .select(col("vec_id"), col("embedding"), col("norm_fp"),
        element_at(col("rc"), 1).getField("cid").as("cluster"),
        transform(slice(col("rc"), 1, nprobe), _.getField("cid")).as("probes"))

  /** IVF probe-list stage: the `nprobe` nearest centroids per query — a
    * narrow slice+explode of the same ranked-codebook array, no
    * exchange (the explode fans each query row out ×nprobe in place). */
  private[graft] def probeClusters(e: DataFrame, cents: Seq[Centroid],
      nprobe: Int = NProbe): DataFrame =
    e.filter(col("vec_id") < NQueries.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"),
        explode(transform(
          slice(rankedCentroids(cents, col("embedding"), col("norm_fp")),
            1, nprobe),
          _.getField("cid"))).as("cluster"))

  /** Fixed-point squared norm of a driver-side vector — the same
    * rounding as the DotFp9 kernel (Warehouse.bucketOf uses the same
    * construction), so driver-built centroids hash identically. */
  private def normFpOf(v: Seq[Float]): Long = {
    var s = 0L
    v.foreach(x => s += graft.functions.DotFp9
      .roundHalfAway(x.toDouble * x.toDouble * 1e9))
    s
  }

  /** Train a spherical k-means codebook over a (vec_id, embedding)
    * corpus — the REAL counterpart of s2's deterministic stand-in
    * centroids (s2 keeps the stand-in for DuckDB-oracle parity; an
    * iterative trainer has no SQL oracle).
    *
    * Lloyd rounds: ASSIGN is the same narrow zero-exchange argmax
    * projection s2 uses ([[assignClusters]], broadcast literal
    * codebook); UPDATE is one groupBy(cluster) with `dim` map-side-
    * combined per-dimension sums — one k×(dim+1)-value shuffle per
    * round, nothing else moves. Components are summed UNIT-normalized
    * and in fixed point (1e9): unit because the unit-mean M-step is
    * what makes the sum-of-cosines objective monotone non-decreasing
    * (pinned by spec), fixed-point because associative integer sums
    * make training bit-deterministic on any partitioning (|component|
    * ≤ 1 ⇒ per-cluster sums overflow only past ~9e9 vectors per
    * cluster). Init: the k lowest vec_ids. Empty clusters keep their
    * previous centroid. Zero-norm vectors are undefined in cosine
    * space and fail loudly (ANSI cast).
    *
    * Scale notes (100 TB): per round = one narrow scan + one k×(dim+1)
    * aggregate — the textbook distributed Lloyd shape; the codebook
    * stays driver-sized (k ≤ thousands) by construction. */
  def trainCodebook(corpus: DataFrame, k: Int = NCentroids,
      iters: Int = 3): Seq[Centroid] = {
    val e = withNorm(corpus)
    val unit = e.withColumn("u",
      transform(col("embedding"), v =>
        round(v.cast("double") /
          sqrt(col("norm_fp").cast("double") / 1e9) * lit(1e9)).cast("long")))
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    var cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).collect().toSeq
      .zipWithIndex.map { case (r, i) =>
        val emb = r.getSeq[Float](0)
        Centroid(i.toLong, emb, normFpOf(emb))
      }
    for (_ <- 0 until iters) {
      val sums = assignClusters(unit, cents)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(j => sum(element_at(col("u"), j + 1)).as(s"s$j")): _*)
        .collect()
      val byCluster = sums.map(r => r.getAs[Long]("cluster") -> r).toMap
      cents = cents.map { c =>
        byCluster.get(c.cid).fold(c) { r =>
          val n = r.getAs[Long]("n").toDouble
          val emb = (0 until dim).map(j => (r.getAs[Long](s"s$j") / n / 1e9).toFloat)
          Centroid(c.cid, emb, normFpOf(emb))
        }
      }
    }
    cents
  }

  /** Sum over the corpus of each vector's best-centroid cosine — the
    * spherical k-means objective, for the monotonicity spec. */
  private[graft] def codebookObjective(corpus: DataFrame,
      cents: Seq[Centroid]): Double =
    withNorm(corpus).select(
      sum(-element_at(
        rankedCentroids(cents, col("embedding"), col("norm_fp")), 1)
        .getField("neg_cos")).as("obj"))
      .first().getDouble(0)

  /** s2: IVF probe — codebook = vectors with vec_id < NCentroids
    * (deterministic stand-in for trained centroids); every vector is
    * assigned to its nearest centroid; a query searches only the NProbe
    * clusters nearest to it. Approximate: recall < 1 vs s1 by design.
    * Assignment and probe-list are narrow projections over the
    * collected codebook ([[assignClusters]]/[[probeClusters]]); the
    * only exchanges left are the probed-subset search's own top-k. */
  def s2KnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    knnIvfWith(e, sharedCodebook(s, d))
  }

  /** The s2 search pipeline over an explicit codebook — the form the
    * trained path reuses ([[trainCodebook]] output plugs in directly;
    * recall-vs-stand-in pinned by spec). Same plan shape regardless of
    * where the codebook came from: narrow assignment + probe list,
    * broadcast probes, per-query top-k. */
  private[graft] def knnIvfWith(e: DataFrame, cents: Seq[Centroid],
      nprobe: Int = NProbe): DataFrame = {
    val assigned = assignClusters(e, cents)
      .select(col("vec_id"), col("embedding"), col("norm_fp"), col("cluster"))
    val probes = probeClusters(e, cents, nprobe)

    // search only the probed clusters
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    assigned.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("cluster"))
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Block-grid width for the tiled s3 pair join. At test scale 8 blocks
    * → 36 block-pairs ≈ one per core; at cluster scale choose
    * G ≈ corpusBytes / targetTaskBytes such that two blocks fit in one
    * task's memory (tasks = G(G+1)/2, replication factor = G+1). */
  val S3Blocks = 8

  /** s3: cosine near-dup pairs — all pairs above 0.40 (the synthetic
    * corpus tops out ≈0.51, so this returns the genuinely-close tail).
    *
    * Shape: TILED EXACT self-join. Vectors are hashed into [[S3Blocks]]
    * blocks; each vector is replicated to the block-pairs (bi ≤ bj) its
    * block participates in; an equi-join on (bi, bj) then evaluates the
    * codegen'd fixed-point dot once per candidate pair inside
    * whole-stage codegen, materializing only survivors.
    *
    * Why tiled, not broadcast: the previous formulation broadcast the
    * whole corpus to every executor — fine at test scale, impossible at
    * 100 TB (the corpus does not fit one machine). The tiled grid moves
    * each row G+1 times (O(n·G) shuffle), caps per-task memory at two
    * blocks, and parallelizes across G(G+1)/2 independent tiles — the
    * standard distributed all-pairs arrangement.
    *
    * Why not an LSH prefilter (measured, sf0.01 corpus): the embeddings
    * are isotropic unit Gaussians and the pairwise-cosine tail is
    * CONTINUOUS through the 0.40 threshold (59 pairs > 0.40, the next
    * ones at 0.399…), so any lossy bucketing misses borderline pairs.
    * Sign-LSH at τ=0.40 collides qualifying pairs per bit with
    * p = 1 − acos(0.40)/π ≈ 0.631 vs 0.5 for random pairs — too small a
    * gap for any band scheme to be simultaneously selective and
    * lossless (r-bit bands: keep-prob 0.631^r vs 0.5^r; rejecting
    * random pairs forces B ≪ 2^r, which makes the miss rate
    * (1−0.631^r)^B ≈ 1). Exact all-pairs at a low threshold is
    * inherently O(n²) dot-work; the tiling optimizes everything else
    * (movement, memory, parallelism). For genuine near-dup thresholds
    * (τ ≳ 0.7) use the bucketed path [[s4KnnSignLsh]] / Dedup.d5 — at
    * those thresholds the per-bit gap is wide and banding is sound. */
  def s3CosinePairs(s: SparkSession, d: String): DataFrame =
    // the checkpoint behind the shared stage doubles as the shuffle
    // barrier the presentation sort needs (see [[cosinePairs]]): the
    // range partitioner's sampling pass replays cached blocks, not the
    // O(n²) tile join
    sharedEmbedPairs(s, d).orderBy(col("a"), col("b"))

  /** CROSS-SESSION STANDING exact-cosine pair set — the tiled O(n²)
    * stage materialized once per REGISTRY (the
    * [[graft.operators.Warehouse.standingTable]] discipline; was
    * session-scoped through round 13) and read by both consumers
    * (s3's listing, d7's cluster resolution): the most expensive pair
    * stage in the library, a pure function of the corpus, now paid
    * once per (corpus, build) across JVMs. */
  private[graft] def sharedEmbedPairs(s: SparkSession, d: String): DataFrame =
    SessionCaches.getOrBuild(embedPairCache, s, d)(
      Warehouse.standingTable(s, "graft_embpairs", d) { t =>
        Warehouse.writeStanding(
          cosinePairsRaw(embeddings(s, d), s.sparkContext.defaultParallelism),
          t, Seq("a"), nBuckets = 32)
      })

  private val embedPairCache = SessionCaches.newCache()

  /** Tiled exact cosine-pair join over any (vec_id, embedding) frame —
    * the library form of [[s3CosinePairs]].
    *
    * @param broadcastTiles Some(true)/Some(false) pins the tile-join
    *   strategy; None (default) picks from the optimizer's size estimate
    *   of the replicated B side vs `autoBroadcastJoinThreshold` — the
    *   same signal Catalyst would use, made explicit so outgrowing the
    *   threshold switches to the shuffled-hash layout instead of
    *   silently degrading to a 36-key sort-merge join. */
  def cosinePairs(corpus: DataFrame, parallelism: Int,
      threshold: Double = 0.40, blocks: Int = S3Blocks,
      broadcastTiles: Option[Boolean] = None): DataFrame =
    cosinePairsRaw(corpus, parallelism, threshold, blocks, broadcastTiles)
      // Shuffle barrier before the presentation sort: the range
      // partitioner SAMPLES its child to pick bounds, and without a
      // boundary that re-executes the whole (broadcast, narrow) pair
      // join a second time — measured 2.6 s → 7.6 s at sf0.1. With the
      // barrier, sampling replays the tiny shuffled survivor set.
      .repartition(col("a"))
      .orderBy(col("a"), col("b"))

  /** [[cosinePairs]] without the presentation tail — the form pipeline
    * consumers (d7 cluster resolution) compose on, where a sorted edge
    * list would be wasted work. */
  private[graft] def cosinePairsRaw(corpus: DataFrame, parallelism: Int,
      threshold: Double = 0.40, blocks: Int = S3Blocks,
      broadcastTiles: Option[Boolean] = None): DataFrame = {
    val g = lit(blocks - 1)
    val e = withNorm(corpus)
      .withColumn("blk", pmod(col("vec_id"), lit(blocks.toLong)).cast("int"))
    // A-role: a vector in block k feeds tiles (k, j) for j ≥ k.
    val aRep = e.withColumn("bj", explode(sequence(col("blk"), g)))
      .select(col("blk").as("bi"), col("bj"), col("vec_id").as("a"),
        col("embedding").as("a_emb"), col("norm_fp").as("a_norm"))
    // B-role: a vector in block k feeds tiles (i, k) for i ≤ k.
    val bRep = e.withColumn("bi", explode(sequence(lit(0), col("blk"))))
      .select(col("bi"), col("blk").as("bj"), col("vec_id").as("b"),
        col("embedding").as("b_emb"), col("norm_fp").as("b_norm"))
    // Off-diagonal tiles see each unordered pair exactly once (oriented
    // by block, not by id — the lower id may sit in the higher block);
    // the diagonal tile needs a < b to dedup. Output is normalized to
    // (least, greatest) so orientation never leaks into the result.
    val cos = cosine(dotFp9(col("a_emb"), col("b_emb")),
      col("a_norm"), col("b_norm"))
    // Strategy switch: below the broadcast threshold, ship the B side to
    // every task and round-robin A across cores (any left partitioning
    // is valid for a BHJ — the corpus arrives as one small parquet split
    // at test scale, and without the spread the whole pair loop would
    // run in ONE task). Above it, hash-partition BOTH sides on the tile
    // key and build in-memory per tile (shuffled-hash, never sort-merge:
    // sorting G(G+1)/2-key streams buys nothing and SMJ would cap
    // parallelism at the sort). At real scale choose `blocks` so
    // G(G+1)/2 ≳ cluster cores — tile count IS the parallelism there.
    val useBroadcast = broadcastTiles.getOrElse {
      val conf = corpus.sparkSession.sessionState.conf
      val thr = conf.autoBroadcastJoinThreshold
      // each B row is replicated to blk+1 tiles: avg factor (G+1)/2
      val bRepBytes = corpus.queryExecution.optimizedPlan.stats.sizeInBytes *
        (blocks + 1) / 2
      thr > 0 && bRepBytes <= thr
    }
    val joined =
      if (useBroadcast)
        aRep.repartition(parallelism).join(broadcast(bRep), Seq("bi", "bj"))
      else
        aRep.repartition(col("bi"), col("bj"))
          .join(bRep.hint("shuffle_hash"), Seq("bi", "bj"))
    joined
      .filter((col("bi") =!= col("bj") || col("a") < col("b")) && cos > threshold)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"),
        round(cos * 1e6).cast("long").as("cos_e6"))
  }

  /** d7: embedding-cosine near-dup CLUSTERS — the embedding twin of
    * Dedup.d6: s3's tiled exact cosine pairs are the edges,
    * [[Components.connectedComponents]] resolves the transitive
    * closure, and each vector gets its cluster's minimum vec_id as the
    * canonical representative. Together with d6 this closes both
    * near-dup decision paths a pipeline runs (text-shingle and
    * embedding-space): KEEP is_canonical = 1, drop the rest. */
  def d7EmbedClusters(s: SparkSession, d: String): DataFrame =
    sharedEmbedComponents(s, d)
      .select(col("id").as("vec_id"), col("rep").as("cluster_rep"),
        when(col("id") === col("rep"), 1L).otherwise(0L).as("is_canonical"))
      .orderBy(col("vec_id"))

  /** CROSS-SESSION STANDING embedding-cluster resolution — the
    * [[graft.operators.Dedup.sharedClusters]] discipline on the
    * cosine-pair graph: the multi-job CC loop runs once per REGISTRY
    * over the shared pair stage and consumers read the standing
    * (id, rep) map (was session-scoped through round 13). */
  private[graft] def sharedEmbedComponents(s: SparkSession, d: String): DataFrame =
    SessionCaches.getOrBuild(embedCompCache, s, d)(
      Warehouse.standingTable(s, "graft_embcomp", d) { t =>
        Warehouse.writeStanding(
          Components.connectedComponents(
            embeddings(s, d).select(col("vec_id").as("id")),
            sharedEmbedPairs(s, d).select(col("a"), col("b"))),
          t, Seq("id"), nBuckets = 32)
      })

  private val embedCompCache = SessionCaches.newCache()

  /** Brute-force (broadcast nested loop) twin of [[s3CosinePairs]] —
    * kept as the semantic spec the tiled join is tested against; never
    * used in the query paths. */
  private[graft] def s3CosinePairsBrute(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
      col("norm_fp").as("a_norm"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
      col("norm_fp").as("b_norm"))
    val cos = cosine(dotFp9(col("a_emb"), col("b_emb")),
      col("a_norm"), col("b_norm"))
    a.join(broadcast(b), col("a") < col("b") && cos > 0.40)
      .select(col("a"), col("b"), round(cos * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("a"), col("b"))
  }

  /** 6 planes → 64 buckets: sized so the sf0.01 corpus (~500 vectors)
    * averages ~8 per bucket — candidates exist without scanning all. */
  val NPlanes = 6
  /** Corpus embedding dimensionality (TESTDATA.md: 64-dim float lists). */
  val Dim = 64

  /** Deterministic ±1 hyperplane weights: plane h, component j is +1
    * iff the first hex char of md5("h|j") is >= '8'. Derived once on the
    * driver and inlined as literals into both the Spark plan and the
    * DuckDB oracle SQL, so the engines hash byte-identical constants. */
  private[operators] def planeWeights(h: Int): Seq[Float] = (0 until Dim).map { j =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$h|$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (hex.charAt(0) >= '8') 1.0f else -1.0f
  }

  /** s4: sign-LSH bucketed kNN — the LSH scale path for ANN (s2's IVF
    * is the other). Each vector's bucket is its NPlanes-bit sign
    * signature against fixed random hyperplanes; a query searches only
    * its own bucket, reranked by exact cosine. The signature is the
    * codegen'd fixed-point dot against LITERAL weight vectors (no
    * hashing at row time). Approximate: recall < 1 vs s1 by design; at
    * scale the corpus is written bucketed by signature so a probe is a
    * partition-pruned read. */
  def s4KnnSignLsh(s: SparkSession, d: String): DataFrame = {
    val eb = signBucketed(withNorm(embeddings(s, d)))
    val q = eb.filter(col("vec_id") < NQueries.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"), col("bucket"))
    val c = eb.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Johnson–Lindenstrauss target dimensionality (s14): 64 → 16. */
  val RpDim = 16

  /** Random ±1 projection of the corpus (Achlioptas / JL): component h
    * of the projection is the fixed-point dot against [[planeWeights]]
    * plane h — the SAME deterministic literal family s4 signs against,
    * kept as values instead of collapsed to sign bits. The fp9 dot is
    * floor-divided to e3 so squares and 16-dim dots stay far inside
    * Long (|y| ≲ 6.4e4 ⇒ pnorm ≲ 7e10) — integer end to end, so the
    * projected ranking is bit-deterministic and oracle-checkable.
    *
    * Scale role: the 4× dimensionality cut is a 4× cut in per-pair
    * compute and memory bandwidth for EVERY downstream ANN structure
    * (brute, LSH, IVF build all work unchanged on `proj`), bought once
    * per vector with a narrow codegen'd map — the standard first move
    * before indexing a 100 TB embedding corpus. */
  private[graft] def projected(df: DataFrame): DataFrame =
    df.withColumn("proj", array((0 until RpDim).map { h =>
        idiv(dotFp9(col("embedding"),
          array(planeWeights(h).map(lit): _*)), lit(1000000L))
      }: _*))
      .withColumn("pnorm", qdot(col("proj"), col("proj")))
      // a vector annihilated by the projection cannot be ranked
      // (0/0 cosine) — fail loudly, the withNorm contract
      .filter(
        when(col("pnorm") === 0L,
          raise_error(concat(
            lit("projection annihilated vec_id="), col("vec_id"))))
          .otherwise(lit(true)))

  /** s14: brute top-k in the 16-dim PROJECTED space — s1's shape over
    * 1/4 the dimensions; the exact cosine of each chosen neighbor is
    * attached so projected-vs-exact agreement (and the winner's-curse
    * overestimate on selected pairs) is visible per row. Measured
    * recall@5 vs s1 is 0.12 on this corpus — the near-isotropic
    * embeddings' top-k margins are smaller than the ~1/√16 JL noise,
    * the same honesty note as the s4/s6/s8 ladder rows; on clustered
    * real-world embeddings (where margins are wide) JL is the
    * standard candidate generator. */
  def s14KnnRp(s: SparkSession, d: String): DataFrame = {
    val e = projected(withNorm(embeddings(s, d)))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"), col("proj").as("q_proj"),
      col("pnorm").as("q_pnorm"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("proj").as("n_proj"),
      col("pnorm").as("n_pnorm"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("pcos",
        cosine(qdot(col("q_proj"), col("n_proj")),
          col("q_pnorm"), col("n_pnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")))
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("pcos") * 1e6).cast("long").as("pcos_e6"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Matryoshka prefix length (s16): rank on the first 16 of 64. */
  val MrlPrefixDim = 16

  /** s16: Matryoshka-style COARSE-TO-FINE retrieval — stage 1 ranks
    * every candidate using only the first [[MrlPrefixDim]] components
    * (a prefix SLICE, not a projection: MRL-trained embeddings
    * front-load information so each prefix is itself a valid
    * embedding; on this corpus the prefix is just 16 independent dims,
    * so recall behaves like s14's JL ladder row — honesty note), and
    * stage 2 reranks the surviving [[RerankK]] candidates with the
    * full-dimension exact cosine — s11's IndexRefine shape with a
    * slice instead of IVF+PQ. The scale story is bandwidth: the scan
    * stage reads/computes 1/4 of every vector; the exact stage is
    * candidate-sized, independent of the corpus. Both stages are one
    * pass here (the frame carries both columns), integer-exact and
    * oracle-checkable throughout. Prefix-zero vectors cannot be
    * ranked and fail loudly (withNorm's contract). */
  def s16MrlRerank(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
      .withColumn("p_emb", slice(col("embedding"), 1, MrlPrefixDim))
      .withColumn("p_norm", normFp9(col("p_emb")))
      .filter(
        when(col("p_norm") === 0L,
          raise_error(concat(
            lit("all-zero prefix at vec_id="), col("vec_id"))))
          .otherwise(lit(true)))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"), col("p_emb").as("qp_emb"),
      col("p_norm").as("qp_norm"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("p_emb").as("np_emb"),
      col("p_norm").as("np_norm"))
    val wCoarse = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("nid"))
    val wFine = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("pcos",
        cosine(dotFp9(col("qp_emb"), col("np_emb")),
          col("qp_norm"), col("np_norm")))
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= RerankK)
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(wFine))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"),
        round(col("pcos") * 1e6).cast("long").as("pcos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Post-filter candidate depth for s17's comparison leg. */
  val PostFilterM = 10

  /** s17: FILTERED vector search — top-k among vectors satisfying a
    * metadata predicate (here: same label as the query), the
    * vector-database problem where the naive plan is subtly wrong:
    * POST-filtering (rank everything, cut at m, then filter) LOSES
    * results whenever fewer than k of the top-m survive the
    * predicate, while PRE-filtering (apply the predicate before
    * ranking) is exact by construction. The query computes BOTH — the
    * exact pre-filtered rank and, per row, whether the post-filter
    * plan at depth [[PostFilterM]] would have surfaced it — so the
    * loss is a visible measure (`lost_by_postfilter`), not an
    * anecdote. Pre-filtering composes with every index in this
    * module: under IVF the predicate prunes list entries before
    * scoring; on the bucketed warehouse it rides partition pruning.
    * Spec pins that the post-filter leg is the truncation it claims
    * to be and that losses actually occur on this corpus. */
  def s17FilteredKnn(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"), col("label").cast("long").as("q_label"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("label").cast("long").as("n_label"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
    val wAll = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    val wPre = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("grank", row_number().over(wAll)) // unfiltered rank
      .filter(col("n_label") === col("q_label"))    // PRE-filter
      .withColumn("rank", row_number().over(wPre))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("q_label"),
        col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"),
        // post-filtering at depth m only sees rows with global rank ≤ m
        (col("grank") > PostFilterM).as("lost_by_postfilter"))
      .orderBy(col("qid"), col("rank"))
  }

  /** s18: the RECALL LADDER as a query — the engine measures its own
    * approximate indexes against the exact ranking, in-engine, so
    * index quality is an oracle-gated NUMBER (it rides the same
    * correctness gate as every answer) instead of a spec-side note:
    * per method (s14's JL projection, s16's MRL rerank), the fraction
    * of s1's exact top-k pairs the approximate ranking recovered.
    * This is the monitoring query a production ANN deployment runs on
    * a sampled slice after every index rebuild — recall regressions
    * page before users notice. The oracle derives VERBATIM from the
    * s1/s14/s16 oracle statements (each as a CTE), so the ladder can
    * never drift from the rankings it measures. */
  def s18RecallLadder(s: SparkSession, d: String): DataFrame = {
    // Each rung's (qid, nid) list is STANDING: a pure function of the
    // corpus, NQueries·TopK rows (driver-tiny), persisted once per
    // (corpus, build) in the registry — the ladder used to re-EXECUTE
    // s1 plus all five rung queries inside itself on every run (~9 s
    // sustained even warm, the one genuinely recurring bench row of
    // r12; r13 made the rungs session-shared, r14 makes them survive
    // JVM turnover too — a fresh JVM's ladder folds six tiny adopted
    // tables instead of re-running six ANN queries). The rung queries
    // themselves keep their own uncached plans (their specs assert
    // plan shape), so this cache changes no query's semantics — the
    // oracle still derives verbatim from the rung statements.
    def rung(name: String, build: => DataFrame): DataFrame =
      rankedRung(s, d, name)(build)
    val exact = rung("exact", s1KnnBrute(s, d))
    val nExact = exact.count()
    def row(method: String, approx: DataFrame): DataFrame = {
      val hits = exact.join(approx, Seq("qid", "nid"), "left_semi").count()
      val sp = s
      import sp.implicits._
      Seq((method, nExact, hits)).toDF("method", "n_exact", "n_hit")
    }
    rungMethods(s, d)
      .map { case (m, build) => row(m, rung(m, build())) }
      .reduce(_ unionByName _)
      .withColumn("recall_e6",
        call_function("div", col("n_hit") * lit(1000000L), col("n_exact")))
      .orderBy(col("method"))
  }

  private val rungCache = SessionCaches.newCache()

  /** One standing rung: a method's ranked (qid, rank, nid) answer list
    * — a pure function of the corpus, NQueries·TopK rows, persisted
    * once per (corpus, build) in the registry and shared by BOTH
    * rung consumers (s18's recall ladder joins on (qid, nid); s31's
    * graded metrics additionally read the rank columns). */
  private def rankedRung(s: SparkSession, d: String, name: String)(
      build: => DataFrame): DataFrame =
    SessionCaches.getOrBuild(rungCache, s, s"$name|$d")(
      Warehouse.standingTable(s, s"graft_s18_$name", d) { t =>
        Warehouse.writeStanding(
          build.select(col("qid"), col("rank"), col("nid")),
          t, Seq("qid"), nBuckets = 4)
      })

  /** The five approximate rung methods, each paired with its builder —
    * the single source of truth both s18 and s31 walk, so the two
    * monitors can never cover different method sets. */
  private def rungMethods(s: SparkSession, d: String)
      : Seq[(String, () => DataFrame)] = Seq(
    ("jl_rp16", () => s14KnnRp(s, d)),
    ("mrl_rerank", () => s16MrlRerank(s, d)),
    ("pq8", () => s6KnnPq(s, d)),
    ("opq_pq8", () => s19KnnOpq(s, d)),
    ("ivfpq_residual", () => s29KnnIvfPqResidual(s, d)))

  /** NDCG rank discounts log2(rank+1) for ranks 1..TopK, e3 fixed
    * point — a shared literal table instead of runtime log2 so both
    * engines state the identical integers (IEEE log2 is not specified
    * to the last ulp across libms; a 5-entry lookup is). */
  val NdcgDiscE3: Seq[Long] = Seq(1000L, 1585L, 2000L, 2322L, 2585L)
  // one discount per retrievable rank — a TopK change without a table
  // change would silently drop ranks > table size from BOTH engines'
  // sums (the oracle gate cannot catch an identical omission)
  require(NdcgDiscE3.length == TopK,
    s"NdcgDiscE3 must carry exactly TopK=$TopK entries")

  /** Ideal DCG at TopK in e6: relevance TopK..1 placed in rank order,
    * each term (rel·1e9) // disc_e3 — the exact integer chain the
    * per-query DCG uses. */
  val IdcgE6: Long = NdcgDiscE3.zipWithIndex
    .map { case (dc, i) => (TopK.toLong - i) * 1000000000L / dc }.sum

  /** s31: GRADED RETRIEVAL METRICS — NDCG@k and MRR per ANN method
    * against the exact ground truth, the graded companions of s18's
    * recall ladder (recall says WHETHER the exact neighbors surfaced;
    * NDCG/MRR say WHERE they ranked — the index-quality report of a
    * production embedding-retrieval deployment). Relevance of an
    * approximate hit = TopK+1 − exact_rank (graded by the truth's own
    * order); DCG discounts by the shared [[NdcgDiscE3]] table; MRR
    * scores the reciprocal rank of the TRUE nearest neighbor in the
    * method's list (0 when missed). All arithmetic is integer (e6/e9
    * fixed point with explicit integer division), so both engines
    * state identical rows; queries a method misses entirely count as
    * zero through the nq divisor, not dropped.
    *
    * Scale notes (100 TB): every input is a standing rung
    * (NQueries·TopK rows, adopted from the registry — building this
    * report costs five tiny sort-merge joins over driver-sized
    * tables; the expensive ANN answers are computed once, shared with
    * s18, and amortized across every consumer). At production scale
    * the rungs are the sampled-slice eval set (thousands of rows),
    * never the full corpus — the monitor stays driver-cheap by
    * construction. */
  def s31RetrievalMetrics(s: SparkSession, d: String): DataFrame = {
    val exact = rankedRung(s, d, "exact")(s1KnnBrute(s, d))
      .select(col("qid"), col("rank").as("ex_rank"), col("nid"))
    val nq = exact.select(col("qid")).distinct().count()
    // diagnostic, not ArithmeticException: an empty exact rung (corpus
    // missing vec_id < NQueries) must name itself like s30's seed guard
    require(nq > 0, "s31: no query vectors in the exact rung — " +
      s"corpus at $d carries no vec_id < $NQueries")
    val discCol = element_at(
      array(NdcgDiscE3.map(lit): _*), col("m_rank").cast("int"))
    // one unioned plan over all five methods (the s18 shape), one
    // driver round-trip — not a collect per method
    val perMethod = rungMethods(s, d).map { case (method, build) =>
      val ap = rankedRung(s, d, method)(build())
        .select(col("qid"), col("rank").as("m_rank"), col("nid"))
      exact.join(ap, Seq("qid", "nid"))
        .groupBy(col("qid"))
        .agg(
          sum(call_function("div",
            (lit(TopK.toLong + 1L) - col("ex_rank")) * lit(1000000000L),
            discCol)).as("dcg_e6"),
          max(when(col("ex_rank") === 1L,
            call_function("div", lit(1000000L), col("m_rank")))
            .otherwise(lit(0L))).as("rr_e6"))
        .agg(
          sum(call_function("div",
            col("dcg_e6") * lit(1000000L), lit(IdcgE6))).as("ndcg_sum"),
          sum(col("rr_e6")).as("rr_sum"))
        .select(lit(method).as("method"), col("ndcg_sum"), col("rr_sum"))
    }
    val rows = perMethod.reduce(_ unionByName _).collect().toSeq.map { r =>
      val ndcgSum = Option(r.get(1)).fold(0L)(_.asInstanceOf[Long])
      val rrSum = Option(r.get(2)).fold(0L)(_.asInstanceOf[Long])
      (r.getString(0), rrSum / nq, ndcgSum / nq)
    }
    val sp = s
    import sp.implicits._
    rows.toDF("method", "mrr_e6", "ndcg_e6").orderBy(col("method"))
  }

  /** Per-vector int8 scalar quantization: scale = max |component|,
    * q_j = round(x_j / scale · 127) — the standard 4×-memory-reduction
    * storage format for ANN corpora at scale. Quantization and the
    * quantized dot are INTEGER arithmetic end to end (the only doubles
    * are correctly-rounded IEEE division and the shared round()
    * semantics both engines implement as half-away-from-zero), so
    * results are bit-deterministic and DuckDB-oracle-checkable, per
    * the engine's fixed-point policy. */
  private[graft] def quantized(df: DataFrame): DataFrame =
    df.filter(
      when(exists(col("embedding"), _.isNull),
        raise_error(concat(
          lit("embedding with null elements at vec_id="), col("vec_id"))))
        .otherwise(lit(true)))
      .withColumn("embedding", array_compact(col("embedding")))
      .withColumn("scale",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      // an all-zero vector gives scale=0 ⇒ 0/0=NaN components, which
      // ANSI round().cast(long) turns into an opaque failure — fail
      // loudly with the offending row instead (withNorm's contract)
      .filter(
        when(col("scale") === 0d,
          raise_error(concat(
            lit("all-zero embedding at vec_id="), col("vec_id"))))
          .otherwise(lit(true)))
      .withColumn("q8",
        transform(col("embedding"),
          x => round(x.cast("double") / col("scale") * 127d).cast("long")))
      .withColumn("qnorm", qdot(col("q8"), col("q8")))

  /** Integer dot of two int8-quantized vectors — native codegen
    * expression ([[graft.functions.DotI64]]); |sum| ≤ 127²·dim, so the
    * quantized domain is overflow-free far beyond any real
    * dimensionality. */
  private[graft] def qdot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_i64(a, b)

  /** Reference higher-order-function formulation of [[qdot]] — kept
    * (and tested, HashKernelSpec) as the semantic spec of the native
    * expression; null elements contribute 0, as in the kernel. */
  private[graft] def qdotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => coalesce(x * y, lit(0L))),
      lit(0L), (acc, v) => acc + v)

  /** s5: brute-force kNN over the int8-QUANTIZED corpus — s1's shape
    * (broadcast queries, linear scan, per-partition top-k) on the
    * compressed representation a 100 TB corpus would actually store in
    * memory. Approximate only through quantization error; recall vs s1
    * is pinned by spec. */
  def s5QuantKnn(s: SparkSession, d: String): DataFrame = {
    val e = quantized(embeddings(s, d))
    val q = e.select(col("vec_id").as("qid"), col("q8").as("q_q8"),
      col("qnorm").as("q_qnorm"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("q8").as("n_q8"),
      col("qnorm").as("n_qnorm"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(qdot(col("q_q8"), col("n_q8")), col("q_qnorm"), col("n_qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** s13: IVF + int8 scalar quantization composed — the FAISS
    * "IVF,SQ8" index shape, the missing rung between s5 (full-scan
    * int8) and s8 (IVF+PQ): IVF pruning picks WHICH rows score (s2's
    * zero-exchange argmax assignment over the literal codebook — the
    * index is BUILT on full-precision floats), and each scored pair is
    * priced by the integer quantized dot (s5's storage format, codegen
    * [[graft.functions.DotI64]]) instead of PQ's 8-lookup ADC.
    *
    * SQ8 keeps 4× compression with near-exact recall (s5 measured 0.98
    * vs PQ's 0.22 at 32×) — at 100 TB this is the configuration for
    * corpora that fit memory quantized: IVF bounds rows touched
    * (nprobe/nlist of the corpus), SQ8 bounds bytes per row, and both
    * stages stay in whole-stage codegen. Plan shape = s2's exactly
    * (narrow assign + broadcast probes + one top-k exchange); only the
    * scoring kernel changes. */
  def s13KnnIvfSq(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val cents = sharedCodebook(s, d)
    // corpus rows: (cluster, q8, qnorm) — assignment on floats, storage
    // quantized; both are narrow maps over the same scan
    val corpus = quantized(assignClusters(e, cents))
      .select(col("vec_id").as("nid"), col("q8").as("n_q8"),
        col("qnorm").as("n_qnorm"), col("cluster"))
    // probe list with the QUERY's quantized form computed in-place
    val probeQ = quantized(
      probeClusters(e, cents)
        .select(col("qid").as("vec_id"), col("q_emb").as("embedding"),
          col("cluster")))
      .select(col("vec_id").as("qid"), col("cluster"),
        col("q8").as("q_q8"), col("qnorm").as("q_qnorm"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    corpus.join(broadcast(probeQ), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(qdot(col("q_q8"), col("n_q8")), col("q_qnorm"), col("n_qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** d12's near-dup threshold — s3's τ, so d12's within-cluster pair
    * set is exactly the co-clustered subset of s3's global pairs. */
  val SemTau = 0.40

  /** d12: SemDeDup — semantic deduplication AT SCALE (the
    * cluster-then-dedup method): assign every embedding to its IVF
    * cluster first (s2's zero-exchange argmax over the literal
    * codebook), search near-duplicate pairs ONLY within clusters, and
    * keep one representative (min vec_id) per within-cluster
    * component. d7 answers the same question exactly with a GLOBAL
    * tiled pair search — O(n²) dot work however arranged; SemDeDup is
    * the published trade: with k ≈ √n clusters the pair work drops to
    * Σ|cluster|² ≈ n^1.5, and the price is missing cross-cluster
    * near-dup pairs — an explicitly accepted approximation, NOT an
    * implementation shortcut (the spec pins d12's pair set = d7's
    * global components restricted to co-clustered pairs).
    *
    * Plan: narrow assignment, ONE equi-join on cluster for the pair
    * search (shuffle keyed by cluster — AQE handles moderate
    * cluster-size skew; the degenerate mega-cluster case is bounded
    * by [[withinClusterPairs]]' `maxCluster` sub-sharding knob, off
    * here for oracle parity — the d9 posture), then the
    * alternating-star component loop over the surviving pairs. */
  def d12SemDedup(s: SparkSession, d: String): DataFrame =
    sharedSemResolution(s, d, maxCluster = None).orderBy(col("vec_id"))

  /** CROSS-SESSION STANDING SemDeDup resolution — assignment +
    * within-cluster pairs + CC, a pure function of (corpus,
    * maxCluster), standing once per posture (the cap rides the table
    * NAME and a validated property — the sharedContainment fence; was
    * session-scoped through round 13). The streaming store
    * ([[graft.streaming.StreamOps.semDedupIngest]]) is its
    * continuously-maintained form. */
  private[graft] def sharedSemResolution(s: SparkSession, d: String,
      maxCluster: Option[Int]): DataFrame =
    SessionCaches.getOrBuild(semResCache, s,
        maxCluster.fold(d)(m => s"$d|maxcluster=$m")) {
      Warehouse.standingTable(s,
        maxCluster.fold("graft_semres")(m => s"graft_semres_cap$m"), d,
        Map("graft.maxcluster" -> maxCluster.fold("none")(_.toString))) { t =>
        val e = withNorm(embeddings(s, d))
        val cents = collectCodebook(e)
        val assigned = assignClusters(e, cents)
          .select(col("vec_id"), col("embedding"), col("norm_fp"), col("cluster"))
          .localCheckpoint()
        Warehouse.writeStanding(resolveSemClusters(assigned, maxCluster),
          t, Seq("vec_id"), nBuckets = 32)
      }
    }

  private val semResCache = SessionCaches.newCache()

  /** Cluster cap for [[d18SemdedupCapped]]: below every sf0.01 cluster
    * size but 48 (62.5 avg over 8 centroids), so sub-sharding arms on
    * 7 of the 8 clusters and leaves one on the untouched branch —
    * both code paths ride the same gated row. */
  val D18MaxCluster = 50

  /** d18: d12 with the PRODUCTION posture armed — `maxCluster`
    * sub-sharding live, gated against a DuckDB oracle that restates
    * the deterministic shard function exactly (sizes → ⌈n/cap⌉ shards
    * → [[shardHash]] mod shards → within-(cluster, shard) pairs →
    * the same component closure). This is the 100 TB plan itself
    * riding the hash gate, not just the uncapped oracle-parity twin:
    * cross-shard recall loss is part of the CONTRACT the oracle
    * states, so a drifting shard expression or size census fails the
    * gate instead of silently changing recall. */
  def d18SemdedupCapped(s: SparkSession, d: String): DataFrame =
    sharedSemResolution(s, d, maxCluster = Some(D18MaxCluster))
      .orderBy(col("vec_id"))

  /** d12's resolution core over an ALREADY-ASSIGNED frame (vec_id,
    * embedding, norm_fp, cluster): within-cluster pair search (the
    * `maxCluster` knob passes through) + alternating-star components +
    * keep-bit. Shared by the batch query and the streaming store's
    * compaction cycle ([[graft.streaming.StreamOps.semDedupIngest]]),
    * so both resolve with the identical plan. */
  def resolveSemClusters(assigned: DataFrame,
      maxCluster: Option[Int] = None): DataFrame = {
    val comp = Components.connectedComponents(
      assigned.select(col("vec_id").as("id")),
      withinClusterPairs(assigned, maxCluster))
    assigned.select(col("vec_id"), col("cluster"))
      .join(comp.select(col("id").as("vec_id"), col("rep")), Seq("vec_id"))
      .select(col("vec_id"), col("cluster"), col("rep"),
        when(col("vec_id") === col("rep"), 1L).otherwise(0L).as("keep"))
  }

  /** d12's within-cluster pair stage over any (vec_id, embedding,
    * norm_fp, cluster) frame — one equi-join on the cluster key. Fed
    * from a cluster-BUCKETED standing table
    * ([[Warehouse.writeBucketed]] on `cluster`) the self-join plans
    * with NO exchange on either side (asserted in WarehouseSpec): the
    * assignment shuffle is paid once at corpus-build time, and every
    * SemDeDup run after that is exchange-free until the top of the
    * component loop — the same pay-the-shuffle-once contract as the
    * postings/image indexes.
    *
    * `maxCluster` is the production skew knob — the d4/d9 `maxDf` /
    * m7 `maxBucket` lesson applied to the cluster key, but by
    * SUB-SHARDING rather than dropping: a mega-cluster (boilerplate
    * embeddings — this very corpus carries a 127-doc one per d13) is
    * exactly where the dup mass lives, so discarding it would defeat
    * the dedup. Instead a cluster of size n > cap splits into
    * ⌈n/cap⌉ deterministic hash shards (xxhash64 of vec_id) and pairs
    * are searched within (cluster, shard): per-join-key work is
    * bounded by ~cap² whatever n does, total mega-cluster work drops
    * from n² to ~n·cap (linear in n at fixed cap), and the price is
    * the cross-shard pairs — a bounded, documented recall trade (each
    * member still meets ~n/⌈n/cap⌉ of its cluster, and the component
    * resolution downstream re-merges shards that share any surviving
    * edge). Clusters at or under the cap are untouched, so capped ≡
    * uncapped on a corpus with no mega-cluster (spec-pinned, along
    * with pair-subset and co-shard-completeness on a constructed
    * mega-cluster; the cap ARMED also rides the DuckDB hash gate as
    * `d18_semdedup_capped`). The cluster-size frame is codebook-sized
    * (NClusters rows) — broadcast, never a corpus-side shuffle.
    * None = exact within-cluster search, the oracle-parity posture
    * (the d9 bench precedent). */
  /** Deterministic sub-shard hash: first 16 bits of md5 of the decimal
    * id. Any uniform hash works here — this one (over `xxhash64`) is
    * chosen because DuckDB restates it verbatim
    * (`('0x' || substr(md5(id::VARCHAR), 1, 4))::BIGINT`), which is
    * what lets the ARMED cap ride the cross-engine hash gate (d18)
    * instead of only in-JVM specs. 65536 values is plenty for shard
    * counts that are ⌈n/cap⌉ small integers. */
  private[graft] def shardHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

  private[graft] def withinClusterPairs(assigned: DataFrame,
      maxCluster: Option[Int] = None): DataFrame = {
    val keyed = maxCluster match {
      case None => assigned.withColumn("shard", lit(0L))
      case Some(cap) =>
        require(cap > 0, s"maxCluster must be positive, got $cap")
        val sizes = assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("cl_n"))
        val nShards = call_function("div",
          col("cl_n") + lit(cap.toLong - 1L), lit(cap.toLong))
        assigned.join(broadcast(sizes), Seq("cluster"))
          .withColumn("shard",
            when(col("cl_n") <= cap.toLong, lit(0L))
              .otherwise(pmod(shardHash(col("vec_id")), nShards)))
          .drop("cl_n")
    }
    val a = keyed.select(col("cluster"), col("shard"), col("vec_id").as("a"),
      col("embedding").as("a_emb"), col("norm_fp").as("a_norm"))
    val b = keyed.select(col("cluster"), col("shard"), col("vec_id").as("b"),
      col("embedding").as("b_emb"), col("norm_fp").as("b_norm"))
    a.join(b, Seq("cluster", "shard"))
      .filter(col("a") < col("b"))
      .filter(cosine(dotFp9(col("a_emb"), col("b_emb")),
        col("a_norm"), col("b_norm")) > SemTau)
      .select(col("a"), col("b"))
  }

  /** PQ geometry: Dim = PqSubs × PqSubDim subspaces, PqK centroids per
    * sub-codebook (stand-in: the sub-slices of vectors vec_id < PqK,
    * the same deterministic stand-in device as s2's codebook — a
    * trained PQ codebook has no SQL oracle). 8×16 codes = 8 bytes per
    * vector vs 256: the 32× compression PQ is used for at 100 TB. */
  val PqSubs = 8
  val PqSubDim = 8
  val PqK = 16

  /** One PQ sub-codebook entry: subspace, code, sub-centroid, its
    * fixed-point squared norm. Driver-sized by construction
    * (PqSubs × PqK rows), collected once and inlined as literals. */
  private[graft] case class SubCent(sub: Int, code: Int, emb: Seq[Float], normFp: Long)

  /** Collect the stand-in PQ codebook from a [[withNorm]]-prepared
    * frame: sub-slices of the PqK lowest vec_ids. */
  private[graft] def collectPqCodebook(e: DataFrame): Map[Int, Seq[SubCent]] =
    e.filter(col("vec_id") < PqK.toLong)
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .flatMap { r =>
        val vid = r.getLong(0).toInt
        val emb = r.getSeq[Float](1)
        (0 until PqSubs).map { s =>
          val sub = emb.slice(s * PqSubDim, (s + 1) * PqSubDim)
          SubCent(s, vid, sub, normFpOf(sub))
        }
      }.groupBy(_.sub).view.mapValues(_.sortBy(_.code)).toMap

  /** Canonical-corpus PQ codebook, collected once per (session, dir) —
    * see [[sharedCodebook]]. */
  private[graft] def sharedPqCodebook(s: SparkSession,
      d: String): Map[Int, Seq[SubCent]] =
    SessionCaches.getOrBuildVal(pqCbCache, s, s"pqcb|$d")(
      collectPqCodebook(withNorm(embeddings(s, d))))

  private val pqCbCache =
    SessionCaches.newValCache[Map[Int, Seq[SubCent]]]()

  /** s19's PQ codebook over the OPQ-permuted corpus, once per
    * (session, dir) — keyed separately from [[sharedPqCodebook]]
    * because the permutation changes the sub-slices. */
  private[graft] def sharedOpqPqCodebook(s: SparkSession,
      d: String): Map[Int, Seq[SubCent]] =
    SessionCaches.getOrBuildVal(pqCbCache, s, s"pqcb|opq|$d")(
      collectPqCodebook(
        withNorm(permuteEmbedding(embeddings(s, d), opqPermStanding(s, d)))))

  /** s6: product-quantization kNN — the 100 TB ANN storage format
    * beyond s5's scalar quantization: each vector stores only PqSubs
    * sub-codebook codes (argmin fixed-point L2 per subspace over the
    * literal codebook — a NARROW projection, the s2 assignment trick
    * per subspace), and queries score by ASYMMETRIC DISTANCE: a
    * per-query lookup table of (subspace × code) partial dots is built
    * once on the tiny query side, so each corpus row costs PqSubs
    * array lookups + one add chain — no full-width dot per pair.
    * Cosine denominator uses the RECONSTRUCTED norm (sum of chosen
    * sub-centroid norms, exact integers). Approximate by construction;
    * recall vs s1 pinned by spec. */
  def s6KnnPq(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    knnPqWith(e, sharedPqCodebook(s, d))
  }

  /** Subvector of an embedding column for PQ subspace `i` (1-based). */
  private def pqSubCol(i: Int, emb: Column = col("embedding")) =
    slice(emb, i * PqSubDim + 1, PqSubDim)

  /** Per-subspace argmin code over a literal sub-codebook — the narrow
    * PQ encode projection (array_min of (dist, code) structs — ties
    * break on code, the same (dist, k) order the oracle's window uses;
    * lexicographic struct-min ≡ first element of the ascending sort the
    * previous formulation used, but array_min keeps the whole encode in
    * whole-stage codegen — array_sort is CodegenFallback and made the
    * corpus encode the dominant stage of every PQ query, see
    * [[minCentroid]]). The xn term is identical across the PqK structs;
    * under codegen the Project's subexpression elimination computes it
    * (and each slice) once per row instead of once per struct. */
  private def pqCodeCol(cbs: Seq[SubCent], i: Int,
      emb: Column = col("embedding")) = {
    val xn = dotFp9(pqSubCol(i, emb), pqSubCol(i, emb))
    array_min(array(cbs.map { c =>
      struct(
        (xn - lit(2L) * dotFp9(pqSubCol(i, emb), array(c.emb.map(lit): _*)) +
          lit(c.normFp)).as("d"),
        lit(c.code.toLong).as("k"))
    }: _*)).getField("k").as(s"code_$i")
  }

  /** Per-query ADC lookup tables: for each subspace, the PqK partial
    * dots of the query's subvector against the literal sub-codebook —
    * computed once per query row, broadcast with it. */
  private def pqLutCols(cb: Map[Int, Seq[SubCent]], emb: Column) =
    (0 until PqSubs).map { i =>
      array(cb(i).map(c =>
        dotFp9(pqSubCol(i, emb), array(c.emb.map(lit): _*))): _*).as(s"lut_$i")
    }

  /** Sum of the chosen sub-centroid norms — the PQ-reconstructed
    * squared norm (exact integers), the cosine denominator on coded
    * corpora. Expects code_0..code_{PqSubs-1} columns. */
  private def pqReconNorm(cb: Map[Int, Seq[SubCent]]) =
    (0 until PqSubs).map { i =>
      element_at(array(cb(i).map(c => lit(c.normFp)): _*),
        col(s"code_$i").cast("int") + 1)
    }.reduce(_ + _)

  /** The ADC approximate dot: one LUT lookup per subspace. */
  private def pqAdcDot =
    (0 until PqSubs).map(i =>
      element_at(col(s"lut_$i"), col(s"code_$i").cast("int") + 1)).reduce(_ + _)

  /** Append the PQ code columns + recon_norm to any frame carrying an
    * `embedding` column — the encode step [[graft.operators.Warehouse
    * .writeIvfPq]] persists (after which the embedding itself can be
    * dropped: the codes ARE the stored index). */
  private[graft] def withPqCodes(df: DataFrame,
      cb: Map[Int, Seq[SubCent]]): DataFrame =
    df.select((df.columns.toSeq.map(col) ++
      (0 until PqSubs).map(i => pqCodeCol(cb(i), i))): _*)
      .withColumn("recon_norm", pqReconNorm(cb))

  /** The s6 search pipeline over an explicit PQ codebook — the form the
    * trained path reuses ([[trainPqCodebook]] output plugs in directly;
    * recall-vs-stand-in pinned by spec). */
  private[graft] def knnPqWith(e: DataFrame, cb: Map[Int, Seq[SubCent]]): DataFrame = {
    val codeCols = (0 until PqSubs).map(i => pqCodeCol(cb(i), i))
    val coded = e.select((col("vec_id").as("nid") +: codeCols): _*)
      .withColumn("recon_norm", pqReconNorm(cb))
    val q = e.filter(col("vec_id") < NQueries.toLong)
      .select((Seq(col("vec_id").as("qid"), col("norm_fp").as("q_norm")) ++
        pqLutCols(cb, col("embedding"))): _*)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    coded.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine(pqAdcDot, col("q_norm"), col("recon_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Driver-side fixed-point dot with the DotFp9 rounding — for the
    * residual-PQ literal tables (codebook × codebook integers). */
  private def dotFpOfSeq(a: Seq[Float], b: Seq[Float]): Long = {
    var s = 0L
    var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) {
      s += graft.functions.DotFp9.roundHalfAway(
        a(j).toDouble * b(j).toDouble * 1e9)
      j += 1
    }
    s
  }

  /** s29: IVF+PQ on RESIDUALS — the TRUE FAISS IVFPQ (s8 ships the
    * no-residual form; the published index quantizes `x − c`, the
    * vector's offset from its assigned centroid, which is what makes
    * coarse+fine quantization compose: residuals are small and
    * centered, so the same sub-codebook budget carries less
    * distortion). No float subtraction ever happens: every residual
    * quantity DECOMPOSES into fixed-point dots both engines state
    * exactly —
    *   encode:  argmin_k ‖r_s − k‖² = argmin_k (‖k‖² − 2·(⟨x_s,k⟩ − ⟨c_s,k⟩))
    *            (the ‖r‖² term is k-free and drops from the argmin),
    *   recon:   ‖c + r̂‖² = ‖c‖² + Σ_s (2·⟨c_s, k̂_s⟩ + ‖k̂_s‖²),
    *   search:  ⟨q, c + r̂⟩ = ⟨q, c⟩ + Σ_s ⟨q_s, k̂_s⟩ (ADC + one
    *            coarse term the probe list already pays for),
    * all in the DotFp9 integer domain — the cosine is then the exact
    * cos_e6 contract. Ties break on code / nid as everywhere.
    *
    * Scale notes (100 TB): identical plan shape to s8 — the stored
    * index is (cluster, PqSubs codes, recon_norm) per row, the
    * centroid×code dot tables are driver-sized literals
    * (nlist × PqSubs × PqK integers), queries broadcast LUTs + one
    * coarse dot per probed cluster, and each scored row costs PqSubs
    * lookups + an add chain. Recall floor vs the no-residual s8 is
    * spec-measured. */
  def s29KnnIvfPqResidual(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    knnIvfPqResidualWith(e, sharedCodebook(s, d), sharedPqCodebook(s, d))
  }

  /** The s29 pipeline over explicit IVF + PQ codebooks. */
  private[graft] def knnIvfPqResidualWith(e: DataFrame,
      cents: Seq[Centroid], cb: Map[Int, Seq[SubCent]],
      topk: Int = TopK): DataFrame = {
    val byCid = cents.sortBy(_.cid)
    require(byCid.map(_.cid) == (0L until byCid.length.toLong),
      "residual tables index centroids by cid — the literal codebook is 0..n-1")
    def centSub(c: Centroid, i: Int): Seq[Float] =
      c.emb.slice(i * PqSubDim, (i + 1) * PqSubDim)
    // driver-side integer tables: <c_s, k> per (cluster, sub, code),
    // and ||c||^2 per cluster — nlist×PqSubs×PqK longs, literal-inlined
    def dotCK(i: Int): Seq[Seq[Long]] =
      byCid.map(c => cb(i).map(k => dotFpOfSeq(centSub(c, i), k.emb)))
    val cNormArr = array(byCid.map(c => lit(c.normFp)): _*)
    // encode: residual argmin per subspace (the k-free ||r||^2 term
    // dropped), with the centroid dot picked by the row's cluster
    val codeCols = (0 until PqSubs).map { i =>
      val table = dotCK(i)
      element_at(array_sort(array(cb(i).map { k =>
        val dck = element_at(
          array(table.map(row => lit(row(k.code))): _*),
          col("cluster").cast("int") + 1)
        struct(
          (lit(k.normFp) - lit(2L) *
            (dotFp9(pqSubCol(i), array(k.emb.map(lit): _*)) - dck)).as("d"),
          lit(k.code.toLong).as("k"))
      }: _*)), 1).getField("k").as(s"code_$i")
    }
    // recon_norm = ||c||^2 + sum_s (2<c_s,k> + ||k||^2), looked up by
    // (cluster, code) over the literal tables
    val reconCol = (0 until PqSubs).map { i =>
      val table = dotCK(i)
      val dck = element_at(
        array(table.map(row =>
          array(row.map(lit): _*)): _*),
        col("cluster").cast("int") + 1)
      lit(2L) * element_at(dck, col(s"code_$i").cast("int") + 1) +
        element_at(array(cb(i).map(k => lit(k.normFp)): _*),
          col(s"code_$i").cast("int") + 1)
    }.reduce(_ + _) + element_at(cNormArr, col("cluster").cast("int") + 1)
    val coded = assignClusters(e, cents)
      .select((Seq(col("vec_id").as("nid"), col("cluster")) ++ codeCols): _*)
      .withColumn("recon_norm", reconCol)
    // query side: ADC LUTs + the coarse <q, c> term per probed cluster
    val qcDot = element_at(
      array(byCid.map(c =>
        dotFp9(col("q_emb"), array(c.emb.map(lit): _*))): _*),
      col("cluster").cast("int") + 1).as("qc_dot")
    val q = probeClusters(e, cents)
      .select((Seq(col("qid"), col("q_norm"), col("cluster"), qcDot) ++
        pqLutCols(cb, col("q_emb"))): _*)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    coded.join(broadcast(q), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(col("qc_dot") + pqAdcDot, col("q_norm"), col("recon_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** OPQ-P-lite rotation for the PQ rung (VERDICT r10 #4): a
    * variance-balanced dimension PERMUTATION applied before product
    * quantization. PQ's weak spot is unbalanced subspaces — when the
    * energy concentrates in a few CONTIGUOUS dimensions, the sub-slices
    * quantizing them carry most of the distortion. OPQ (Ge et al.,
    * CVPR 2013) learns an orthogonal pre-rotation; its parametric
    * allocation step — distribute dimensions across subspaces so each
    * carries comparable variance — is the part expressible as exact
    * integer statistics BOTH engines can restate, so that is what ships
    * here: per-dimension fixed-point variance surrogates
    * (n·Σround(x²·1e9)·1000 − (Σround(x·1e6))², exact in
    * BigInt/HUGEINT), ranked desc (ties: dimension asc), snake-assigned
    * to the PqSubs buckets (rank r → bucket m = r mod 2·PqSubs, m if
    * m < PqSubs else 2·PqSubs−1−m). A permutation matrix IS orthogonal,
    * so true cosines are untouched (spec-pinned) — only the PQ cell
    * geometry changes. The full learned-rotation OPQ needs an
    * eigendecomposition no SQL oracle can restate; this is the
    * documented, honest subset (the s14 JL-literal precedent).
    * Returns the 1-based permutation p with rotated[i] = x[p(i)]. */
  private[graft] def opqPermutation(raw: DataFrame): Seq[Int] = {
    val aggs = (1 to Dim).flatMap { j =>
      val x = element_at(col("embedding"), j).cast("double")
      Seq(sum(round(x * x * lit(1e9)).cast("long")).as(s"s2_$j"),
        sum(round(x * lit(1e6)).cast("long")).as(s"s1_$j"))
    } :+ count(lit(1)).as("n")
    val r = raw.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = BigInt(r.getAs[Long]("n"))
    val ranked = (1 to Dim).map { j =>
      j -> (n * BigInt(r.getAs[Long](s"s2_$j")) * 1000 -
        BigInt(r.getAs[Long](s"s1_$j")).pow(2))
    }.sortWith { case ((ja, va), (jb, vb)) => va > vb || (va == vb && ja < jb) }
    // snake allocation: rank r → bucket; position within bucket follows
    // rank order; new index = bucket·PqSubDim + position
    val newPos = new Array[Int](Dim) // newPos(rank) = target index
    val fill = new Array[Int](PqSubs)
    ranked.indices.foreach { rk =>
      val m = rk % (2 * PqSubs)
      val b = if (m < PqSubs) m else 2 * PqSubs - 1 - m
      newPos(rk) = b * PqSubDim + fill(b)
      fill(b) += 1
    }
    val perm = new Array[Int](Dim) // perm(newIndex) = original dim (1-based)
    ranked.indices.foreach(rk => perm(newPos(rk)) = ranked(rk)._1)
    perm.toSeq
  }

  /** Apply a 1-based dimension permutation as a narrow projection
    * (static literal indices — pure codegen, no shuffle). */
  private[graft] def permuteEmbedding(raw: DataFrame, perm: Seq[Int]): DataFrame =
    raw.select(col("vec_id"),
      array(perm.map(p => element_at(col("embedding"), p)): _*).as("embedding"))

  private val opqPermCache = SessionCaches.newValCache[Seq[Int]]()

  /** STANDING form of [[opqPermutation]] (VERDICT r15 #4): the
    * permutation is a pure function of the corpus — Dim integers — yet
    * deriving it full-scans the corpus for the variance statistics.
    * It therefore persists in the standing registry keyed by corpus
    * fingerprint + build stamp (the graft_docstats precedent): the
    * scan is paid once per (corpus, build); every later run — and
    * every other JVM on the machine — reads back Dim rows. The
    * read-back collect is Dim-bounded (a permutation, never data). */
  private[graft] def opqPermStanding(s: SparkSession, d: String): Seq[Int] =
    SessionCaches.getOrBuildVal(opqPermCache, s, s"opqperm|$d") {
      val t = Warehouse.standingTable(s, "graft_opqperm", d) { stage =>
        val perm = opqPermutation(embeddings(s, d))
        import s.implicits._
        perm.zipWithIndex.map { case (dim, i) => (i + 1, dim) }
          .toDF("pos", "dim").coalesce(1)
          .write.format("parquet").saveAsTable(stage)
      }
      val rows = t.orderBy(col("pos")).collect() // Dim rows
      require(rows.length == Dim &&
        rows.map(_.getAs[Int]("dim")).sorted.sameElements(1 to Dim),
        s"standing OPQ permutation is not a bijection over 1..$Dim")
      rows.map(_.getAs[Int]("dim")).toSeq
    }

  /** s19: the PQ rung with the OPQ-P-lite rotation armed — s6's exact
    * pipeline (stand-in codebook, narrow encode, ADC ranking) over the
    * permuted vectors, oracle-gated end to end: the DuckDB oracle
    * re-derives the SAME permutation from the SAME integer statistics
    * (HUGEINT window ranks), permutes, and restates the s6 body over
    * the rotated CTE — one template for both rows so they cannot
    * drift. Whether the rotation LIFTS recall on this corpus is
    * measured by the s18 ladder (pq8 vs opq_pq8 rows), recorded
    * honestly either way. */
  def s19KnnOpq(s: SparkSession, d: String): DataFrame = {
    val raw = embeddings(s, d)
    val e = withNorm(permuteEmbedding(raw, opqPermStanding(s, d)))
    knnPqWith(e, sharedOpqPqCodebook(s, d))
  }

  /** s20: ONE exact Lloyd round of the spherical k-means trainer,
    * oracle-gated — the r10→r11 "gate the production posture" theme
    * applied to [[trainCodebook]]: the trainer itself had only a spec
    * (its ITERATED output has no SQL oracle), but a single round is
    * exactly SQL-expressible because every step is integer or
    * correctly-rounded double math: ASSIGN is s2's literal-codebook
    * argmax (fp9 cosines, cid tie-break) from the deterministic init
    * (the [[NCentroids]] lowest vec_ids — trainCodebook's own init),
    * and the M-step is emitted as per-(cluster, dimension) integer
    * SUMS of the fixed-point unit components plus the member COUNT —
    * no mean division, so the gated row is integer-exact end to end
    * and the DuckDB oracle restates it verbatim. The spec closes the
    * loop: dividing these sums by n reproduces trainCodebook(iters=1)
    * bit-for-bit, so the hash gate covers the trainer's real round.
    *
    * Scale shape (identical to the trainer's): one narrow scan for
    * assignment (zero exchanges, the s2 plan) + one groupBy(cluster)
    * with dim map-side-combined sums — k×(dim+1) values shuffle,
    * nothing else; the per-dim unpivot at the end explodes only the
    * k-row aggregate. */
  def s20KmeansRound(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    kmeansSums(e, sharedCodebook(s, d))
  }

  /** One Lloyd round's M-step emission over an explicit codebook —
    * the s20 body, shared with [[s25KmeansTrain]]'s later rounds:
    * assign (narrow literal-codebook argmax), then per-(cluster, dim)
    * integer sums of the fixed-point unit components plus the member
    * count. No division anywhere, so the output is BIGINT-exact on
    * both engines regardless of which round's centroids feed it. */
  private[graft] def kmeansSums(e: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    val unit = e.withColumn("u",
      transform(col("embedding"), v =>
        round(v.cast("double") /
          sqrt(col("norm_fp").cast("double") / 1e9) * lit(1e9)).cast("long")))
    val sums = assignClusters(unit, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        (0 until dim).map(j => sum(element_at(col("u"), j + 1)).as(s"s$j")): _*)
    sums
      .select(col("cluster"), col("n"),
        explode(array((0 until dim).map(j =>
          struct(lit(j + 1L).as("j"), col(s"s$j").as("s_fp"))): _*)).as("c"))
      .select(col("cluster"), col("c.j").as("j"), col("n"),
        col("c.s_fp").as("s_fp"))
      .orderBy(col("cluster"), col("j"))
  }

  /** s25: the trained-IVF FIXPOINT gated one composition deeper than
    * s20 — TWO Lloyd rounds unrolled cross-engine (VERDICT r11 #4):
    * round 1 is [[trainCodebook]]'s real first iteration (assign from
    * the deterministic init, integer M-step sums, divide, keep empty
    * clusters — the trainer's own driver-sized fold, the q24 CTE-
    * unroll pattern's Spark half), and the emitted row set is round
    * 2's M-step sums over those round-1 centroids. The DuckDB oracle
    * restates the whole chain as plain CTEs: init → argmax → integer
    * sums → per-dim mean CAST to REAL (float round-trip identical
    * cross-engine: both are IEEE double division then double→float
    * rounding on identical inputs; empty clusters keep the init
    * component via LEFT JOIN + COALESCE) → re-ranked argmax over the
    * round-1 centroids → round-2 sums. The spec closes the loop the
    * way s20's does: dividing the emitted sums reproduces
    * trainCodebook(iters = 2) bit-for-bit, so the hash gate now pins
    * the train→assign composition, not just one step.
    *
    * Scale shape: two of s20's rounds — each one narrow corpus scan +
    * one k×(dim+1) map-side-combined aggregate; the inter-round
    * centroid state is the driver-sized codebook by construction. */
  def s25KmeansTrain(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    kmeansSums(e, trainCodebook(embeddings(s, d), NCentroids, iters = 1))
  }

  /** s21: SIMPLIFIED-SILHOUETTE cluster audit — the published scalable
    * variant of Rousseeuw's silhouette (a = distance to OWN centroid,
    * b = distance to the NEAREST OTHER centroid, instead of the
    * all-pairs within/between means): per vector,
    * `sil = (b − a) / max(a, b)` in cosine distance, which with
    * b ≥ a ≥ 0 closes to `(cos_own − cos_next) / (1 − cos_next)` —
    * the quality audit that closes the clustering loop
    * (s20 trains → s2 assigns → s21 judges the fit; a low-silhouette
    * cluster is where d12's SemDeDup over-merges and where the IVF
    * ladder's recall sags).
    *
    * Scale notes (100 TB): the true silhouette is Σ within-cluster
    * pair work (the d7 quadratic); the simplified form is a ZERO-
    * EXCHANGE narrow projection — the same literal-codebook ranked
    * array s2's assignment reads, taking elements 1 AND 2 instead of
    * 1. Cost = one corpus scan, mergeable, no shuffle at all.
    * Determinism: cosines are exact-input double math (bit-identical
    * cross-engine), and the one division is correctly-rounded IEEE on
    * identical inputs — the cos_e6 contract. A vector equidistant
    * from both top centroids (1 − cos_next = 0 ⇒ a = b = 0) reports
    * silhouette 0 by convention, guarded not hoped. */
  def s21Silhouette(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    silhouetteWith(e, sharedCodebook(s, d))
  }

  /** The s21 pipeline over an explicit codebook — the trained path
    * (s20's output) and the spec's constructed geometries plug in. */
  private[graft] def silhouetteWith(e: DataFrame,
      cents: Seq[Centroid]): DataFrame = {
    e.select(col("vec_id"),
        rankedCentroids(cents, col("embedding"), col("norm_fp")).as("rc"))
      .select(col("vec_id"),
        element_at(col("rc"), 1).getField("cid").as("cluster"),
        (-element_at(col("rc"), 1).getField("neg_cos")).as("cos1"),
        element_at(col("rc"), 2).getField("cid").as("next_cluster"),
        (-element_at(col("rc"), 2).getField("neg_cos")).as("cos2"))
      .select(col("vec_id"), col("cluster"), col("next_cluster"),
        round(col("cos1") * 1e6).cast("long").as("cos_own_e6"),
        round(col("cos2") * 1e6).cast("long").as("cos_next_e6"),
        when(lit(1.0) - col("cos2") === 0.0, lit(0L))
          .otherwise(round((col("cos1") - col("cos2")) /
            (lit(1.0) - col("cos2")) * 1e6).cast("long"))
          .as("sil_e6"))
      .orderBy(col("vec_id"))
  }

  /** Neighbors per vector in the s22/s23 kNN graph. */
  val GraphK = 3

  /** Directed top-k edges from an (a, b, cos_e6) unordered pair frame:
    * each pair feeds both endpoints' candidate lists; rank by the e6
    * fixed-point cosine (nid tiebreak) so both engines state the
    * identical total order. */
  private def knnGraphFromPairs(pairs: DataFrame): DataFrame = {
    val directed = pairs
      .select(col("a").as("src"), col("b").as("nid"), col("cos_e6"))
      .unionByName(pairs
        .select(col("b").as("src"), col("a").as("nid"), col("cos_e6")))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_e6").desc, col("nid"))
    directed
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= GraphK.toLong)
      .select(col("src"), col("rank"), col("nid"), col("cos_e6"))
  }

  /** s22: the EXACT kNN GRAPH — every vector's [[GraphK]] nearest
    * neighbors (not just the query set s1 serves): the precursor
    * artifact of SemDeDup-style clustering, kNN-LM retrieval and
    * graph-based ANN index builds. Edges come from the s3 tiled
    * all-pairs stage with the threshold OPEN (every pair scored once
    * per unordered pair, each feeding both endpoints' lists), then
    * one per-vector window cut.
    *
    * Scale notes (100 TB): this is the honest O(n²) baseline — the
    * tiled pair stage bounds task memory (never a corpus broadcast)
    * and the per-src window is k-bounded, but pair count is
    * quadratic; the production path is s23's IVF-pruned graph
    * (Σ|cluster|²·nprobe work), with NN-descent the published
    * refinement beyond both. The ranking is by e6 fixed-point cosine
    * with nid tiebreak — the same total order both engines state. */
  def s22KnnGraph(s: SparkSession, d: String): DataFrame =
    knnGraphFromPairs(cosinePairsRaw(embeddings(s, d),
      s.sparkContext.defaultParallelism, threshold = -2.0))
      .orderBy(col("src"), col("rank"))

  /** s23: the IVF-PRUNED kNN graph — s22's production form: every
    * vector probes its [[NProbe]] nearest codebook clusters (the s2
    * machinery, applied to ALL vectors instead of the query set) and
    * ranks only co-clustered candidates; pair work collapses from n²
    * to Σ(cluster × probe fan). Approximate exactly like s2: recall
    * vs the exact graph is measured by spec (and the miss pattern is
    * the s18 ladder's lesson — cross-cluster true neighbors). Each
    * (src, nid) candidate appears at most once (nid lives in ONE
    * cluster), so no dedup stage is needed before the window. */
  def s23KnnGraphIvf(s: SparkSession, d: String): DataFrame =
    sharedIvfGraph(s, d)
      .orderBy(col("src"), col("rank"))

  /** CROSS-SESSION STANDING IVF kNN graph — [[ivfGraphEdges]]
    * materialized once per REGISTRY (was session-scoped through round
    * 13) and read by its three consumers (s23's listing, s24's single
    * refinement round, s26's two-round unroll): the graph is THE
    * standing artifact this family maintains (n×k rows), bucketed by
    * src for the refinement self-joins;
    * [[graft.streaming.StreamOps.knnGraphStream]]'s versioned store is
    * its continuously-maintained form. */
  private[graft] def sharedIvfGraph(s: SparkSession, d: String): DataFrame =
    SessionCaches.getOrBuild(ivfGraphCache, s, d)(
      Warehouse.standingTable(s, "graft_ivfgraph", d) { t =>
        Warehouse.writeStanding(ivfGraphEdges(withNorm(embeddings(s, d))),
          t, Seq("src"), nBuckets = 32)
      })

  private val ivfGraphCache = SessionCaches.newCache()

  /** s23's edge frame (pre-presentation-sort) — shared with s24's
    * NN-descent refinement. */
  private def ivfGraphEdges(e: DataFrame): DataFrame = {
    val cents = collectCodebook(e)
    val assigned = assignClusters(e, cents)
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("norm_fp").as("n_norm"), col("cluster"))
    val probed = e
      .select(col("vec_id").as("src"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"),
        explode(transform(
          slice(rankedCentroids(cents, col("embedding"), col("norm_fp")),
            1, NProbe),
          _.getField("cid"))).as("cluster"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_e6").desc, col("nid"))
    probed.join(assigned, Seq("cluster"))
      .filter(col("src") =!= col("nid"))
      .select(col("src"), col("nid"),
        round(cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")) * 1e6).cast("long").as("cos_e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= GraphK.toLong)
      .select(col("src"), col("rank"), col("nid"), col("cos_e6"))
  }

  /** s24: one NN-DESCENT refinement round over the IVF graph — the
    * published kNN-graph improvement (Dong et al.'s "a neighbor of my
    * neighbor is likely my neighbor"): candidates = the current graph
    * G ∪ its one-hop composition G∘G ∪ its reverse Gᵀ, re-scored by
    * exact cosine and cut back to top-k. Recovers exactly the
    * cross-cluster true neighbors IVF pruning loses (spec measures
    * recall vs the exact graph strictly ABOVE s23's — the
    * self-measuring-improvement pattern of s18).
    *
    * Scale notes (100 TB): per round the candidate set is ≤ k² + 2k
    * per vector — graph-sized, never corpus-sized; the expansion is
    * one self-join of the k-bounded edge list on nid = src, the
    * re-score joins embeddings by id (two hash joins moving candidate
    * rows), and the cut is the same k-bounded window. Production runs
    * a few rounds to convergence; ONE round is stated here so the
    * gate pins the recipe's step exactly. */
  def s24NnDescent(s: SparkSession, d: String): DataFrame =
    sharedNnRound1(s, d)
      .orderBy(col("src"), col("rank"))

  /** Session-scoped FIRST NN-descent round — s24's body materialized
    * once per (session, dir): s24 reads it directly and s26 composes
    * its second round on top instead of re-running round one (the
    * [[sharedIvfGraph]] discipline moved one rung up the refinement
    * ladder — the round is a pure function of (corpus, graph), and
    * the checkpointed frame is n×k rows, graph-sized). */
  private[graft] def sharedNnRound1(s: SparkSession, d: String): DataFrame =
    SessionCaches.getOrBuild(nnRound1Cache, s, d)(
      nnDescentRound(withNorm(embeddings(s, d)), sharedIvfGraph(s, d))
        .localCheckpoint())

  private val nnRound1Cache = SessionCaches.newCache()

  /** One NN-descent round over an explicit graph — the s24 body,
    * shared with [[nnDescent]]'s convergence loop: candidates =
    * G ∪ G∘G ∪ Gᵀ (≤ k² + 2k per vector, graph-sized never
    * corpus-sized), re-scored by exact fixed-point cosine against the
    * [[withNorm]]-prepared corpus `e`, cut back to the top [[GraphK]]
    * per src. Input needs only (src, nid); extra columns are
    * ignored. */
  private[graft] def nnDescentRound(e: DataFrame, graph: DataFrame): DataFrame = {
    val g = graph.select(col("src"), col("nid"))
    val cand = g
      .unionByName(g.as("g1").join(g.as("g2"),
          col("g1.nid") === col("g2.src") && col("g1.src") =!= col("g2.nid"))
        .select(col("g1.src").as("src"), col("g2.nid").as("nid")))
      .unionByName(g.select(col("nid").as("src"), col("src").as("nid")))
      .distinct()
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_e6").desc, col("nid"))
    cand
      .join(e.select(col("vec_id").as("src"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm")), Seq("src"))
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("norm_fp").as("n_norm")), Seq("nid"))
      .select(col("src"), col("nid"),
        round(cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")) * 1e6).cast("long").as("cos_e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= GraphK.toLong)
      .select(col("src"), col("rank"), col("nid"), col("cos_e6"))
  }

  /** NN-DESCENT TO CONVERGENCE — the production form s24's single
    * gated round is the recipe step of (VERDICT r11 #3): iterate
    * [[nnDescentRound]] until an iteration changes no edge (or
    * `maxRounds`), returning the refined graph and the number of
    * rounds that did real work. Each round's per-vector list only
    * ever improves in the (cos_e6 DESC, nid) total order — the
    * current top-k is always among its own candidates — so recall vs
    * the exact graph is monotone non-decreasing round over round
    * (spec-pinned), and a round that changes nothing proves the
    * FIXPOINT: its successor would see the identical candidate set.
    *
    * Scale notes (100 TB): the CC-loop discipline — each round's
    * k-bounded edge list is localCheckpoint()ed (lineage would
    * otherwise stack one join tree per round until planning
    * collapses), the convergence probe is one exceptAll-count over
    * two k-bounded lists (graph-sized, never corpus²), and per-round
    * candidate growth stays ≤ k² + 2k per vector by construction.
    * Round count in practice is small (the published convergence
    * behavior — candidates stop producing better neighbors within a
    * few rounds at modest k); the embeddings frame `e` is scanned
    * only by the re-score joins. */
  /** s26: TWO NN-descent rounds — the refinement ITERATION gated one
    * composition deeper than s24 (the s20 → s25 pattern applied to
    * the graph loop): [[nnDescentRound]] composed with itself over
    * the IVF graph, oracle-built from the SAME per-round SQL template
    * as s24 so the unroll provably cannot drift from the single round
    * it iterates. Recall vs the exact graph is ≥ s24's by the
    * monotonicity argument on [[nnDescent]] (spec-pinned). Candidate
    * growth stays ≤ k² + 2k per vector PER ROUND — graph-sized. */
  def s26NnDescent2(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    nnDescentRound(e, sharedNnRound1(s, d))
      .orderBy(col("src"), col("rank"))
  }

  def nnDescent(e: DataFrame, graph: DataFrame,
      maxRounds: Int = 10): (DataFrame, Int) = {
    require(maxRounds >= 0, "maxRounds must be non-negative")
    var g = graph.select(col("src"), col("rank"), col("nid"), col("cos_e6"))
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = nnDescentRound(e, g).localCheckpoint()
      // an edge list is per-src rank-keyed; the round changed nothing
      // iff the (src, nid) sets agree (ranks/cos are functions of them)
      val changed = next.select(col("src"), col("nid"))
        .exceptAll(g.select(col("src"), col("nid"))).count()
      converged = changed == 0L
      g = next
      if (!converged) rounds += 1
    }
    (g, rounds)
  }

  /** Beam width (entry fan and per-hop survivor cut) for [[s27GraphSearch]]. */
  val NEntry = 2

  /** s27: GRAPH-BASED ANN SEARCH — the search layer of the
    * graph-index family (HNSW/NSG/DiskANN lineage: greedy best-first
    * expansion over a proximity graph), unrolled to TWO hops so the
    * gate pins each expansion exactly (the s24→s26 unroll pattern
    * applied to search). Seeds are the literal-codebook vectors (real
    * corpus rows — DiskANN's fixed entry-point set): each query keeps
    * its [[NEntry]] best seeds by exact cosine (zero-exchange ranked
    * array, the s2 machinery), expands their graph out-edges, keeps
    * the [[NEntry]] best visited (the beam), expands once more, and
    * ranks EVERYTHING VISITED by exact cosine for the final
    * [[GraphK]] cut. Self-matches are excluded like s1.
    *
    * Scale notes (100 TB): the graph is the standing n×k artifact
    * ([[graft.streaming.StreamOps.knnGraphStream]]'s store, bucketed
    * by src at warehouse scale, so each hop joins exchange-free on
    * the graph side); per query the visited set is ≤ NEntry·(2k + 1)
    * rows — QUERY-sized, never corpus-sized — and the exact re-score
    * joins move only those candidate rows. This is the read path the
    * s22–s26 build ladder exists to serve: queries never scan the
    * corpus, only the beam's graph neighborhood. */
  def s27GraphSearch(s: SparkSession, d: String): DataFrame =
    graphSearch(withNorm(embeddings(s, d)), sharedIvfGraph(s, d))
      .orderBy(col("qid"), col("rank"))

  /** The s27 pipeline over an explicit graph — [[nnDescent]] output
    * and constructed spec geometries plug in. `graph` needs
    * (src, nid) ranked rows (rank ≤ [[GraphK]] enforced here). */
  private[graft] def graphSearch(e: DataFrame, graph: DataFrame): DataFrame =
    graphSearchFor(e, graph,
      e.filter(col("vec_id") < NQueries.toLong)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("norm_fp").as("q_norm")))

  /** [[graphSearch]] for an EXPLICIT query frame (qid, q_emb, q_norm)
    * — the form [[graft.streaming.StreamOps.graphSearchStream]] runs
    * per arriving micro-batch against the standing graph store. */
  private[graft] def graphSearchFor(e: DataFrame, graph: DataFrame,
      queries: DataFrame): DataFrame = {
    val cents = collectCodebook(e)
    val g = graph.filter(col("rank") <= GraphK.toLong)
      .select(col("src"), col("nid"))
    // frontier 0: each query's NEntry best seeds among the codebook
    // vectors — a narrow zero-exchange projection (cid IS the seed's
    // vec_id: the literal codebook is made of corpus rows)
    val f0 = queries
      .select(col("qid"),
        slice(rankedCentroids(cents, col("q_emb"), col("q_norm")),
          1, NEntry).as("rc"))
      .select(col("qid"), explode(col("rc")).as("c"))
      .select(col("qid"), col("c.cid").as("nid"))
    def hop(frontier: DataFrame): DataFrame =
      frontier.select(col("qid"), col("nid").as("f_nid"))
        .join(g.select(col("src").as("f_nid"), col("nid")), Seq("f_nid"))
        .select(col("qid"), col("nid"))
    def rescore(v: DataFrame): DataFrame = v
      .join(queries, Seq("qid"))
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("norm_fp").as("n_norm")), Seq("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")) * 1e6).cast("long").as("cos_e6"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("nid"))
    val v1 = f0.unionByName(hop(f0))
      .filter(col("qid") =!= col("nid")).distinct()
    val b1 = rescore(v1)
      .withColumn("brank", row_number().over(w))
      .filter(col("brank") <= NEntry)
      .select(col("qid"), col("nid"))
    val v2 = v1.unionByName(hop(b1))
      .filter(col("qid") =!= col("nid")).distinct()
    rescore(v2)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= GraphK.toLong)
      .select(col("qid"), col("rank"), col("nid"), col("cos_e6"))
  }

  /** MMR pool width and λ numerator (score = λ·rel − (1−λ)·redund,
    * stated over tenths so every score is an exact integer). */
  val MmrPool = 8
  val MmrLambda10 = 7L

  /** s28: MAXIMAL MARGINAL RELEVANCE rerank (Carbonell & Goldstein
    * 1998) — the diversity-aware top-k every retrieval stack bolts
    * onto its ANN candidates (and a training-data pipeline uses to
    * pick VARIED exemplars rather than k near-duplicates): greedily
    * select [[GraphK]] results from each query's [[MmrPool]]-wide
    * exact-cosine pool, each pick maximizing
    * `λ·cos(q,d) − (1−λ)·max_{s∈selected} cos(d,s)`. The greedy loop
    * is inherently sequential, so like s25/s26 the gate UNROLLS it —
    * three picks as three argmax windows over the pool, every score
    * the exact integer `7·cos_e6 − 3·penalty_e6` (×10 the published
    * λ=0.7 form — a positive constant scale that cannot change any
    * argmax), ties by nid.
    *
    * Scale notes (100 TB): the pool is the ANN ladder's candidate cut
    * at real scale (the s11 rerank pattern — exact brute force here
    * for oracle parity); the pool-internal pairwise-sim frame is
    * P²-bounded PER QUERY (64 rows), and each pick is one window over
    * a pool-sized frame — query-sized work end to end, never
    * corpus-sized. */
  def s28MmrRerank(s: SparkSession, d: String): DataFrame =
    mmrRerank(withNorm(embeddings(s, d)))
      .orderBy(col("qid"), col("rank"))

  /** The s28 pipeline over a [[withNorm]]-prepared frame. */
  private[graft] def mmrRerank(e: DataFrame): DataFrame = {
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"))
    val wPool = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("nid"))
    // The greedy unroll references `pool` five times and `ps` twice;
    // Spark shares no common subtrees within one DAG, so without a cut
    // the corpus×query pool scan (and its top-pool window) re-executes
    // per reference — 19 AQE stage-jobs at sf0.1, and at scale five
    // corpus scans where one suffices. Both frames are query-sized by
    // construction (NQueries×MmrPool and NQueries×MmrPool² rows), so
    // materialize each ONCE with localCheckpoint — the q24/Components
    // loop-invariant discipline — and let every pick read the
    // materialized rows.
    val pool = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")) * 1e6).cast("long").as("cos_e6"))
      .withColumn("pr", row_number().over(wPool))
      .filter(col("pr") <= MmrPool)
      .select(col("qid"), col("nid"), col("cos_e6"))
      // EAGER by measurement (r18 CutProbe: eager 1.64 s / 0.8 s CPU <
      // lazy 1.77/1.2 < none 3.00/1.3): the five-pick unroll consumes
      // these frames from several concurrent AQE stage-jobs, and the
      // lazy cut lets racing consumers duplicate the corpus scan the
      // barrier exists to pay once. Query-sized frames, so the
      // blocking job is cheap.
      .transform(Cuts.cut(_, default = "eager"))
    val ps = pool.select(col("qid"), col("nid").as("a"))
      .join(pool.select(col("qid"), col("nid").as("b")), Seq("qid"))
      .filter(col("a") =!= col("b"))
      .join(e.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
        col("norm_fp").as("a_norm")), Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
        col("norm_fp").as("b_norm")), Seq("b"))
      .select(col("qid"), col("a"), col("b"),
        round(cosine(dotFp9(col("a_emb"), col("b_emb")),
          col("a_norm"), col("b_norm")) * 1e6).cast("long").as("sim_e6"))
      .transform(Cuts.cut(_, default = "eager")) // see pool's rationale
    def scoreOf(cands: DataFrame): DataFrame = cands.withColumn("mmr_x10_e6",
      lit(MmrLambda10) * col("cos_e6") -
        lit(10L - MmrLambda10) * col("penalty_e6"))
    def pick(cands: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("mmr_x10_e6").desc, col("nid"))
      cands.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("qid"), col("nid"), col("cos_e6"), col("penalty_e6"),
          col("mmr_x10_e6"))
    }
    def penaltyVs(selected: DataFrame): DataFrame = ps
      .join(selected.select(col("qid"), col("nid").as("b")),
        Seq("qid", "b"), "left_semi")
      .groupBy(col("qid"), col("a").as("nid"))
      .agg(max(col("sim_e6")).as("penalty_e6"))
    def remaining(selected: DataFrame): DataFrame = pool
      .join(selected.select(col("qid"), col("nid")),
        Seq("qid", "nid"), "left_anti")
    val p1 = pick(scoreOf(pool.withColumn("penalty_e6", lit(0L))))
    val sel1 = p1.select(col("qid"), col("nid"))
    val p2 = pick(scoreOf(remaining(sel1).join(penaltyVs(sel1),
      Seq("qid", "nid"))))
    val sel2 = sel1.unionByName(p2.select(col("qid"), col("nid")))
    val p3 = pick(scoreOf(remaining(sel2).join(penaltyVs(sel2),
      Seq("qid", "nid"))))
    p1.withColumn("rank", lit(1L))
      .unionByName(p2.withColumn("rank", lit(2L)))
      .unionByName(p3.withColumn("rank", lit(3L)))
      .select(col("qid"), col("rank"), col("nid"), col("cos_e6"),
        col("penalty_e6"), col("mmr_x10_e6"))
  }

  /** s8: IVF+PQ kNN — the two scale mechanisms COMPOSED, the standard
    * billion-vector index architecture (FAISS IVFPQ's no-residual
    * form): IVF cluster assignment prunes WHICH corpus rows a query
    * scores (nprobe/nlist of the corpus, s2's narrow-argmax machinery)
    * and PQ codes shrink WHAT each scored row costs (8 LUT lookups on
    * an 8-byte code, s6's ADC machinery). Corpus rows carry
    * (cluster, codes, recon_norm) — at rest this is the entire stored
    * index: the raw vectors never reach the search. The production
    * refinement (PQ on RESIDUALS x − centroid, tighter codes at the
    * same budget) changes only the encode/LUT inputs, not this plan
    * shape. Approximate on both axes; recall floor pinned by spec. */
  def s8KnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    knnIvfPqWith(e, sharedCodebook(s, d), sharedPqCodebook(s, d))
  }

  /** The s8 pipeline over explicit IVF + PQ codebooks (no-residual
    * form) — the trained path, the recall probe, and s11's candidate
    * stage (wider `topk` cut) plug in here. */
  private[graft] def knnIvfPqWith(e: DataFrame, cents: Seq[Centroid],
      cb: Map[Int, Seq[SubCent]], topk: Int = TopK): DataFrame = {
    val codeCols = (0 until PqSubs).map(i => pqCodeCol(cb(i), i))
    val coded = assignClusters(e, cents)
      .select((Seq(col("vec_id").as("nid"), col("cluster")) ++ codeCols): _*)
      .withColumn("recon_norm", pqReconNorm(cb))
    val q = probeClusters(e, cents)
      .select((Seq(col("qid"), col("q_norm"), col("cluster")) ++
        pqLutCols(cb, col("q_emb"))): _*)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    coded.join(broadcast(q), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(pqAdcDot, col("q_norm"), col("recon_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** s11 candidate width: ADC matches re-scored exactly per query. */
  val RerankK = 20

  /** s11: IVF+PQ with EXACT RERANK — the production two-stage ANN
    * shape (FAISS `IndexRefine`, every vector-DB's default): the
    * compressed index (s8's IVF prune + PQ ADC scan) nominates
    * [[RerankK]] candidates per query, then the TRUE embeddings of
    * just those candidates are fetched and re-scored with the exact
    * fixed-point cosine, and the final [[TopK]] is ranked on exact
    * scores. Buys back ADC's quantization error (rank swaps near the
    * cut) for the price of RerankK exact dots per query — the recall
    * ladder records the lift over raw s8 at identical index cost.
    *
    * Shape: stage 1 is s8's one-shuffle plan with a wider rank cut;
    * stage 2 is a BROADCAST of the tiny candidate list (queries ×
    * RerankK rows) back into the corpus scan — the exact-fetch is a
    * narrow probe of the stored vectors, no second shuffle of the
    * corpus. At 100 TB the fetch side is a point-lookup-friendly
    * bucketed table and the rerank cost stays queries × RerankK
    * regardless of corpus size. */
  def s11IvfRerank(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val cand = knnIvfPqWith(e, sharedCodebook(s, d), sharedPqCodebook(s, d),
      topk = RerankK).select(col("qid"), col("nid"))
    val q = e.filter(col("vec_id") < NQueries.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"))
    val candq = cand.join(q, Seq("qid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"))
      .join(broadcast(candq), Seq("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** s12: ANN-MIPS — the norm-augmentation reduction s9's scaladoc
    * records (Bachrach et al., RecSys'14), MADE REAL over the IVF
    * structure: every corpus vector is augmented with component
    * sqrt(M² − ‖x‖²) (M = max corpus norm, so every augmented vector
    * has norm M), queries are zero-padded — then cosine structure over
    * augmented vectors = inner-product structure over the originals,
    * and the s2 IVF machinery applies UNCHANGED (same stand-in
    * codebook rule, same zero-exchange assignment, same probe list).
    * The final ranking is by the exact fixed-point dot itself — the
    * query's augmented component is 0, so the augmented dot IS the
    * original MIPS dot, integer-exact in both engines (and sqrt is
    * IEEE-correctly-rounded everywhere, unlike ln — the augmentation
    * introduces no cross-engine float risk; the appended component is
    * cast to float to match the corpus element type in both engines).
    * Approximate like s2: recall vs exact s9 is the nprobe/nlist
    * trade, measured in the ladder. */
  def s12MipsIvf(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val mxFp = e.agg(max(col("norm_fp"))).first().getLong(0)
    val ea = withNorm(e.select(col("vec_id"),
      concat(col("embedding"), array(
        sqrt((lit(mxFp) - col("norm_fp")).cast("double") / 1e9).cast("float")))
        .as("embedding")))
    val cents = collectCodebook(ea)
    val assigned = assignClusters(ea, cents)
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("cluster"))
    val q = withNorm(e.filter(col("vec_id") < NQueries.toLong)
      .select(col("vec_id"),
        concat(col("embedding"), array(lit(0f))).as("embedding")))
    val probes = probeClusters(q, cents)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot_fp").desc, col("nid"))
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("dot_fp", dotFp9(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        col("dot_fp"))
      .orderBy(col("qid"), col("rank"))
  }

  /** The cluster's centroid embedding as a literal lookup — cids are
    * 0..k−1 by construction (stand-in and trained both), so
    * element_at(cluster+1) is the centroid. */
  private def centEmbFor(cents: Seq[Centroid], cluster: Column): Column =
    element_at(array(cents.map(c => array(c.emb.map(lit): _*)): _*),
      cluster.cast("int") + 1)

  /** Per-list RECONSTRUCTION ANCHORS: the Euclidean mean of each IVF
    * list's members. The assignment codebook is SPHERICAL k-means
    * (unit-mean M-step — the right trainer for the cosine assignment
    * objective), but a unit centroid is the wrong thing to SUBTRACT
    * for residuals: x − c/‖c‖ keeps a cluster-dependent component
    * whenever the list's mean norm ≠ 1, so residual clouds stay
    * separated and residual PQ buys nothing. Anchoring residuals at
    * the plain mean removes exactly the between-list energy — FAISS's
    * by_residual uses the coarse centroid in the metric it trains in;
    * this is that idea carried to the cosine/IP setting. One
    * k×(dim+1)-value map-side-combined aggregate, fixed-point
    * deterministic; empty lists anchor at 0 (residual = x). */
  private[graft] def clusterAnchors(corpus: DataFrame,
      cents: Seq[Centroid]): Seq[Centroid] = {
    val e = withNorm(corpus)
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    val u = e.withColumn("u",
      transform(col("embedding"), v => round(v.cast("double") * 1e9).cast("long")))
    val sums = assignClusters(u, cents).groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        (0 until dim).map(j => sum(element_at(col("u"), j + 1)).as(s"s$j")): _*)
      .collect()
    val byC = sums.map(r => r.getAs[Long]("cluster") -> r).toMap
    cents.map { c =>
      byC.get(c.cid).fold(Centroid(c.cid, Seq.fill(dim)(0f), 0L)) { r =>
        val n = r.getAs[Long]("n").toDouble
        val emb = (0 until dim).map(j => (r.getAs[Long](s"s$j") / n / 1e9).toFloat)
        Centroid(c.cid, emb, normFpOf(emb))
      }
    }
  }

  /** Train a PQ codebook on IVF RESIDUALS (x − anchor(x)) — the
    * FAISS-default IVFPQ refinement: after coarse quantization the
    * residuals concentrate near the origin with far less variance than
    * the raw vectors, so the same 8-byte budget spends its codes on a
    * much smaller cell of space (see BASELINE.md's ladder for where
    * this pays and where it provably cannot). Returns the
    * reconstruction anchors alongside the codebook — search must
    * subtract/add the SAME anchors. One extra narrow zip_with (the
    * subtract) on top of [[trainPqCodebook]]'s per-round shape; the
    * codebook is shared across clusters (FAISS default), so LUTs stay
    * cluster-independent at search. */
  def trainResidualPqCodebook(corpus: DataFrame, cents: Seq[Centroid],
      iters: Int = 3): (Seq[Centroid], Map[Int, Seq[SubCent]]) = {
    val e = withNorm(corpus)
    val anchors = clusterAnchors(corpus, cents)
    val resid = assignClusters(e, cents)
      .select(col("vec_id"),
        zip_with(col("embedding"), centEmbFor(anchors, col("cluster")),
          (x, c) => x - c).as("embedding"))
    (anchors, trainPqCodebook(resid, iters))
  }

  /** Fraction of the corpus's squared-norm energy the coarse quantizer
    * LEAVES in the residuals: Σ‖x − c(x)‖² / Σ‖x‖² (fixed-point). Near
    * 1 ⇒ the corpus is isotropic w.r.t. the codebook and residual PQ
    * cannot improve on plain PQ (same distribution, same budget); near
    * 0 ⇒ residuals concentrate and the refinement pays. The measured
    * diagnostic behind the ladder's residual row. */
  private[graft] def residualEnergyRatio(corpus: DataFrame,
      cents: Seq[Centroid], anchors: Seq[Centroid]): Double = {
    val e = withNorm(corpus)
    val resid = zip_with(col("embedding"), centEmbFor(anchors, col("cluster")),
      (x, c) => x - c)
    val r = assignClusters(e, cents)
      .select(sum(dotFp9(resid, resid)).as("res"), sum(col("norm_fp")).as("tot"))
      .first()
    r.getLong(0).toDouble / r.getLong(1).toDouble
  }

  /** s8's RESIDUAL form — IVF prune + PQ codes over residuals. Encode:
    * assign cluster (narrow argmax), subtract the centroid (narrow
    * zip_with), code the residual per subspace (narrow literal-codebook
    * argmin), and store the EXACT reconstructed norm
    * ‖centroid + r̂‖²  (fixed-point, computed from literals at encode
    * time — per row it is one add chain, and at rest it is one stored
    * long beside the codes). Search: dot(q, x̂) = dot(q, centroid) +
    * dot(q, r̂); the first term is a per-(query, probed-cluster)
    * literal dot computed on the tiny probe side, the second is s6's
    * ADC LUT sum (the residual codebook is cluster-shared, so LUTs
    * stay per-query). Same one-shuffle plan shape as s8 — the
    * refinement changes only encode/LUT inputs, exactly as s8's
    * scaladoc promised. No SQL oracle (trained, like trainCodebook);
    * recall pinned by spec against exact s1. */
  private[graft] def knnIvfPqResidualWith(e: DataFrame, cents: Seq[Centroid],
      anchors: Seq[Centroid], cb: Map[Int, Seq[SubCent]]): DataFrame = {
    val resid = zip_with(col("embedding"), centEmbFor(anchors, col("cluster")),
      (x, c) => x - c)
    val codeCols = (0 until PqSubs).map(i => pqCodeCol(cb(i), i, resid))
    def residCent(i: Int) =
      element_at(array(cb(i).map(c => array(c.emb.map(lit): _*)): _*),
        col(s"code_$i").cast("int") + 1)
    // recon_norm from literals + codes only (the raw embedding never
    // reaches — or needs to reach — the search side):
    val codedN = assignClusters(e, cents)
      .select(Seq(col("vec_id").as("nid"), col("cluster")) ++ codeCols: _*)
      .withColumn("recon_norm",
        (0 until PqSubs).map { i =>
          val rs = zip_with(
            slice(centEmbFor(anchors, col("cluster")),
              i * PqSubDim + 1, PqSubDim),
            residCent(i), (a, b) => a + b)
          dotFp9(rs, rs)
        }.reduce(_ + _))
    val q = probeClusters(e, cents)
      .withColumn("q_cent_dot",
        element_at(array(anchors.map(c =>
          dotFp9(col("q_emb"), array(c.emb.map(lit): _*))): _*),
          col("cluster").cast("int") + 1))
      .select(Seq(col("qid"), col("q_norm"), col("cluster"),
        col("q_cent_dot")) ++ pqLutCols(cb, col("q_emb")): _*)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    codedN.join(broadcast(q), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(col("q_cent_dot") + pqAdcDot, col("q_norm"), col("recon_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Deduplicated PQ-training init: per subspace, the first PqK
    * DISTINCT sub-slices in vec_id order (scanning a bounded prefix of
    * 16·PqK rows, padded by cycling if the prefix has fewer distinct
    * values). The naive first-PqK-rows init collapses when sub-slices
    * repeat — on RESIDUAL corpora most early residual sub-slices are
    * (near-)identical zeros, so k-means starts with massively
    * duplicated codes and Lloyd cannot split them (empty-code rule
    * keeps duplicates frozen); measured on the structured probe corpus
    * this init moves residual IVFPQ recall 0.34 → ~1.0. Deterministic:
    * driver-side order is pinned by vec_id. */
  private[graft] def pqInit(e: DataFrame): Map[Int, Seq[SubCent]] = {
    val rows = e.orderBy(col("vec_id")).limit(16 * PqK)
      .select(col("embedding")).collect().map(_.getSeq[Float](0))
    require(rows.nonEmpty, "pqInit: empty corpus")
    (0 until PqSubs).map { s =>
      val subs = rows.map(_.slice(s * PqSubDim, (s + 1) * PqSubDim).toSeq).toSeq
      val distinct = subs.distinct.take(PqK)
      val padded = (0 until PqK).map(i => distinct(i % distinct.size))
      s -> padded.zipWithIndex.map { case (u, i) =>
        SubCent(s, i, u, normFpOf(u))
      }.toSeq
    }.toMap
  }

  /** Train PQ sub-codebooks: independent k-means per subspace over the
    * corpus's sub-slices — classic PQ training, on the same
    * bit-deterministic distributed Lloyd shape as [[trainCodebook]].
    * Per round: the 8 per-subspace argmin codes are ONE narrow
    * projection (each the [[pqCodeCol]] literal-codebook trick), the
    * (vector × subspace) rows explode in place, and the M-step is a
    * single groupBy(sub, code) with (PqSubs·PqK)×(PqSubDim+1)
    * map-side-combined fixed-point sums — one small shuffle per round,
    * nothing else moves. Plain (non-normalized) means: PQ reconstructs
    * the vector, so the Euclidean centroid is the right M-step (unlike
    * the IVF trainer's unit-mean spherical update). Empty codes keep
    * their previous centroid. Init: the stand-in codebook (sub-slices
    * of the PqK lowest vec_ids). */
  def trainPqCodebook(corpus: DataFrame, iters: Int = 3): Map[Int, Seq[SubCent]] = {
    // No withNorm: PQ training never needs norms, and its zero-norm
    // guard would reject legitimate all-zero RESIDUAL rows (a vector
    // that coincides with its list's anchor)
    val e = corpus.select(col("vec_id"),
      array_compact(col("embedding")).as("embedding"))
    var cb = pqInit(e)
    for (_ <- 0 until iters) {
      val perSub = e.select(explode(array((0 until PqSubs).map { i =>
        struct(lit(i).as("sub"),
          pqCodeCol(cb(i), i).as("code"),
          transform(pqSubCol(i), v =>
            round(v.cast("double") * 1e9).cast("long")).as("u"))
      }: _*)).as("sc"))
        .select(col("sc.sub"), col("sc.code"), col("sc.u"))
      val sums = perSub.groupBy(col("sub"), col("code"))
        .agg(count(lit(1)).as("n"),
          (0 until PqSubDim).map(j =>
            sum(element_at(col("u"), j + 1)).as(s"s$j")): _*)
        .collect()
      val byKey = sums.map(r =>
        (r.getAs[Int]("sub"), r.getAs[Long]("code")) -> r).toMap
      cb = cb.map { case (s, cents) =>
        s -> cents.map { c =>
          byKey.get((s, c.code.toLong)).fold(c) { r =>
            val n = r.getAs[Long]("n").toDouble
            val emb = (0 until PqSubDim)
              .map(j => (r.getAs[Long](s"s$j") / n / 1e9).toFloat)
            SubCent(s, c.code, emb, normFpOf(emb))
          }
        }
      }
    }
    cb
  }

  /** Corpus-wide PQ distortion (sum of per-subspace fixed-point L2
    * distances to the chosen code) — the k-means objective, for the
    * trainer's monotonicity spec. */
  private[graft] def pqDistortion(corpus: DataFrame,
      cb: Map[Int, Seq[SubCent]]): Long = {
    val e = withNorm(corpus)
    val distCols = (0 until PqSubs).map { i =>
      val xn = dotFp9(pqSubCol(i), pqSubCol(i))
      element_at(array_sort(array(cb(i).map { c =>
        struct(
          (xn - lit(2L) * dotFp9(pqSubCol(i), array(c.emb.map(lit): _*)) +
            lit(c.normFp)).as("d"),
          lit(c.code.toLong).as("k"))
      }: _*)), 1).getField("d")
    }
    e.select(sum(distCols.reduce(_ + _)).as("obj")).first().getLong(0)
  }

  /** s7: kNN label classification — the embedding-space classifier a
    * curation pipeline runs to propagate labels (quality tiers, topic
    * tags) from a labeled seed set to an unlabeled corpus: each query
    * vector is classified by MAJORITY VOTE among its TopK exact-cosine
    * neighbors' labels (tie → smallest label), and scored against its
    * own label. Same broadcast-queries/linear-scan/per-query-top-k
    * shape as s1, plus one tiny per-query vote aggregate — the
    * neighbor search dominates, and it is the scan s1 already proved
    * linear. Uses the embeddings table's `label` column. */
  /** s15: HARD-NEGATIVE MINING — for each query vector, the TopK most
    * similar vectors carrying a DIFFERENT label: the highest-loss
    * negatives a contrastive/embedding trainer wants in its batches
    * (easy random negatives carry no gradient; the near-but-wrong
    * ones do — the dense-retrieval training recipe). The s1 exact
    * shape plus one label predicate, so every ANN acceleration in
    * this module (IVF pruning, PQ, the bucketed warehouse) applies
    * unchanged when the corpus outgrows brute force; the margin
    * (cos to nearest SAME-label vector minus cos to the negative) is
    * attached so curriculum thresholds can filter downstream. */
  def s15HardNegatives(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"), col("label").cast("long").as("q_label"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("label").cast("long").as("n_label"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
    // best same-label cosine per query — the positive anchor the
    // margin is measured against (one tiny agg, broadcast back)
    val posBest = scored.filter(col("n_label") === col("q_label"))
      .groupBy(col("qid")).agg(max(col("cos")).as("pos_cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.filter(col("n_label") =!= col("q_label"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .join(broadcast(posBest), Seq("qid"), "left")
      .select(col("qid"), col("q_label"),
        col("rank").cast("long").as("rank"), col("nid"),
        col("n_label").as("neg_label"),
        round(col("cos") * 1e6).cast("long").as("cos_e6"),
        round((coalesce(col("pos_cos"), lit(0d)) - col("cos")) * 1e6)
          .cast("long").as("margin_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  def s7KnnClassify(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"), col("label").cast("long").as("true_label"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"), col("label").cast("long").as("n_label"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    val voteW = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("n_label"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos",
        cosine(dotFp9(col("q_emb"), col("n_emb")), col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .groupBy(col("qid"), col("true_label"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrank", row_number().over(voteW))
      .filter(col("vrank") === 1)
      .select(col("qid"), col("true_label"),
        col("n_label").as("pred_label"), col("votes"),
        (col("n_label") === col("true_label")).as("correct"))
      .orderBy(col("qid"))
  }

  /** s9: maximum-inner-product search (MIPS) — retrieval where score =
    * ⟨q, x⟩ UN-normalized, the objective of recommender/two-tower
    * retrieval (a document's norm encodes its learned popularity prior,
    * so normalizing it away — cosine — is the WRONG metric there).
    * Ranking is by the exact 1e18-fixed-point dot (dotFp9 of float
    * inputs is bit-deterministic integer arithmetic), so rank order and
    * the reported score are integer-exact in both engines — no cosine
    * division anywhere. Same broadcast-queries / linear-scan /
    * per-query top-k shape as s1.
    *
    * Scale path: MIPS reduces to cosine search by norm augmentation
    * (Bachrach et al., RecSys'14): append component sqrt(M² − ‖x‖²)
    * to each corpus vector (M = max norm) and 0 to each query — then
    * argmax cosine over augmented vectors = argmax inner product, so
    * every ANN structure this module already has (s2 IVF, s4 sign-LSH,
    * s6/s8 PQ) applies unchanged to MIPS corpora. The exact scan here
    * is the oracle-checkable baseline of that family. */
  def s9KnnMips(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot_fp").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot_fp", dotFp9(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        col("dot_fp"))
      .orderBy(col("qid"), col("rank"))
  }

  /** s10 radius: keep neighbors with cosine ≥ 0.25 (fixed-point 1e6). */
  val RadiusE6 = 250000L

  /** s10: RADIUS (range) SEARCH — every corpus vector within a fixed
    * cosine radius of each query, the "all sufficiently similar"
    * complement of top-k (s1): result cardinality tracks true
    * neighborhood density, including ZERO rows for isolated queries,
    * which no top-k variant can express.
    *
    * Scale notes (100 TB): radius search is the SHUFFLE-FREE dense
    * query — broadcast queries, score, filter; no rank window at all,
    * so the corpus-side stage is embarrassingly parallel and pipelines
    * entirely inside whole-stage codegen (the [[dotFp9]] kernel). The
    * only exchange in the plan is the presentation orderBy. The
    * IVF/LSH pruned variants compose the same way they do for top-k
    * (probe-select, then the identical score+filter tail). */
  def s10RadiusSearch(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      col("norm_fp").as("q_norm"))
      .filter(col("qid") < NQueries.toLong)
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
      col("norm_fp").as("n_norm"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos_e6",
        round(cosine(dotFp9(col("q_emb"), col("n_emb")),
          col("q_norm"), col("n_norm")) * 1e6).cast("long"))
      .filter(col("cos_e6") >= RadiusE6)
      .select(col("qid"), col("nid"), col("cos_e6"))
      .orderBy(col("qid"), col("cos_e6").desc, col("nid"))
  }

  /** Number of representatives the s30 k-center coreset selects. */
  val KCenterK = 8

  /** One farthest-point round: the e6 fixed-point MAX cosine of every
    * unchosen vector to the chosen set (broadcast as literals, same as
    * the IVF codebook) — a NARROW greatest-of-cosines projection over
    * the [[dotFp9]] kernel, no exchange (plan-pinned). The round's
    * argmin (farthest point) is `orderBy(mx, vec_id).limit(1)` on this
    * frame: a TakeOrdered reduction (per-partition top-1, driver merges
    * one row per partition). */
  private[graft] def kcenterRound(e: DataFrame,
      centers: Seq[Centroid]): DataFrame = {
    val cos = centers.map(c =>
      round(cosine(dotFp9(col("embedding"), array(c.emb.map(lit): _*)),
        col("norm_fp"), lit(c.normFp)) * 1e6).cast("long"))
    val mx = if (cos.sizeIs == 1) cos.head else greatest(cos: _*)
    e.filter(!col("vec_id").isin(centers.map(_.cid): _*))
      .select(col("vec_id"), col("embedding"), col("norm_fp"), mx.as("mx"))
  }

  /** s30: GREEDY K-CENTER coreset selection — farthest-point traversal
    * (Gonzalez 1985's 2-approximation for the k-center objective; the
    * diverse-subset / coreset primitive of training-data curation:
    * pick a representative slice whose every corpus point is close to
    * some representative). Seed = vec_id 0, then k−1 rounds each
    * adding the point with MINIMUM max-cosine (= maximum cosine
    * DISTANCE) to the chosen set. Output: selection order, vector id,
    * and the farness (1e6 − max-cos-e6 at selection) — a monotone
    * non-increasing radius ladder that doubles as the coreset's
    * coverage certificate (round r's farness bounds the k-center
    * radius of the first r representatives).
    *
    * Scale notes (100 TB): the chosen set is k driver-side rows
    * broadcast as literals; each round is ONE corpus scan (narrow
    * projection, zero exchanges) feeding a TakeOrdered(1) reduction —
    * k scans total, the textbook distributed farthest-first traversal
    * (e.g. the seeding pass of k-means|| , Bahmani et al. VLDB'12).
    * Determinism: the argmin orders by the e6 fixed-point max cosine
    * with vec_id tiebreak — the exact integer order the oracle's
    * unrolled CTE chain states. */
  def s30KCenterCoreset(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
      .select(col("vec_id"), col("embedding"), col("norm_fp"))
    val seedRows = e.filter(col("vec_id") === 0L).collect()
    require(seedRows.nonEmpty,
      "k-center seed vec_id 0 missing from the embedding corpus")
    val seed = seedRows.head
    var centers =
      Vector(Centroid(seed.getLong(0), seed.getSeq[Float](1), seed.getLong(2)))
    var rows = Vector((1L, centers.head.cid, 2000000L))
    (2 to KCenterK).foreach { r =>
      val pick = kcenterRound(e, centers)
        .orderBy(col("mx").asc, col("vec_id").asc)
        .limit(1).collect().head
      centers :+=
        Centroid(pick.getLong(0), pick.getSeq[Float](1), pick.getLong(2))
      rows :+= ((r.toLong, pick.getLong(0), 1000000L - pick.getLong(3)))
    }
    val sp = s
    import sp.implicits._
    rows.toDF("rank", "vec_id", "far_e6").orderBy(col("rank"))
  }

  /** Total representatives the s32 prototypicality coreset budgets. */
  val CoresetBudget = 64

  /** s32: CLUSTER-PROPORTIONAL PROTOTYPICALITY CORESET — the
    * complement of s30's diversity traversal: within each IVF cluster,
    * keep the most PROTOTYPICAL vectors (highest cosine to their own
    * centroid — the pruning metric of Sorscher et al. NeurIPS'22's
    * "Beyond neural scaling laws"; SemDeDup's cousin), with the global
    * budget allocated to clusters proportionally to their mass
    * (quota_c = max(1, ⌊B·n_c/n⌋) — deterministic largest-floor
    * allocation, every cluster keeps at least its medoid). Output per
    * kept vector: cluster, in-cluster prototypicality rank, id, and
    * the e6 cosine to its centroid.
    *
    * Scale notes (100 TB): centroid assignment is the s2 zero-exchange
    * narrow projection over the literal codebook; the in-cluster rank,
    * the cluster census, and the quota filter all ride ONE hash
    * exchange on cluster (the two window frames share the partitioning
    * — plan-pinned ≤1 exchange). No global window anywhere; n is one
    * count action. Determinism: in-cluster order is the e6 fixed-point
    * cosine with vec_id tiebreak; the assignment argmax is the same
    * double ranking s2's oracle states. */
  def s32ProtoCoreset(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val n = e.count()
    val cents = sharedCodebook(s, d)
    val a = e.select(col("vec_id"),
        rankedCentroids(cents, col("embedding"), col("norm_fp")).as("rc"))
      .select(col("vec_id"),
        element_at(col("rc"), 1).getField("cid").as("cluster"),
        round((-element_at(col("rc"), 1).getField("neg_cos")) * 1e6)
          .cast("long").as("cos_e6"))
    val byProto = Window.partitionBy(col("cluster"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    val census = Window.partitionBy(col("cluster"))
    a.withColumn("rank", row_number().over(byProto).cast("long"))
      .withColumn("n_c", count(lit(1)).over(census))
      .filter(col("rank") <= greatest(lit(1L),
        call_function("div", lit(CoresetBudget.toLong) * col("n_c"), lit(n))))
      .select(col("cluster"), col("rank"), col("vec_id"), col("cos_e6"))
      .orderBy(col("cluster"), col("rank"))
  }

  /** How many outliers s33 reports. */
  val OutlierTopN = 20

  /** s33: kNN-DISTANCE OUTLIER SCORING — the classic distance-to-kth-
    * neighbor outlier definition (Ramaswamy, Rastogi & Shim,
    * SIGMOD'00): a vector whose k-th nearest neighbor is FAR sits in a
    * sparse region; the top-N by that score are the out-of-
    * distribution candidates a curation pipeline screens before
    * training (mislabeled scrapes, encoding junk, adversarial inserts
    * — the d12/s32 density family's opposite tail). Score = the e6
    * cosine to the k-th graph neighbor (k = [[GraphK]]), ascending =
    * most isolated; output the top [[OutlierTopN]] with their k-th
    * neighbor pinned for auditability.
    *
    * Scale notes (100 TB): the score is a FILTER (rank = k) over the
    * kNN graph the engine already maintains — exact (s22) here at
    * gate scale; at production scale the IVF-pruned s23 graph or its
    * continuously-maintained store serve the same filter with no new
    * machinery. The top-N cut is a TakeOrdered reduction
    * (per-partition top-N, driver merge) — no global window, no
    * shuffle beyond the graph's own. Determinism: (cos_e6 ASC, src)
    * total order, the oracle derived verbatim from the s22 statement. */
  private val exactGraphCache = SessionCaches.newCache()

  /** The exact kNN graph as a STANDING registry stage (n·GraphK rows,
    * a pure function of the corpus) — s33 adopts it instead of
    * re-running s22's all-pairs scan; s22 itself keeps its own
    * uncached plan (its spec pins the plan shape), exactly the
    * rung/ivfgraph discipline. */
  private def sharedExactGraph(s: SparkSession, d: String): DataFrame =
    SessionCaches.getOrBuild(exactGraphCache, s, d)(
      Warehouse.standingTable(s, "graft_exactgraph", d) { t =>
        Warehouse.writeStanding(s22KnnGraph(s, d), t, Seq("src"),
          nBuckets = 4)
      })

  def s33KnnOutliers(s: SparkSession, d: String): DataFrame = {
    val picked = sharedExactGraph(s, d)
      .filter(col("rank") === GraphK.toLong)
      .orderBy(col("cos_e6").asc, col("src"))
      .limit(OutlierTopN)
      .select(col("src"), col("nid"), col("cos_e6"))
      .collect()
    val rows = picked.zipWithIndex.toSeq.map { case (r, i) =>
      (i + 1L, r.getLong(0), r.getLong(1), r.getLong(2)) }
    val sp = s
    import sp.implicits._
    rows.toDF("rank", "vec_id", "kth_nid", "kth_cos_e6")
      .orderBy(col("rank"))
  }

  /** RRF smoothing constant — k = 60, the value the method's paper
    * (Cormack, Clarke, Buettcher 2009) fixed and every production
    * hybrid-search engine ships as the default. */
  val RrfK = 60L

  /** s34: HYBRID RETRIEVAL FUSION — reciprocal-rank fusion of the two
    * retrieval axes this library already gates: x17's BM25 (sparse,
    * lexical) and the exact kNN graph (dense, embedding), the standard
    * hybrid-search recipe. Per test-split doc, each rung contributes
    * ⌊1e6 / (k + rank)⌋ per candidate (k = [[RrfK]]; a candidate
    * missing from a rung contributes nothing), candidates merge on a
    * FULL outer join and re-rank by (rrf_e6 desc, cand). Rank
    * arithmetic is integer, so fusion is bit-reproducible and the
    * DuckDB oracle restates it from the SAME component statements
    * (x17's CTE chain verbatim via [[TextAnalysis.Bm25Cte]], the s22
    * graph chain verbatim).
    *
    * Scale notes (100 TB): both rungs are pay-once artifacts — BM25
    * postings join broadcast idf, the dense rung ADOPTS the standing
    * exact-kNN-graph table (production swaps in the s23 IVF graph,
    * same shape); fusion itself moves only rung rows (queries × k per
    * rung), never the corpus, and the per-query windows are k-bounded.
    * The vec_id ↔ doc_id identity is the m17 cross-modal alignment. */
  def s34HybridRrf(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val sparse = TextAnalysis.x17Bm25(s, d)
      .select(col("test_doc").as("q"), col("train_doc").as("c"),
        col("rank").as("r_sparse"))
    // the same per-doc split gate as x17 (hashBucket over doc_id)
    val sp = documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.hashBucket(col("doc_id").cast("string")).as("bk"))
      .select(col("doc_id"),
        when(col("bk") < 80L, "train").when(col("bk") < 90L, "val")
          .otherwise("test").as("split"))
    val dense = sharedExactGraph(s, d)
      .join(sp.filter(col("split") === "test")
        .select(col("doc_id").as("src")), Seq("src"))
      .join(sp.filter(col("split") === "train")
        .select(col("doc_id").as("nid")), Seq("nid"))
      .withColumn("r_dense", row_number().over(
        w.partitionBy(col("src")).orderBy(col("cos_e6").desc, col("nid")))
        .cast("long"))
      .select(col("src").as("q"), col("nid").as("c"), col("r_dense"))
    sparse.join(dense, Seq("q", "c"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(idiv(lit(1000000L), lit(RrfK) + col("r_sparse")), lit(0L)) +
          coalesce(idiv(lit(1000000L), lit(RrfK) + col("r_dense")), lit(0L)))
      .withColumn("rank", row_number().over(
        w.partitionBy(col("q")).orderBy(col("rrf_e6").desc, col("c")))
        .cast("long"))
      .select(col("q").as("test_doc"), col("rank"), col("c").as("cand_doc"),
        col("rrf_e6"), col("r_sparse"), col("r_dense"))
      .orderBy(col("test_doc"), col("rank"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s34_hybrid_rrf"  -> s34HybridRrf _,
    "s1_knn_brute"    -> s1KnnBrute _,
    "s2_knn_ivf"      -> s2KnnIvf _,
    "s3_cosine_pairs" -> s3CosinePairs _,
    "s4_knn_sign_lsh" -> s4KnnSignLsh _,
    "s5_quant_knn"    -> s5QuantKnn _,
    "s6_knn_pq"       -> s6KnnPq _,
    "s7_knn_classify" -> s7KnnClassify _,
    "s8_knn_ivfpq"    -> s8KnnIvfPq _,
    "s11_ivf_rerank"  -> s11IvfRerank _,
    "s12_mips_ivf"    -> s12MipsIvf _,
    "s13_ivf_sq"      -> s13KnnIvfSq _,
    "s14_knn_rp"      -> s14KnnRp _,
    "s15_hard_neg"    -> s15HardNegatives _,
    "s16_mrl_rerank"  -> s16MrlRerank _,
    "s17_filtered_knn" -> s17FilteredKnn _,
    "s18_recall_ladder" -> s18RecallLadder _,
    "s19_knn_opq"     -> s19KnnOpq _,
    "s20_kmeans_round" -> s20KmeansRound _,
    "s21_silhouette" -> s21Silhouette _,
    "s22_knn_graph" -> s22KnnGraph _,
    "s23_knn_graph_ivf" -> s23KnnGraphIvf _,
    "s24_nn_descent" -> s24NnDescent _,
    "s25_kmeans_train" -> s25KmeansTrain _,
    "s26_nn_descent2" -> s26NnDescent2 _,
    "s27_graph_search" -> s27GraphSearch _,
    "s28_mmr_rerank" -> s28MmrRerank _,
    "s29_knn_ivfpq_residual" -> s29KnnIvfPqResidual _,
    "s30_kcenter"     -> s30KCenterCoreset _,
    "s31_retrieval_metrics" -> s31RetrievalMetrics _,
    "s32_proto_coreset" -> s32ProtoCoreset _,
    "s33_knn_outliers" -> s33KnnOutliers _,
    "d12_semdedup"    -> d12SemDedup _,
    "d18_semdedup_capped" -> d18SemdedupCapped _,
    "s9_knn_mips"     -> s9KnnMips _,
    "s10_radius"      -> s10RadiusSearch _,
    "d7_embed_clusters" -> d7EmbedClusters _,
    "s35_range_lsh"     -> s35RangeLsh _,
    "s36_range_recall"  -> s36RangeRecall _,
  )

  /** Oracle fixed-point dot product between embedding lists (1-based
    * DuckDB list indexing). */
  private def oDot(a: String, b: String): String =
    s"""CAST(coalesce(list_sum(list_transform(range(1, len($a) + 1),
       |      i -> CAST(round($a[i]::DOUBLE * $b[i]::DOUBLE * 1e9) AS BIGINT))), 0) AS BIGINT)""".stripMargin

  private def oCos(dot: String, na: String, nb: String): String =
    s"$dot::DOUBLE / (sqrt($na::DOUBLE) * sqrt($nb::DOUBLE))"

  private val NormCte =
    s"""WITH e AS (SELECT vec_id, embedding,
       |    ${oDot("embedding", "embedding")} AS norm_fp
       |  FROM embeddings)""".stripMargin

  /** The s23 IVF-graph CTE chain through `r` (ranked co-clustered
    * candidates for EVERY vector) — shared by the s23 and s24 oracles
    * so refinement can never drift from the graph it refines. */
  private lazy val IvfGraphCte =
    NormCte +
      s"""
         |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
         |  FROM e WHERE vec_id < $NCentroids),
         |assigned AS (SELECT vec_id, embedding, norm_fp, cluster FROM (
         |  SELECT e.vec_id, e.embedding, e.norm_fp, cent.cid AS cluster,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
         |      cent.cid) AS arank
         |  FROM e CROSS JOIN cent) WHERE arank = 1),
         |probes AS (SELECT src, q_emb, q_norm, cluster FROM (
         |  SELECT q.vec_id AS src, q.embedding AS q_emb, q.norm_fp AS q_norm,
         |    cent.cid AS cluster,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      ${oCos(oDot("q.embedding", "cent.c_emb"), "q.norm_fp", "cent.c_norm")} DESC,
         |      cent.cid) AS prank
         |  FROM e q CROSS JOIN cent) WHERE prank <= $NProbe),
         |scored AS (SELECT p.src, a.vec_id AS nid,
         |    CAST(round(${oCos(oDot("p.q_emb", "a.embedding"),
                "p.q_norm", "a.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
         |  FROM probes p JOIN assigned a ON p.cluster = a.cluster
         |  WHERE p.src <> a.vec_id),
         |r AS (SELECT src, nid, cos_e6,
         |    CAST(row_number() OVER (PARTITION BY src
         |      ORDER BY cos_e6 DESC, nid) AS BIGINT) AS rank
         |  FROM scored)""".stripMargin

  /** One NN-descent round as SQL CTEs over a ranked graph CTE `rIn`
    * (src, nid, cos_e6, rank): cut to [[GraphK]], expand G ∪ G∘G ∪ Gᵀ,
    * re-score exactly, re-rank as `r$sfx` — ONE template for the s24
    * and s26 oracles, so a deeper unroll can never drift from the
    * single round it composes. */
  private def oNnRound(rIn: String, sfx: String): String =
    s"""
       |, g$sfx AS (SELECT src, nid FROM $rIn WHERE rank <= $GraphK),
       |cand$sfx AS (SELECT src, nid FROM g$sfx
       |  UNION SELECT g1.src, g2.nid FROM g$sfx g1 JOIN g$sfx g2
       |    ON g1.nid = g2.src AND g1.src <> g2.nid
       |  UNION SELECT nid AS src, src AS nid FROM g$sfx),
       |sc$sfx AS (SELECT c.src, c.nid,
       |    CAST(round(${oCos(oDot("q.embedding", "n.embedding"),
              "q.norm_fp", "n.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
       |  FROM cand$sfx c JOIN e q ON q.vec_id = c.src
       |    JOIN e n ON n.vec_id = c.nid),
       |r$sfx AS (SELECT src, nid, cos_e6,
       |    CAST(row_number() OVER (PARTITION BY src
       |      ORDER BY cos_e6 DESC, nid) AS BIGINT) AS rank
       |  FROM sc$sfx)""".stripMargin

  /** Plane h's ±1 weights as a DuckDB list literal — same driver-side
    * derivation the Spark plan embeds, so both engines hash against
    * byte-identical constants. */
  private def oPlane(h: Int): String =
    planeWeights(h).map(w => if (w > 0) "1.0" else "-1.0")
      .mkString("([", ",", "])")

  /** NPlanes-bit sign signature of `emb` as a '0'/'1' string, mirroring
    * the Spark-side `sigBit` concat. */
  private def oBucket(emb: String): String =
    (0 until NPlanes).map { h =>
      s"(CASE WHEN ${oDot(emb, oPlane(h))} >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** The s35 multiprobe range-search statement at probe radius 1 or 2
    * — ONE template, so the gated s35 row and s36's radius rungs can
    * never restate different chains. Probe keys per query: the
    * identity bucket, every 1-bit flip (lambda over i), and at radius
    * 2 every 2-bit flip (i < j; the middle substr carries the
    * unflipped span, so positions never shift). */
  private def rangeLshOracle(radius: Int): String = {
    require(radius == 1 || radius == 2)
    // single-line fragments ON PURPOSE: these embed into the outer
    // stripMargin template, which would eat a leading "||" on an
    // embedded line as a margin marker and leave a bare '|' operator
    def flipCase(i: String): String =
      s"(CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END)"
    val flip1 =
      s"substr(bucket, 1, i - 1) || ${flipCase("i")} || substr(bucket, i + 1)"
    val keys1 =
      s"list_prepend(bucket, list_transform(range(1, $NPlanes + 1), i -> $flip1))"
    val flip2 = s"substr(bucket, 1, i - 1) || ${flipCase("i")} || " +
      s"substr(bucket, i + 1, j - i - 1) || ${flipCase("j")} || " +
      "substr(bucket, j + 1)"
    val keys =
      if (radius == 1) keys1
      else s"list_concat($keys1, flatten(list_transform(" +
        s"range(1, $NPlanes + 1), i -> list_transform(" +
        s"range(i + 1, $NPlanes + 1), j -> $flip2))))"
    NormCte +
      s"""
         |, eb AS (SELECT vec_id, embedding, norm_fp,
         |    ${oBucket("embedding")} AS bucket
         |  FROM e),
         |p AS (SELECT vec_id AS qid, q_emb, q_norm, unnest(pk) AS bucket
         |  FROM (SELECT vec_id, embedding AS q_emb, norm_fp AS q_norm,
         |    $keys AS pk
         |  FROM eb WHERE vec_id < $NQueries)),
         |scored AS (SELECT p.qid, c.vec_id AS nid,
         |    CAST(round(${oCos(oDot("p.q_emb", "c.embedding"),
              "p.q_norm", "c.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
         |  FROM eb c JOIN p ON c.bucket = p.bucket AND p.qid <> c.vec_id)
         |SELECT qid, nid, cos_e6 FROM scored
         |WHERE cos_e6 >= $RadiusE6
         |ORDER BY qid, cos_e6 DESC, nid""".stripMargin
  }

  /** Shared s8/s11 candidate pipeline: IVF probe + PQ ADC scoring,
    * as the WITH-prefix through `scored(qid, nid, cos)` — s8 ranks it
    * directly; s11 widens the cut and reranks exactly. */
  /** The IVF+PQ oracle PREFIX through `pcentn` — the coarse codebook,
    * assignment/probe windows and PQ sub-codebook shared by the s8
    * (no-residual) and s29 (residual) entries, so the two forms can
    * only differ where the published index does: encode, recon, ADC. */
  private def oIvfPqBase: String =
    s"""WITH e AS (SELECT vec_id, embedding,
         |    ${oDot("embedding", "embedding")} AS norm_fp
         |  FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
         |  FROM e WHERE vec_id < $NCentroids),
         |assigned AS (SELECT vec_id, cluster FROM (
         |  SELECT e.vec_id, cent.cid AS cluster,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
         |      cent.cid) AS arank
         |  FROM e CROSS JOIN cent) WHERE arank = 1),
         |probes AS (SELECT qid, q_emb, q_norm, cluster FROM (
         |  SELECT q.vec_id AS qid, q.embedding AS q_emb, q.norm_fp AS q_norm,
         |    cent.cid AS cluster,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      ${oCos(oDot("q.embedding", "cent.c_emb"), "q.norm_fp", "cent.c_norm")} DESC,
         |      cent.cid) AS prank
         |  FROM e q CROSS JOIN cent WHERE q.vec_id < $NQueries) WHERE prank <= $NProbe),
         |sub AS (SELECT unnest(range(0, $PqSubs)) AS s),
         |pcent AS (SELECT c.vec_id AS k, sub.s,
         |    c.embedding[sub.s*$PqSubDim+1 : sub.s*$PqSubDim+$PqSubDim] AS cemb
         |  FROM e c CROSS JOIN sub WHERE c.vec_id < $PqK),
         |pcentn AS (SELECT k, s, cemb, ${oDot("cemb", "cemb")} AS cnorm FROM pcent)""".stripMargin

  private def oIvfPqScored: String =
    oIvfPqBase +
      s""",
         |xs AS (SELECT vec_id, sub.s,
         |    embedding[sub.s*$PqSubDim+1 : sub.s*$PqSubDim+$PqSubDim] AS xemb
         |  FROM e CROSS JOIN sub),
         |codes AS (SELECT vec_id, s, k AS code, cnorm FROM (
         |    SELECT xs.vec_id, xs.s, pcentn.k, pcentn.cnorm,
         |      row_number() OVER (PARTITION BY xs.vec_id, xs.s ORDER BY
         |        (${oDot("xemb", "xemb")} - 2 * ${oDot("xemb", "cemb")} + cnorm),
         |        pcentn.k) AS rk
         |    FROM xs JOIN pcentn ON xs.s = pcentn.s) WHERE rk = 1),
         |rn AS (SELECT vec_id, CAST(sum(cnorm) AS BIGINT) AS recon_norm
         |  FROM codes GROUP BY vec_id),
         |adc AS (SELECT p.qid, a.vec_id AS nid, p.q_norm,
         |    CAST(sum(${oDot(s"(p.q_emb[codes.s*$PqSubDim+1 : codes.s*$PqSubDim+$PqSubDim])", "pcentn.cemb")}) AS BIGINT) AS adot
         |  FROM probes p JOIN assigned a ON p.cluster = a.cluster
         |    AND p.qid <> a.vec_id
         |  JOIN codes ON codes.vec_id = a.vec_id
         |  JOIN pcentn ON pcentn.s = codes.s AND pcentn.k = codes.code
         |  GROUP BY p.qid, a.vec_id, p.q_norm),
         |scored AS (SELECT adc.qid, adc.nid,
         |    adc.adot::DOUBLE / (sqrt(adc.q_norm::DOUBLE) * sqrt(rn.recon_norm::DOUBLE)) AS cos
         |  FROM adc JOIN rn ON rn.vec_id = adc.nid)""".stripMargin

  /** d12/d18 shared oracle: s2's assignment + within-cluster exact
    * pairs + d6's recursive component closure, min-id representative.
    * With `maxCluster` set, the pair CTE restates the engine's
    * sub-sharding exactly: cluster sizes → ⌈n/cap⌉ shards →
    * [[shardHash]] (md5-prefix, `('0x'||substr(md5(id),1,4))::BIGINT`
    * in DuckDB) mod shards, pairs within (cluster, shard) only. One
    * template for both rows so capped and uncapped can never drift. */
  private def semDedupOracle(maxCluster: Option[Int]): String = {
    val keyedCte = maxCluster match {
      case None => "keyed AS (SELECT *, 0 AS shard FROM assigned),"
      case Some(cap) =>
        s"""szc AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cl_n
           |  FROM assigned GROUP BY cluster),
           |keyed AS (SELECT a.*, CASE WHEN szc.cl_n <= $cap THEN 0
           |    ELSE (('0x' || substr(md5(a.vec_id::VARCHAR), 1, 4))::BIGINT)
           |      % ((szc.cl_n + $cap - 1) // $cap) END AS shard
           |  FROM assigned a JOIN szc USING (cluster)),""".stripMargin
    }
    NormCte.replace("WITH ", "WITH RECURSIVE ") +
      s"""
         |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
         |  FROM e WHERE vec_id < $NCentroids),
         |assigned AS (SELECT vec_id, embedding, norm_fp, cluster FROM (
         |  SELECT e.vec_id, e.embedding, e.norm_fp, cent.cid AS cluster,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
         |      cent.cid) AS arank
         |  FROM e CROSS JOIN cent) WHERE arank = 1),
         |$keyedCte
         |p AS (SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM keyed x JOIN keyed y
         |    ON x.cluster = y.cluster AND x.shard = y.shard AND x.vec_id < y.vec_id
         |  WHERE ${oCos(oDot("x.embedding", "y.embedding"), "x.norm_fp", "y.norm_fp")} > $SemTau),
         |ee AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
         |reach(src, dst) AS (
         |  SELECT vec_id, vec_id FROM assigned
         |  UNION
         |  SELECT r.src, ee.v FROM reach r JOIN ee ON r.dst = ee.u),
         |comp AS (SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS rep
         |  FROM reach GROUP BY src)
         |SELECT a2.vec_id, CAST(a2.cluster AS BIGINT) AS cluster, comp.rep,
         |  CAST(CASE WHEN a2.vec_id = comp.rep THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM assigned a2 JOIN comp ON a2.vec_id = comp.vec_id
         |ORDER BY a2.vec_id""".stripMargin
  }

  /** s6/s19 shared PQ oracle: stand-in sub-codebooks from the source's
    * low vec_ids, per-(vector, subspace) codes by the (fixed-point L2,
    * code) window argmin, ADC scoring, top-k. `src` names the relation
    * providing (vec_id, embedding); `prelude` CTEs (possibly deriving
    * `src` itself — the s19 rotation chain) run first. One template so
    * the plain and rotated rows cannot drift. */
  private def pqOracle(prelude: String, src: String): String =
    s"""WITH ${prelude}e AS (SELECT vec_id, embedding,
       |    ${oDot("embedding", "embedding")} AS norm_fp
       |  FROM $src),
       |sub AS (SELECT unnest(range(0, $PqSubs)) AS s),
       |cent AS (SELECT c.vec_id AS k, sub.s,
       |    c.embedding[sub.s*$PqSubDim+1 : sub.s*$PqSubDim+$PqSubDim] AS cemb
       |  FROM e c CROSS JOIN sub WHERE c.vec_id < $PqK),
       |centn AS (SELECT k, s, cemb, ${oDot("cemb", "cemb")} AS cnorm FROM cent),
       |xs AS (SELECT vec_id, sub.s,
       |    embedding[sub.s*$PqSubDim+1 : sub.s*$PqSubDim+$PqSubDim] AS xemb
       |  FROM e CROSS JOIN sub),
       |codes AS (SELECT vec_id, s, k AS code, cnorm FROM (
       |    SELECT xs.vec_id, xs.s, centn.k, centn.cnorm,
       |      row_number() OVER (PARTITION BY xs.vec_id, xs.s ORDER BY
       |        (${oDot("xemb", "xemb")} - 2 * ${oDot("xemb", "cemb")} + cnorm),
       |        centn.k) AS rk
       |    FROM xs JOIN centn ON xs.s = centn.s) WHERE rk = 1),
       |rn AS (SELECT vec_id, CAST(sum(cnorm) AS BIGINT) AS recon_norm
       |  FROM codes GROUP BY vec_id),
       |q AS (SELECT vec_id AS qid, embedding AS qemb, norm_fp AS qnorm
       |  FROM e WHERE vec_id < $NQueries),
       |adc AS (SELECT q.qid, codes.vec_id AS nid, q.qnorm,
       |    CAST(sum(${oDot(s"(q.qemb[codes.s*$PqSubDim+1 : codes.s*$PqSubDim+$PqSubDim])", "centn.cemb")}) AS BIGINT) AS adot
       |  FROM q CROSS JOIN codes
       |  JOIN centn ON centn.s = codes.s AND centn.k = codes.code
       |  WHERE q.qid <> codes.vec_id
       |  GROUP BY q.qid, codes.vec_id, q.qnorm),
       |scored AS (SELECT adc.qid, adc.nid,
       |    adc.adot::DOUBLE / (sqrt(adc.qnorm::DOUBLE) * sqrt(rn.recon_norm::DOUBLE)) AS cos
       |  FROM adc JOIN rn ON rn.vec_id = adc.nid),
       |r AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
       |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
       |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  /** s19's rotation prelude: the [[opqPermutation]] statistics and
    * snake allocation restated in SQL — exact HUGEINT variance
    * surrogates, rank window (desc, dim asc), snake bucket, and the
    * permuted corpus as the `rot` relation [[pqOracle]] consumes. */
  private def opqPrelude: String =
    s"""dims AS (SELECT unnest(range(1, $Dim + 1)) AS j),
       |st AS (SELECT dims.j,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(coalesce(sum(CAST(round(embedding[dims.j]::DOUBLE * embedding[dims.j]::DOUBLE * 1e9) AS BIGINT)), 0) AS BIGINT) AS s2,
       |    CAST(coalesce(sum(CAST(round(embedding[dims.j]::DOUBLE * 1e6) AS BIGINT)), 0) AS BIGINT) AS s1
       |  FROM embeddings CROSS JOIN dims GROUP BY dims.j),
       |vr AS (SELECT j,
       |    n::HUGEINT * s2::HUGEINT * 1000 - s1::HUGEINT * s1::HUGEINT AS vstat
       |  FROM st),
       |rnk AS (SELECT j, row_number() OVER (ORDER BY vstat DESC, j) - 1 AS r FROM vr),
       |asn AS (SELECT j, r,
       |    CASE WHEN r % ${2 * PqSubs} < $PqSubs THEN r % ${2 * PqSubs}
       |      ELSE ${2 * PqSubs - 1} - (r % ${2 * PqSubs}) END AS bucket
       |  FROM rnk),
       |np AS (SELECT j, bucket * $PqSubDim +
       |    row_number() OVER (PARTITION BY bucket ORDER BY r) - 1 AS newpos
       |  FROM asn),
       |perm AS (SELECT list(j ORDER BY newpos) AS p FROM np),
       |rot AS (SELECT vec_id,
       |    list_transform(range(1, $Dim + 1), i -> embedding[p[i]]) AS embedding
       |  FROM embeddings CROSS JOIN perm),
       |""".stripMargin

  /** s31's oracle: like s18's, it DERIVES from the s1 + method oracle
    * statements verbatim (each a CTE), then states the identical
    * integer NDCG/MRR chain — shared literal discount table, explicit
    * integer division, misses counted as zero through the nq divisor. */
  private def retrievalMetricsOracle(base: Map[String, String]): String = {
    val methods = Seq(
      ("jl_rp16", "s14_knn_rp"), ("mrl_rerank", "s16_mrl_rerank"),
      ("pq8", "s6_knn_pq"), ("opq_pq8", "s19_knn_opq"),
      ("ivfpq_residual", "s29_knn_ivfpq_residual"))
    val disc = NdcgDiscE3.zipWithIndex
      .map { case (dc, i) => s"WHEN ${i + 1} THEN $dc" }
      .mkString("CASE m_rank ", " ", " END")
    val nqSub = "(SELECT count(DISTINCT qid) FROM ex)"
    val ctes = methods.map { case (m, key) =>
      s"""a_$m AS (${base(key)}),
         |j_$m AS (SELECT ex.qid, ex.rank AS ex_rank, a.rank AS m_rank
         |  FROM ex JOIN a_$m a ON ex.qid = a.qid AND ex.nid = a.nid),
         |p_$m AS (SELECT qid,
         |    sum(($TopK + 1 - ex_rank) * 1000000000 // ($disc)) AS dcg_e6,
         |    max(CASE WHEN ex_rank = 1 THEN 1000000 // m_rank ELSE 0 END) AS rr_e6
         |  FROM j_$m GROUP BY qid),
         |r_$m AS (SELECT '$m' AS method,
         |    CAST(coalesce(sum(rr_e6), 0) // $nqSub AS BIGINT) AS mrr_e6,
         |    CAST(coalesce(sum(dcg_e6 * 1000000 // $IdcgE6), 0) // $nqSub
         |      AS BIGINT) AS ndcg_e6
         |  FROM p_$m)""".stripMargin
    }.mkString(",\n")
    val unions = methods.map { case (m, _) => s"SELECT * FROM r_$m" }
      .mkString(" UNION ALL ")
    s"""WITH ex AS (${base("s1_knn_brute")}),
       |$ctes
       |SELECT method, mrr_e6, ndcg_e6 FROM ($unions) ORDER BY method"""
      .stripMargin
  }

  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // s18's oracle DERIVES from the s1/s14/s16 entries verbatim (each
    // full statement becomes a CTE), so the ladder can never drift
    // from the rankings it measures
    base + ("s31_retrieval_metrics" -> retrievalMetricsOracle(base)) +
      // s33 derives verbatim from the s22 statement: the k-th-neighbor
      // rows, cut to the top-N most isolated in (cos ASC, src) order
      ("s33_knn_outliers" ->
        s"""WITH g AS (${base("s22_knn_graph")}),
           |kth AS (SELECT src, nid, cos_e6 FROM g WHERE rank = $GraphK),
           |top AS (SELECT src, nid, cos_e6 FROM kth
           |  ORDER BY cos_e6 ASC, src LIMIT $OutlierTopN)
           |SELECT CAST(row_number() OVER (ORDER BY cos_e6 ASC, src)
           |    AS BIGINT) AS rank,
           |  src AS vec_id, nid AS kth_nid, cos_e6 AS kth_cos_e6
           |FROM top ORDER BY rank""".stripMargin) +
      ("s18_recall_ladder" ->
      s"""WITH ex AS (${base("s1_knn_brute")}),
         |a AS (${base("s14_knn_rp")}),
         |b AS (${base("s16_mrl_rerank")}),
         |c AS (${base("s6_knn_pq")}),
         |dq AS (${base("s19_knn_opq")}),
         |rv AS (${base("s29_knn_ivfpq_residual")}),
         |ladder AS (
         |  SELECT 'jl_rp16' AS method,
         |    (SELECT count(*) FROM ex) AS n_exact,
         |    (SELECT count(*) FROM ex JOIN a
         |       ON ex.qid = a.qid AND ex.nid = a.nid) AS n_hit
         |  UNION ALL
         |  SELECT 'mrl_rerank',
         |    (SELECT count(*) FROM ex),
         |    (SELECT count(*) FROM ex JOIN b
         |       ON ex.qid = b.qid AND ex.nid = b.nid)
         |  UNION ALL
         |  SELECT 'pq8',
         |    (SELECT count(*) FROM ex),
         |    (SELECT count(*) FROM ex JOIN c
         |       ON ex.qid = c.qid AND ex.nid = c.nid)
         |  UNION ALL
         |  SELECT 'opq_pq8',
         |    (SELECT count(*) FROM ex),
         |    (SELECT count(*) FROM ex JOIN dq
         |       ON ex.qid = dq.qid AND ex.nid = dq.nid)
         |  UNION ALL
         |  SELECT 'ivfpq_residual',
         |    (SELECT count(*) FROM ex),
         |    (SELECT count(*) FROM ex JOIN rv
         |       ON ex.qid = rv.qid AND ex.nid = rv.nid))
         |SELECT method, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST(n_hit * 1000000 // n_exact AS BIGINT) AS recall_e6
         |FROM ladder ORDER BY method""".stripMargin) +
      // s36 derives verbatim from the s10 and s35 statements (plus the
      // radius-2 instantiation of the SAME s35 template): the range
      // rungs are exact-verified subsets of the ε-ball, so recall is a
      // pure count ratio
      ("s36_range_recall" ->
        s"""WITH ex AS (${base("s10_radius")}),
           |r1 AS (${base("s35_range_lsh")}),
           |r2 AS (${rangeLshOracle(2)}),
           |ladder AS (
           |  SELECT 1 AS probe_radius,
           |    (SELECT count(*) FROM ex) AS n_exact,
           |    (SELECT count(*) FROM r1) AS n_hit
           |  UNION ALL
           |  SELECT 2, (SELECT count(*) FROM ex), (SELECT count(*) FROM r2))
           |SELECT CAST(probe_radius AS BIGINT) AS probe_radius,
           |  CAST(n_exact AS BIGINT) AS n_exact,
           |  CAST(n_hit AS BIGINT) AS n_hit,
           |  CAST(n_hit * 1000000 // n_exact AS BIGINT) AS recall_e6
           |FROM ladder ORDER BY probe_radius""".stripMargin)
  }

  /** s30's oracle: the greedy farthest-point recurrence UNROLLED as a
    * CTE chain (cents_r = cents_{r-1} ∪ argmin of the max e6 cosine to
    * cents_{r-1}, vec_id tiebreak) — the same integer order the engine
    * states, one CTE pair per round. */
  private def kcenterOracle: String = {
    val rounds = (2 to KCenterK).map { r =>
      val p = r - 1
      s"""
         |, m$r AS (SELECT e.vec_id,
         |    max(CAST(round(${oCos(oDot("e.embedding", "c.embedding"),
                "e.norm_fp", "c.norm_fp")} * 1e6) AS BIGINT)) AS mx
         |  FROM e, cents$p c
         |  WHERE e.vec_id NOT IN (SELECT vec_id FROM cents$p)
         |  GROUP BY e.vec_id),
         |sel$r AS (SELECT vec_id, mx FROM m$r ORDER BY mx ASC, vec_id LIMIT 1),
         |cents$r AS (SELECT * FROM cents$p UNION ALL
         |  SELECT CAST($r AS BIGINT), e.vec_id, e.embedding, e.norm_fp,
         |    CAST(1000000 - s.mx AS BIGINT)
         |  FROM e JOIN sel$r s USING (vec_id))""".stripMargin
    }.mkString
    NormCte +
      s"""
         |, cents1 AS (SELECT CAST(1 AS BIGINT) AS rank, vec_id, embedding,
         |    norm_fp, CAST(2000000 AS BIGINT) AS far_e6 FROM e WHERE vec_id = 0)
         |$rounds
         |SELECT rank, vec_id, far_e6 FROM cents$KCenterK ORDER BY rank""".stripMargin
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "s30_kcenter" -> kcenterOracle,
    // s2's double-ranked assignment argmax (also carrying the argmax
    // cosine), then the e6-ordered in-cluster window + the same
    // integer quota rule
    "s32_proto_coreset" ->
      (NormCte +
        s"""
           |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
           |  FROM e WHERE vec_id < $NCentroids),
           |a AS (SELECT vec_id, cluster, cos_e6 FROM (
           |  SELECT e.vec_id, cent.cid AS cluster,
           |    CAST(round(${oCos(oDot("e.embedding", "cent.c_emb"),
                  "e.norm_fp", "cent.c_norm")} * 1e6) AS BIGINT) AS cos_e6,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM e CROSS JOIN cent) WHERE arank = 1),
           |r AS (SELECT cluster,
           |    CAST(row_number() OVER (PARTITION BY cluster
           |      ORDER BY cos_e6 DESC, vec_id) AS BIGINT) AS rank,
           |    vec_id, cos_e6,
           |    count(*) OVER (PARTITION BY cluster) AS n_c
           |  FROM a)
           |SELECT cluster, rank, vec_id, cos_e6 FROM r
           |WHERE rank <= greatest(1, ($CoresetBudget * n_c) // (SELECT count(*) FROM e))
           |ORDER BY cluster, rank""".stripMargin),
    "s1_knn_brute" ->
      (NormCte +
        s"""
           |, scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    ${oCos(oDot("q.embedding", "c.embedding"), "q.norm_fp", "c.norm_fp")} AS cos
           |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // the identical multiprobe chain: sign buckets from the same plane
    // dots, the query's bucket plus each 1-bit flip as probe keys,
    // exact e6 cosine verify at s10's τ (one template per probe
    // radius — s36's radius-2 rung reuses it verbatim)
    "s35_range_lsh" -> rangeLshOracle(1),
    "s10_radius" ->
      (NormCte +
        s"""
           |, scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    CAST(round(${oCos(oDot("q.embedding", "c.embedding"),
                  "q.norm_fp", "c.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
           |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
           |SELECT qid, nid, cos_e6 FROM scored WHERE cos_e6 >= $RadiusE6
           |ORDER BY qid, cos_e6 DESC, nid""".stripMargin),
    "s9_knn_mips" ->
      (NormCte +
        s"""
           |, scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    ${oDot("q.embedding", "c.embedding")} AS dot_fp
           |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
           |r AS (SELECT qid, nid, dot_fp,
           |    row_number() OVER (PARTITION BY qid ORDER BY dot_fp DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, dot_fp
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    "s2_knn_ivf" ->
      (NormCte +
        s"""
           |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
           |  FROM e WHERE vec_id < $NCentroids),
           |assigned AS (SELECT vec_id, embedding, norm_fp, cluster FROM (
           |  SELECT e.vec_id, e.embedding, e.norm_fp, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM e CROSS JOIN cent) WHERE arank = 1),
           |probes AS (SELECT qid, q_emb, q_norm, cluster FROM (
           |  SELECT q.vec_id AS qid, q.embedding AS q_emb, q.norm_fp AS q_norm,
           |    cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |      ${oCos(oDot("q.embedding", "cent.c_emb"), "q.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS prank
           |  FROM e q CROSS JOIN cent WHERE q.vec_id < $NQueries) WHERE prank <= $NProbe),
           |scored AS (SELECT p.qid, a.vec_id AS nid,
           |    ${oCos(oDot("p.q_emb", "a.embedding"), "p.q_norm", "a.norm_fp")} AS cos
           |  FROM probes p JOIN assigned a ON p.cluster = a.cluster
           |  WHERE p.qid <> a.vec_id),
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // brute all-pairs, rank by the e6 fixed-point cosine (nid
    // tiebreak) — the same total order the engine's window states
    // the x17 chain verbatim (Bm25Cte, through ranked `r` with the
    // split CTE `sp`) + the s22 graph chain restated, fused by
    // integer reciprocal ranks on a full outer join
    "s34_hybrid_rrf" ->
      (graft.operators.TextAnalysis.Bm25Cte +
        s"""
           |, sparse AS (SELECT test_doc AS q, train_doc AS c,
           |    CAST(rank AS BIGINT) AS r_sparse
           |  FROM r WHERE rank <= ${graft.operators.TextAnalysis.Bm25TopK}),
           |e AS (SELECT vec_id, embedding,
           |    ${oDot("embedding", "embedding")} AS norm_fp FROM embeddings),
           |dscored AS (SELECT qv.vec_id AS src, cv.vec_id AS nid,
           |    CAST(round(${oCos(oDot("qv.embedding", "cv.embedding"),
                  "qv.norm_fp", "cv.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
           |  FROM e qv JOIN e cv ON qv.vec_id <> cv.vec_id),
           |dg AS (SELECT src, nid, cos_e6,
           |    row_number() OVER (PARTITION BY src
           |      ORDER BY cos_e6 DESC, nid) AS grank
           |  FROM dscored),
           |dtt AS (SELECT g.src, g.nid, g.cos_e6 FROM dg g
           |  JOIN sp st ON st.doc_id = g.src AND st.split = 'test'
           |  JOIN sp tr ON tr.doc_id = g.nid AND tr.split = 'train'
           |  WHERE g.grank <= $GraphK),
           |dense AS (SELECT src AS q, nid AS c,
           |    CAST(row_number() OVER (PARTITION BY src
           |      ORDER BY cos_e6 DESC, nid) AS BIGINT) AS r_dense
           |  FROM dtt),
           |fused AS (SELECT coalesce(s.q, d.q) AS q, coalesce(s.c, d.c) AS c,
           |    coalesce(1000000 // ($RrfK + s.r_sparse), 0) +
           |      coalesce(1000000 // ($RrfK + d.r_dense), 0) AS rrf_e6,
           |    s.r_sparse, d.r_dense
           |  FROM sparse s FULL JOIN dense d ON s.q = d.q AND s.c = d.c)
           |SELECT q AS test_doc,
           |  CAST(row_number() OVER (PARTITION BY q
           |    ORDER BY rrf_e6 DESC, c) AS BIGINT) AS rank,
           |  c AS cand_doc, rrf_e6, r_sparse, r_dense
           |FROM fused ORDER BY test_doc, rank""".stripMargin),
    "s22_knn_graph" ->
      (NormCte +
        s"""
           |, scored AS (SELECT q.vec_id AS src, c.vec_id AS nid,
           |    CAST(round(${oCos(oDot("q.embedding", "c.embedding"),
                  "q.norm_fp", "c.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
           |  FROM e q JOIN e c ON q.vec_id <> c.vec_id),
           |r AS (SELECT src, nid, cos_e6,
           |    CAST(row_number() OVER (PARTITION BY src
           |      ORDER BY cos_e6 DESC, nid) AS BIGINT) AS rank
           |  FROM scored)
           |SELECT src, rank, nid, cos_e6 FROM r WHERE rank <= $GraphK
           |ORDER BY src, rank""".stripMargin),
    // s2's assignment + probe lists for EVERY vector, candidates
    // restricted to probed clusters, the identical window cut
    "s23_knn_graph_ivf" ->
      (IvfGraphCte +
        s"""
           |SELECT src, rank, nid, cos_e6 FROM r WHERE rank <= $GraphK
           |ORDER BY src, rank""".stripMargin),
    // one NN-descent round DERIVED from the s23 CTE verbatim (the s18
    // derivation pattern): G ∪ G∘G ∪ Gᵀ re-scored exactly, same cut
    "s24_nn_descent" ->
      (IvfGraphCte + oNnRound("r", "2") +
        s"""
           |SELECT src, rank, nid, cos_e6 FROM r2 WHERE rank <= $GraphK
           |ORDER BY src, rank""".stripMargin),
    // TWO rounds from the SAME template — the refinement ITERATION
    // (nnDescent's composed step) pinned cross-engine, the s20→s25
    // one-composition-deeper pattern applied to s24
    "s26_nn_descent2" ->
      (IvfGraphCte + oNnRound("r", "2") + oNnRound("r2", "3") +
        s"""
           |SELECT src, rank, nid, cos_e6 FROM r3 WHERE rank <= $GraphK
           |ORDER BY src, rank""".stripMargin),
    // graph search DERIVED from the s23 CTE verbatim: seed with the
    // NEntry best codebook vectors (cid IS a corpus vec_id), two
    // beam-cut graph expansions, exact re-score of everything visited
    "s27_graph_search" ->
      (IvfGraphCte +
        s"""
           |, g AS (SELECT src, nid FROM r WHERE rank <= $GraphK),
           |f0 AS (SELECT qid, cid AS nid FROM (
           |  SELECT q.vec_id AS qid, cent.cid,
           |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |      ${oCos(oDot("q.embedding", "cent.c_emb"),
                  "q.norm_fp", "cent.c_norm")} DESC, cent.cid) AS erank
           |  FROM e q CROSS JOIN cent WHERE q.vec_id < $NQueries)
           |  WHERE erank <= $NEntry),
           |v1 AS (SELECT qid, nid FROM f0 WHERE qid <> nid
           |  UNION SELECT f0.qid, g.nid FROM f0 JOIN g ON g.src = f0.nid
           |    WHERE f0.qid <> g.nid),
           |sc1 AS (SELECT v.qid, v.nid,
           |    CAST(round(${oCos(oDot("q.embedding", "n.embedding"),
                  "q.norm_fp", "n.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
           |  FROM v1 v JOIN e q ON q.vec_id = v.qid
           |    JOIN e n ON n.vec_id = v.nid),
           |b1 AS (SELECT qid, nid FROM (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY cos_e6 DESC, nid) AS brank FROM sc1)
           |  WHERE brank <= $NEntry),
           |v2 AS (SELECT qid, nid FROM v1
           |  UNION SELECT b1.qid, g.nid FROM b1 JOIN g ON g.src = b1.nid
           |    WHERE b1.qid <> g.nid),
           |sc2 AS (SELECT v.qid, v.nid,
           |    CAST(round(${oCos(oDot("q.embedding", "n.embedding"),
                  "q.norm_fp", "n.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
           |  FROM v2 v JOIN e q ON q.vec_id = v.qid
           |    JOIN e n ON n.vec_id = v.nid),
           |res AS (SELECT qid, nid, cos_e6,
           |    CAST(row_number() OVER (PARTITION BY qid
           |      ORDER BY cos_e6 DESC, nid) AS BIGINT) AS rank FROM sc2)
           |SELECT qid, rank, nid, cos_e6 FROM res WHERE rank <= $GraphK
           |ORDER BY qid, rank""".stripMargin),
    // the greedy MMR loop unrolled as three argmax windows (the
    // s25/s26 unroll pattern): identical pool, pairwise-sim and
    // integer 7·cos − 3·penalty scoring in both engines
    "s28_mmr_rerank" ->
      (NormCte +
        s"""
           |, sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    CAST(round(${oCos(oDot("q.embedding", "c.embedding"),
                  "q.norm_fp", "c.norm_fp")} * 1e6) AS BIGINT) AS cos_e6
           |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
           |  WHERE q.vec_id < $NQueries),
           |pool AS (SELECT qid, nid, cos_e6 FROM (SELECT qid, nid, cos_e6,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY cos_e6 DESC, nid) AS pr FROM sc) WHERE pr <= $MmrPool),
           |ps AS (SELECT pa.qid, pa.nid AS a, pb.nid AS b,
           |    CAST(round(${oCos(oDot("ea.embedding", "eb.embedding"),
                  "ea.norm_fp", "eb.norm_fp")} * 1e6) AS BIGINT) AS sim_e6
           |  FROM pool pa JOIN pool pb ON pa.qid = pb.qid AND pa.nid <> pb.nid
           |  JOIN e ea ON ea.vec_id = pa.nid JOIN e eb ON eb.vec_id = pb.nid),
           |p1 AS (SELECT qid, nid, cos_e6, CAST(0 AS BIGINT) AS penalty_e6,
           |    $MmrLambda10 * cos_e6 AS mmr_x10_e6
           |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY $MmrLambda10 * cos_e6 DESC, nid) AS rk FROM pool)
           |  WHERE rk = 1),
           |pen2 AS (SELECT ps.qid, ps.a AS nid,
           |    CAST(max(ps.sim_e6) AS BIGINT) AS penalty_e6
           |  FROM ps JOIN p1 ON p1.qid = ps.qid AND p1.nid = ps.b
           |  GROUP BY ps.qid, ps.a),
           |c2 AS (SELECT pool.qid, pool.nid, pool.cos_e6, pen2.penalty_e6,
           |    $MmrLambda10 * pool.cos_e6
           |      - ${10L - MmrLambda10} * pen2.penalty_e6 AS mmr_x10_e6
           |  FROM pool JOIN pen2 ON pen2.qid = pool.qid AND pen2.nid = pool.nid
           |  WHERE NOT EXISTS (SELECT 1 FROM p1
           |    WHERE p1.qid = pool.qid AND p1.nid = pool.nid)),
           |p2 AS (SELECT qid, nid, cos_e6, penalty_e6, mmr_x10_e6
           |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY mmr_x10_e6 DESC, nid) AS rk FROM c2) WHERE rk = 1),
           |sel2 AS (SELECT qid, nid FROM p1 UNION ALL SELECT qid, nid FROM p2),
           |pen3 AS (SELECT ps.qid, ps.a AS nid,
           |    CAST(max(ps.sim_e6) AS BIGINT) AS penalty_e6
           |  FROM ps JOIN sel2 ON sel2.qid = ps.qid AND sel2.nid = ps.b
           |  GROUP BY ps.qid, ps.a),
           |c3 AS (SELECT pool.qid, pool.nid, pool.cos_e6, pen3.penalty_e6,
           |    $MmrLambda10 * pool.cos_e6
           |      - ${10L - MmrLambda10} * pen3.penalty_e6 AS mmr_x10_e6
           |  FROM pool JOIN pen3 ON pen3.qid = pool.qid AND pen3.nid = pool.nid
           |  WHERE NOT EXISTS (SELECT 1 FROM sel2
           |    WHERE sel2.qid = pool.qid AND sel2.nid = pool.nid)),
           |p3 AS (SELECT qid, nid, cos_e6, penalty_e6, mmr_x10_e6
           |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY mmr_x10_e6 DESC, nid) AS rk FROM c3) WHERE rk = 1)
           |SELECT qid, CAST(1 AS BIGINT) AS rank, nid, cos_e6, penalty_e6,
           |  mmr_x10_e6 FROM p1
           |UNION ALL SELECT qid, CAST(2 AS BIGINT), nid, cos_e6, penalty_e6,
           |  mmr_x10_e6 FROM p2
           |UNION ALL SELECT qid, CAST(3 AS BIGINT), nid, cos_e6, penalty_e6,
           |  mmr_x10_e6 FROM p3
           |ORDER BY qid, rank""".stripMargin),
    // s2's ranked-centroid window cut at the top TWO ranks, pivoted to
    // (own, next); the silhouette division is IEEE double on identical
    // inputs (the cos_e6 contract), equidistant guard included
    "s21_silhouette" ->
      (NormCte +
        s"""
           |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
           |  FROM e WHERE vec_id < $NCentroids),
           |ranked AS (SELECT e.vec_id, cent.cid,
           |    ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} AS cos,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM e CROSS JOIN cent),
           |t AS (SELECT a.vec_id, a.cid AS cluster, a.cos AS cos1,
           |    b.cid AS next_cluster, b.cos AS cos2
           |  FROM ranked a JOIN ranked b ON a.vec_id = b.vec_id
           |  WHERE a.arank = 1 AND b.arank = 2)
           |SELECT vec_id, cluster, next_cluster,
           |  CAST(round(cos1 * 1e6) AS BIGINT) AS cos_own_e6,
           |  CAST(round(cos2 * 1e6) AS BIGINT) AS cos_next_e6,
           |  CASE WHEN 1.0 - cos2 = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(round((cos1 - cos2) / (1.0 - cos2) * 1e6) AS BIGINT)
           |    END AS sil_e6
           |FROM t ORDER BY vec_id""".stripMargin),
    // one exact Lloyd round: s2's assignment restated verbatim, then
    // integer fixed-point unit components summed per (cluster, dim) —
    // no mean division, so the M-step is BIGINT-exact on both engines
    "s20_kmeans_round" ->
      (NormCte +
        s"""
           |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
           |  FROM e WHERE vec_id < $NCentroids),
           |assigned AS (SELECT vec_id, embedding, norm_fp, cluster FROM (
           |  SELECT e.vec_id, e.embedding, e.norm_fp, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM e CROSS JOIN cent) WHERE arank = 1),
           |unit AS (SELECT vec_id, cluster,
           |    list_transform(range(1, len(embedding) + 1), i ->
           |      CAST(round(embedding[i]::DOUBLE /
           |        sqrt(norm_fp::DOUBLE / 1e9) * 1e9) AS BIGINT)) AS u
           |  FROM assigned),
           |ex AS (SELECT cluster, unnest(u) AS uj,
           |    generate_subscripts(u, 1) AS j FROM unit)
           |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(j AS BIGINT) AS j,
           |  CAST(count(*) AS BIGINT) AS n, CAST(sum(uj) AS BIGINT) AS s_fp
           |FROM ex GROUP BY cluster, j ORDER BY cluster, j""".stripMargin),
    // TWO Lloyd rounds unrolled as plain CTEs (the q24 pattern —
    // standard SQL forbids aggregation in a recursive term): round 1
    // is s20's chain verbatim, the per-dim mean CASTs to REAL exactly
    // like the trainer's toFloat (IEEE double divide then double→float
    // on identical inputs), empty clusters keep the init component via
    // LEFT JOIN + COALESCE, and the emitted rows are round 2's sums
    // over those round-1 centroids
    "s25_kmeans_train" ->
      (NormCte +
        s"""
           |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
           |  FROM e WHERE vec_id < $NCentroids),
           |un AS (SELECT vec_id,
           |    list_transform(range(1, len(embedding) + 1), i ->
           |      CAST(round(embedding[i]::DOUBLE /
           |        sqrt(norm_fp::DOUBLE / 1e9) * 1e9) AS BIGINT)) AS u
           |  FROM e),
           |assigned AS (SELECT vec_id, cluster FROM (
           |  SELECT e.vec_id, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM e CROSS JOIN cent) WHERE arank = 1),
           |ex1 AS (SELECT a.cluster, unnest(un.u) AS uj,
           |    generate_subscripts(un.u, 1) AS j
           |  FROM assigned a JOIN un ON un.vec_id = a.vec_id),
           |sums1 AS (SELECT cluster, j, count(*) AS n, sum(uj) AS s_fp
           |  FROM ex1 GROUP BY cluster, j),
           |dims AS (SELECT unnest(range(1,
           |    (SELECT max(len(embedding)) FROM e) + 1)) AS j),
           |cent2v AS (SELECT c.cid, d.j,
           |    COALESCE(CAST(s.s_fp / CAST(s.n AS DOUBLE) / 1e9 AS REAL),
           |      c.c_emb[d.j]) AS cj
           |  FROM cent c CROSS JOIN dims d
           |  LEFT JOIN sums1 s ON s.cluster = c.cid AND s.j = d.j),
           |cent2 AS (SELECT cid, list(CAST(cj AS REAL) ORDER BY j) AS c_emb
           |  FROM cent2v GROUP BY cid),
           |cent2n AS (SELECT cid, c_emb,
           |    ${oDot("c_emb", "c_emb")} AS c_norm
           |  FROM cent2),
           |assigned2 AS (SELECT vec_id, cluster FROM (
           |  SELECT e.vec_id, c2.cid AS cluster,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "c2.c_emb"), "e.norm_fp", "c2.c_norm")} DESC,
           |      c2.cid) AS arank
           |  FROM e CROSS JOIN cent2n c2) WHERE arank = 1),
           |ex2 AS (SELECT a.cluster, unnest(un.u) AS uj,
           |    generate_subscripts(un.u, 1) AS j
           |  FROM assigned2 a JOIN un ON un.vec_id = a.vec_id)
           |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(j AS BIGINT) AS j,
           |  CAST(count(*) AS BIGINT) AS n, CAST(sum(uj) AS BIGINT) AS s_fp
           |FROM ex2 GROUP BY cluster, j ORDER BY cluster, j""".stripMargin),
    "s3_cosine_pairs" ->
      (NormCte +
        s"""
           |SELECT a.vec_id AS a, b.vec_id AS b,
           |  CAST(round(${oCos(oDot("a.embedding", "b.embedding"), "a.norm_fp", "b.norm_fp")} * 1e6)
           |    AS BIGINT) AS cos_e6
           |FROM e a JOIN e b ON a.vec_id < b.vec_id
           |WHERE ${oCos(oDot("a.embedding", "b.embedding"), "a.norm_fp", "b.norm_fp")} > 0.40
           |ORDER BY a, b""".stripMargin),
    "s4_knn_sign_lsh" ->
      (NormCte +
        s"""
           |, eb AS (SELECT vec_id, embedding, norm_fp,
           |    ${oBucket("embedding")} AS bucket
           |  FROM e),
           |q AS (SELECT vec_id AS qid, embedding AS q_emb, norm_fp AS q_norm, bucket
           |  FROM eb WHERE vec_id < $NQueries),
           |scored AS (SELECT q.qid, c.vec_id AS nid,
           |    ${oCos(oDot("q.q_emb", "c.embedding"), "q.q_norm", "c.norm_fp")} AS cos
           |  FROM eb c JOIN q ON c.bucket = q.bucket AND q.qid <> c.vec_id),
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // unfiltered global rank first, label pre-filter second — the
    // identical two-window chain, loss flag from the global rank
    "s17_filtered_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding, label,
         |    ${oDot("embedding", "embedding")} AS norm_fp
         |  FROM embeddings),
         |scored AS (SELECT q.vec_id AS qid, CAST(q.label AS BIGINT) AS q_label,
         |    c.vec_id AS nid, CAST(c.label AS BIGINT) AS n_label,
         |    ${oCos(oDot("q.embedding", "c.embedding"), "q.norm_fp", "c.norm_fp")} AS cos
         |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
         |g AS (SELECT qid, q_label, nid, n_label, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS grank
         |  FROM scored),
         |f AS (SELECT qid, q_label, nid, cos, grank,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
         |      AS BIGINT) AS rank
         |  FROM g WHERE n_label = q_label)
         |SELECT qid, q_label, rank, nid,
         |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6,
         |  grank > $PostFilterM AS lost_by_postfilter
         |FROM f WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,
    // prefix slice, prefix fp9 cosine, RerankK coarse cut, full-dim
    // fine rank — the identical two-window chain
    "s16_mrl_rerank" ->
      (NormCte +
        s"""
           |, pe AS (SELECT vec_id, embedding, norm_fp,
           |    embedding[1:$MrlPrefixDim] AS p_emb
           |  FROM e),
           |pn AS (SELECT vec_id, embedding, norm_fp, p_emb,
           |    ${oDot("p_emb", "p_emb")} AS p_norm
           |  FROM pe),
           |scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    ${oCos(oDot("q.p_emb", "c.p_emb"), "q.p_norm", "c.p_norm")} AS pcos,
           |    ${oCos(oDot("q.embedding", "c.embedding"),
                  "q.norm_fp", "c.norm_fp")} AS cos
           |  FROM pn q JOIN pn c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
           |coarse AS (SELECT qid, nid, pcos, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, nid)
           |      AS crank
           |  FROM scored),
           |fine AS (SELECT qid, nid, pcos, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
           |      AS rank
           |  FROM coarse WHERE crank <= $RerankK)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6,
           |  CAST(round(pcos * 1e6) AS BIGINT) AS pcos_e6
           |FROM fine WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // JL ±1 projection restated: per-plane fp9 dot, explicit floor to
    // e3 (DuckDB's // truncates toward zero — floor() matches Spark's
    // idiv on negative dots), integer 16-dim dot, double cosine
    "s14_knn_rp" ->
      (NormCte +
        s"""
           |, p AS (SELECT vec_id, embedding, norm_fp,
           |    [${(0 until RpDim).map(h =>
                  s"CAST(floor((${oDot("embedding", oPlane(h))})::DOUBLE / 1e6) AS BIGINT)")
                  .mkString(",\n         ")}] AS proj
           |  FROM e),
           |pn AS (SELECT vec_id, embedding, norm_fp, proj,
           |    CAST(coalesce(list_sum(list_transform(proj, v -> v * v)), 0)
           |      AS BIGINT) AS pnorm
           |  FROM p),
           |scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    CAST(coalesce(list_sum(list_transform(range(1, $RpDim + 1),
           |        i -> q.proj[i] * c.proj[i])), 0) AS BIGINT)::DOUBLE
           |      / (sqrt(q.pnorm::DOUBLE) * sqrt(c.pnorm::DOUBLE)) AS pcos,
           |    ${oCos(oDot("q.embedding", "c.embedding"),
                  "q.norm_fp", "c.norm_fp")} AS cos
           |  FROM pn q JOIN pn c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
           |r AS (SELECT qid, nid, pcos, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(pcos * 1e6) AS BIGINT) AS pcos_e6,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    "s5_quant_knn" ->
      s"""WITH sc AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
         |  FROM embeddings),
         |qq AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(x::DOUBLE / scale * 127) AS BIGINT)) AS q8
         |  FROM sc),
         |e AS (SELECT vec_id, q8,
         |    CAST(coalesce(list_sum(list_transform(q8, v -> v * v)), 0) AS BIGINT)
         |      AS qnorm
         |  FROM qq),
         |scored AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    CAST(coalesce(list_sum(list_transform(range(1, len(q.q8) + 1),
         |        i -> q.q8[i] * c.q8[i])), 0) AS BIGINT)::DOUBLE
         |      / (sqrt(q.qnorm::DOUBLE) * sqrt(c.qnorm::DOUBLE)) AS cos
         |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
         |r AS (SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
         |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
         |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,
    // PQ mirror: sub-codebooks are the sub-slices of vectors
    // vec_id < PqK read from the table; per-(vector, subspace) codes by
    // the same (fixed-point L2, code) window argmin; ADC dot recomputed
    // per (query, code) pair — semantics, not performance, is the
    // oracle's job (the Spark side builds the per-query LUT instead)
    "s6_knn_pq" -> pqOracle("", "embeddings"),
    // the same PQ body over the OPQ-P-lite-rotated corpus: the prelude
    // re-derives the permutation from the same exact integer variance
    // statistics (HUGEINT), so both engines rotate identically
    "s19_knn_opq" -> pqOracle(opqPrelude, "rot"),
    // IVFPQ mirror: s2's assigned/probes CTEs pick WHICH pairs score;
    // s6's codes/centn/rn CTEs price each scored pair by ADC
    // mirrors the augmentation exactly: float-cast appended component,
    // augmented-cosine assignment/probes, ranking by the raw dot
    "s12_mips_ivf" ->
      (NormCte +
        s"""
           |, mm AS (SELECT max(norm_fp) AS mx FROM e),
           |an AS (SELECT vec_id, a, ${oDot("a", "a")} AS anorm FROM (
           |  SELECT e.vec_id, list_append(e.embedding,
           |      CAST(sqrt((mm.mx - e.norm_fp)::DOUBLE / 1e9) AS FLOAT)) AS a
           |    FROM e CROSS JOIN mm)),
           |cent AS (SELECT vec_id AS cid, a AS c_emb, anorm AS c_norm
           |  FROM an WHERE vec_id < $NCentroids),
           |assigned AS (SELECT vec_id, a, cluster FROM (
           |  SELECT an.vec_id, an.a, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY an.vec_id ORDER BY
           |      ${oCos(oDot("an.a", "cent.c_emb"), "an.anorm", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM an CROSS JOIN cent) WHERE arank = 1),
           |qn AS (SELECT vec_id, a, ${oDot("a", "a")} AS anorm FROM (
           |  SELECT vec_id, list_append(embedding, CAST(0 AS FLOAT)) AS a
           |    FROM e WHERE vec_id < $NQueries)),
           |probes AS (SELECT qid, q_emb, cluster FROM (
           |  SELECT qn.vec_id AS qid, qn.a AS q_emb, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY qn.vec_id ORDER BY
           |      ${oCos(oDot("qn.a", "cent.c_emb"), "qn.anorm", "cent.c_norm")} DESC,
           |      cent.cid) AS prank
           |  FROM qn CROSS JOIN cent) WHERE prank <= $NProbe),
           |scored AS (SELECT p.qid, x.vec_id AS nid,
           |    ${oDot("p.q_emb", "x.a")} AS dot_fp
           |  FROM probes p JOIN assigned x ON p.cluster = x.cluster
           |  WHERE p.qid <> x.vec_id),
           |r AS (SELECT qid, nid, dot_fp,
           |    row_number() OVER (PARTITION BY qid ORDER BY dot_fp DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, dot_fp
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // s2's assignment + within-cluster exact pairs + d6's recursive
    // component closure, min-id representative
    "d12_semdedup" -> semDedupOracle(maxCluster = None),
    // the same resolution with the PRODUCTION cluster cap armed: the
    // oracle restates the deterministic shard function (⌈n/cap⌉
    // md5-prefix shards) so the capped plan itself rides the gate
    "d18_semdedup_capped" -> semDedupOracle(maxCluster = Some(D18MaxCluster)),
    // s2's cent/assigned/probes pick WHICH pairs score; s5's
    // quantization CTEs price each scored pair by the integer int8 dot
    "s13_ivf_sq" ->
      (NormCte +
        s"""
           |, cent AS (SELECT vec_id AS cid, embedding AS c_emb, norm_fp AS c_norm
           |  FROM e WHERE vec_id < $NCentroids),
           |assigned AS (SELECT vec_id, cluster FROM (
           |  SELECT e.vec_id, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${oCos(oDot("e.embedding", "cent.c_emb"), "e.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS arank
           |  FROM e CROSS JOIN cent) WHERE arank = 1),
           |probes AS (SELECT qid, cluster FROM (
           |  SELECT q.vec_id AS qid, cent.cid AS cluster,
           |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |      ${oCos(oDot("q.embedding", "cent.c_emb"), "q.norm_fp", "cent.c_norm")} DESC,
           |      cent.cid) AS prank
           |  FROM e q CROSS JOIN cent WHERE q.vec_id < $NQueries) WHERE prank <= $NProbe),
           |sc AS (SELECT vec_id, embedding,
           |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
           |  FROM embeddings),
           |qq AS (SELECT vec_id,
           |    list_transform(embedding,
           |      x -> CAST(round(x::DOUBLE / scale * 127) AS BIGINT)) AS q8
           |  FROM sc),
           |qz AS (SELECT vec_id, q8,
           |    CAST(coalesce(list_sum(list_transform(q8, v -> v * v)), 0) AS BIGINT)
           |      AS qnorm
           |  FROM qq),
           |scored AS (SELECT p.qid, a.vec_id AS nid,
           |    CAST(coalesce(list_sum(list_transform(range(1, len(q.q8) + 1),
           |        i -> q.q8[i] * c.q8[i])), 0) AS BIGINT)::DOUBLE
           |      / (sqrt(q.qnorm::DOUBLE) * sqrt(c.qnorm::DOUBLE)) AS cos
           |  FROM probes p JOIN assigned a ON p.cluster = a.cluster
           |    JOIN qz q ON q.vec_id = p.qid
           |    JOIN qz c ON c.vec_id = a.vec_id
           |  WHERE p.qid <> a.vec_id),
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    "s11_ivf_rerank" ->
      (oIvfPqScored +
        s""",
           |ar AS (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
           |      AS arank
           |  FROM scored),
           |cand AS (SELECT qid, nid FROM ar WHERE arank <= $RerankK),
           |ex AS (SELECT cand.qid, cand.nid,
           |    ${oCos(oDot("q.embedding", "c.embedding"), "q.norm_fp", "c.norm_fp")} AS cos
           |  FROM cand JOIN e q ON q.vec_id = cand.qid
           |  JOIN e c ON c.vec_id = cand.nid),
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM ex)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    "s8_knn_ivfpq" ->
      (oIvfPqScored +
        s""",
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // the RESIDUAL form from the same base: encode argmin drops the
    // k-free ||r||^2 term and subtracts the centroid dot; recon and
    // ADC add the coarse terms — every residual quantity a fixed-point
    // dot both engines state, never a float subtraction
    "s29_knn_ivfpq_residual" ->
      (oIvfPqBase +
        s""",
           |ac AS (SELECT a.vec_id, a.cluster, cent.c_emb, cent.c_norm
           |  FROM assigned a JOIN cent ON cent.cid = a.cluster),
           |xs AS (SELECT ac.vec_id, sub.s,
           |    e.embedding[sub.s*$PqSubDim+1 : sub.s*$PqSubDim+$PqSubDim] AS xemb,
           |    ac.c_emb[sub.s*$PqSubDim+1 : sub.s*$PqSubDim+$PqSubDim] AS csub
           |  FROM e JOIN ac ON ac.vec_id = e.vec_id CROSS JOIN sub),
           |codes AS (SELECT vec_id, s, k AS code, cnorm, csub FROM (
           |    SELECT xs.vec_id, xs.s, xs.csub, pcentn.k, pcentn.cnorm,
           |      row_number() OVER (PARTITION BY xs.vec_id, xs.s ORDER BY
           |        (pcentn.cnorm - 2 * (${oDot("xemb", "cemb")}
           |          - ${oDot("csub", "cemb")})),
           |        pcentn.k) AS rk
           |    FROM xs JOIN pcentn ON xs.s = pcentn.s) WHERE rk = 1),
           |rn AS (SELECT codes.vec_id,
           |    CAST(any_value(ac.c_norm)
           |      + sum(2 * ${oDot("codes.csub", "pcentn.cemb")} + pcentn.cnorm)
           |      AS BIGINT) AS recon_norm
           |  FROM codes JOIN pcentn ON pcentn.s = codes.s AND pcentn.k = codes.code
           |    JOIN ac ON ac.vec_id = codes.vec_id
           |  GROUP BY codes.vec_id),
           |adc AS (SELECT p.qid, a.vec_id AS nid, p.q_norm,
           |    CAST(any_value(${oDot("p.q_emb", "cent.c_emb")})
           |      + sum(${oDot(s"(p.q_emb[codes.s*$PqSubDim+1 : codes.s*$PqSubDim+$PqSubDim])", "pcentn.cemb")})
           |      AS BIGINT) AS adot
           |  FROM probes p JOIN assigned a ON p.cluster = a.cluster
           |    AND p.qid <> a.vec_id
           |  JOIN cent ON cent.cid = p.cluster
           |  JOIN codes ON codes.vec_id = a.vec_id
           |  JOIN pcentn ON pcentn.s = codes.s AND pcentn.k = codes.code
           |  GROUP BY p.qid, a.vec_id, p.q_norm),
           |scored AS (SELECT adc.qid, adc.nid,
           |    adc.adot::DOUBLE / (sqrt(adc.q_norm::DOUBLE)
           |      * sqrt(rn.recon_norm::DOUBLE)) AS cos
           |  FROM adc JOIN rn ON rn.vec_id = adc.nid),
           |r AS (SELECT qid, nid, cos,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS BIGINT) AS rank, nid,
           |  CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
           |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin),
    // same scored pair set; negatives ranked after the label filter,
    // the positive anchor as a per-query max, identical roundings
    "s15_hard_neg" ->
      s"""WITH e AS (SELECT vec_id, embedding, label,
         |    ${oDot("embedding", "embedding")} AS norm_fp
         |  FROM embeddings),
         |scored AS (SELECT q.vec_id AS qid, CAST(q.label AS BIGINT) AS q_label,
         |    c.vec_id AS nid, CAST(c.label AS BIGINT) AS n_label,
         |    ${oCos(oDot("q.embedding", "c.embedding"), "q.norm_fp", "c.norm_fp")} AS cos
         |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
         |pos AS (SELECT qid, max(cos) AS pos_cos FROM scored
         |  WHERE n_label = q_label GROUP BY qid),
         |neg AS (SELECT qid, q_label, nid, n_label, cos,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
         |      AS BIGINT) AS rank
         |  FROM scored WHERE n_label <> q_label)
         |SELECT n.qid, n.q_label, n.rank, n.nid, n.n_label AS neg_label,
         |  CAST(round(n.cos * 1e6) AS BIGINT) AS cos_e6,
         |  CAST(round((coalesce(p.pos_cos, 0) - n.cos) * 1e6) AS BIGINT)
         |    AS margin_e6
         |FROM neg n LEFT JOIN pos p ON p.qid = n.qid
         |WHERE n.rank <= $TopK ORDER BY n.qid, n.rank""".stripMargin,
    "s7_knn_classify" ->
      s"""WITH e AS (SELECT vec_id, embedding, label,
         |    ${oDot("embedding", "embedding")} AS norm_fp
         |  FROM embeddings),
         |scored AS (SELECT q.vec_id AS qid, CAST(q.label AS BIGINT) AS true_label,
         |    c.vec_id AS nid, CAST(c.label AS BIGINT) AS n_label,
         |    ${oCos(oDot("q.embedding", "c.embedding"), "q.norm_fp", "c.norm_fp")} AS cos
         |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
         |r AS (SELECT qid, true_label, nid, n_label,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored),
         |v AS (SELECT qid, true_label, n_label, CAST(count(*) AS BIGINT) AS votes
         |  FROM r WHERE rank <= $TopK GROUP BY qid, true_label, n_label),
         |p AS (SELECT qid, true_label, n_label, votes,
         |    row_number() OVER (PARTITION BY qid ORDER BY votes DESC, n_label) AS vrank
         |  FROM v)
         |SELECT qid, true_label, n_label AS pred_label, votes,
         |  n_label = true_label AS correct
         |FROM p WHERE vrank = 1 ORDER BY qid""".stripMargin,
    "d7_embed_clusters" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding,
         |    ${oDot("embedding", "embedding")} AS norm_fp
         |  FROM embeddings),
         |p AS (SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  WHERE ${oCos(oDot("a.embedding", "b.embedding"), "a.norm_fp", "b.norm_fp")} > 0.40),
         |ed AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
         |reach(src, dst) AS (
         |  SELECT vec_id, vec_id FROM e
         |  UNION
         |  SELECT r.src, ed.v FROM reach r JOIN ed ON r.dst = ed.u)
         |SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS cluster_rep,
         |  CAST(CASE WHEN min(dst) = src THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
         |FROM reach GROUP BY src ORDER BY vec_id""".stripMargin,
  )
}
