package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the LLM-data-pipeline operators: dedup, similarity search,
  * text analysis, event-stream ops, multimodal plumbing. Correctness
  * against DuckDB is the driver's oracle gate (tools/check.py); these
  * tests pin semantic invariants and audit the physical plans for the
  * properties that matter at scale.
  */
class PipelineOpsSpec extends SparkSpecBase {

  private val allModules = Seq(
    ("text", TextAnalysis.queries, TextAnalysis.oracleSql),
    ("dedup", Dedup.queries, Dedup.oracleSql),
    ("similarity", Similarity.queries, Similarity.oracleSql),
    ("events", Events.queries, Events.oracleSql),
    ("multimodal", Multimodal.queries, Multimodal.oracleSql))

  test("every pipeline query runs and returns rows at sf0.001") {
    allModules.foreach { case (mod, qs, _) =>
      qs.foreach { case (name, fn) =>
        assert(fn(spark, sf).count() > 0, s"$mod/$name returned 0 rows")
      }
    }
  }

  test("every pipeline query has an oracle") {
    allModules.foreach { case (mod, qs, os) =>
      assert(qs.keySet == os.keySet, s"$mod queries/oracles mismatch")
    }
  }

  test("no query name collisions across modules") {
    val all = SparkEntry.queries.keys.toSeq
    assert(all.size == all.distinct.size)
    val perModule = Relational.queries.size + allModules.map(_._2.size).sum
    assert(all.size == perModule, "a module's queries were shadowed in the merge")
  }

  test("gate invariant: every query has DuckDB oracle SQL and every oracle " +
      "names a query (zero rows-only entries, zero orphans)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
    SparkEntry.oracleSql.values.foreach(sql =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT")))
  }

  test("scale invariant: NO query in the surface plans a CartesianProduct") {
    // a cartesian product is the one join strategy that cannot survive
    // the 100 TB target under any knob — every cross-shaped join in
    // the engine must ride a broadcast (BroadcastNestedLoopJoin over a
    // driver-sized side) or an equi-shuffle. Planning every declared
    // query catches a regression the per-query specs might not look
    // for.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products planned by: ${offenders.mkString(", ")}")
  }

  // ---- dedup ----

  test("d1 exact dedup: canonical id is the group min and dups point at it") {
    val rows = Dedup.d1ExactDedup(spark, sf).collect()
    val byHash = rows.groupBy(_.getAs[String]("content_md5"))
    byHash.values.foreach { g =>
      val canon = g.map(_.getAs[Long]("doc_id")).min
      assert(g.forall(_.getAs[Long]("canonical_id") == canon))
      assert(g.forall(r =>
        r.getAs[Boolean]("is_dup") == (r.getAs[Long]("doc_id") != canon)))
    }
  }

  test("d3 LSH candidates are a superset of high-Jaccard d4 pairs (LSH recall)") {
    val cands = Dedup.d3LshCandidates(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val top = Dedup.d4JaccardTopK(spark, sf).collect()
    // every pair with true jaccard >= 0.5 should be an LSH candidate
    val high = top.filter(_.getAs[Long]("jaccard_e6") >= 500000L)
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(high.subsetOf(cands),
      s"high-jaccard pairs missed by LSH: ${high.diff(cands)}")
  }

  test("d4 inverted-index join never builds the cross product") {
    val plan = planOf(Dedup.d4JaccardTopK(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cross product in d4:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in d4:\n$plan")
  }

  test("lshCandidates maxBucket drops mega-buckets, keeps small-bucket pairs") {
    import spark.implicits._
    // 5 identical boilerplate docs (mega-bucket: every band agrees) +
    // 2 near-dup docs sharing their own buckets
    val boiler = "terms of service apply to all users of this website " +
      "and may change at any time without further notice to you"
    val uniq = "a genuinely distinctive document about catalyst plan " +
      "rewrites and whole stage codegen for vectorized execution"
    val docs = ((1L to 5L).map(i => (i, boiler)) ++
      Seq((10L, uniq), (11L, uniq + " extra"))).toDF("doc_id", "text")
    val idx = Dedup.lshIndex(docs)
    def pairs(cap: Option[Int]) = Dedup.lshCandidates(idx, cap).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val uncapped = pairs(None)
    val capped = pairs(Some(2))
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((10L, 11L)))
    assert(capped.contains((10L, 11L)), s"small-bucket pair lost: $capped")
    assert(!capped.exists(p => p._1 <= 5L && p._2 <= 5L),
      s"mega-bucket pairs survived the cap: $capped")
    assert(capped.subsetOf(uncapped))
  }

  test("minhash estimate correlates with true jaccard on top pairs") {
    val est = Dedup.d3LshCandidates(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("est_jaccard_e6")).toMap
    val truth = Dedup.d4JaccardTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("jaccard_e6")).toMap
    val common = est.keySet.intersect(truth.keySet)
    assert(common.nonEmpty, "no overlap between LSH candidates and top jaccard pairs")
    common.foreach { k =>
      assert(math.abs(est(k) - truth(k)) <= 450000L,
        s"estimate wildly off for $k: est=${est(k)} true=${truth(k)}")
    }
  }

  // ---- similarity ----

  test("s1 knn: k results per query, ranked by descending cosine") {
    val rows = Similarity.s1KnnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == Similarity.NQueries)
    byQ.values.foreach { g =>
      assert(g.length == Similarity.TopK)
      val sorted = g.sortBy(_.getAs[Long]("rank"))
      val cs = sorted.map(_.getAs[Long]("cos_e6"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, "not descending")
      assert(!sorted.exists(_.getAs[Long]("nid") == sorted.head.getAs[Long]("qid")),
        "self in neighbors")
    }
  }

  test("s2 IVF recall vs s1 exact is imperfect-but-substantial (it's an ANN)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val ivf = pairs(Similarity.s2KnnIvf(spark, sf))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall implausibly low: $recall")
  }

  test("s14 JL projection: 16-dim ranking recalls most of s1's exact top-k; " +
      "projected cosine tracks the exact one") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val out = Similarity.s14KnnRp(spark, sf).collect()
    val rp = out.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = rp.intersect(exact).size.toDouble / exact.size
    // JL at 64→16 adds ~1/√16 inner-product noise; on this corpus's
    // near-isotropic embeddings the true top-k margins are smaller
    // than that (the s4/s6/s8 ladder story), so recall is modest by
    // construction — but it must beat the ~0.01 random baseline by
    // an order of magnitude (measured 0.12 at sf0.001)
    assert(recall >= 0.05, s"JL recall implausibly low: $recall")
    // the attached exact cosine column lets winner's-curse bias be
    // SEEN per row (selected pcos overestimates by ~the JL noise, a
    // property, not a bug — asserted only as direction, not size)
    val signed = out.map(r =>
      (r.getAs[Long]("pcos_e6") - r.getAs[Long]("cos_e6")) / 1e6)
    assert(signed.sum / signed.size > 0d,
      "pcos-selected pairs should overestimate on average (selection bias)")
  }

  test("s15 hard negatives: every mined row is a different-label neighbor, " +
      "ranks are the label-filtered restriction of the exact ranking, and " +
      "the margin references the best same-label cosine") {
    val out = Similarity.s15HardNegatives(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("neg_label") != r.getAs[Long]("q_label"),
        s"same-label row leaked into negatives: $r")
    }
    out.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to Similarity.TopK.toLong))
      assert(!rs.exists(_.getAs[Long]("nid") == q))
      // negatives descend in cosine with rank
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cos_e6"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // margin = pos_cos − neg_cos: consistent within each query
    // (pos_cos is per-query constant, so margin + cos is too)
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val anchors = rs.map(r =>
        r.getAs[Long]("margin_e6") + r.getAs[Long]("cos_e6")).toSet
      assert(anchors.size <= 2, // ±1 ulp from independent roundings
        s"margin anchor inconsistent: $anchors")
    }
  }

  test("s16 MRL rerank: fine stage is the exact ranking restricted to the " +
      "coarse survivors, recall >= the coarse-only ranking's") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val out = Similarity.s16MrlRerank(spark, sf).collect()
    val mrl = out.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = mrl.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.05, s"MRL recall implausibly low: $recall")
    out.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.length == Similarity.TopK)
      assert(!rs.exists(_.getAs[Long]("nid") == q))
      // fine ranking is by exact cosine, descending
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cos_e6"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // an exact top-k hit that the coarse stage admits MUST surface in
    // the fine output: the rerank can only fix, never hurt, the
    // coarse list (IndexRefine's contract)
    val coarseOnly = out.map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Long]("pcos_e6"))).toSet
    assert(coarseOnly.nonEmpty)
  }

  test("s17 filtered kNN: pre-filtered ranking is exact (every row same " +
      "label), the post-filter loss flag is the truncation it claims, and " +
      "losses occur on this corpus") {
    val out = Similarity.s17FilteredKnn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("q_label") ==
      Tables.embeddings(spark, sf)
        .filter(col("vec_id") === r.getAs[Long]("nid"))
        .collect()(0).getAs[Int]("label").toLong,
      "a differently-labeled row leaked through the pre-filter"))
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rs.length.toLong)) // dense ranks from 1
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cos_e6"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the loss flag is real on a ~uniform-label corpus: with L labels,
    // the top-10 global ranks hold ~10/L same-label rows < TopK, so
    // SOME of the exact filtered top-k must sit beyond depth 10
    assert(out.exists(_.getAs[Boolean]("lost_by_postfilter")),
      "expected post-filter losses on this corpus")
    // and the flag equals the truncation it claims: recompute global
    // ranks in-Spark and cross-check a sample row
    val first = out.filter(_.getAs[Boolean]("lost_by_postfilter")).head
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val qv = e.filter(col("vec_id") === first.getAs[Long]("qid"))
      .select(col("embedding"), col("norm_fp")).collect()(0)
    val ranked = e.filter(col("vec_id") =!= first.getAs[Long]("qid"))
      .withColumn("cos", Similarity.cosine(
        Similarity.dotFp9(col("embedding"),
          typedLit(qv.getSeq[Float](0))), col("norm_fp"), lit(qv.getLong(1))))
      .orderBy(col("cos").desc, col("vec_id"))
      .select(col("vec_id")).collect().map(_.getLong(0))
    val pos = ranked.indexOf(first.getAs[Long]("nid")) + 1
    assert(pos > Similarity.PostFilterM,
      s"flagged row sits at global rank $pos <= ${Similarity.PostFilterM}")
  }

  test("s18 recall ladder: in-engine recall equals the recomputed " +
      "intersection for both methods and sits in (0, 1]") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val expect = Map(
      "jl_rp16" -> pairs(Similarity.s14KnnRp(spark, sf)),
      "mrl_rerank" -> pairs(Similarity.s16MrlRerank(spark, sf)),
      "pq8" -> pairs(Similarity.s6KnnPq(spark, sf)),
      "opq_pq8" -> pairs(Similarity.s19KnnOpq(spark, sf)),
      "ivfpq_residual" -> pairs(Similarity.s29KnnIvfPqResidual(spark, sf)))
      .view.mapValues(p =>
        p.intersect(exact).size.toLong * 1000000L / exact.size).toMap
    val out = Similarity.s18RecallLadder(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Long]("recall_e6")).toMap
    assert(out == expect, s"ladder drifted: $out vs $expect")
    out.values.foreach(v => assert(v > 0L && v <= 1000000L))
  }

  test("s2 IVF assignment and probe-list stages plan with zero Exchange") {
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val cents = Similarity.collectCodebook(e)
    val aPlan = planOf(Similarity.assignClusters(e, cents))
    assert(!aPlan.contains("Exchange"),
      s"IVF assignment stage shuffles — must stay a narrow projection:\n$aPlan")
    val pPlan = planOf(Similarity.probeClusters(e, cents))
    assert(!pPlan.contains("Exchange"),
      s"IVF probe-list stage shuffles — must stay a narrow projection:\n$pPlan")
  }

  test("s2 IVF narrow argmax assignment ≡ the window-formulation reference") {
    import org.apache.spark.sql.expressions.Window
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val cents = Similarity.collectCodebook(e)
    // the pre-round-5 shape, kept here as the semantic spec: replicate
    // every vector against the codebook, rank (cos desc, cid), keep rank 1
    val cent = e.filter(col("vec_id") < Similarity.NCentroids.toLong)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        col("norm_fp").as("c_norm"))
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(col("a_cos").desc, col("cid"))
    val want = e.join(broadcast(cent), lit(true))
      .withColumn("a_cos", Similarity.cosine(
        Similarity.dotFp9(col("embedding"), col("c_emb")),
        col("norm_fp"), col("c_norm")))
      .withColumn("arank", row_number().over(aw))
      .filter(col("arank") === 1)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.assignClusters(e, cents)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("trainCodebook: objective monotone over Lloyd rounds, bit-deterministic") {
    val corpus = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val objs = (0 to 3).map(i =>
      Similarity.codebookObjective(corpus,
        Similarity.trainCodebook(corpus, iters = i)))
    objs.zip(objs.tail).foreach { case (prev, next) =>
      assert(next >= prev - 1e-6,
        s"objective regressed across a Lloyd round: $objs")
    }
    assert(objs.last > objs.head + 1e-3,
      s"training never improved on the init codebook: $objs")
    // fixed-point sums ⇒ identical centroids on re-run, bit for bit
    val a = Similarity.trainCodebook(corpus, iters = 3)
    val b = Similarity.trainCodebook(corpus, iters = 3)
    assert(a == b, "training is not deterministic")
    // the trained codebook plugs into the same zero-exchange assignment
    val e = Similarity.withNorm(corpus)
    val plan = planOf(Similarity.assignClusters(e, a))
    assert(!plan.contains("Exchange"),
      s"assignment with a trained codebook shuffles:\n$plan")
    val clusters = Similarity.assignClusters(e, a)
      .select(col("cluster")).distinct().collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf((0L until Similarity.NCentroids.toLong).toSet))
  }

  test("trained codebook closes the loop: IVF recall@k ≥ the stand-in codebook's") {
    val corpus = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val e = Similarity.withNorm(corpus)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val standIn = pairs(Similarity.knnIvfWith(e, Similarity.collectCodebook(e)))
    val trained = pairs(Similarity.knnIvfWith(e, Similarity.trainCodebook(corpus)))
    def recall(s: Set[(Long, Long)]) = s.intersect(exact).size.toDouble / exact.size
    // the whole point of training: spherical k-means centroids must not
    // be WORSE than the first-k-vectors stand-in at equal nprobe/nlist
    assert(recall(trained) >= recall(standIn),
      s"trained codebook lost recall: trained=${recall(trained)} " +
        s"stand-in=${recall(standIn)}")
    assert(recall(trained) >= 0.2, s"trained recall implausibly low: ${recall(trained)}")
  }

  test("s6 PQ kNN: narrow encode + broadcast ADC join; recall plausible vs s1") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val pq = pairs(Similarity.s6KnnPq(spark, sf))
    // 8-byte codes from a 16-vector stand-in codebook on isotropic
    // gaussians: lossy by design (measured 0.22 at sf0.01); the bound
    // is a plausibility floor, not a quality claim
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.1, s"PQ recall implausibly low: $recall")
    // plan: encode is a narrow projection over the scan; the only hash
    // shuffle is the per-query top-k window; queries broadcast with
    // their LUTs
    val plan = planOf(Similarity.s6KnnPq(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"query side not broadcast:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected only the top-k window shuffle, got $shuffles:\n$plan")
  }

  test("s19 OPQ-P-lite: the permutation is a subspace-balanced bijection " +
      "matching an independent driver re-derivation; true cosines are " +
      "rotation-invariant; the rotated rung does not lose to plain PQ here") {
    val raw = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val perm = Similarity.opqPermutation(raw)
    // bijection over 1..Dim, PqSubDim dims per subspace by construction
    assert(perm.sorted == (1 to Similarity.Dim).toList, s"not a bijection: $perm")
    // independent re-derivation: BigInt stats from collected vectors,
    // snake allocation re-implemented from scratch
    val vecs = raw.collect().map(_.getSeq[Float](1))
    val n = BigInt(vecs.length)
    def rnd(d: Double) = BigInt(math.round(d))
    val vstat = (1 to Similarity.Dim).map { j =>
      val s2 = vecs.map(v => rnd(v(j - 1).toDouble * v(j - 1).toDouble * 1e9)).sum
      val s1 = vecs.map(v => rnd(v(j - 1).toDouble * 1e6)).sum
      j -> (n * s2 * 1000 - s1 * s1)
    }
    val ranked = vstat.sortWith { case ((ja, va), (jb, vb)) =>
      va > vb || (va == vb && ja < jb) }.map(_._1)
    val want = new Array[Int](Similarity.Dim)
    val fill = new Array[Int](Similarity.PqSubs)
    ranked.zipWithIndex.foreach { case (j, rk) =>
      val m = rk % (2 * Similarity.PqSubs)
      val b = if (m < Similarity.PqSubs) m else 2 * Similarity.PqSubs - 1 - m
      want(b * Similarity.PqSubDim + fill(b)) = j
      fill(b) += 1
    }
    assert(perm == want.toSeq, s"permutation drifted: $perm vs ${want.toSeq}")
    // the standing-registry form (VERDICT r15 #4) serves the IDENTICAL
    // permutation — s19 reads Dim rows instead of re-scanning the corpus
    assert(Similarity.opqPermStanding(spark, sf) == perm,
      "standing permutation diverged from the direct derivation")
    // orthogonality sanity: exact cosine ranking is permutation-blind
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val exactRot = pairs(Similarity.knnBruteWith(
      Similarity.withNorm(Similarity.permuteEmbedding(raw, perm))))
    assert(exactRot == exact, "permutation changed TRUE cosine ranking")
    // recall is MEASURED, not assumed (the honest-recording contract):
    // 0.22 → 0.34 at sf0.01, within noise of plain PQ at this tiny sf
    // (13 vs 14 of 50) — assert plausibility, let the s18 ladder and
    // BASELINE carry the numbers
    val opq = pairs(Similarity.s19KnnOpq(spark, sf))
    assert(opq.size == Similarity.NQueries * Similarity.TopK)
    val rOpq = opq.intersect(exact).size.toDouble / exact.size
    assert(rOpq >= 0.1, s"rotated-PQ recall implausibly low: $rOpq")
  }

  test("s8 IVFPQ: pruning and quantization compose in one one-shuffle plan") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val out = Similarity.s8KnnIvfPq(spark, sf)
    val got = pairs(out)
    // every query still fills its TopK (probed clusters are never empty
    // here: the query's own cluster is always probed)
    assert(got.size == Similarity.NQueries * Similarity.TopK)
    // candidates only from probed clusters: s8's pairs ⊆ s2's candidate
    // universe is implied by construction; pin the recall floor instead
    // (measured 0.26 at sf0.01 — lossy on both axes by design)
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.1, s"IVFPQ recall implausibly low: $recall")
    // plan: cluster assignment + PQ encode are ONE narrow projection
    // over the scan; probes broadcast with their LUTs; the only hash
    // shuffle is the per-query top-k window. Audit a FRESH frame — an
    // executed one stringifies the AQE final plan AND the initial plan,
    // double-counting every exchange.
    val plan = planOf(Similarity.s8KnnIvfPq(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"probe side not broadcast:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected only the top-k window shuffle, got $shuffles:\n$plan")
  }

  test("trainPqCodebook: distortion non-increasing, deterministic, recall plausible") {
    val corpus = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val e = Similarity.withNorm(corpus)
    val standIn = Similarity.collectPqCodebook(e)
    val objs = (0 to 3).map(i =>
      Similarity.pqDistortion(corpus, Similarity.trainPqCodebook(corpus, iters = i)))
    objs.zip(objs.tail).foreach { case (prev, next) =>
      assert(next <= prev, s"PQ distortion regressed across a Lloyd round: $objs")
    }
    assert(objs.last < objs.head, s"PQ training never improved on the init: $objs")
    val trained = Similarity.trainPqCodebook(corpus, iters = 3)
    assert(trained == Similarity.trainPqCodebook(corpus, iters = 3),
      "PQ training is not deterministic")
    // k-means minimizes RECONSTRUCTION DISTORTION, which is the
    // trainer's contract (asserted above) — it does not dominate
    // cosine recall@k: on this isotropic corpus the norm-shrunken
    // means (measured 0.20 at sf0.001) sit below the norm-preserving
    // stand-in vectors (0.28) under ADC cosine. Pin a plausibility
    // floor, not trained ≥ stand-in, and record why.
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    def recall(cb: Map[Int, Seq[Similarity.SubCent]]) =
      pairs(Similarity.knnPqWith(e, cb)).intersect(exact).size.toDouble / exact.size
    assert(recall(trained) >= 0.1,
      s"trained PQ recall implausibly low: ${recall(trained)}")
  }

  test("residual IVFPQ: no gain on the isotropic corpus (explained), wins where residuals concentrate") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    def recall(got: Set[(Long, Long)], exact: Set[(Long, Long)]) =
      got.intersect(exact).size.toDouble / exact.size
    // --- real corpus: residual ≈ plain, and HERE IS WHY ---
    // the corpus is isotropic gaussians, so the trained coarse
    // quantizer captures almost none of the energy: residuals keep
    // ≥80% of the vectors' squared norm, the residual distribution ≈
    // the raw distribution, and the same 8-byte budget buys the same
    // recall (measured 0.24–0.30 both forms at sf0.01, it∈{3,10};
    // the FAISS-default refinement CANNOT pay off without structure)
    val corpus = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val e = Similarity.withNorm(corpus)
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val cents = Similarity.trainCodebook(corpus)
    val (anchors, rcb) = Similarity.trainResidualPqCodebook(corpus, cents)
    val cbP = Similarity.trainPqCodebook(corpus)
    val rRes = recall(
      pairs(Similarity.knnIvfPqResidualWith(e, cents, anchors, rcb)), exact)
    val rPlain = recall(pairs(Similarity.knnIvfPqWith(e, cents, cbP)), exact)
    assert(rRes >= rPlain - 0.1,
      s"residual IVFPQ ($rRes) materially WORSE than no-residual ($rPlain)")
    val energy = Similarity.residualEnergyRatio(corpus, cents, anchors)
    assert(energy >= 0.8,
      s"isotropy explanation fails: residuals keep only $energy of the energy")
    // determinism (trained path is fixed-point Lloyd all the way down)
    assert(Similarity.trainResidualPqCodebook(corpus, cents) == ((anchors, rcb)),
      "residual PQ training is not deterministic")
    // --- structured corpus: the refinement must deliver ---
    // DENSE well-separated centers + a shared 4×4 offset grid in dims
    // 0/1: per subspace, plain PQ's 16 codes must spread over 8 tight
    // clouds (~2 codes per cloud — no within-cluster resolution) while
    // residual PQ sees ONE cloud of 16 grid points (16 codes — exact).
    // Measured: plain 0.18 vs residual 1.00 at identical geometry.
    val dim = Similarity.PqSubs * Similarity.PqSubDim
    val k = Similarity.NCentroids
    val synth = (0 until 400).map { id =>
      val c = id % k
      val a = ((id / k) % 4) * 0.1f - 0.15f
      val b = ((id / (k * 4)) % 4) * 0.1f - 0.15f
      (id.toLong, Array.tabulate(dim)(j =>
        (((c * 37 + j * 11) % 13) - 6) * 0.05f +
          (if (j == 0) a else 0.0f) + (if (j == 1) b else 0.0f)).toSeq)
    }.toDF("vec_id", "embedding")
    val es = Similarity.withNorm(synth)
    val exactS = pairs(Similarity.knnBruteWith(es))
    val centsS = Similarity.trainCodebook(synth)
    val cbPS = Similarity.trainPqCodebook(synth)
    val (anchorsS, rcbS) = Similarity.trainResidualPqCodebook(synth, centsS)
    val energyS = Similarity.residualEnergyRatio(synth, centsS, anchorsS)
    assert(energyS <= 0.2,
      s"synthetic corpus not structured enough: residual energy $energyS")
    val rResS = recall(
      pairs(Similarity.knnIvfPqResidualWith(es, centsS, anchorsS, rcbS)), exactS)
    val rPlainS = recall(pairs(Similarity.knnIvfPqWith(es, centsS, cbPS)), exactS)
    assert(rResS >= rPlainS + 0.3,
      s"residual IVFPQ ($rResS) does not decisively beat no-residual " +
        s"($rPlainS) on clustered data")
    // plan: encode stays a narrow projection; probes broadcast with
    // LUTs + per-cluster centroid dots; the only hash shuffle is the
    // per-query top-k window — same shape as s8
    val plan = planOf(Similarity.knnIvfPqResidualWith(e, cents, anchors, rcb))
    assert(plan.contains("BroadcastExchange"), s"probe side not broadcast:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected only the top-k window shuffle, got $shuffles:\n$plan")
  }

  test("s7 kNN classify: majority vote wins, ties break to the smallest label") {
    import spark.implicits._
    // 10 orthogonal query directions (dim 16); 5 corpus members per
    // query at cos≈1 with distinct tiny perturbations; cross-cluster
    // and query-query cosines are 0 — each query's top-5 is exactly its
    // own cluster, so the vote outcome is fully determined
    val dim = 16
    def basis(i: Int, eps: (Int, Float)*): Seq[Float] = {
      val v = Array.fill(dim)(0f); v(i) = 1f
      eps.foreach { case (j, e) => v(j) = e }
      v.toSeq
    }
    val labelsFor = Map(
      0 -> Seq(1, 1, 1, 2, 2), // clear majority: pred 1 with 3 votes
      1 -> Seq(1, 1, 2, 2, 3)) // 2-2 tie: pred 1 (smallest label)
    val rows =
      (0 until 10).map(i => (i.toLong, basis(i), if (i == 0) 1 else 2)) ++
        (0 until 10).flatMap { i =>
          (0 until 5).map { j =>
            (10L + i * 5 + j, basis(i, (10 + j, 0.01f * (j + 1))),
              labelsFor.getOrElse(i, Seq.fill(5)(i)).apply(j))
          }
        }
    val dir = java.nio.file.Files.createTempDirectory("s7vecs").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.s7KnnClassify(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("true_label"), r.getAs[Long]("pred_label"),
          r.getAs[Long]("votes"), r.getAs[Boolean]("correct"))).toMap
    assert(out(0L) == ((1L, 1L, 3L, true)), s"majority vote: ${out(0L)}")
    assert(out(1L) == ((2L, 1L, 2L, false)), s"tie-break: ${out(1L)}")
    (2 until 10).foreach { i =>
      // queries 2..9 carry true_label 2; cluster i votes unanimously i,
      // so only query 2's prediction is correct
      assert(out(i.toLong) == ((2L, i.toLong, 5L, i == 2)),
        s"unanimous cluster $i: ${out(i.toLong)}")
    }
  }

  test("s5 int8-quantized kNN keeps high recall vs exact s1") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Similarity.s1KnnBrute(spark, sf))
    val quant = pairs(Similarity.s5QuantKnn(spark, sf))
    val recall = quant.intersect(exact).size.toDouble / exact.size
    // int8 keeps ~2 decimal digits of each component: neighbor sets
    // should survive nearly intact (far above the ANN paths' bar)
    assert(recall >= 0.8, s"quantization recall implausibly low: $recall")
  }

  test("s10 radius: shuffle-free score+filter; results agree with s1 overlap") {
    val df = Similarity.s10RadiusSearch(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastExchange"), s"query side not broadcast:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 0,
      s"radius search must not hash-shuffle (no window, no agg):\n$plan")
    val radius = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Long]("cos_e6")).toMap
    // consistency vs s1: every top-k neighbor at/above the radius is in
    // the radius result with the same score; below-radius ones are not
    Similarity.s1KnnBrute(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      val cos = r.getAs[Long]("cos_e6")
      if (cos >= Similarity.RadiusE6)
        assert(radius.get(k).contains(cos), s"missing/mismatched $k")
      else assert(!radius.contains(k), s"below-radius pair present $k")
    }
  }

  test("s1 broadcasts the query side (no shuffle of the corpus)") {
    val plan = planOf(Similarity.s1KnnBrute(spark, sf))
    assert(plan.contains("Broadcast"), s"query side not broadcast:\n$plan")
    // partial top-k per partition before the rank shuffle — the property
    // that keeps brute-force kNN linear-shuffle at corpus scale
    assert(plan.contains("WindowGroupLimit"),
      s"top-k not pushed below the window shuffle:\n$plan")
  }

  test("s2/s4 search stages also push the top-k below the window shuffle") {
    Seq("s2" -> Similarity.s2KnnIvf(spark, sf),
      "s4" -> Similarity.s4KnnSignLsh(spark, sf)).foreach { case (n, df) =>
      val plan = planOf(df)
      assert(plan.contains("WindowGroupLimit"),
        s"$n reranks full candidate sets at the window shuffle:\n$plan")
    }
  }

  // ---- events ----

  test("e2 sessions: ordinals are contiguous from 1 per user") {
    val rows = Events.e2Sessionize(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val ids = g.map(_.getAs[Long]("session_id")).sorted.toSeq
      assert(ids == (1L to ids.length.toLong),
        s"non-contiguous sessions: $ids")
    }
  }

  test("e2 sessions partition all events exactly once") {
    val n = Tables.events(spark, sf).count()
    val sessSum = Events.e2Sessionize(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(sessSum == n)
  }

  test("e11 scd2: intervals chain, versions contiguous, one open row per user") {
    val rows = Events.e11Scd2(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val byV = g.sortBy(_.getAs[Long]("version"))
      assert(byV.map(_.getAs[Long]("version")).toSeq ==
        (1L to byV.length.toLong), "versions not contiguous from 1")
      // no-change runs collapsed: consecutive states always differ
      byV.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("state") != b.getAs[String]("state"),
            "consecutive versions with identical state (run not collapsed)")
          // half-open intervals chain exactly
          assert(a.getAs[Long]("valid_to_s") == b.getAs[Long]("valid_from_s"),
            "valid_to of version n != valid_from of version n+1")
        case _ => ()
      }
      assert(byV.count(_.getAs[Boolean]("is_current")) == 1 &&
        byV.last.getAs[Boolean]("is_current"),
        "exactly the last version must be open")
      assert(byV.last.isNullAt(byV.last.fieldIndex("valid_to_s")),
        "open row must have null valid_to_s")
    }
  }

  test("e11 scd2: both window passes share one exchange and one sort") {
    val plan = Events.e11Scd2(spark, sf).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 user_id exchange, got $shuffles:\n$plan")
    // the change filter preserves (ts, event_id) order, so the later
    // windows must not re-sort: one partition-local (user_id, ts, ...)
    // sort below all three (the global output orderBy is separate)
    val sorts = "Sort \\[user_id#\\d+L ASC NULLS FIRST, ts".r.findAllIn(plan).length
    assert(sorts == 1, s"expected 1 shared window sort, got $sorts:\n$plan")
  }

  test("e13 heavy hitters: top-3 per hour, window runs over the aggregate") {
    val rows = Events.e13HeavyHitters(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("hour_s")).values.foreach { g =>
      val byR = g.sortBy(_.getAs[Long]("rnk"))
      assert(byR.map(_.getAs[Long]("rnk")).toSeq == (1L to byR.length.toLong))
      assert(byR.length <= 3)
      // counts non-increasing down the ranks
      byR.sliding(2).foreach {
        case Array(a, b) => assert(
          a.getAs[Long]("n_events") >= b.getAs[Long]("n_events"))
        case _ => ()
      }
    }
    // the rank window consumes the (hour, user) aggregate, not raw
    // events: the hash aggregate must sit BELOW the window in the plan
    val plan = Events.e13HeavyHitters(spark, sf).queryExecution.executedPlan.toString
    val winAt = plan.indexOf("Window")
    val aggAt = plan.lastIndexOf("HashAggregate")
    assert(winAt >= 0 && aggAt > winAt,
      s"expected HashAggregate below Window (two-stage heavy hitters):\n$plan")
  }

  test("e14 sliding windows: 6 covers per event, tumbling consistency, no spine join") {
    val rows = Events.e14SlidingAgg(spark, sf).collect()
    // total mass = 6 × corpus (each event counted in width/slide windows)
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 6 * n)
    // every window is hour-aligned and 6h wide
    rows.foreach { r =>
      assert(r.getAs[Long]("win_start_s") % 3600 == 0)
      assert(r.getAs[Long]("win_end_s") - r.getAs[Long]("win_start_s") == 21600L)
    }
    // the hour-aligned slice of a sliding window equals the sum of its
    // 6 tumbling buckets (e1), checked on a sample of windows
    val tumbling = Events.e1HourlyAgg(spark, sf).collect()
      .map(r => (r.getAs[Long]("hour_s"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n_events")).toMap
    rows.take(200).foreach { r =>
      val want = (0 until 6).map(i => tumbling.getOrElse(
        (r.getAs[Long]("win_start_s") + i * 3600L,
          r.getAs[String]("event_type")), 0L)).sum
      assert(r.getAs[Long]("n_events") == want,
        s"window ${r.getAs[Long]("win_start_s")} diverges from tumbling sum")
    }
    // plan: window assignment is a narrow Expand/Generate, not a join
    val plan = planOf(Events.e14SlidingAgg(spark, sf))
    assert(!plan.contains("Join"), s"sliding windows must not join a spine:\n$plan")
  }

  test("e4 asof: every matched purchase precedes (or ties) its click") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_timestamp(col("ts")).as("s")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("s")).toMap
    Events.e4AsofPurchase(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(r.fieldIndex("purchase_id"))) {
        val p = r.getAs[Long]("purchase_id")
        assert(ev(p) <= r.getAs[Long]("click_s"),
          s"purchase $p after click ${r.getAs[Long]("click_id")}")
      }
    }
  }

  test("asof: tied right rows fill ALL payload columns from one row, deterministically") {
    import spark.implicits._
    // two right rows tie exactly on (key, ts) with different payloads —
    // per-column fills could mix (id from one row, cents from the other)
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "click")
    val right = Seq(
      (1L, 50L, 7L, 700L),
      (1L, 50L, 9L, 900L), // greatest payload struct — must win whole
      (1L, 50L, 8L, 800L)).toDF("k", "ts", "rid", "cents")
    val outs = (1 to 5).map { _ =>
      operators.AsOfJoin.asof(left, right, "k", "ts", Seq("rid", "cents"))
        .select("rid", "cents").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(outs.forall(_ == Seq((9L, 900L))), s"got ${outs.distinct}")
  }

  test("asof: non-orderable (map) payloads fall back to engine tie order, still one-row fills") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "click")
    val right = Seq((1L, 50L, 7L)).toDF("k", "ts", "rid")
      .withColumn("attrs", map(lit("x"), col("rid")))
    val out = operators.AsOfJoin.asof(left, right, "k", "ts", Seq("rid", "attrs"))
      .select("rid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("s3 tile join strategy: broadcast below the size switch, shuffled-hash above") {
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val par = spark.sparkContext.defaultParallelism
    val bcast = planOf(Similarity.cosinePairs(corpus, par,
      broadcastTiles = Some(true)))
    assert(bcast.contains("BroadcastHashJoin"),
      s"small-corpus tile join not broadcast:\n$bcast")
    val shuffled = planOf(Similarity.cosinePairs(corpus, par,
      broadcastTiles = Some(false)))
    assert(shuffled.contains("ShuffledHashJoin"),
      s"large-corpus tile join not shuffled-hash:\n$shuffled")
    assert(!shuffled.contains("SortMergeJoin"),
      s"tile join degraded to sort-merge (36-key sort, parallelism collapse):\n$shuffled")
    // results must be identical on both sides of the switch
    def rows(b: Boolean) = Similarity.cosinePairs(corpus, par,
      broadcastTiles = Some(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(true) == rows(false))
    // auto mode at test scale picks broadcast (corpus ≪ threshold)
    val auto = planOf(Similarity.cosinePairs(corpus, par))
    assert(auto.contains("BroadcastHashJoin"), s"auto switch at toy scale:\n$auto")
  }

  test("similarity corpus prep fail-stops on null embedding elements (alignment guard)") {
    import spark.implicits._
    val bad = Seq((0L, Seq[java.lang.Float](1.0f, null, 2.0f)),
      (1L, Seq[java.lang.Float](3.0f, 4.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.cosinePairs(bad, 2, blocks = 2).collect()
    }
    assert(ex.getMessage.contains("null elements") ||
      Option(ex.getCause).exists(_.getMessage.contains("null elements")),
      s"unexpected error: ${ex.getMessage}")
  }

  test("e5 latest-state: one row per user") {
    val df = Events.e5LatestState(spark, sf)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  // ---- multimodal ----

  test("m2 real PNG decode: round-trip is pixel-exact against the closed-form spec") {
    val rows = Multimodal.m2DecodeFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the payload really was a PNG (magic from the ENCODED bytes)
      assert(r.getAs[String]("png_magic") == "89504E47",
        s"doc $id: payload is not a PNG")
      // decoded dims and the exact pixel sum equal the generation spec —
      // i.e. the real codec round-tripped every pixel
      val w = Multimodal.imgWidth(id); val h = Multimodal.imgHeight(id)
      assert(r.getAs[Long]("width") == w.toLong &&
        r.getAs[Long]("height") == h.toLong, s"doc $id: decoded dims wrong")
      assert(r.getAs[Long]("n_px") == w.toLong * h)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w)
        want += Multimodal.imgPixel(id, x, y)
      assert(r.getAs[Long]("px_sum") == want,
        s"doc $id: decoded pixel sum ${r.getAs[Long]("px_sum")} != spec $want")
    }
  }

  test("m5 real WAV decode: container parsed, every PCM16 sample round-trips") {
    val rows = Multimodal.m5AudioFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the payload really was a RIFF/WAV container
      assert(r.getAs[String]("wav_magic") == "52494646",
        s"doc $id: payload is not a WAV")
      assert(r.getAs[Long]("sample_rate") == 8000L)
      val n = Multimodal.audioSamples(id)
      assert(r.getAs[Long]("n_samples") == n.toLong,
        s"doc $id: decoded frame count wrong")
      // decoded Σ/min/max equal the generation spec — the codec
      // round-tripped every 16-bit sample (byte order included)
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      for (t <- 0 until n) {
        val v = Multimodal.audioSample(id, t).toLong
        sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
      }
      assert(r.getAs[Long]("amp_sum") == sum &&
        r.getAs[Long]("amp_min") == mn && r.getAs[Long]("amp_max") == mx,
        s"doc $id: decoded sample stats diverge from spec")
    }
  }

  // ---- plan regression guards for the measured perf fixes ----

  test("d1 computes the content hash once (single scan, no self-join)") {
    val plan = planOf(Dedup.d1ExactDedup(spark, sf))
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"d1 scans documents more than once:\n$plan")
  }

  test("d3 computes the MinHash index once (single scan: bucket pair-gen, not self-join)") {
    // the build path (what the shared checkpoint materializes once)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = planOf(Dedup.lshCandidates(Dedup.lshIndex(docs), None))
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"d3's build scans documents more than once:\n$plan")
    // the query path reads the STANDING pair table (r14: the shared
    // stage persists through the registry): one scan — the standing
    // table itself — and no re-run of the signature/band pipeline
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val qPlan = planOf(Dedup.d3LshCandidates(spark, sf))
    assert(qPlan.contains(s"graft_lshpairs_$digest"),
      s"d3 query does not read the standing pair table:\n$qPlan")
    assert(!qPlan.contains("Generate"),
      s"d3 query re-runs the signature explode:\n$qPlan")
  }

  test("d5 hamming-ball bucketing: single scan, no O(n²) pair join") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = planOf(Dedup.simhashPairs(docs))
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"d5's build scans documents more than once:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"d5 regressed to a quadratic pair scan:\n$plan")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val qPlan = planOf(Dedup.d5SimhashPairs(spark, sf))
    assert(qPlan.contains(s"graft_simpairs_$digest"),
      s"d5 query does not read the standing pair table:\n$qPlan")
    assert(!qPlan.contains("Generate"),
      s"d5 query re-runs the hamming-ball explode:\n$qPlan")
  }

  test("d10 blocking union ≡ union of its three blockers with exact provenance") {
    val got = Dedup.d10Blocking(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Boolean]("via_exact"), r.getAs[Boolean]("via_lsh"),
          r.getAs[Boolean]("via_simhash"), r.getAs[Long]("n_blockers"))).toMap
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val lsh = pairs(Dedup.d3LshCandidates(spark, sf))
    val sim = pairs(Dedup.d5SimhashPairs(spark, sf))
    val exact = Dedup.d1ExactDedup(spark, sf).collect()
      .groupBy(_.getAs[String]("content_md5")).values
      .flatMap { g =>
        val ids = g.map(_.getAs[Long]("doc_id")).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }.toSet
    assert(got.keySet == (exact ++ lsh ++ sim), "pair sets diverge")
    got.foreach { case (p, (ve, vl, vs, n)) =>
      assert(ve == exact(p) && vl == lsh(p) && vs == sim(p),
        s"provenance wrong for $p")
      assert(n == Seq(ve, vl, vs).count(identity).toLong)
    }
    // the union is non-trivial: some pair is found by >1 blocker and
    // some by exactly one (else the blockers are redundant here)
    assert(got.values.exists(_._4 >= 2L) && got.values.exists(_._4 == 1L))
  }

  test("d8 incremental candidates ≡ d3's pair set restricted to the new batch") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("n_sig_match"))
    val full = Dedup.d3LshCandidates(spark, sf).collect().map(key)
      .filter(p => p._1 >= Dedup.IncrementalSplit || p._2 >= Dedup.IncrementalSplit)
      .toSet
    val inc = Dedup.d8IncrementalLsh(spark, sf).collect().map(key).toSet
    assert(inc == full,
      s"inc-only=${inc -- full}, full-only=${full -- inc}")
    // the batch must actually exercise both pair kinds at test scale
    assert(inc.exists(p => p._1 < Dedup.IncrementalSplit), "no new×corpus pair")
  }

  test("d8 postings index round-trips through parquet (the persisted daily-run form)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val corpusIx = Dedup.lshIndex(docs.filter(col("doc_id") < Dedup.IncrementalSplit))
    val newIx = Dedup.lshIndex(docs.filter(col("doc_id") >= Dedup.IncrementalSplit))
    val dir = java.nio.file.Files.createTempDirectory("d8-postings").toString
    Dedup.corpusPostings(corpusIx).write.mode("overwrite").parquet(dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("n_sig_match"))
    val fromDisk = Dedup.incrementalFromPostings(
      spark.read.parquet(dir), newIx, maxBucket = None)
      .collect().map(key).toSet
    val direct = Dedup.incrementalCandidates(corpusIx, newIx, maxBucket = None)
      .collect().map(key).toSet
    assert(fromDisk == direct && direct.nonEmpty)
  }

  test("d8 maxBucket caps the corpus posting list, not the new side") {
    import spark.implicits._
    // 5 corpus docs share one boilerplate text (a mega posting list);
    // 1 corpus doc and 1 new doc share distinct near-dup content
    val boiler = "the same boilerplate navigation header text repeated " +
      "on every single page of the site forever and ever"
    val rare = "a genuinely unique passage that the new batch happens " +
      "to duplicate almost word for word tonight"
    val corpus = ((1L to 5L).map(i => (i, boiler)) :+ (6L, rare)).toDF("doc_id", "text")
    val fresh = Seq((100L, boiler), (101L, rare + " ok")).toDF("doc_id", "text")
    def run(cap: Option[Int]) = Dedup.incrementalCandidates(
      Dedup.lshIndex(corpus), Dedup.lshIndex(fresh), cap)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(None)
    assert(uncapped.contains((6L, 101L)), s"rare near-dup missed: $uncapped")
    assert((1L to 5L).forall(i => uncapped.contains((i, 100L))),
      s"boilerplate pairs missing uncapped: $uncapped")
    // cap below the mega-bucket size: boilerplate postings dropped,
    // the rare pair (posting list of 1) survives
    val capped = run(Some(2))
    assert(capped.contains((6L, 101L)), s"cap dropped the rare pair: $capped")
    assert(!capped.exists(p => p._1 <= 5L && p._2 == 100L),
      s"mega posting list not capped: $capped")
  }

  // ---- count-first cap discipline (the m7 pattern ported to text) ----

  /** Shared fixture: 6 identical boilerplate docs (every index family
    * puts them in one mega bucket/posting) + 2 near-identical rare
    * docs whose buckets stay small. */
  private def capFixture = {
    import spark.implicits._
    val boiler = "terms of service apply to all users of this website " +
      "and may change at any time without further notice to you"
    val rare = "a genuinely distinctive document about catalyst plan " +
      "rewrites and whole stage codegen for vectorized execution"
    ((1L to 6L).map(i => (i, boiler)) ++
      Seq((10L, rare), (11L, rare))).toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("count-first caps: a cap at/above the largest group equals uncapped " +
    "(every family)") {
    val docs = capFixture
    val idx = Dedup.lshIndex(docs)
    assert(pairSet(Dedup.lshCandidates(idx, Some(6))) ==
      pairSet(Dedup.lshCandidates(idx, None)), "lshCandidates at-boundary")
    assert(pairSet(Dedup.simhashPairs(docs, Some(6))) ==
      pairSet(Dedup.simhashPairs(docs, None)), "simhashPairs at-boundary")
    assert(Dedup.containmentPairs(docs, Some(6L)).collect().toSet ==
      Dedup.containmentPairs(docs, None).collect().toSet,
      "containmentPairs at-boundary")
    assert(pairSet(Dedup.blockingUnion(docs, Some(6), Some(6))) ==
      pairSet(Dedup.blockingUnion(docs)), "blockingUnion at-boundary")
  }

  test("count-first caps: the capped plan's anti-join sits BELOW the " +
      "posting aggregation (the buffer never sees over-cap keys)") {
    val plan = planOf(Dedup.containmentPairs(capFixture, maxDf = Some(5L)))
    val lines = plan.linesIterator.toIndexedSeq
    val aggIdx = lines.indexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("collect_list"))
    val antiIdx = lines.indexWhere(_.contains("LeftAnti"))
    assert(aggIdx >= 0, s"no collect_list aggregate in plan:\n$plan")
    assert(antiIdx >= 0, s"no anti-join in the capped plan:\n$plan")
    // tree prints top-down: the aggregate consuming the capped rows
    // must appear ABOVE the anti-join feeding it
    assert(aggIdx < antiIdx,
      s"anti-join not below the posting aggregation:\n$plan")
  }

  test("simhashPairs maxBucket drops the boilerplate hamming-ball bucket, " +
    "keeps small-bucket pairs") {
    val docs = capFixture
    val uncapped = pairSet(Dedup.simhashPairs(docs, None))
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((10L, 11L)))
    val capped = pairSet(Dedup.simhashPairs(docs, Some(3)))
    assert(capped.contains((10L, 11L)), s"small-bucket pair lost: $capped")
    assert(!capped.exists(p => p._2 <= 6L),
      s"mega-bucket pairs survived the cap: $capped")
    assert(capped.subsetOf(uncapped))
  }

  test("blockingUnion maxExactGroup emits the mega group's star: linear pair " +
    "count, identical connected-component closure") {
    val docs = capFixture
    val uncapped = pairSet(Dedup.blockingUnion(docs))
    // cap the bucket blockers too, so the mega group's only surviving
    // candidate edges are the exact blocker's star
    val capped = pairSet(Dedup.blockingUnion(docs, maxBucket = Some(3),
      maxExactGroup = Some(3)))
    // the 6-doc exact group collapses from C(6,2)=15 cliques to a
    // 5-edge star on the min id; the under-cap exact pair (10,11) and
    // all bucket-blocker pairs are untouched
    assert((2L to 6L).forall(i => capped.contains((1L, i))),
      s"star edges missing: $capped")
    assert(!capped.exists(p => p._1 >= 2L && p._2 <= 6L),
      s"non-star mega-group pair survived: $capped")
    assert(capped.contains((10L, 11L)))
    // same transitive closure: union-find both pair sets
    def closure(pairs: Set[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (1L to 11L).map(i => i -> find(i)).toMap
    }
    assert(closure(capped) == closure(uncapped),
      "star treatment changed the dedup closure")
  }

  test("corpusPostings build-time cap: no over-cap array exists, and it " +
    "yields the same candidates as the read-time cap") {
    val docs = capFixture
    val corpusIx = Dedup.lshIndex(docs.filter(col("doc_id") <= 10L))
    val newIx = Dedup.lshIndex(docs.filter(col("doc_id") === 11L))
    val builtCapped = Dedup.corpusPostings(corpusIx, Some(3))
    assert(builtCapped.count() > 0, "capped build kept nothing")
    assert(builtCapped.select(max(size(col("docs")))).collect()(0).getInt(0) <= 3,
      "an over-cap posting array survived the capped build")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("n_sig_match"))
    val viaBuild = Dedup.incrementalFromPostings(builtCapped, newIx, None)
      .collect().map(key).toSet
    val viaRead = Dedup.incrementalFromPostings(
      Dedup.corpusPostings(corpusIx, None), newIx, Some(3))
      .collect().map(key).toSet
    assert(viaBuild == viaRead, "build-time and read-time caps disagree")
  }

  test("connectedComponents: chain, pair, singleton resolve to component minima") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents: a long path converges (log-round star steps)") {
    import spark.implicits._
    // path through shuffled ids — min is in the middle, diameter 63
    val ids = new scala.util.Random(42).shuffle((0L until 64L).toList)
    val nodes = ids.toDF("id")
    val edges = ids.zip(ids.tail).toDF("a", "b")
    val out = Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64 && out.values.forall(_ == 0L))
  }

  test("connectedComponents: a viral-duplicate hot key converges in bounded rounds") {
    import spark.implicits._
    // one viral document (a high id, so large-star must flip the whole
    // fan-out) connected to 20k others — the degree-skew case the scale
    // notes lean on AQE for. Convergence must hold and the round count
    // must stay O(log n), not grow with the hub's degree.
    val hub = 500000L
    val n = 20000L
    val nodes = spark.range(n).select(col("id"))
      .union(Seq(hub).toDF("id"))
    val edges = spark.range(n)
      .select(lit(hub).as("a"), col("id").as("b"))
    val (out, rounds) = Components.connectedComponentsCounted(nodes, edges)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n + 1 && got.values.forall(_ == 0L),
      "hot-key component did not resolve to the minimum id")
    assert(rounds <= 6,
      s"hot-key graph took $rounds star rounds — degree skew is leaking into round count")
  }

  test("property: connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 5 + rnd.nextInt(30)
      val ids = (0 until n).map(_ => rnd.nextLong().abs % 1000L).distinct
      val edges = (0 until rnd.nextInt(40))
        .map(_ => (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val want = ids.map { i =>
        i -> ids.filter(j => find(j) == find(i)).min
      }.toMap
      val got = Components.connectedComponents(
        ids.toDF("id"), edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }

  test("Components.absorb: chunked absorb ≡ full re-resolve on random " +
      "graphs (delta-sized incremental connectivity)") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    (1 to 4).foreach { trial =>
      // nodes arrive in 3 chunks; an edge arrives with the LATER of
      // its endpoints (the ingest model: a pair emits when the new
      // doc lands). Ids are shuffled so late chunks carry SMALL ids —
      // forcing rep takeovers through the remap, not just appends.
      val n = 20 + rnd.nextInt(40)
      val ids = rnd.shuffle((0L until n.toLong).toList)
      val chunkOf = ids.zipWithIndex.map { case (id, i) => id -> i % 3 }.toMap
      val edges = (0 until n * 2).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter { case (a, b) => a != b }
      def arrives(e: (Long, Long)) = math.max(chunkOf(e._1), chunkOf(e._2))
      def nodesOf(c: Int) = ids.filter(chunkOf(_) == c)
      def edgesOf(c: Int) = edges.filter(arrives(_) == c)
      // chunk 0 resolves from scratch; chunks 1, 2 absorb
      var standing = Components.connectedComponents(
        nodesOf(0).toDF("id"),
        (edgesOf(0) :+ ((-1L, -1L))).toDF("a", "b").filter(col("a") >= 0L))
      (1 to 2).foreach { c =>
        standing = Components.absorb(standing,
          nodesOf(c).toDF("id"),
          (edgesOf(c) :+ ((-1L, -1L))).toDF("a", "b").filter(col("a") >= 0L))
      }
      val got = standing.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Components.connectedComponents(
        ids.toDF("id"), edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial=$trial n=$n: absorb diverged from re-resolve")
    }
  }

  test("Components.absorb: isolated new nodes, standing-rep takeover by a " +
      "smaller late id, and edge-only batches all resolve exactly") {
    import spark.implicits._
    // standing: {5,6} one component (rep 5), {9} singleton
    val standing = Seq((5L, 5L), (6L, 5L), (9L, 9L)).toDF("id", "rep")
    // batch: id 1 (smaller than every standing rep) links to 6 —
    // the whole {5,6} component must remap to rep 1; id 7 isolated
    val out = Components.absorb(standing,
      Seq(1L, 7L).toDF("id"), Seq((1L, 6L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 7L, 9L -> 9L), out.toString)
    // edge-only follow-up (no new nodes): 9 joins the big component
    val out2 = Components.absorb(out.toSeq.toDF("id", "rep"),
      spark.range(0).select(col("id")), Seq((9L, 7L), (7L, 5L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, 9L -> 1L), out2.toString)
  }

  test("property: the pattern-automaton family (sets / WITHIN / optional) " +
      "equals driver-side reference folds on random event streams") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(11)
    val types = Vector("click", "view", "purchase", "error", "other")
    (1 to 4).foreach { _ =>
      val n = 20 + rnd.nextInt(120)
      val rows = (0 until n).map { i =>
        (1L + rnd.nextInt(4), // few users → long runs
          new Timestamp(1700000000000L + rnd.nextInt(40) * 1000L), // heavy ts ties
          i.toLong, types(rnd.nextInt(types.size)), 0.0d)
      }
      val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
      // the shared deterministic per-user run the operators consume
      val runs = rows.groupBy(_._1).view.mapValues(
        _.sortBy(e => (e._2.getTime, e._3)).map(e => (e._2.getTime, e._4)))
      // reference 1: stage-set k-cycle counter
      val sets = Seq(Seq("click"), Seq("view", "error"), Seq("purchase"))
      def codeOf(t: String) =
        sets.indexWhere(_.contains(t)) match { case -1 => 0L; case i => i + 1L }
      val wantSets = runs.map { case (u, es) =>
        var acc = 0L
        es.foreach { case (_, t) =>
          if (codeOf(t) == acc % 3 + 1) acc += 1 }
        u -> (acc / 3, acc % 3)
      }.toMap
      val gotSets = Events.patternCountSets(df, sets).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
      assert(gotSets == wantSets, s"sets diverged: n=$n")
      // reference 2: WITHIN expiry (20 s window, ms → micros)
      val W = 20L * 1000000L
      val stages = Seq("click", "view", "purchase")
      def c3(t: String) = stages.indexOf(t) + 1L // 0-as-noise handled below
      val wantWin = runs.map { case (u, es) =>
        var acc = 0L; var start = 0L; var nexp = 0L
        es.foreach { case (tsMs, t) =>
          val tu = tsMs * 1000L
          var s = acc % 3
          if (s > 0 && tu - start > W) { acc -= s; s = 0; nexp += 1 }
          val code = if (stages.contains(t)) c3(t) else 0L
          if (code == s + 1) { if (s == 0) start = tu; acc += 1 }
        }
        u -> (acc / 3, acc % 3, nexp)
      }.toMap
      val gotWin = Events.patternCountWithin(df, stages, W).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"),
            r.getAs[Long]("n_expired"))).toMap
      assert(gotWin == wantWin, s"WITHIN diverged: n=$n")
      // reference 3: optional middle stage
      val wantOpt = runs.map { case (u, es) =>
        var st = 0L; var done = 0L; var withB = 0L
        es.foreach { case (_, t) =>
          val code = t match {
            case "click" => 1L; case "view" => 2L; case "purchase" => 3L
            case _ => 0L }
          if (st == 0L) { if (code == 1L) st = 1L }
          else if (st == 1L) {
            if (code == 2L) st = 2L
            else if (code == 3L) { done += 1; st = 0L }
          } else if (code == 3L) { done += 1; withB += 1; st = 0L }
        }
        u -> (done, withB, st)
      }.toMap
      val gotOpt = Events.patternCountOptional(df,
        "click", "view", "purchase").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_complete"), r.getAs[Long]("n_with_b"),
            r.getAs[Long]("open_state"))).toMap
      assert(gotOpt == wantOpt, s"optional diverged: n=$n")
    }
  }

  test("property: threshold-selection mix equals the rank form on random " +
      "corpora (boundary-bucket and tiny-source edges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val names = Vector("web", "books", "code", "wiki", "s1", "s2", "s3")
    (1 to 4).foreach { _ =>
      val nSrc = 1 + rnd.nextInt(names.size)
      val docs = (0 until 30 + rnd.nextInt(400)).map { i =>
        (i.toLong + rnd.nextInt(5) * 10000L, // sparse, duplicated-range ids
          names(rnd.nextInt(nSrc)))
      }.distinctBy(_._1).toDF("doc_id", "source")
      def roll(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"))).toMap
      val thr = roll(TextAnalysis.sourceMixThreshold(docs))
      val rank = roll(TextAnalysis.sourceMix(docs)
        .groupBy(col("source"))
        .agg(count(when(col("keep"), lit(1))).as("n_kept"),
          coalesce(sum(when(col("keep"), col("doc_id"))), lit(0L))
            .as("kept_id_sum")))
      assert(thr == rank, s"diverged with $nSrc sources: $thr vs $rank")
    }
  }

  test("d6 cluster reps are consistent with d5 pairs (every paired doc shares a rep)") {
    val reps = Dedup.d6DupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.d5SimhashPairs(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(reps(a) == reps(b), s"pair ($a,$b) in different clusters")
    }
    // every rep is the min of its cluster
    reps.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
    }
  }

  test("s3 tiled pair join: equi-join on block keys, no corpus broadcast nested loop") {
    // assert the BUILD plan, not s3CosinePairs: the query row reads the
    // session-shared checkpoint (sharedEmbedPairs) whenever another
    // consumer (d7) materialized it first, and a checkpointed scan has
    // no join to inspect — the build form is what the assertion pins
    val plan = planOf(Similarity.cosinePairs(
      graft.Tables.embeddings(spark, sf), spark.sparkContext.defaultParallelism))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"s3 regressed to an all-broadcast pair scan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), s"s3 tile join is not an equi hash/merge join:\n$plan")
  }

  test("s21 simplified silhouette: hand-computed geometries, equidistant " +
      "guard, cluster agrees with the s2 assignment, zero-join narrow plan") {
    import spark.implicits._
    import Similarity.{silhouetteWith, collectCodebook, withNorm}
    def frame(rows: (Long, Seq[Float])*) =
      rows.toDF("vec_id", "embedding")
    // codebook = ids < 8: orthogonal axes (1,0) and (0,1)
    val f = withNorm(frame(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      100L -> Seq(2f, 0f),   // on-axis: cos1=1, cos2=0 → sil = 1e6
      101L -> Seq(3f, 3f),   // exact tie: cos1=cos2 → sil = 0 (not guard)
      102L -> Seq(0f, -5f))) // cos 0 vs −1 → sil = (0+1)/(1+1) = 5e5
    val by = silhouetteWith(f, collectCodebook(f)).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("next_cluster"),
          r.getAs[Long]("sil_e6"))).toMap
    assert(by(100L) == ((0L, 1L, 1000000L)), by.toString)
    assert(by(101L) == ((0L, 1L, 0L)), s"tie must break to cid 0: $by")
    assert(by(102L) == ((0L, 1L, 500000L)), by.toString)
    // duplicate-direction centroids: cos_own == cos_next == ~1 (the
    // IEEE value is 1 + 2⁻⁵², so the 1−cos guard stays cold and the
    // EXACT numerator tie carries the 0 — both paths land silhouette 0
    // deterministically, and both engines compute the identical bits)
    val g = withNorm(frame(0L -> Seq(1f, 0f), 1L -> Seq(2f, 0f),
      100L -> Seq(4f, 0f)))
    val gr = silhouetteWith(g, collectCodebook(g)).collect()
      .filter(_.getAs[Long]("vec_id") == 100L).head
    assert(gr.getAs[Long]("cos_next_e6") == 1000000L &&
      gr.getAs[Long]("sil_e6") == 0L, gr.toString)
    // sf gate: one row per vector, cluster ≡ the s2 assignment, range
    // sane, and the plan stays pair-free (no join, no aggregate)
    val sfDf = Similarity.s21Silhouette(spark, sf)
    val out = sfDf.collect()
    val e = withNorm(graft.Tables.embeddings(spark, sf))
    val assigned = Similarity.assignClusters(e, collectCodebook(e))
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(out.length == assigned.size)
    out.foreach { r =>
      assert(r.getAs[Long]("cluster") == assigned(r.getAs[Long]("vec_id")))
      val sil = r.getAs[Long]("sil_e6")
      assert(sil >= -1000000L && sil <= 1000000L, r.toString)
    }
    val plan = planOf(sfDf)
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      "silhouette must stay a narrow pair-free projection")
  }

  test("s22/s23 kNN graph: the exact graph is complete and agrees with s1 " +
      "on the query set; the IVF-pruned graph is a measured-recall subset " +
      "whose hits carry identical ranks of the shared candidate order") {
    val exact = Similarity.s22KnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("nid"), r.getAs[Long]("cos_e6"))).toMap
    val n = graft.Tables.embeddings(spark, sf).count()
    // complete: every vector carries exactly GraphK edges
    assert(exact.size == n * Similarity.GraphK, s"graph incomplete: ${exact.size}")
    // agreement with s1 (rank-1 neighbor for the query vectors) — two
    // machineries, one answer; s1 ranks on raw cos, the graph on e6,
    // so compare the neighbor only where the e6 top is unique
    val s1 = Similarity.s1KnnBrute(spark, sf).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("nid"), r.getAs[Long]("cos_e6"))).toMap
    s1.foreach { case (q, (nid, cos)) =>
      val (gn, gc) = exact((q, 1L))
      assert(gc == cos, s"rank-1 cosine diverged for query $q")
      if (s1.count(_ => true) > 0 && gc != exact.getOrElse((q, 2L), (0L, -2000000L))._2)
        assert(gn == nid, s"rank-1 neighbor diverged for query $q")
    }
    // the IVF graph: every edge is a true pair from the probed
    // clusters; recall vs exact is substantial but imperfect (an ANN)
    val ivf = Similarity.s23KnnGraphIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nid"))).toSet
    val exactEdges = exact.map { case ((s, _), (nid, _)) => (s, nid) }.toSet
    val recall = ivf.intersect(exactEdges).size.toDouble / exactEdges.size
    assert(recall > 0.4 && recall < 1.0,
      s"IVF graph recall $recall out of the expected ANN band")
    // one NN-descent round recovers cross-cluster neighbors: recall
    // strictly improves over the raw IVF graph
    val refined = Similarity.s24NnDescent(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nid"))).toSet
    val recall2 = refined.intersect(exactEdges).size.toDouble / exactEdges.size
    assert(recall2 > recall,
      s"NN-descent round did not lift recall: $recall -> $recall2")
    // the second gated round (s26) never regresses the first
    val refined2 = Similarity.s26NnDescent2(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nid"))).toSet
    val recall3 = refined2.intersect(exactEdges).size.toDouble / exactEdges.size
    assert(recall3 >= recall2,
      s"second NN-descent round regressed recall: $recall2 -> $recall3")
  }

  test("s20 one gated Lloyd round reproduces trainCodebook(iters=1) bit-for-bit") {
    val e = graft.Tables.embeddings(spark, sf)
    val n_corpus = e.count()
    val rows = Similarity.s20KmeansRound(spark, sf).collect()
    // the M-step sums divided by n are EXACTLY the trainer's new
    // centroids — the same (s / n / 1e9).toFloat arithmetic
    val derived = rows.groupBy(_.getAs[Long]("cluster")).map { case (cid, rs) =>
      val n = rs.head.getAs[Long]("n").toDouble
      cid -> rs.sortBy(_.getAs[Long]("j"))
        .map(r => (r.getAs[Long]("s_fp") / n / 1e9).toFloat).toSeq
    }
    val trained = Similarity.trainCodebook(e, iters = 1)
    assert(trained.nonEmpty)
    val initEmb = e.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding")).toMap
    trained.foreach { c =>
      derived.get(c.cid) match {
        case Some(emb) => assert(emb == c.emb.toSeq,
          s"cluster ${c.cid}: gated sums diverge from the trainer's round")
        case None => // empty cluster: the trainer keeps its init centroid
          assert(c.emb.toSeq == initEmb(c.cid).toSeq)
      }
    }
    // conservation: every vector lands in exactly one cluster, every
    // cluster row carries all dims exactly once
    val dim = rows.map(_.getAs[Long]("j")).max
    assert(rows.groupBy(_.getAs[Long]("cluster"))
      .forall { case (_, rs) =>
        rs.map(_.getAs[Long]("j")).sorted.toSeq == (1L to dim) })
    assert(rows.filter(_.getAs[Long]("j") == 1L).map(_.getAs[Long]("n")).sum
      == n_corpus)
  }

  test("s25 two gated Lloyd rounds reproduce trainCodebook(iters=2) bit-for-bit") {
    val e = graft.Tables.embeddings(spark, sf)
    val n_corpus = e.count()
    val rows = Similarity.s25KmeansTrain(spark, sf).collect()
    // round-2 sums divided by n are EXACTLY the two-round trainer's
    // centroids — the same (s / n / 1e9).toFloat arithmetic, so the
    // gated row pins the train→assign COMPOSITION, not one step
    val derived = rows.groupBy(_.getAs[Long]("cluster")).map { case (cid, rs) =>
      val n = rs.head.getAs[Long]("n").toDouble
      cid -> rs.sortBy(_.getAs[Long]("j"))
        .map(r => (r.getAs[Long]("s_fp") / n / 1e9).toFloat).toSeq
    }
    val trained = Similarity.trainCodebook(e, iters = 2)
    val round1 = Similarity.trainCodebook(e, iters = 1).map(c => c.cid -> c).toMap
    assert(trained.nonEmpty)
    trained.foreach { c =>
      derived.get(c.cid) match {
        case Some(emb) => assert(emb == c.emb.toSeq,
          s"cluster ${c.cid}: gated round-2 sums diverge from the trainer")
        case None => // round-2-empty cluster: the trainer keeps round 1's
          assert(c.emb.toSeq == round1(c.cid).emb.toSeq)
      }
    }
    // conservation at round 2: every vector in exactly one cluster
    assert(rows.filter(_.getAs[Long]("j") == 1L).map(_.getAs[Long]("n")).sum
      == n_corpus)
  }

  test("nnDescent: per-round recall vs the exact graph is monotone " +
      "non-decreasing, the loop stops at a round-stable fixpoint, and " +
      "the library form agrees with the manual iteration") {
    val e = Similarity.withNorm(graft.Tables.embeddings(spark, sf))
    val exactEdges = Similarity.s22KnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nid"))).toSet
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nid"))).toSet
    def recallOf(edges: Set[(Long, Long)]) =
      edges.intersect(exactEdges).size.toDouble / exactEdges.size
    val g0 = Similarity.s23KnnGraphIvf(spark, sf).localCheckpoint()
    var g = g0.toDF()
    var prev = edgeSet(g)
    var recalls = List(recallOf(prev))
    var manualRounds = 0
    var stable = false
    while (!stable && manualRounds < 10) {
      val next = Similarity.nnDescentRound(e, g).localCheckpoint()
      val cur = edgeSet(next)
      stable = cur == prev
      if (!stable) {
        manualRounds += 1
        recalls ::= recallOf(cur)
      }
      prev = cur
      g = next
    }
    assert(stable, "NN-descent did not reach a fixpoint in 10 rounds")
    assert(manualRounds >= 1, "the IVF graph was already a fixpoint — " +
      "the refinement spec is vacuous at this corpus")
    // monotone non-decreasing recall, strictly above the IVF start
    recalls.reverse.sliding(2).foreach {
      case List(a, b) => assert(b >= a, s"recall regressed: $recalls")
      case _ =>
    }
    assert(recalls.head > recalls.last,
      s"convergence never lifted recall above the IVF graph: $recalls")
    // the library loop lands on the same fixpoint with the same count
    val (refined, rounds) = Similarity.nnDescent(e, g0.toDF(), maxRounds = 10)
    assert(rounds == manualRounds,
      s"nnDescent counted $rounds working rounds, manual loop $manualRounds")
    assert(edgeSet(refined) == prev,
      "nnDescent's fixpoint differs from the manual iteration's")
  }

  test("s3 tiled join is pair-exact vs the brute-force spec") {
    val tiled = Similarity.s3CosinePairs(spark, sf).collect().map(_.toSeq).toSeq
    val brute = Similarity.s3CosinePairsBrute(spark, sf).collect().map(_.toSeq).toSeq
    assert(tiled == brute)
  }

  test("m3/m4 are narrow plans (no shuffle before the presentation tail)") {
    Seq(Multimodal.m3Resize(spark, sf), Multimodal.m4FrameSample(spark, sf))
      .foreach { df =>
        val plan = planOf(df)
        // exactly the presentation tail's exchanges: Output.ordered's
        // sampling shield + the orderBy's range partitioning
        assert(plan.split("Exchange").length - 1 <= 3,
          s"multimodal map gained a shuffle:\n$plan")
      }
  }

  test("x5: no per-term window (stopword skew); df is an aggregate broadcast back") {
    val plan = planOf(TextAnalysis.x5Tfidf(spark, sf))
    // 3 scans: tf, the df branch (can't share the tf subtree), doc count
    assert(plan.split("Scan parquet").length - 1 <= 3,
      s"x5 re-derives statistics from extra scans:\n$plan")
    assert(!plan.contains("windowspecdefinition(term"),
      s"x5 regressed to the term-partitioned (stopword-skewed) window:\n$plan")
  }

  test("e6 funnel: one scan, one user partitioning (chained-window shape)") {
    val plan = planOf(Events.e6Funnel(spark, sf))
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"funnel re-derives stages from extra scans:\n$plan")
    assert(!plan.contains("Join"), s"funnel regressed to stage joins:\n$plan")
  }

  test("x8 repetition fractions match hand-computed values; gram-less docs score zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x8docs").toString
    Seq(
      (1L, "a", "en", "t", 1L),
      (2L, "x y x y x y", "en", "t", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.x8Repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // 1 word: no grams at all → zero totals, zero fractions
    assert(out(1L) == Seq(0L, 0L, 0L, 0L, 0L))
    // "x y x y x y": 5 bigrams {x y ×3, y x ×2} → dup (5-2)/5, top 3/5;
    // 4 trigrams {x y x ×2, y x y ×2} → dup (4-2)/4
    assert(out(2L) == Seq(5L, 600000L, 600000L, 4L, 500000L))
  }

  test("x9 packing: budget respected, every doc packed once, shard ranges disjoint") {
    val seqs = TextAnalysis.x9SequencePack(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(seqs.map(_.getAs[Long]("n_docs")).sum == nDocs)
    seqs.foreach { r =>
      assert(r.getAs[Long]("seq_tokens") <= TextAnalysis.PackBudget ||
        r.getAs[Long]("n_docs") == 1L,
        s"over-budget multi-doc sequence: $r")
    }
    // greedy doc_id-order packing ⇒ within a shard, consecutive
    // sequences cover strictly increasing, disjoint doc_id ranges
    seqs.groupBy(_.getAs[Long]("shard")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("seq_id"))
      assert(sorted.map(_.getAs[Long]("seq_id")).toSeq ==
        (1L to sorted.length.toLong), "non-contiguous seq ids")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
    }
  }

  test("property: x9 packing equals a driver-side greedy reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val n = 20 + rnd.nextInt(180)
      // sparse ids across shards, token counts spanning under/oversized
      val docs = (0 until n).map { _ =>
        (rnd.nextLong().abs % 10000L, 1 + rnd.nextInt(120))
      }.distinctBy(_._1)
      val df = docs.map { case (id, nt) => (id, Seq.fill(nt)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val shards = 4
      val budget = 64L
      // driver-side greedy reference: per shard, doc_id order, reset on overflow
      val want = docs.groupBy(_._1 % shards).flatMap { case (sh, ds) =>
        var seq = 0L; var acc = 0L
        ds.sortBy(_._1).map { case (id, nt) =>
          if (seq == 0L || acc + nt > budget) { seq += 1L; acc = nt.toLong }
          else acc += nt.toLong
          (sh, seq, id, nt.toLong)
        }
      }.toSeq.groupBy(t => (t._1, t._2)).map { case ((sh, seq), g) =>
        (sh, seq, g.size.toLong, g.map(_._4).sum, g.map(_._3).min, g.map(_._3).max)
      }.toSet
      val got = TextAnalysis.packSequences(df, shards, budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got == want, s"n=${docs.size}")
    }
  }

  test("x10 curation manifest is consistent with its signal stages") {
    val manifest = TextAnalysis.x10Curate(spark, sf).collect()
    assert(manifest.length == Tables.documents(spark, sf).count())
    val kept = manifest.filter(_.getAs[Boolean]("keep"))
    assert(kept.nonEmpty && kept.length < manifest.length,
      "degenerate manifest: everything kept or everything dropped")
    // kept docs pass every rule
    kept.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("reject_reason")))
      assert(r.getAs[String]("pred_lang") == "en")
      assert(r.getAs[Long]("quality_e3") >= TextAnalysis.CurateMinQuality)
      assert(r.getAs[Long]("cluster_rep") == r.getAs[Long]("doc_id"),
        "kept doc is not its near-dup cluster's canonical")
    }
    // reject reasons agree with the underlying stages
    val exactDups = Dedup.d1ExactDedup(spark, sf).collect()
      .filter(_.getAs[Boolean]("is_dup")).map(_.getAs[Long]("doc_id")).toSet
    manifest.foreach { r =>
      val reason = Option(r.getAs[String]("reject_reason"))
      assert(reason.contains("exact_dup") ==
        exactDups.contains(r.getAs[Long]("doc_id")),
        s"exact_dup mismatch for ${r.getAs[Long]("doc_id")}: $reason")
    }
  }

  test("d7 cluster reps are consistent with s3 pairs (every paired vector shares a rep)") {
    val reps = Similarity.d7EmbedClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Similarity.s3CosinePairs(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(reps(a) == reps(b), s"pair ($a,$b) in different clusters")
    }
    reps.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep, s"rep $rep is not its cluster's min")
    }
  }

  test("d7 edge input resolves to the same broadcast tile join as s3 (strategy pin)") {
    // d7 composes cosinePairsRaw as CC's edge input — the tile-join
    // strategy switch must resolve exactly as it does under s3 (the
    // r6 bench flagged d7 slow while s3 got faster; the profile showed
    // the gap was run-position machine throttle, NOT a plan change —
    // this pin keeps it that way). The raw form also must NOT pay the
    // presentation tail: no global sort in the edge path.
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val raw = planOf(Similarity.cosinePairsRaw(e,
      spark.sparkContext.defaultParallelism))
    assert(raw.contains("BroadcastHashJoin"),
      s"d7's edge join lost the broadcast tile strategy:\n$raw")
    assert(!raw.contains("SortMergeJoin") && !raw.contains("ShuffledHashJoin"),
      s"d7's edge join picked a different strategy than s3's:\n$raw")
    assert(!raw.contains("Sort "), s"edge path pays a sort it never needs:\n$raw")
  }

  test("x11 contamination: only test-split docs report, top offender shares real shingles") {
    val rows = TextAnalysis.x11Contamination(spark, sf).collect()
    assert(rows.nonEmpty)
    // split membership must agree with x6's hash gate
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 100L
    }
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(id: Long): Set[String] = {
      val ws = texts(id).split(" ").filter(_.nonEmpty)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    rows.foreach { r =>
      val te = r.getAs[Long]("test_doc")
      val tr = r.getAs[Long]("top_train_doc")
      assert(bucket(te) >= 90L, s"test_doc $te is not in the test split")
      assert(bucket(tr) < 80L, s"top_train_doc $tr is not in the train split")
      val shared = shingleSet(te).intersect(shingleSet(tr)).size.toLong
      assert(r.getAs[Long]("top_shared") == shared,
        s"shared-shingle count mismatch for ($te,$tr)")
      assert(r.getAs[Long]("n_train_docs") >= 1L)
    }
    val plan = planOf(TextAnalysis.x11Contamination(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"contamination join degenerated:\n$plan")
  }

  test("x11 maxDf cap drops boilerplate shingles; uncapped result unchanged") {
    import spark.implicits._
    // classify candidate ids with the SAME hash gate x11 uses
    val buckets = spark.range(0, 200)
      .select(col("id"), TextAnalysis.hashBucket(col("id").cast("string")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = (0L until 200L).filter(buckets(_) < 80L).take(6)
    val testId = (0L until 200L).find(buckets(_) >= 90L).get
    assert(trainIds.size == 6)
    // every train doc carries the boilerplate shingle "common boiler
    // plate"; exactly one (leak) also contains the test doc's passage
    val leak = trainIds.head
    val docs = (trainIds.map { id =>
      val tail = if (id == leak) "secret leaked passage" else s"filler$id a b"
      (id, s"common boiler plate $tail")
    } :+ (testId -> "common boiler plate secret leaked passage"))
      .toDF("doc_id", "text")

    def one(maxDf: Option[Int]) = {
      val rows = TextAnalysis.contamination(docs, maxDf).collect()
      assert(rows.length == 1)
      val r = rows.head
      (r.getAs[Long]("test_doc"), r.getAs[Long]("n_train_docs"),
        r.getAs[Long]("top_train_doc"), r.getAs[Long]("top_shared"))
    }
    // uncapped: the boilerplate shingle pairs the test doc with every
    // train doc; the leak doc tops with all 4 shingles of the passage
    assert(one(None) == ((testId, 6L, leak, 4L)))
    // cap below the boilerplate's train DF (6): only the leak's three
    // DF-1 shingles survive, the other five train docs drop out
    assert(one(Some(1)) == ((testId, 1L, leak, 3L)))
    // cap at/above the max train DF: inactive, identical to uncapped
    assert(one(Some(6)) == one(None))
  }

  test("x15 span dedup drops cross-doc boilerplate, keeps unique spans in order") {
    import spark.implicits._
    // 10-token docs → two 5-token segments each. Docs 1 and 2 share the
    // SAME boilerplate first segment; their second segments are unique.
    // Doc 3 repeats a segment WITHIN itself only (df = 1 → kept: within-
    // doc repetition is x8's signal, not boilerplate). Doc 4 is empty.
    val boiler = "all rights reserved site footer"
    val docs = Seq(
      (1L, s"$boiler unique one tail for alpha"),
      (2L, s"$boiler unique two tail for bravo"),
      (3L, "echo echo echo echo echo echo echo echo echo echo"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.spanDedup(docs, maxDf = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept_segs"),
          r.getAs[String]("cleaned_text"))).toMap
    assert(got(1L) == ((2L, 1L, "unique one tail for alpha")))
    assert(got(2L) == ((2L, 1L, "unique two tail for bravo")))
    assert(got(3L) == ((2L, 2L, docs.filter(col("doc_id") === 3L)
      .head().getAs[String]("text"))))
    assert(got(4L) == ((0L, 0L, "")))
    // reshuffle-proof: the decision is a pure function of the corpus
    val re = TextAnalysis.spanDedup(docs.repartition(7), maxDf = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept_segs"),
          r.getAs[String]("cleaned_text"))).toMap
    assert(re == got)
    // raising maxDf to 2 keeps the shared segment in both docs
    val relaxed = TextAnalysis.spanDedup(docs, maxDf = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept_segs")).toMap
    assert(relaxed(1L) == 2L && relaxed(2L) == 2L)
  }

  test("x15 partial tail segments participate; segmentation is non-overlapping") {
    import spark.implicits._
    // 7 tokens → segments of 5 + 2; the 2-token tail is its own unit
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "z z z z z f g")).toDF("doc_id", "text") // shares ONLY the tail
    val got = TextAnalysis.spanDedup(docs, maxDf = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segs"), r.getAs[String]("cleaned_text"))).toMap
    // the shared "f g" tail is boilerplate under maxDf=1; heads survive
    assert(got(1L) == ((2L, "a b c d e")))
    assert(got(2L) == ((2L, "z z z z z")))
  }

  test("x35 substring dedup finds repeats at ANY alignment and merges maximal spans") {
    import spark.implicits._
    // W = 6. An 8-token passage shared by docs 1 and 2 at DIFFERENT
    // offsets (0 vs 3) — the alignment x15's fixed segmentation misses.
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    val runA = "a1 a2 a3 a4 a5 a6"
    val docs = Seq(
      (1L, s"$passage u1 u2"),            // passage at tokens 0..7
      (2L, s"v1 v2 v3 $passage"),         // passage at tokens 3..10
      (3L, s"w1 $runA w2 $runA"),         // WITHIN-doc repeat: 1..6, 8..13
      (4L, "x1 x2 x3"),                   // shorter than W → no windows
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(docs, minCount = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_dup_tokens"),
          r.getAs[Long]("span_start_sum"), r.getAs[Long]("span_end_sum"),
          r.getAs[Long]("dup_frac_e6"))).toMap
    // doc 1: windows p=0,1,2 duplicated (the 3 fully-inside-passage
    // alignments) → ONE maximal span [0,7], 8 of 10 tokens
    assert(got(1L) == ((10L, 3L, 1L, 8L, 0L, 7L, 800000L)))
    // doc 2: same passage at p=3,4,5 → span [3,10], 8 of 11 tokens
    assert(got(2L) == ((11L, 3L, 1L, 8L, 3L, 10L, 727272L)))
    // doc 3: the run appears twice IN THE SAME doc — suffix-array
    // occurrence semantics (count ≥ 2), unlike x15's distinct-doc DF;
    // two disjoint spans [1,6] and [8,13] (gap at token 7)
    assert(got(3L) == ((14L, 2L, 2L, 12L, 9L, 19L, 857142L)))
    assert(got(4L) == ((3L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    // reshuffle-proof: pure function of the corpus
    val re = TextAnalysis.substringDedup(docs.repartition(7), minCount = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_dup_tokens"),
          r.getAs[Long]("span_start_sum"), r.getAs[Long]("span_end_sum"),
          r.getAs[Long]("dup_frac_e6"))).toMap
    assert(re == got)
  }

  test("x35 adjacent duplicated intervals merge into one contiguous span") {
    import spark.implicits._
    // doc 6 is run B twice back-to-back: duplicated windows at p=0 and
    // p=6 (the in-between alignments straddle the seam and occur once).
    // Intervals [0,5] and [6,11] are ADJACENT (6 = 5+1) → one span.
    val runB = "b1 b2 b3 b4 b5 b6"
    val docs = Seq(
      (6L, s"$runB $runB"),
      (7L, s"z1 z2 $runB z3")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(docs, minCount = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_windows"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("span_start_sum"),
          r.getAs[Long]("span_end_sum"))).toMap
    assert(got(6L) == ((2L, 1L, 12L, 0L, 11L)))
    assert(got(7L) == ((1L, 1L, 6L, 2L, 7L)))
    // raising the threshold above the occurrence count disarms it
    val none = TextAnalysis.substringDedup(docs, minCount = 4L).collect()
      .map(_.getAs[Long]("n_dup_windows")).sum
    assert(none == 0L)
  }

  test("x12 PII scrub detects and redacts constructed emails/phones/IPs/SSNs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x12docs").toString
    Seq(
      (1L, "contact me at jane.doe+test@example.co.uk or 555-123-4567 thanks"),
      (2L, "no personal data here just words"),
      (3L, "two mails a@b.io c.d@e-f.org and 111-222-3333 999-888-7777"),
      (4L, "server 10.0.42.7 and 255.255.255.255 sent ssn 078-05-1120"),
      // near-misses: 4-digit octet, 2-3-4 dashes, SSN shape overrun, no TLD
      (5L, "almost pii 1234.5.6.7 and 12-34-5678 and 555-12-34567 and a@b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    case class P(em: Long, ph: Long, ip: Long, ssn: Long, pii: Boolean, rl: Long)
    val out = TextAnalysis.x12PiiScrub(spark, dir).collect()
      .map(r => r.getLong(0) ->
        P(r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ipv4"), r.getAs[Long]("n_ssn"),
          r.getAs[Boolean]("has_pii"), r.getAs[Long]("redacted_len"))).toMap
    assert(out(1L).em == 1L && out(1L).ph == 1L && out(1L).pii)
    assert(out(2L) == P(0, 0, 0, 0, pii = false,
      "no personal data here just words".length.toLong))
    assert(out(3L).em == 2L && out(3L).ph == 2L && out(3L).pii)
    assert(out(4L) == P(0, 0, 2, 1, pii = true,
      "server [PII] and [PII] sent ssn [PII]".length.toLong))
    assert(out(5L) == P(0, 0, 0, 0, pii = false,
      "almost pii 1234.5.6.7 and 12-34-5678 and 555-12-34567 and a@b".length.toLong))
    // every match collapses to the 5-char token: redacted lengths are
    // exactly computable from the originals
    assert(out(1L).rl == "contact me at [PII] or [PII] thanks".length.toLong)
    assert(out(3L).rl == "two mails [PII] [PII] and [PII] [PII]".length.toLong)
    // the PII fixtures ride along in every x12 run (negative doc_ids) —
    // they are what makes the DuckDB oracle exercise PII-shaped strings
    assert(out(-4L).em == 1L && out(-4L).ph == 1L && out(-4L).ip == 1L)
    assert(out(-3L).ssn == 1L && out(-3L).ip == 3L)
    assert(!out(-2L).pii)
    // "1.2.3.4.5" yields exactly one dotted-quad match in BOTH engines
    assert(out(-1L) == P(2, 1, 2, 2, pii = true,
      "[PII] [PII] [PII].5 [PII] [PII] [PII] [PII]".length.toLong))
  }

  test("x10 joins stay hash/merge equi-joins (no cartesian fallback)") {
    val plan = planOf(TextAnalysis.x10Curate(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"x10 signal join degenerated:\n$plan")
  }

  test("text/dedup scans prune to doc_id+text only") {
    val plan = planOf(TextAnalysis.x4Fingerprint(spark, sf))
    assert(plan.contains("ReadSchema"), "no read schema in plan")
    assert(!plan.contains("n_chars"), "unused documents column not pruned")
    assert(!plan.contains("source"), "unused documents column not pruned")
  }

  test("x13 LM score: train docs have zero OOV, unseen test words count as OOV") {
    import spark.implicits._
    // drive the split from the REAL hash gate: find a train id and a
    // test id by computing the bucket driver-side (x6's md5 mod 100)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 100L
    }
    val trainId = (0L to 500L).find(bucket(_) < 80L).get
    val testId = (0L to 500L).find(bucket(_) >= 90L).get
    val docs = Seq(
      (trainId, "the cat sat on the mat"),
      (testId, "the cat zzzunseen words here")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("n_oov"), r.getAs[Long]("mean_lp_e4"))).toMap
    assert(out(trainId)._1 == "train" && out(testId)._1 == "test")
    // train tokens ARE the model: no OOV by construction
    assert(out(trainId)._3 == 0L)
    // "zzzunseen"/"words"/"here" are not in the 2-doc train vocabulary
    assert(out(testId)._3 == 3L, s"expected 3 OOV tokens: ${out(testId)}")
    assert(out(trainId)._2 == 6L && out(testId)._2 == 5L)
    // log-probs are negative, and the OOV-heavy doc scores lower
    assert(out(trainId)._4 < 0L && out(testId)._4 < out(trainId)._4)
    // the whole corpus scores: every doc exactly once, all train rows clean
    val full = TextAnalysis.x13LmScore(spark, sf).collect()
    assert(full.length == Tables.documents(spark, sf).count())
    assert(full.filter(_.getAs[String]("split") == "train")
      .forall(_.getAs[Long]("n_oov") == 0L))
  }

  test("x14 source mix: quotas filled exactly, proportions match weights, reshuffle-proof") {
    val out = TextAnalysis.x14SourceMix(spark, sf).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      val w = rows.head.getAs[Long]("weight")
      val quota = rows.head.getAs[Long]("quota")
      val kept = rows.count(_.getAs[Boolean]("keep"))
      assert(kept == quota, s"$src kept $kept of quota $quota")
      // quota = weight × the shared K: proportions match weights exactly
      assert(quota == w * (quota / w) && quota % w == 0L)
    }
    // shared K: quota/weight identical across sources
    val ks = out.map(r => r.getAs[Long]("quota") / r.getAs[Long]("weight")).toSet
    assert(ks.size == 1, s"inconsistent K across sources: $ks")
    // every source can fill its quota (K is the binding constraint)
    bySource.foreach { case (src, rows) =>
      assert(rows.head.getAs[Long]("quota") <= rows.head.getAs[Long]("n_src"),
        s"$src quota exceeds its population")
    }
    // deterministic under re-partitioning: the KEPT SET is a function of
    // the data, not the physical layout
    val keptA = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val keptB = TextAnalysis.sourceMix(
      Tables.documents(spark, sf).repartition(7, col("text")))
      .collect().filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    assert(keptA == keptB, "kept set changed under re-partitioning")
  }

  test("x13/x14 plan audit: model/caps broadcast back, one data shuffle each") {
    // x13: the vocabulary joins back as a BROADCAST (stopword skew
    // stays in the map-side-combined model aggregate, never a per-token
    // window); the token stream shuffles once, onto its doc grouping
    val lmPlan = planOf(TextAnalysis.x13LmScore(spark, sf))
    assert(lmPlan.contains("BroadcastExchange"), s"model not broadcast:\n$lmPlan")
    assert(!lmPlan.contains("SortMergeJoin"),
      s"token-model join degraded to a full shuffle join:\n$lmPlan")
    // x14: caps and K broadcast; the docs shuffle once for the
    // per-source rank window
    val mixPlan = planOf(TextAnalysis.x14SourceMix(spark, sf))
    assert(mixPlan.contains("BroadcastExchange"), s"caps not broadcast:\n$mixPlan")
    val mixShuffles = "Exchange hashpartitioning".r.findAllIn(mixPlan).length
    // docs→window shuffle + the caps aggregate's own tiny shuffle;
    // nothing should shuffle the doc population twice
    assert(mixShuffles <= 2, s"x14 shuffles the corpus more than once:\n$mixPlan")
  }

  test("x23 threshold mix: selects exactly x14's kept set (corpus + skew), " +
      "quota-0 when a source is smaller than its weight, thresholds broadcast") {
    import spark.implicits._
    // rollup of x14's per-doc rank form, the semantic ground truth
    def rankRollup(docs: org.apache.spark.sql.DataFrame) =
      TextAnalysis.sourceMix(docs)
        .groupBy(col("source"))
        .agg(count(when(col("keep"), lit(1))).as("n_kept"),
          coalesce(sum(when(col("keep"), col("doc_id"))), lit(0L))
            .as("kept_id_sum"),
          min(when(col("keep"), col("doc_id"))).as("kept_id_min"),
          max(when(col("keep"), col("doc_id"))).as("kept_id_max"))
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"),
            r.getAs[Any]("kept_id_min"), r.getAs[Any]("kept_id_max"))).toMap
    def thrRollup(docs: org.apache.spark.sql.DataFrame) =
      TextAnalysis.sourceMixThreshold(docs)
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"),
            r.getAs[Any]("kept_id_min"), r.getAs[Any]("kept_id_max"))).toMap
    val corpus = Tables.documents(spark, sf)
    assert(thrRollup(corpus) == rankRollup(corpus),
      "threshold selection diverged from the rank form on the corpus")
    // heavy skew: one source carries nearly everything; selection must
    // still match and the big source must not be dropped or inflated
    val skewed = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") < 1990L, lit("web"))
        .when(col("id") < 1998L, lit("books"))
        .otherwise(lit("code")).as("source"))
    assert(thrRollup(skewed) == rankRollup(skewed),
      "threshold selection diverged under source skew")
    // a source smaller than its weight forces K = 0 ⇒ nothing kept
    // anywhere (the binding-constraint contract); find a weight≥2 name
    // the same way both engines derive weights
    val names = (1 to 50).map(i => s"src$i")
    val weights = names.toDF("source")
      .withColumn("w", lit(1L) + TextAnalysis.hashBucket(col("source")) % 3L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("w")).toMap
    val heavy = names.find(weights(_) >= 2L).get
    val tiny = spark.range(100).select(col("id").as("doc_id"),
        lit("web").as("source"))
      .union(Seq((10000L, heavy)).toDF("doc_id", "source"))
    val tinyOut = thrRollup(tiny)
    assert(tinyOut == rankRollup(tiny))
    assert(tinyOut.values.forall(_._1 == 0L),
      s"K=0 must keep nothing, got $tinyOut")
    // the per-source thresholds and boundary buckets come back as
    // broadcasts — the corpus is never sorted or windowed whole
    val plan = planOf(TextAnalysis.x23SourceMixAtScale(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"thresholds not broadcast:\n$plan")
  }

  test("x24 gopher rules: each rule trips on its constructed violator and " +
      "a clean doc passes all seven") {
    import spark.implicits._
    val goodBody = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the of and to be" // 65 words, all alphabetic, 5 required words
    val docs = Seq(
      1L -> goodBody,                                     // passes all
      2L -> "the of and short",                           // rule 1: too few words
      3L -> ((1 to 60).map(_ => "zq").mkString(" ") + " the of and"), // rule 2: mean len < 3
      4L -> ((1 to 60).map(i => s"word$i").mkString(" ") +
        " the of # # # # # # #"),                         // rule 3: symbol ratio > 0.1
      5L -> ("- one\n- two\n- three\nthe of and " + goodBody), // rule 4: 3/4 bullet lines
      6L -> ("end...\nmore...\n" + goodBody),              // rule 5: 2/3 ellipsis lines
      7L -> ((1 to 60).map(_ => "123").mkString(" ") + " the of and"), // rule 6: <80% alpha
      8L -> ((1 to 60).map(i => s"word$i").mkString(" ")) // rule 7: no required words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"), s"clean doc failed: ${out(1L)}")
    (2L to 8L).foreach { id =>
      assert(!out(id).getAs[Boolean]("gopher_pass"), s"doc $id should fail")
    }
    // the tripped signal is the intended one
    assert(out(2L).getAs[Long]("n_words") < 50L)
    assert(out(3L).getAs[Long]("mean_word_len_e3") < 3000L)
    assert(out(4L).getAs[Long]("symbol_ratio_e6") > 100000L)
    assert(out(5L).getAs[Long]("bullet_ratio_e6") > 100000L,
      s"bullet ratio: ${out(5L)}")
    assert(out(6L).getAs[Long]("ellipsis_ratio_e6") > 300000L)
    assert(out(7L).getAs[Long]("alpha_ratio_e6") < 800000L)
    assert(out(8L).getAs[Long]("n_req_stop") < 2L)
    // '....' counts ONE non-overlapping '...' in both engines; '…' and
    // bullet '•' are single chars
    val sym = TextAnalysis.gopherRules(
      Seq((9L, "a.... b\n• x\ny …")).toDF("doc_id", "text")).collect()(0)
    // 1 sym / 4 words ('b\n•' and 'x\ny' are single space-split tokens)
    assert(sym.getAs[Long]("symbol_ratio_e6") == 250000L, s"got $sym")
    assert(sym.getAs[Long]("bullet_ratio_e6") == 333333L)
    assert(sym.getAs[Long]("ellipsis_ratio_e6") == 333333L)
  }

  test("x25 normalize: NFC composes decomposed text (Latin + Hangul), " +
      "compatibility forms survive, controls/CRLF/whitespace canonicalized, " +
      "ASCII is an allocation-free identity") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    // kernel fast path: ASCII returns the INPUT OBJECT (no copy)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(graft.functions.NfcNormalizeExpr.nfc(ascii) eq ascii)
    // already-NFC non-ASCII also returns the input object
    val composed = UTF8String.fromString("caf\u00e9")
    assert(graft.functions.NfcNormalizeExpr.nfc(composed) eq composed)
    val docs = Seq(
      (1L, "cafe\u0301"),           // decomposed e + U+0301 -> U+00E9
      (2L, "\u1100\u1161\u11a8"),   // Hangul jamo -> syllable U+AC01
      (3L, "\ufb01le"),             // fi ligature: NFC must NOT touch it
      (4L, "a\r\nb\rc"),            // CRLF and CR -> LF
      (5L, "a\u0001b\u0002c\u007fd"), // C0 controls + DEL stripped
      (6L, "  a \t b  "),           // collapse + trim
      (7L, "plain")                  // identity
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeDocs(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Boolean]("changed"))).toMap
    assert(out(1L) == (("caf\u00e9", true)))
    assert(out(2L) == (("\uac01", true)))
    assert(out(3L) == (("\ufb01le", false)))
    assert(out(4L) == (("a\nb\nc", true)))
    assert(out(5L) == (("abcd", true)))
    assert(out(6L) == (("a b", true)))
    assert(out(7L) == (("plain", false)))
    // normalization makes visually-equal docs hash-equal: the dedup
    // motivation, end to end through the x4 fingerprint path
    val fp = TextAnalysis.normalizeDocs(
      Seq((1L, "cafe\u0301 x"), (2L, "caf\u00e9 x")).toDF("doc_id", "text"))
      .select(col("doc_id"), md5(col("clean_text")).as("h"))
      .collect().map(_.getAs[String]("h")).toSet
    assert(fp.size == 1, "NFC-equal docs must fingerprint identically")
  }

  test("x26 CMS: sketch is bit-identical under any partitioning (merge " +
      "order), estimates dominate exact counts for EVERY token, and the " +
      "buffer survives the serialized partial-aggregation shuffle") {
    import spark.implicits._
    val words = (1 to 40).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val staged = words.toDF("w")
      .withColumn("hs", array((0 until TextAnalysis.CmsDepth).map { j =>
        conv(substring(md5(concat(lit(s"$j:"), col("w"))), 1, 8), 16, 10)
          .cast("long")
      }: _*))
    def sketchOf(parts: Int): Seq[Long] = staged.repartition(parts)
      .agg(graft.functions.GraftFunctions.cms_sketch(col("hs"),
        TextAnalysis.CmsDepth, TextAnalysis.CmsWidth).as("cms"))
      .collect()(0).getSeq[Long](0)
    val one = sketchOf(1)
    val many = sketchOf(13)    // forces partial buffers + serialize/merge
    assert(one == many, "sketch depends on partitioning/merge order")
    assert(one.sum == words.size.toLong * TextAnalysis.CmsDepth,
      "every (token, row) increment must land exactly once")
    // one-sided guarantee on every token, not just the probed top-k
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (w, n) =>
      val est = (0 until TextAnalysis.CmsDepth).map { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$j:$w".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val bucket = (java.lang.Long.parseLong(hex, 16) %
          TextAnalysis.CmsWidth).toInt
        one(j * TextAnalysis.CmsWidth + bucket)
      }.min
      assert(est >= n, s"CMS underestimated $w: $est < $n")
    }
    // the query's probe arithmetic agrees with the sketch contract
    val out = TextAnalysis.x26CmsFreq(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"),
        s"one-sided bound violated: $r")
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_n") - r.getAs[Long]("exact_n"))
    }
  }

  test("x36 HLL: native registers match the groupBy spec, MAX-merge is " +
      "duplicate-insensitive and partitioning-proof, rank arithmetic " +
      "pinned on crafted hashes, estimate lands in the documented band") {
    import spark.implicits._
    val vals = (1 to 300).map(i => (if (i % 3 == 0) "a" else "b", s"val$i"))
    val hashed = vals.toDF("source", "g")
      .select(col("source"), TextAnalysis.hllHash(col("g")).as("h"))
    def regsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      df.groupBy(col("source"))
        .agg(graft.functions.GraftFunctions
          .hll_sketch(col("h"), TextAnalysis.HllM).as("regs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val one = regsOf(hashed.repartition(1))
    val many = regsOf(hashed.repartition(13)) // partial buffers + merge
    assert(one == many, "sketch depends on partitioning/merge order")
    // MAX-merge is idempotent: duplicated input leaves the sketch
    // unchanged — the algebra that frees the streaming twin from
    // exactly-once fencing
    val dup = regsOf(hashed.union(hashed).repartition(7))
    assert(dup == one, "duplicate rows changed the sketch")
    // native ≡ executable groupBy spec, register by register
    val spec = TextAnalysis.hllRegistersSpec(hashed).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("register")) ->
        r.getAs[Long]("max_rank")).toMap
    one.foreach { case (src, regs) =>
      regs.zipWithIndex.foreach { case (mr, i) =>
        assert(spec((src, i.toLong)) == mr,
          s"register $i of $src: native $mr vs spec") } }
    // rank arithmetic on crafted hashes h = idx + 64·w:
    //   w = 0 → 55; w = 1 → 54; w = 2 → 53; w = 2^53 (top bit) → 1
    val crafted = Seq(0L, 1L + 64L, 2L + 128L, 3L + (1L << 59))
      .map(h => ("c", h)).toDF("source", "h")
    val cregs = regsOf(crafted)("c")
    assert(cregs(0) == 55L && cregs(1) == 54L && cregs(2) == 53L &&
      cregs(3) == 1L && cregs.drop(4).forall(_ == 0L))
    // end to end: every source emits all m registers; the raw harmonic
    // estimate lands within the documented band of the exact count
    // (1.04/√64 ≈ 13% expected error; assert a loose 2σ-ish 40%)
    val out = TextAnalysis.x36HllDistinct(spark, sf).collect()
    val bySrc = out.groupBy(_.getString(0))
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("register")).sorted.toSeq ==
        (0L until TextAnalysis.HllM.toLong))
      val n = rows.head.getAs[Long]("n_exact").toDouble
      val est = rows.head.getAs[Long]("est_e3").toDouble / 1000.0
      assert(n > 0 && math.abs(est - n) / n < 0.40,
        s"$src: estimate $est vs exact $n out of band")
    }
    // adversarial negative hash fails loudly, never mis-registers
    val ex = intercept[org.apache.spark.SparkException] {
      Seq(("z", -1L)).toDF("source", "h").groupBy(col("source"))
        .agg(graft.functions.GraftFunctions.hll_sketch(col("h"), 64))
        .collect()
    }
    assert(ex.getMessage.contains("hll_sketch") ||
      ex.getCause != null)
  }

  test("x37 ccnet buckets equal the single-window ntile form; thirds are " +
      "exact; pairless (NULL-score) docs land in the tail") {
    val got = TextAnalysis.x37CcnetBuckets(spark, sf).collect()
    val scored = TextAnalysis.bigramScore(graft.Tables.documents(spark, sf))
      .select(col("doc_id"), col("mean_lp_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_lp_e4").desc_nulls_last, col("doc_id").asc)
    val ref = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n"))))
      .withColumn("b", expr("((rank - 1) * 3) div n + 1"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("b"))).toMap
    assert(got.nonEmpty && got.length == ref.size)
    got.foreach { r =>
      val (rk, b) = ref(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("rank") == rk,
        s"rank diverged for doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[String]("bucket") == Seq("head", "middle", "tail")(b.toInt - 1))
    }
    // exact thirds: bucket sizes differ by at most 1
    val sizes = got.groupBy(_.getAs[String]("bucket")).view.mapValues(_.length)
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toMap.toString)
    // NULL scores (pairless docs) rank LAST — tail membership
    got.filter(r => r.isNullAt(r.fieldIndex("mean_lp_e4"))).foreach { r =>
      assert(r.getAs[String]("bucket") == "tail",
        s"NULL-score doc ${r.getAs[Long]("doc_id")} not in tail")
    }
  }

  test("x27 weighted sample: reshuffle-proof, plans as TakeOrdered (no " +
      "global sort), bottom-K is mergeable, higher weight raises selection " +
      "rate") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.weightedSample(docs).collect()
    assert(out.length == TextAnalysis.WorK)
    // membership is a pure function of the data, not the layout
    val reshuffled = TextAnalysis.weightedSample(
        docs.repartition(7, col("text"))).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      reshuffled.map(_.getAs[Long]("doc_id")).toSeq)
    // bottom-K via per-partition heaps, not a global sort
    val plan = TextAnalysis.weightedSample(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"no TakeOrdered:\n$plan")
    // mergeable: bottom-K of the union == bottom-K over merged
    // per-shard bottom-Ks (the incremental-maintenance identity)
    val half1 = TextAnalysis.weightedSample(docs.filter(col("doc_id") % 2 === 0))
    val half2 = TextAnalysis.weightedSample(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = half1.union(half2)
      .orderBy(col("priority"), col("doc_id")).limit(TextAnalysis.WorK)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(merged == out.map(_.getAs[Long]("doc_id")).toSeq,
      "bottom-K must be mergeable across shards")
    // per-capita selection rate rises with weight (500 docs, K=100:
    // the 3×-weighted stratum must out-rate the 1×-weighted one)
    val pop = docs.groupBy(
        when(col("lang") === "en", 3L)
          .when(col("lang").isin("de", "es", "fr"), 2L).otherwise(1L)
          .as("w"))
      .count().collect().map(r => r.getAs[Long]("w") -> r.getAs[Long]("count")).toMap
    val sel = out.groupBy(_.getAs[Long]("weight")).view.mapValues(_.length).toMap
    val rate3 = sel.getOrElse(3L, 0).toDouble / pop(3L)
    val rate1 = sel.getOrElse(1L, 0).toDouble / pop(1L)
    assert(rate3 > rate1,
      s"weight-3 per-capita rate $rate3 should exceed weight-1 rate $rate1")
  }

  test("d15 subsumption: an embedded quote is dropped for its container, " +
      "chains resolve to the maximal doc, equals are tie-broken by id, " +
      "and resemblance-distinct docs survive") {
    import spark.implicits._
    val inner = (1 to 8).map(i => s"q$i").mkString(" ")       // 6 shingles
    val mid = inner + " " + (1 to 8).map(i => s"m$i").mkString(" ")
    val outer = mid + " " + (1 to 8).map(i => s"o$i").mkString(" ")
    val docs = Seq(
      (1L, inner),                                   // ⊂ 2 ⊂ 3
      (2L, mid),
      (3L, outer),
      (4L, (1 to 12).map(i => s"z$i").mkString(" ")), // unrelated
      (5L, inner)                                    // duplicate of 1
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("d15").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.d15Subsumption(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("subsumed"), Option(r.get(r.fieldIndex("subsumed_by")))
          .map(_.asInstanceOf[Long]))).toMap
    // inner is subsumed and names the LARGEST container (outer, doc 3)
    assert(out(1L) == ((true, Some(3L))), s"got ${out(1L)}")
    assert(out(2L) == ((true, Some(3L))))
    assert(out(3L) == ((false, None)), "the maximal doc must survive")
    assert(out(4L) == ((false, None)))
    // equal-content docs: the larger ID defers to the smaller
    assert(out(5L)._1 && out(5L)._2.exists(b => b == 1L || b == 3L),
      s"duplicate must be subsumed: ${out(5L)}")
    assert(!out(1L)._2.contains(5L), "tie rule: 1 must not defer to 5")
  }

  test("d9 containment: directed — a short doc inside a long one scores 1.0 one way only") {
    import spark.implicits._
    val longText = (1 to 20).map(i => s"w$i").mkString(" ")   // 18 shingles
    val shortText = (1 to 5).map(i => s"w$i").mkString(" ")   // 3 shingles, all in long
    val docs = Seq((1L, longText), (2L, shortText), (3L, "totally different text here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, maxDf = None).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"),
          r.getAs[Long]("containment_e6"))).toMap
    // short→long: every one of short's 3 shingles is in long — 100%
    assert(pairs((2L, 1L)) == ((3L, 3L, 1000000L)), s"got $pairs")
    // long→short: 3/18 = 16.7% < the 50% gate — direction matters
    assert(!pairs.contains((1L, 2L)), "diluted direction leaked through the gate")
    assert(!pairs.keys.exists(k => k._1 == 3L || k._2 == 3L), "unrelated doc paired")
    // Jaccard for the same pair is 3/18 — BELOW d3's LSH regime; d9
    // exists precisely because resemblance misses embeddings like this
    // maxDf drops boilerplate postings wholesale (the d3/x11 cap)
    val boiler = (1L to 10L).map(i => (i, s"same boiler plate text u$i")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(boiler, maxDf = None).count() > 0L,
      "fixture lost its boilerplate overlap")
    assert(Dedup.containmentPairs(boiler, maxDf = Some(5L)).count() == 0L,
      "a 10-doc posting survived maxDf=5")
    // corpus invariants: scores within gates, intersection bounded by |S(a)|
    val corpus = Dedup.d9Containment(spark, sf).collect()
    assert(corpus.nonEmpty, "no containment pairs on the corpus")
    corpus.foreach { r =>
      val (sh, na, c) = (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"),
        r.getAs[Long]("containment_e6"))
      assert(sh <= na && c >= Dedup.MinContainE6 && c <= 1000000L, s"bad row $r")
    }
  }

  test("e9 anomaly: integer-exact 3σ boundary, quiet starts, robust to its own spikes") {
    import spark.implicits._
    // alternating 9/11 baseline (mean 10, popvar 1 over 24 buckets) then
    // a probe bucket: z = |n−10| exactly, so 13 (z=3, z²=9 NOT > 9) must
    // stay quiet and 14 (z=4) must flag — the strict-inequality boundary
    // the cross-multiplied integer form gets exactly right
    val base = (1 to 24).map(h => (h.toLong, if (h % 2 == 0) 9L else 11L))
    val series =
      base.map { case (h, n) => ("t3", h, n) } ++ Seq(("t3", 25L, 13L)) ++
        base.map { case (h, n) => ("t4", h, n) } ++ Seq(("t4", 25L, 14L)) ++
        // constant-zero-variance series: any deviation flags (σ=0)…
        (1 to 24).map(h => ("tc", h.toLong, 10L)) ++ Seq(("tc", 25L, 11L)) ++
        // …but an EQUAL bucket does not (0 > 0 is false)
        Seq(("tc", 26L, 10L)) ++
        // short series: huge spike but only 5 trailing buckets → quiet
        (1 to 5).map(h => ("ts", h.toLong, 10L)) ++ Seq(("ts", 6L, 1000L))
    val flags = Events.anomalyFlags(
      series.toDF("event_type", "hour_s", "n_events")
        .select(col("hour_s"), col("event_type"), col("n_events")))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_s")) ->
        r.getAs[Boolean]("is_anomaly")).toMap
    assert(!flags(("t3", 25L)), "z=3 exactly must NOT flag (strict >)")
    assert(flags(("t4", 25L)), "z=4 must flag")
    assert(flags(("tc", 25L)), "deviation from a zero-variance baseline must flag")
    assert(!flags(("tc", 26L)), "equal bucket over zero variance must not flag")
    assert(!flags(("ts", 6L)), "under-filled trailing window must never flag")
    // the tc spike sits in tc-26's trailing window but, as ONE outlier,
    // inflates the variance it is measured against — still quiet (the
    // trailing-only frame keeps a bucket out of its OWN baseline, and a
    // single spike does not poison the next bucket into flagging)
    // full corpus: one row per hourly bucket, flags only where the
    // window is adequately filled
    val full = Events.e9Anomaly(spark, sf)
    val plan = planOf(full)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"e9 should shuffle exactly twice (full-width agg + tiny series window):\n$plan")
    val rows = full.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("trail_n") <= Events.TrailBuckets.toLong)
      if (r.getAs[Long]("trail_n") < Events.MinTrail.toLong)
        assert(!r.getAs[Boolean]("is_anomaly"), s"under-filled window flagged: $r")
    }
  }

  test("e9 anomaly: decimal-widened z² survives counts past the int64 wrap, loud bound") {
    import spark.implicits._
    // A quiet baseline then a 5e8 spike: dev = 24·5e8 = 1.2e10, so
    // dev² = 1.44e20 — PAST int64. Wrapped two's-complement math maps
    // it to a NEGATIVE long (1.44e20 mod 2^64 > Long.Max), so unwidened
    // arithmetic says "quiet" for an obvious anomaly; the decimal(38,0)
    // form must flag it.
    val spike = ((1 to 24).map(h => ("big", h.toLong, 1L)) :+
      (("big", 25L, 500000000L)))
      .toDF("event_type", "hour_s", "n_events")
      .select(col("hour_s"), col("event_type"), col("n_events"))
    val flags = Events.anomalyFlags(spike).collect()
      .map(r => r.getAs[Long]("hour_s") -> r.getAs[Boolean]("is_anomaly")).toMap
    assert(flags(25L), "5e8 spike over a quiet baseline must flag (int64 wrap bug)")
    // exact z boundary at large counts: alternating ±1e7 around 5e8
    // (σ=1e7); a z=3 probe stays quiet (strict >), z=4 flags — both
    // cross-products exceed int64 en route
    val base = (1 to 24).map(h =>
      ("b", h.toLong, if (h % 2 == 0) 490000000L else 510000000L))
    val big = (base ++ Seq(("b", 25L, 530000000L)) ++
      base.map { case (_, h, n) => ("c", h, n) } ++ Seq(("c", 25L, 540000000L)))
      .toDF("event_type", "hour_s", "n_events")
      .select(col("hour_s"), col("event_type"), col("n_events"))
    val bf = Events.anomalyFlags(big).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_s")) ->
        r.getAs[Boolean]("is_anomaly")).toMap
    assert(!bf(("b", 25L)), "z=3 at 5e8-scale counts must stay quiet")
    assert(bf(("c", 25L)), "z=4 at 5e8-scale counts must flag")
    // counts above MaxBucketCount would overflow the BIGINT Σn² output
    // column — the operator must raise, not wrap
    val over = Seq(("x", 1L, Events.MaxBucketCount + 1L))
      .toDF("event_type", "hour_s", "n_events")
      .select(col("hour_s"), col("event_type"), col("n_events"))
    val err = intercept[Exception] { Events.anomalyFlags(over).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("MaxBucketCount")),
      s"expected the loud bound guard, got: $err")
  }

  test("e8 open last band: values past any finite cap land in band 5, domain contract") {
    import spark.implicits._
    // the last band must be genuinely open-ended: 1e9 and 5e9 (past the
    // old cap) both land in band 5 in BOTH forms; negative values are
    // out of the [0, ∞) domain by contract (no band, NULL bin)
    val ev = Seq((1L, 0.0), (1L, 5.0), (2L, 30.0), (2L, 1e9), (3L, 5e9),
      (3L, -1.0)).toDF("user_id", "value")
    val joined = Events.bandJoin(spark, ev).collect()
      .map(r => r.getAs[Long]("band_id") -> r.getAs[Long]("n_events")).toMap
    assert(joined == Map(0L -> 2L, 2L -> 1L, 5L -> 2L),
      s"open-band join aggregates wrong: $joined")
    val binned = ev.select(col("value"), Events.bandOf(col("value")).as("b"))
      .collect().map(r => r.getAs[Double]("value") ->
        Option(r.getAs[java.lang.Long]("b")).map(_.toLong)).toMap
    assert(binned(1e9) == Some(5L) && binned(5e9) == Some(5L),
      s"bandOf caps the open band: $binned")
    assert(binned(-1.0).isEmpty, "negative value must bin to NULL (out of domain)")
    // conservation over the in-domain rows: nothing ≥ 0 is dropped
    assert(joined.values.sum == ev.filter(col("value") >= 0).count(),
      "in-domain events lost by the band join")
  }

  test("e10 gap fill: explicit gaps, forward fill carries the last observation only") {
    import spark.implicits._
    // type a observed at hours 0 and 3 (of a 0..3 span), type b only at
    // hour 2 — gaps in between, and b's pre-first-observation hours
    // must fill to NULL, not to a's values
    val hourly = Seq(
      ("a", 0L, 5L), ("a", 3L * 3600L, 2L), ("b", 2L * 3600L, 7L))
      .toDF("event_type", "hour_s", "n_events")
    val filled = Events.gapFill(hourly).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_s")) ->
        (Option(r.getAs[java.lang.Long]("n_events")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("filled_n")).map(_.toLong),
          r.getAs[Boolean]("is_gap"))).toMap
    assert(filled.size == 8, s"spine should be 2 types x 4 hours: ${filled.size}")
    assert(filled(("a", 0L)) == ((Some(5L), Some(5L), false)))
    assert(filled(("a", 3600L)) == ((None, Some(5L), true)), "gap not carried")
    assert(filled(("a", 2L * 3600L)) == ((None, Some(5L), true)))
    assert(filled(("a", 3L * 3600L)) == ((Some(2L), Some(2L), false)), "fill outlived a new observation")
    assert(filled(("b", 0L)) == ((None, None, true)), "pre-first-observation hour must fill to NULL")
    assert(filled(("b", 2L * 3600L)) == ((Some(7L), Some(7L), false)))
    assert(filled(("b", 3L * 3600L)) == ((None, Some(7L), true)))
    // corpus: spine is exactly types x span-hours; observed buckets
    // reconcile with e1's hourly counts; no gap carries a count
    val full = Events.e10GapFill(spark, sf).collect()
    val hours = full.map(_.getAs[Long]("hour_s"))
    val types = full.map(_.getAs[String]("event_type")).distinct.length
    val span = (hours.max - hours.min) / 3600L + 1L
    assert(full.length.toLong == span * types, s"${full.length} != $span x $types")
    val observed = full.filter(!_.getAs[Boolean]("is_gap"))
    assert(observed.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count(), "observed buckets lose events")
    full.foreach { r =>
      if (!r.getAs[Boolean]("is_gap"))
        assert(r.getAs[Long]("filled_n") == r.getAs[Long]("n_events"))
    }
  }

  test("e8 band join: broadcast interval join ≡ the narrow binning twin, rows conserved") {
    val joined = Events.e8BandJoin(spark, sf)
    // the non-equi band predicate must plan as a broadcast nested-loop
    // against the tiny dimension — never a shuffle or cartesian of the
    // fact side
    val plan = planOf(joined)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"band join not broadcast-NLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian fallback:\n$plan")
    val rows = joined.collect()
    // the bands partition the value domain: every event in exactly one band
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count(), "events lost or double-banded")
    // join form ≡ the join-FREE when-chain binning (the 100 TB fast
    // path): same per-band aggregates, bit-exact
    val binned = Tables.events(spark, sf)
      .withColumn("band_id", Events.bandOf(col("value")))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_events"),
        Tables.dollars(sum(Tables.cents(col("value")))).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .collect()
      .map(r => r.getAs[Long]("band_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
          r.getAs[Long]("n_users"))).toMap
    rows.foreach { r =>
      val got = (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
        r.getAs[Long]("n_users"))
      val want = binned(r.getAs[Long]("band_id"))
      assert(got == want, s"band ${r.getAs[Long]("band_id")}: join=$got bin=$want")
    }
  }

  test("s9 MIPS: integer-exact vs a driver-side brute force; ranks by dot, not cosine") {
    val out = Similarity.s9KnnMips(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("nid"), r.getAs[Long]("dot_fp")))
    // recompute the full top-k on the driver with the same fixed-point
    // semantics (per-element round(x*y*1e9), summed as longs)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    val want = (0L until Similarity.NQueries.toLong).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (n, dot(vecs(q), vecs(n))))
        .sortBy { case (n, d) => (-d, n) }
        .take(Similarity.TopK).zipWithIndex
        .map { case ((n, d), i) => (q, i + 1L, n, d) }
    }.toSet
    assert(out.toSet == want,
      s"MIPS diverges from the driver reference: ${(out.toSet diff want).take(3)}")
    // the synthetic corpus has near-uniform norms, so cosine and MIPS
    // tie there; prove the metrics genuinely diverge on a corpus where
    // norms carry signal — a big-norm slightly-off-axis vector must win
    // MIPS while the small perfectly-aligned one wins cosine
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mips").toFile
    try {
      val vs = Seq(
        (0L, Seq(1f, 0f), 0),
        (10L, Seq(10f, 1f), 0), // ‖x‖≈10, cos≈0.995: the popularity prior
        (11L, Seq(0.5f, 0f), 0) // cos=1 exactly, but dot=0.5
      ) ++ (1 to 9).map { k =>
        val a = k * math.Pi / 20
        (k.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat), 0)
      }
      vs.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      def top1(df: org.apache.spark.sql.DataFrame): Long = df.collect()
        .filter(r => r.getAs[Long]("qid") == 0L && r.getAs[Long]("rank") == 1L)
        .head.getAs[Long]("nid")
      assert(top1(Similarity.s9KnnMips(spark, dir.toString)) == 10L,
        "MIPS top-1 should be the big-norm vector")
      assert(top1(Similarity.s1KnnBrute(spark, dir.toString)) == 11L,
        "cosine top-1 should be the aligned unit-direction vector")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("x16 bigram LM: penalizes scrambled order that the unigram model cannot see") {
    import spark.implicits._
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 100L
    }
    val trainId = (0L to 500L).find(bucket(_) < 80L).get
    val testIds = (0L to 500L).filter(bucket(_) >= 90L).take(3)
    val (flu, scr, tiny) = (testIds(0), testIds(1), testIds(2))
    val docs = Seq(
      (trainId, "a b a b a b"), // model: c(a,b)=3 c(b,a)=2; ctx a=3 b=2; V=2
      (flu, "a b a b"),         // pairs (a,b),(b,a),(a,b) — all seen
      (scr, "a a b b"),         // SAME BAG, scrambled: (a,a),(b,b) unseen
      (tiny, "a"))              // < 2 tokens: no pairs at all
      .toDF("doc_id", "text")
    val big = TextAnalysis.bigramScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_big"), r.getAs[Long]("n_oov_big"),
          r.getAs[Long]("n_new_ctx"),
          Option(r.getAs[java.lang.Long]("mean_lp_e4")).map(_.toLong))).toMap
    assert(big(flu) == ((3L, 0L, 0L, big(flu)._4)) && big(flu)._4.isDefined)
    // scrambled: both novel pairs have KNOWN contexts — oov counts the
    // pair, new_ctx does not
    assert(big(scr)._1 == 3L && big(scr)._2 == 2L && big(scr)._3 == 0L)
    assert(big(scr)._4.get < big(flu)._4.get,
      s"scrambled doc not penalized: ${big(scr)._4} vs ${big(flu)._4}")
    assert(big(tiny) == ((0L, 0L, 0L, None)), s"1-token doc: ${big(tiny)}")
    // the unigram model scores the two bags IDENTICALLY — the property
    // x16 exists to fix
    val uni = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_oov"), r.getAs[Long]("mean_lp_e4"))).toMap
    assert(uni(flu) == uni(scr), s"unigram should tie: ${uni(flu)} vs ${uni(scr)}")
    // full corpus: every doc exactly once; train pairs are the model,
    // so train docs have zero pair-OOV; novel-context ⊆ novel-pair
    val full = TextAnalysis.x16BigramScore(spark, sf).collect()
    assert(full.length == Tables.documents(spark, sf).count())
    full.foreach { r =>
      assert(r.getAs[Long]("n_new_ctx") <= r.getAs[Long]("n_oov_big"))
      if (r.getAs[String]("split") == "train")
        assert(r.getAs[Long]("n_oov_big") == 0L, s"train OOV: $r")
    }
  }

  test("degenerate vectors fail loudly: zero norm in withNorm, all-zero in quantized") {
    import spark.implicits._
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val bad = Seq((7L, Seq(0f, 0f, 0f)), (8L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    // a zero-norm vector is undefined in cosine space: NaN would rank
    // FIRST under orderBy(cos.desc) but LAST in the ascending
    // neg_cos array_sort — the guard keeps the formulations equivalent
    // by refusing the input instead of silently diverging
    val e1 = intercept[Throwable] { Similarity.withNorm(bad).collect() }
    assert(msgChain(e1).contains("zero-norm embedding at vec_id=7"), msgChain(e1))
    val e2 = intercept[Throwable] { Similarity.quantized(bad).collect() }
    assert(msgChain(e2).contains("all-zero embedding at vec_id=7"), msgChain(e2))
    // the guards pass clean vectors through untouched
    assert(Similarity.withNorm(bad.filter(col("vec_id") === 8L)).count() == 1)
    assert(Similarity.quantized(bad.filter(col("vec_id") === 8L)).count() == 1)
  }

  // ---- round-8 additions: e15 merge apply, x17 BM25, s11 rerank, m6 aHash ----

  test("e15 CDC apply: merge actions are consistent with base and feed") {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("bal_c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Events.e15CdcApply(spark, sf).collect()
    // every base key appears exactly once unless nothing ever deletes it
    val byKey = rows.groupBy(_.getAs[Long]("key"))
    assert(byKey.values.forall(_.length == 1), "duplicate keys in merge output")
    rows.foreach { r =>
      val key = r.getAs[Long]("key")
      val action = r.getAs[String]("action")
      val n = r.getAs[Long]("n_changes")
      action match {
        case "keep" =>
          assert(n == 0L && base.contains(key))
          assert(math.round(r.getAs[Double]("final_bal") * 100) == base(key))
        case "update" => assert(n >= 1L && base.contains(key))
        case "insert" => assert(n >= 1L && !base.contains(key))
        case "delete" =>
          assert(n >= 1L && r.isNullAt(r.fieldIndex("final_bal")))
        case other => fail(s"unknown action $other")
      }
    }
    // the output covers base ∪ touched keys, nothing else
    val touched = rows.filter(_.getAs[Long]("n_changes") > 0)
      .map(_.getAs[Long]("key")).toSet
    assert(rows.map(_.getAs[Long]("key")).toSet == base.keySet ++ touched)
  }

  test("e15 plan: pushed feed filter, partial agg, one key shuffle per side") {
    val plan = planOf(Events.e15CdcApply(spark, sf))
    // the op-type filter must reach the parquet scan
    assert(plan.contains("PushedFilters: [In(event_type"),
      s"feed filter not pushed down:\n$plan")
    // exactly two hash exchanges: collapsed feed and base, each keyed
    // once for the merge join (at scale the bucketed base drops to one)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2, s"expected 2 key shuffles, got $hashEx:\n$plan")
    // the collapse aggregates partially below its shuffle (map-side
    // combine on the feed) — two aggregate nodes around the exchange
    assert("SortAggregate|HashAggregate".r.findAllIn(plan).length >= 2)
    assert(plan.contains("FullOuter"), s"merge join not full-outer:\n$plan")
  }

  test("x17 BM25: ranked contiguously per test doc, splits disjoint, model broadcast") {
    val df = TextAnalysis.x17Bm25(spark, sf)
    val plan = planOf(df)
    // vocabulary-sized model frames (idf, stats) must broadcast, not shuffle-join
    assert(plan.contains("BroadcastExchange"), s"idf/stats not broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val tests = rows.map(_.getAs[Long]("test_doc")).toSet
    val trains = rows.map(_.getAs[Long]("train_doc")).toSet
    assert(tests.intersect(trains).isEmpty, "train/test splits overlap")
    rows.groupBy(_.getAs[Long]("test_doc")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq, "ranks not contiguous from 1")
      assert(sorted.length <= TextAnalysis.Bm25TopK)
      val scores = sorted.map(_.getAs[Long]("score_e4")).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending: $scores")
      g.foreach(r => assert(r.getAs[Long]("n_shared") >= 1L))
    }
  }

  test("s11 rerank: scores are exact cosines and recall >= raw s8") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exactTop = Similarity.s1KnnBrute(spark, sf)
    // exact scores for ALL pairs via the radius=anything trick is absent;
    // use s1's scored rows as the reference for overlapping pairs
    val exactScores = exactTop.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Long]("cos_e6")).toMap
    val rer = Similarity.s11IvfRerank(spark, sf).collect()
    rer.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      exactScores.get(k).foreach(c =>
        assert(c == r.getAs[Long]("cos_e6"), s"rerank score != exact for $k"))
    }
    val exact = pairs(exactTop)
    val raw = pairs(Similarity.s8KnnIvfPq(spark, sf)).intersect(exact).size
    val rr = rer.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .toSet.intersect(exact).size
    assert(rr >= raw, s"rerank recall $rr below raw ADC recall $raw")
  }

  test("m7 maxBucket cap drops only boilerplate-bucket pairs, keeps distinct-image pairs") {
    import spark.implicits._
    // 20 constant-black "images" (identical hash 0) + 2 near-identical
    // structured hashes: the boilerplate run floods every band bucket
    val rows = (0L until 20L).map(id => (id, 0L, 0L)) ++
      Seq((100L, 0x12345678L, 0x0000000FL), (101L, 0x12345678L, 0x0000000EL))
    val hashes = rows.toDF("doc_id", "ahash_hi", "ahash_lo")
    val uncapped = Multimodal.imgNearDupPairs(hashes, None).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val capped = Multimodal.imgNearDupPairs(hashes, Some(10)).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // uncapped finds the full boilerplate quadratic + the real pair
    assert(uncapped.size == 20 * 19 / 2 + 1)
    assert(uncapped.contains((100L, 101L)))
    // capped keeps the real pair (its buckets are size 2) and drops
    // exactly the boilerplate expansion
    assert(capped == Set((100L, 101L)), s"capped = $capped")
  }

  test("m8 incremental image pairs = m7's full answer restricted to the batch") {
    val full = Multimodal.m7ImgNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val mx = graft.Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).first().getLong(0)
    val expected = full.filter { case (a, b) => a * 10 >= mx * 9 || b * 10 >= mx * 9 }
    val inc = Multimodal.m8ImgIncremental(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(expected.nonEmpty, "batch touches no pairs — fixture too small")
    assert(inc == expected,
      s"incremental/full divergence: inc-only=${inc -- expected}, missing=${expected -- inc}")
  }

  test("s12 MIPS-IVF: scores are the exact raw dots; ranking is by dot, not cosine") {
    val exact = Similarity.s9KnnMips(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Long]("dot_fp")).toMap
    val rows = Similarity.s12MipsIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      // the zero-padded query makes the augmented dot equal the raw
      // dot — anywhere s9 scored the same pair the integers must agree
      exact.get(k).foreach(d =>
        assert(d == r.getAs[Long]("dot_fp"), s"augmented dot != raw dot for $k"))
    }
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { g =>
      val ds = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("dot_fp")).toSeq
      assert(ds == ds.sorted.reverse, s"not ranked by dot: $ds")
    }
    val recall = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .toSet.intersect(exact.keySet).size.toDouble / exact.size
    assert(recall > 0.3, s"MIPS-IVF recall implausibly low: $recall")
  }

  test("BPE trainer: known merge sequence, deterministic, objective monotone") {
    import spark.implicits._
    // "ab" dominates pairs (3 in-word occurrences via abc/abd + aab's
    // tail), so the first merge must be (a,b); after it, the corpus
    // re-pairs deterministically
    val docs = Seq((0L, "abc abc abd"), (1L, "aab xy"), (2L, "xy xy"))
      .toDF("doc_id", "text")
    val m1 = TextAnalysis.trainBpe(docs, 1)
    assert(m1 == Seq(("a", "b")), s"first merge: $m1")
    val m3 = TextAnalysis.trainBpe(docs, 3)
    assert(m3.take(1) == m1, "merge sequence not a stable prefix")
    assert(m3.map(p => p._1 + p._2).distinct.size == m3.size)
    // determinism across runs (and partitionings — repartition first)
    val m3b = TextAnalysis.trainBpe(docs.repartition(7), 3)
    assert(m3b == m3, s"nondeterministic merges: $m3b vs $m3")
    // the objective (weighted token total) is monotone non-increasing
    // in the merge prefix, strictly decreasing while merges apply
    val totals = (0 to 3).map(i => TextAnalysis.bpeTokenTotal(docs, m3.take(i)))
    assert(totals == totals.sorted.reverse, s"not monotone: $totals")
    assert(totals.head > totals.last, "merges never reduced the token count")
    // real corpus: 3 merges train without error and stay deterministic
    val real = TextAnalysis.trainBpe(
      graft.Tables.documents(spark, sf).select(col("doc_id"), col("text")), 3)
    assert(real.size == 3 && real.distinct.size == 3)
  }

  test("batched BPE trainer: merge list identical to the sequential trainer " +
      "on constructed and real corpora, with fewer driver rounds") {
    import spark.implicits._
    // constructed: many disjoint high-frequency pairs (batchable) plus
    // interacting chains (aab/abab force the exactness guard to split
    // rounds) — the adversarial mix for an accept-prefix rule
    val docs = Seq(
      (0L, "abc abc abd xy xy xy"), (1L, "aab abab pq pq pq"),
      (2L, "mn mn mn uv uv west west"), (3L, "aaa bba ccd ccd")
    ).toDF("doc_id", "text")
    for (k <- Seq(1, 3, 6, 10)) {
      val seqM = TextAnalysis.trainBpe(docs, k)
      val (batM, _) = TextAnalysis.trainBpeBatchedRounds(docs, k)
      assert(batM == seqM, s"k=$k: batched $batM != sequential $seqM")
      // a starved scan width degrades batch size, never correctness
      assert(TextAnalysis.trainBpeBatched(docs, k, scanWidth = 2) == seqM,
        s"k=$k: scanWidth=2 diverged")
    }
    // a batchable corpus (disjoint letters, strictly separated counts):
    // the exactness proof admits every merge in ONE driver round
    val disjoint = (Seq.fill(100)("ab") ++ Seq.fill(90)("cd") ++
      Seq.fill(80)("ef") ++ Seq.fill(70)("gh"))
      .grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val seqD = TextAnalysis.trainBpe(disjoint, 4)
    val (batD, roundsD) = TextAnalysis.trainBpeBatchedRounds(disjoint, 4)
    assert(batD == seqD, s"disjoint corpus diverged: $batD != $seqD")
    assert(roundsD == 1, s"disjoint top pairs must batch in one round: $roundsD")
    // approximate mode ≡ exact ≡ sequential when the top pairs are
    // disjoint (the spec-pinned regime the production mode relies on)
    assert(TextAnalysis.trainBpeBatched(disjoint, 4, exact = false) == seqD)
    // real corpus: EXACT mode reproduces the sequential list verbatim
    // (natural-text top pairs interlock — er/or/in share letters — so
    // the proof may not batch at all; that honesty is the contract)
    val real = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val k = 8
    val seqReal = TextAnalysis.trainBpe(real, k)
    val (batReal, _) = TextAnalysis.trainBpeBatchedRounds(real, k)
    assert(batReal == seqReal, s"real corpus diverged: $batReal != $seqReal")
    // production mode on the real corpus: k merges in << k driver
    // rounds, every merge a valid vocabulary entry chosen from true
    // corpus-wide counts
    val (apxReal, apxRounds) = TextAnalysis.trainBpeBatchedRounds(real, k,
      exact = false)
    assert(apxReal.size == k && apxReal.distinct.size == k)
    assert(apxRounds <= (k + 1) / 2,
      s"approximate mode failed to batch: $apxRounds rounds for $k merges")
  }

  test("BPE encode + fertility: the Catalyst fold equals a reference encoder; " +
      "fertility is monotone non-increasing in the merge prefix") {
    import spark.implicits._
    def refEncode(w: String, merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(w.map(_.toString): Seq[String]) { case (sym, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += a + b; i += 2
          } else { out += sym(i); i += 1 }
        }
        out.toSeq
      }
    // adversarial words incl. overlap (aab, abab) and self-merge (aa)
    val words = Seq("abc", "aab", "abab", "aaa", "xy", "a", "")
    val merges = Seq(("a", "b"), ("a", "a"), ("ab", "c"))
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.bpeEncode(col("w"), merges).as("enc"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == refEncode(w, merges),
        s"encode('$w'): ${got(w)} != ${refEncode(w, merges)}")
    }
    // fertility over the real corpus, monotone in the merge prefix
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    val trained = TextAnalysis.trainBpe(
      docs.select(col("doc_id"), col("text")), 4)
    val ferts = (0 to 4).map { i =>
      val f = TextAnalysis.bpeFertility(docs, trained.take(i)).collect()
      f.map(r => r.getAs[Long]("n_bpe_tokens")).sum
    }
    assert(ferts == ferts.sorted.reverse, s"not monotone: $ferts")
    assert(ferts.head > ferts.last, "merges never reduced fertility")
    // per-source fertility_e4 is the exact integer ratio
    TextAnalysis.bpeFertility(docs, trained).collect().foreach { r =>
      assert(r.getAs[Long]("fertility_e4") ==
        r.getAs[Long]("n_bpe_tokens") * 10000L / r.getAs[Long]("n_words"))
    }
  }

  test("m6 aHash: decode-derived hash equals the closed-form spec hash") {
    val rows = Multimodal.m6ImgHash(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = Multimodal.imgWidth(id); val h = Multimodal.imgHeight(id)
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
      // independent closed-form re-derivation, no codec in the loop
      val bs = new Array[Long](64); val bn = new Array[Long](64); var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.imgPixel(id, x, y).toLong
        val idx = (y * 8 / h) * 8 + (x * 8 / w)
        bs(idx) += v; bn(idx) += 1; tot += v
      }
      var hi = 0L; var lo = 0L; var bits = 0L
      for (i <- 0 until 64)
        if (bs(i) * w * h > tot * bn(i)) {
          bits += 1; if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
        }
      assert(r.getAs[Long]("ahash_hi") == hi, s"hi mismatch doc $id")
      assert(r.getAs[Long]("ahash_lo") == lo, s"lo mismatch doc $id")
      assert(r.getAs[Long]("bits_set") == bits)
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
  }

  test("d11 canonical: keeps the best-QUALITY copy, not d6's min-id rep") {
    import spark.implicits._
    // docs 1/2 carry identical WORDS (same simhash -> same cluster) but
    // different raw lengths: doc 1 is under the 100-char quality bar,
    // doc 2 is space-padded past it (words() ignores the extra spaces,
    // length(text) does not). doc 3 is an unrelated singleton.
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")  // ~120 chars
    val short = base.substring(0, 93).trim                 // < 100 chars
    val docs = Seq(
      (1L, short),
      (2L, short + "   " * 10),  // same words, length >= 100
      (3L, "completely different unrelated content entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.canonicalManifest(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[Long]("canonical_id"),
          r.getAs[Long]("keep"))).toMap
    // same cluster, min-id rep = 1, but canonical = 2 (higher quality)
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L, s"not clustered: $out")
    assert(out(1L)._2 == 2L && out(2L)._2 == 2L,
      s"canonical should be the padded (higher-quality) doc: $out")
    assert(out(1L)._3 == 0L && out(2L)._3 == 1L)
    // singleton keeps itself
    assert(out(3L) == ((3L, 3L, 1L)))
  }

  test("s13 IVF+SQ8: candidates are exactly s2's probed clusters, scores are s5's " +
      "quantized cosines, corpus side exchange-free before the top-k") {
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val cents = Similarity.collectCodebook(e)
    val clusterOf = Similarity.assignClusters(e, cents)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probesOf = Similarity.probeClusters(e, cents)
      .select(col("qid"), col("cluster")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val out = Similarity.s13KnnIvfSq(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, nid) = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(probesOf(qid).contains(clusterOf(nid)),
        s"neighbor $nid outside $qid's probed clusters")
    }
    // scoring kernel: the quantized cosine, same as s5 for shared pairs
    val s5 = Similarity.s5QuantKnn(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Long]("cos_e6")).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      s5.get(k).foreach(c => assert(c == r.getAs[Long]("cos_e6"),
        s"s13 score != s5 quantized score for $k"))
    }
    // plan: s2's shape — no exchange below the per-query top-k window
    // (assignment/probes are narrow literal-codebook projections; fresh
    // df so the un-executed AQE plan prints once)
    val plan = planOf(Similarity.s13KnnIvfSq(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"probe side not broadcast:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"expected only the top-k window shuffle, got $shuffles:\n$plan")
  }

  test("x19 divergence: integer-exact chi2 on a constructed skewed source") {
    import spark.implicits._
    // srcA skews 'aa' against a balanced, larger srcB (asymmetric sizes
    // so the two sources' chi2 totals genuinely differ)
    val docs = Seq(
      ("srcA", ("aa " * 8 + "bb " * 2).trim),
      ("srcB", ("aa " * 10 + "bb " * 10).trim)
    ).toDF("source", "text")
    val out = TextAnalysis.srcDivergence(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("token")) ->
        (r.getAs[Long]("obs"), r.getAs[Long]("glob_n"),
          r.getAs[Long]("chi2_e4"), r.getAs[Long]("chi2_total_e4"))).toMap
    // independent BigInt reference of the published formula — the
    // TWO-STEP integral division over |num| (the overflow-safe form;
    // squaring num first would overflow decimal(38,0) at ~3e8 tokens)
    def chi2(obs: Long, glob: Long, nSrc: Long, nTot: Long): Long = {
      val num = (BigInt(obs) * nTot - BigInt(glob) * nSrc).abs
      val stepA = num * 10000 / (BigInt(glob) * nSrc)
      (stepA * num / nTot).toLong
    }
    val (nTot, nA, nB) = (30L, 10L, 20L)
    val expA = Map("aa" -> chi2(8, 18, nA, nTot), "bb" -> chi2(2, 12, nA, nTot))
    val expB = Map("aa" -> chi2(10, 18, nB, nTot), "bb" -> chi2(10, 12, nB, nTot))
    expA.foreach { case (t, v) =>
      assert(out(("srcA", t))._3 == v, s"chi2 srcA/$t: ${out(("srcA", t))} != $v") }
    expB.foreach { case (t, v) => assert(out(("srcB", t))._3 == v) }
    // totals = sum of contributions; the skewed source diverges more
    assert(out(("srcA", "aa"))._4 == expA.values.sum)
    assert(out(("srcB", "aa"))._4 == expB.values.sum)
    assert(out(("srcA", "aa"))._4 > out(("srcB", "aa"))._4)
  }

  test("e19 pattern automaton: greedy non-overlapping matches, stage carry, " +
      "noise-transparent, order from (ts, event_id)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    // user 1: C V P C V P -> 2 complete; user 2: C C V x P V -> 1, stage 0
    //   (second C ignored at stage 1; 'x' noise transparent)
    // user 3: V P C -> 0 complete, open at stage 1
    // user 4: ts tie-break by event_id: P(id 2) C(id 1) at same second
    //   ordered C then P -> C opens (stage 1), P ignored
    val rows = Seq(
      (1L, 1, 1L, "click"), (1L, 2, 2L, "view"), (1L, 3, 3L, "purchase"),
      (1L, 4, 4L, "click"), (1L, 5, 5L, "view"), (1L, 6, 6L, "purchase"),
      (2L, 1, 11L, "click"), (2L, 2, 12L, "click"), (2L, 3, 13L, "view"),
      (2L, 4, 14L, "signup"), (2L, 5, 15L, "purchase"), (2L, 6, 16L, "view"),
      (3L, 1, 21L, "view"), (3L, 2, 22L, "purchase"), (3L, 3, 23L, "click"),
      (4L, 7, 32L, "purchase"), (4L, 7, 31L, "click")
    ).map { case (u, s, id, ty) => (u, t(s), id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("e19-fixture").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.e19Pattern(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    assert(out(1L) == ((2L, 0L)))
    assert(out(2L) == ((1L, 0L)), s"got ${out(2L)}")
    assert(out(3L) == ((0L, 1L)))
    assert(out(4L) == ((0L, 1L)), "ts tie must break by event_id")
    // partitioning-deterministic: the sort is inside the plan, not the input
    val shuffled = Events.e19Pattern(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    assert(shuffled == out)
    // generalized pattern: a 2-stage cycle counts independently of the
    // 3-stage one (user 1 has C V C V -> 2 completions of (C,V))
    val ev2 = graft.Tables.events(spark, dir)
    val two = Events.patternCount(ev2, Seq("click", "view")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    assert(two(1L) == ((2L, 0L)), s"got ${two(1L)}")
    assert(two(3L) == ((0L, 1L))) // V P C -> only the trailing C opens
    // degenerate pattern guard
    intercept[IllegalArgumentException] {
      Events.patternCount(ev2, Seq("click", "click"))
    }
  }

  test("cluster resolution is materialized once per (session, dir): repeat " +
      "calls share one standing frame; rows equal a fresh resolution") {
    val a = Dedup.sharedClusters(spark, sf)
    val b = Dedup.sharedClusters(spark, sf)
    assert(a eq b, "second call rebuilt the cluster resolution")
    // the shared frame reads the STANDING warehouse table (round 13:
    // cross-session, not just a session checkpoint) — its plan is a
    // bucketed parquet scan, not the pair-join + component loop
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("graft_textcomp_"),
      s"shared clusters should scan the standing table:\n$plan")
    assert(!plan.contains("Generate"),
      s"shared clusters re-ran the pair stage:\n$plan")
    // correctness: identical to an uncached resolution
    val fresh = Dedup.dupClusters(Tables.documents(spark, sf)).collect()
      .map(_.toString).sorted
    val cached = a.collect().map(_.toString).sorted
    assert(cached.sameElements(fresh), "cached resolution diverged")
  }

  test("e19 streamed fold ≡ the collect_list+aggregate form on adversarial " +
      "random inputs (hot keys, ts ties, noise); e20 spans are exact and " +
      "consistent with the counts") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(19)
    val types = Seq("click", "view", "purchase", "signup", "other")
    // hot key 0 takes ~half the events; ts collide heavily (mod 20)
    val rows = (0 until 2000).map { i =>
      val u = if (rnd.nextBoolean()) 0L else rnd.nextInt(8).toLong
      (u, new Timestamp(1700000000000L + rnd.nextInt(20) * 1000L),
        i.toLong, types(rnd.nextInt(types.size)), 0.0d)
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
      .repartition(7) // adversarial physical layout
    val stages = Seq("click", "view", "purchase")
    val k = stages.size.toLong
    // reference: the former per-key collect_list + Catalyst aggregate
    // fold (the buffering form this operator replaced)
    val code = stages.zipWithIndex.foldLeft(lit(0L)) { case (c, (st, i)) =>
      when(col("event_type") === st, (i + 1).toLong).otherwise(c)
    }
    val ref = rows.select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), col("event_id").as("id"),
          code.as("c")).as("r"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(col("r"))).as("rs"))
      .select(col("user_id"),
        aggregate(transform(col("rs"), r => r.getField("c")), lit(0L),
          (acc, c) => when(c >= 1L && acc % k === c - 1L, acc + 1L)
            .otherwise(acc)).as("st"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Events.patternCount(rows, stages).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels") * k + r.getAs[Long]("open_stage"))).toMap
    assert(got == ref, s"streamed fold diverged: ${got.toSeq.diff(ref.toSeq)}")
    // spans agree with counts: per user, max match_no == n_funnels,
    // match_nos contiguous from 1, spans ordered and non-overlapping
    val spans = Events.patternMatches(rows, stages).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("match_no"),
        r.getAs[Long]("start_event_id"), r.getAs[Long]("end_event_id")))
    val byUser = spans.groupBy(_._1)
    byUser.foreach { case (u, ss) =>
      assert(ss.map(_._2).sorted.sameElements(1L to ss.length.toLong),
        s"user $u match_nos not contiguous")
      assert(ss.length.toLong == ref(u) / k, s"user $u span count != n_funnels")
    }
    ref.filter(_._2 >= k).keys.foreach(u =>
      assert(byUser.contains(u), s"user $u completed but emitted no span"))

    // exact spans on a constructed history: C(1) V(2) P(3) C(4) C(5)
    // V(6) P(7) — spans (1,3) and (4,7): the repeat C at 5 must not
    // reset the open cycle's start
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val fixed = Seq(
      (9L, ts(1), 1L, "click"), (9L, ts(2), 2L, "view"),
      (9L, ts(3), 3L, "purchase"), (9L, ts(4), 4L, "click"),
      (9L, ts(5), 5L, "click"), (9L, ts(6), 6L, "view"),
      (9L, ts(7), 7L, "purchase")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val fixedSpans = Events.patternMatches(fixed, stages).collect()
      .map(r => (r.getAs[Long]("match_no"),
        r.getAs[Long]("start_event_id"), r.getAs[Long]("end_event_id")))
      .sortBy(_._1).toSeq
    assert(fixedSpans == Seq((1L, 1L, 3L), (2L, 4L, 7L)), s"got $fixedSpans")
  }

  test("e21 WITHIN window: attempts expire past the window (breaching event " +
      "may open a fresh attempt), boundary is inclusive, expiry tally exact") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val W = 10L * 1000000L // 10 s in micros
    val rows = Seq(
      // user 1: completes inside the window
      (1L, ts(0), 1L, "click"), (1L, ts(5), 2L, "view"),
      (1L, ts(9), 3L, "purchase"),
      // user 2: purchase breaches the window -> expire, no completion
      (2L, ts(0), 11L, "click"), (2L, ts(5), 12L, "view"),
      (2L, ts(11), 13L, "purchase"),
      // user 3: second click breaches -> expire AND opens fresh;
      // the fresh attempt completes
      (3L, ts(0), 21L, "click"), (3L, ts(11), 22L, "click"),
      (3L, ts(12), 23L, "view"), (3L, ts(13), 24L, "purchase"),
      // user 4: view breaches -> expire; view cannot open
      (4L, ts(0), 31L, "click"), (4L, ts(15), 32L, "view"),
      // user 5: completes EXACTLY at the boundary (inclusive)
      (5L, ts(0), 41L, "click"), (5L, ts(5), 42L, "view"),
      (5L, ts(10), 43L, "purchase")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.patternCountWithin(rows,
      Seq("click", "view", "purchase"), W).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"),
          r.getAs[Long]("n_expired"))).toMap
    assert(out(1L) == ((1L, 0L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 1L)), s"got ${out(2L)}")
    assert(out(3L) == ((1L, 0L, 1L)),
      s"breaching click must open a fresh attempt: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 1L)), s"got ${out(4L)}")
    assert(out(5L) == ((1L, 0L, 0L)), s"boundary must be inclusive: ${out(5L)}")
    // an infinite window degrades to plain e19 counting
    val inf = Events.patternCountWithin(rows,
      Seq("click", "view", "purchase"), Long.MaxValue).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    val plain = Events.patternCount(rows,
      Seq("click", "view", "purchase")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    assert(inf == plain, "infinite window must equal the unwindowed counter")
  }

  test("e22 alternation: either branch advances the middle stage, " +
      "single-element sets degrade to patternCount exactly, " +
      "overlapping sets are rejected") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      // user 1: click → view → purchase (branch B)
      (1L, ts(0), 1L, "click"), (1L, ts(1), 2L, "view"),
      (1L, ts(2), 3L, "purchase"),
      // user 2: click → error → purchase (branch C)
      (2L, ts(0), 11L, "click"), (2L, ts(1), 12L, "error"),
      (2L, ts(2), 13L, "purchase"),
      // user 3: both branches fire mid-funnel — only the FIRST advances
      // (greedy: view consumes stage 2; the error is a no-op);
      // then purchase completes
      (3L, ts(0), 21L, "click"), (3L, ts(1), 22L, "view"),
      (3L, ts(2), 23L, "error"), (3L, ts(3), 24L, "purchase"),
      // user 4: error alone cannot open (stage 1 is click-only)
      (4L, ts(0), 31L, "error"), (4L, ts(1), 32L, "purchase")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val sets = Seq(Seq("click"), Seq("view", "error"), Seq("purchase"))
    val out = Events.patternCountSets(rows, sets).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((1L, 0L)), s"error branch must advance: ${out(2L)}")
    assert(out(3L) == ((1L, 0L)))
    assert(out(4L) == ((0L, 0L)))
    // single-element sets ≡ the plain stage-list automaton
    val plain = Events.patternCount(rows, Seq("click", "view", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    val singleton = Events.patternCountSets(rows,
      Seq(Seq("click"), Seq("view"), Seq("purchase")))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_funnels"), r.getAs[Long]("open_stage"))).toMap
    assert(singleton == plain)
    // non-disjoint sets would make the stage code ambiguous
    val ex = intercept[IllegalArgumentException] {
      Events.patternCountSets(rows, Seq(Seq("click"), Seq("click", "view")))
    }
    assert(ex.getMessage.contains("disjoint"))
  }

  test("e23 series kNN: PAA segments are positional floor-means, short " +
      "series are excluded, ranking is exact and reshuffle-proof") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    // user 1: values 0..15 → 8 segments of 2 → means 2k*1000+500
    // user 2: constant 7 → all segments 7000
    // user 3: 4 events only (< 8 segments) → excluded
    val rows =
      (0 until 16).map(i => (1L, ts(i), i.toLong, "click", i.toDouble)) ++
      (0 until 8).map(i => (2L, ts(i), 100L + i, "view", 7.0)) ++
      (0 until 4).map(i => (3L, ts(i), 200L + i, "view", 1.0))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    // reuse the query pipeline on a temp dir? — drive the library
    // arithmetic through the same expressions by writing a fixture
    val dir = java.nio.file.Files.createTempDirectory("e23").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val paa = Events.e23SeriesKnn(spark, dir)
    // only users 1,2 survive; queries are user_id < 5 → both are
    // queries, each with exactly ONE candidate (the other)
    val out = paa.collect()
    assert(out.length == 2, s"got ${out.toSeq}")
    val byQ = out.map(r => r.getAs[Long]("qid") ->
      (r.getAs[Long]("nid"), r.getAs[Long]("dist"))).toMap
    // expected: u1 means = 500,2500,...,14500; u2 = 7000×8
    val m1 = (0 until 8).map(k => 2 * k * 1000L + 500L)
    val expDist = m1.map(v => (v - 7000L) * (v - 7000L)).sum
    assert(byQ(1L) == ((2L, expDist)), s"got ${byQ(1L)}")
    assert(byQ(2L) == ((1L, expDist)))
    // corpus run: k results per query, no self, deterministic under
    // input re-partitioning (integer arithmetic end to end)
    val a = Events.e23SeriesKnn(spark, sf).collect()
    assert(a.nonEmpty)
    a.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.length == Events.SeriesK)
      assert(!rs.exists(_.getAs[Long]("nid") == q), "self in neighbors")
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("d19 bloom novelty: OR-merge sketch is partitioning-proof and " +
      "duplicate-insensitive, membership has no false negatives, the exact " +
      "column matches a direct all-windows join, and the set-bit census " +
      "pins the word packing") {
    import spark.implicits._
    // constructed: corpus doc 0 shares a verbatim 8-token passage with
    // incoming doc 500 (⇒ exactly 3 shared 6-token windows); 501 is
    // fully novel; 502 is sub-window-length
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (0L, s"one two three $passage four five six"),
      (1L, "solo text with plenty of ordinary words here")).toDF("doc_id", "text")
    val incoming = Seq(
      (500L, s"prefix words go here $passage suffix words too"),
      (501L, "completely different vocabulary nothing shared at all ever"),
      (502L, "tiny")).toDF("doc_id", "text")
    val by = Dedup.bloomNovelty(corpus, incoming).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(by.size == 3)
    assert(by(500L).getAs[Long]("n_seen") == 3L, by(500L).toString)
    assert(by(500L).getAs[Long]("n_maybe") >= 3L, "false negative — impossible for a bloom")
    // ≤36 set bits in 2^18 ⇒ FP odds ~1e-9: the novel doc reads clean
    assert(by(501L).getAs[Long]("n_maybe") == 0L &&
      by(501L).getAs[Long]("novelty_e6") == 1000000L)
    assert(by(502L).getAs[Long]("n_win") == 0L &&
      by(502L).getAs[Long]("novelty_e6") == 1000000L)
    // set-bit census equals a JVM-side recompute of the distinct positions
    val expectBits = Dedup.distinctWindows(corpus).select("g").distinct()
      .as[String].collect().flatMap { g =>
        (0 until Dedup.BloomK).map { i =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$g:$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15)
          java.lang.Long.parseLong(hex, 16) % Dedup.BloomMBits
        }
      }.distinct.length.toLong
    assert(by(500L).getAs[Long]("n_set_bits") == expectBits)
    // the native sketch: partitioning-proof and duplicate-insensitive
    def bits(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Dedup.streamingWindowBloom(df).collect().head.getSeq[Long](0)
    val one = bits(corpus.repartition(1))
    assert(one == bits(corpus.repartition(7)), "partitioning changed the bits")
    assert(one == bits(corpus.union(corpus)), "duplicate rows changed the bits")
    assert(one.map(java.lang.Long.bitCount(_).toLong).sum == expectBits)
    // out-of-range staged position fails loudly, never aliases
    val ex = intercept[org.apache.spark.SparkException] {
      Seq(Seq(Dedup.BloomMBits.toLong)).toDF("pos").groupBy()
        .agg(graft.functions.GraftFunctions
          .bloom_sketch(col("pos"), Dedup.BloomMBits)).collect()
    }
    assert(ex.getMessage.contains("bloom_sketch") || ex.getCause != null)
    // the 1-row sketch reaches the per-window test via BROADCAST — a
    // plain cartesian against the bitset would re-shuffle the corpus
    val sfDf = Dedup.d19BloomNovelty(spark, sf)
    assert(planOf(sfDf).contains("BroadcastNestedLoopJoin") ||
      planOf(sfDf).contains("BroadcastExchange"),
      "bloom bitset not broadcast to the incoming side")
    // sf gate: exact n_seen per doc equals the join-everything strawman
    val out = sfDf.collect()
    assert(out.nonEmpty && out.exists(_.getAs[Long]("n_seen") > 0L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_seen") <= r.getAs[Long]("n_maybe"))
      if (r.getAs[Long]("n_win") > 0L)
        assert(r.getAs[Long]("novelty_e6") ==
          (r.getAs[Long]("n_win") - r.getAs[Long]("n_maybe")) * 1000000L /
            r.getAs[Long]("n_win"))
    }
    val docs = graft.Tables.documents(spark, sf)
    val cwAll = Dedup.distinctWindows(
      docs.filter(col("doc_id") < Dedup.IncrementalSplit))
      .select(col("g")).distinct()
    val direct = Dedup.distinctWindows(
      docs.filter(col("doc_id") >= Dedup.IncrementalSplit))
      .join(cwAll, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_seen") ==
        direct.getOrElse(r.getAs[Long]("doc_id"), 0L),
        s"exact column diverged for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("d20 LSH S-curve audit: mid-jaccard recall decays as bands widen, " +
      "confusion counts reconcile, truth is config-invariant, and the " +
      "engine's (6,2) rides the knee on the gate corpus") {
    import spark.implicits._
    // 30 constructed pairs at jaccard ≈ 0.47 (18 of 38 union shingles
    // shared): the mid-similarity band where the S-curve actually
    // separates — per-row banding (r=1) catches nearly all, two wide
    // bands (r=6) miss most
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = (0 until 30).flatMap { p =>
      val shared = words(s"s${p}_", 20)
      Seq((2L * p, shared + " " + words(s"a${p}_", 10)),
        (2L * p + 1, shared + " " + words(s"b${p}_", 10)))
    }.toDF("doc_id", "text")
    val out = Dedup.lshScurve(docs, tauE6 = 300000L).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) -> r)
      .toMap
    assert(out.size == Dedup.D20Configs.size)
    val nTrue = out.values.map(_.getAs[Long]("n_true")).toSet
    assert(nTrue == Set(30L), s"truth must be config-invariant: $nTrue")
    out.values.foreach { r =>
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("fp") ==
        r.getAs[Long]("n_cand") - r.getAs[Long]("tp"))
      assert(r.getAs[Long]("fn") ==
        r.getAs[Long]("n_true") - r.getAs[Long]("tp"))
    }
    val recallByR = Dedup.D20Configs.map { case (b, r) =>
      r -> out((b.toLong, r.toLong)).getAs[Long]("recall_e6") }.toMap
    assert(recallByR(1) > recallByR(6),
      s"mid-jaccard recall must decay with band width: $recallByR")
    assert(out((2L, 6L)).getAs[Long]("fn") > 0L,
      "wide bands lost nothing at j≈0.47 — the S-curve axis is dead")
    assert(recallByR(1) >= recallByR(2) && recallByR(2) >= recallByR(3) &&
      recallByR(3) >= recallByR(6), s"recall not monotone in r: $recallByR")
    // gate corpus (sf0.001, measured): both S-curve axes are alive —
    // r ≤ 3 configs keep full recall, the widest band forfeits 2 of
    // the 28 true pairs, and the load axis orders per-row banding
    // (1285 candidates) ≫ the engine's (6,2) at 31 ≥ (4,3) at 28
    val sfOut = Dedup.d20LshScurve(spark, sf).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) -> r)
      .toMap
    Seq((12L, 1L), (6L, 2L), (4L, 3L)).foreach { c =>
      assert(sfOut(c).getAs[Long]("recall_e6") == 1000000L, sfOut(c).toString) }
    assert(sfOut((2L, 6L)).getAs[Long]("fn") == 2L, sfOut((2L, 6L)).toString)
    assert(sfOut((12L, 1L)).getAs[Long]("n_cand") >
      sfOut((6L, 2L)).getAs[Long]("n_cand"))
    assert(sfOut((6L, 2L)).getAs[Long]("n_cand") >=
      sfOut((4L, 3L)).getAs[Long]("n_cand"))
  }

  test("d21 edit verify: catches the transposition Jaccard misses, rejects " +
      "unrelated band collisions, and splits the gate corpus's bimodal " +
      "candidate set at the measured boundary") {
    import spark.implicits._
    // word transposition: shingle Jaccard collapses (3 of 8 shared
    // 3-grams) while the character edit is tiny — the metric axis d21
    // adds over d14
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta zeta epsilon eta theta iota kappa"),
      (3L, "utterly unrelated content with different words entirely now yes"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val by = Dedup.editVerify(cands, docs).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("edit_sim_e6"), r.getAs[Boolean]("verified"))).toMap
    assert(by((1L, 2L))._2, s"transposition not verified: $by")
    assert(by((1L, 2L))._1 > 750000L, by.toString)
    assert(!by((1L, 3L))._2, s"unrelated pair verified: $by")
    // the Jaccard contrast: the same transposed pair sits BELOW d14's
    // verify threshold on distinct 3-gram shingles
    val sh = docs.filter(col("doc_id") < 3L)
      .select(col("doc_id"), array_distinct(
        graft.operators.TextOps.shingles3(
          graft.operators.TextOps.words(col("text")))).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet)
      .toMap
    val inter = (sh(1L) & sh(2L)).size.toDouble
    val jac = inter / (sh(1L).size + sh(2L).size - inter)
    assert(jac * 1e6 < Dedup.D14TauE6,
      s"constructed pair not below the Jaccard verify bar: $jac")
    // gate corpus (sf0.001 shares the bimodal structure): every LSH
    // candidate is either a high-sim near-dup or a low-sim collision —
    // nothing within 150000 of the boundary on either side
    val sfOut = Dedup.d21EditVerify(spark, sf).collect()
    assert(sfOut.nonEmpty)
    val (ver, rej) = sfOut.partition(_.getAs[Boolean]("verified"))
    assert(ver.nonEmpty && rej.nonEmpty,
      s"gate corpus not bimodal: ${sfOut.map(_.getAs[Long]("edit_sim_e6")).sorted.toSeq}")
    assert(ver.forall(_.getAs[Long]("edit_sim_e6") > Dedup.D21SimE6 + 150000L))
    assert(rej.forall(_.getAs[Long]("edit_sim_e6") < Dedup.D21SimE6 - 150000L))
  }

  test("x43 KMV overlap: union estimate within 30% of exact per pair, " +
      "intersection estimate within 35% in aggregate; the under-filled " +
      "sketch path answers exactly") {
    import spark.implicits._
    // exact truth from the same shingle-hash universe
    val g = Tables.documents(spark, sf)
      .select(col("source"),
        explode(graft.operators.TextOps.shingles3(
          graft.operators.TextOps.words(col("text")))).as("sh"))
      .select(col("source"), md5(col("sh")).as("h")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
    val out = TextAnalysis.x43KmvOverlap(spark, sf).collect()
    assert(out.length == g.size * (g.size - 1) / 2, "missing source pairs")
    var estSum = 0L
    var exactSum = 0L
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val exU = (g(a) | g(b)).size.toLong
      val exI = (g(a) & g(b)).size.toLong
      val estU = r.getAs[Long]("union_est")
      // KMV relative SD is ~1/√(k−2) ≈ 6.3% at k=256; 30% is ~4.7σ —
      // a real defect, never estimator noise, across all 190 pairs
      assert(math.abs(estU - exU) * 10L <= 3L * exU,
        s"union estimate off >30% for ($a,$b): est $estU exact $exU")
      estSum += r.getAs[Long]("inter_est")
      exactSum += exI
    }
    assert(math.abs(estSum - exactSum) * 100L <= 35L * exactSum,
      s"aggregate intersection estimate off >35%: est $estSum exact $exactSum")
    // under-filled sketches (union < k): the sketch IS the set — the
    // estimators answer exactly, no theta math involved
    val tiny = Seq(
      ("a", "p q r s t u"), ("a", "p q r x y z"),
      ("b", "p q r s t u"), ("b", "m n o m n o")).toDF("source", "text")
    val row = TextAnalysis.kmvOverlap(tiny, TextAnalysis.KmvK).collect()
    assert(row.length == 1)
    val shA = Seq("p q r", "q r s", "r s t", "s t u",
      "p q r", "q r x", "r x y", "x y z").distinct.toSet
    val shB = Seq("p q r", "q r s", "r s t", "s t u",
      "m n o", "n o m", "o m n", "m n o").distinct.toSet
    val r0 = row.head
    assert(r0.getAs[Long]("ku") == (shA | shB).size.toLong)
    assert(r0.getAs[Long]("union_est") == (shA | shB).size.toLong,
      "under-filled union estimate is not exact")
    assert(r0.getAs[Long]("shared") == (shA & shB).size.toLong)
    assert(r0.getAs[Long]("inter_est") == (shA & shB).size.toLong,
      "under-filled intersection estimate is not exact")
  }

  test("x46 sketched novelty: exact columns ≡ x45, cumulative estimate " +
      "within 30% per batch, and the final prefix merge is bit-identical " +
      "to one direct sketch over the whole corpus (k-min mergeability)") {
    val out = TextAnalysis.x46NoveltySketch(spark, sf).collect()
    val x45 = TextAnalysis.x45NoveltyCurve(spark, sf).collect()
    assert(out.length == x45.length && out.nonEmpty)
    out.zip(x45).foreach { case (r, e) =>
      assert(r.getAs[Long]("batch") == e.getAs[Long]("batch"))
      assert(r.getAs[Long]("novel_exact") == e.getAs[Long]("novel_grams") &&
        r.getAs[Long]("cum_exact") == e.getAs[Long]("cum_grams"),
        "exact side diverged from the gated x45 statement")
      val (est, ex) = (r.getAs[Long]("cum_est"), r.getAs[Long]("cum_exact"))
      // KMV relative SD ~1/√(k−2) ≈ 6.3% at k=256; 30% is ~4.7σ
      assert(math.abs(est - ex) * 10L <= 3L * ex,
        s"cum estimate off >30% at batch ${r.getAs[Long]("batch")}: " +
          s"est $est exact $ex")
      assert(r.getAs[Long]("err_permille") ==
        math.abs(est - ex) * 1000L / math.max(ex, 1L),
        "err_permille is not the stated integer error")
    }
    // telescoping: per-batch estimates sum back to the last cum
    assert(out.map(_.getAs[Long]("novel_est")).sum ==
      out.last.getAs[Long]("cum_est"))
    // mergeability: one direct sketch over the WHOLE incidence frame
    // (everything in a single batch) gives the same final estimate —
    // the k smallest of the union survive any batch partitioning
    val cnt = Tables.documents(spark, sf).count()
    val b = TextAnalysis.NoveltyBatches
    val gbAll = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.operators.TextOps.words(col("text")).as("ws"))
      .select(explode(array_distinct(
        graft.operators.TextOps.shingles3(col("ws")))).as("shingle"))
      .select(lit(0L).as("batch"), col("shingle"))
    val direct = TextAnalysis
      .noveltySketchFromIncidence(gbAll, TextAnalysis.KmvK)
      .collect().head.getAs[Long]("cum_est")
    assert(direct == out.last.getAs[Long]("cum_est"),
      s"prefix merge ($cnt docs, $b batches) diverged from the direct " +
        s"sketch: $direct vs ${out.last.getAs[Long]("cum_est")}")
  }

  test("s34 hybrid RRF: exact reciprocal-rank arithmetic, candidate set " +
      "= union of the two rungs (sparse keys exactly x17's), contiguous " +
      "per-query ranks in fused order") {
    val out = Similarity.s34HybridRrf(spark, sf).collect()
    assert(out.nonEmpty)
    def optL(r: org.apache.spark.sql.Row, f: String): Option[Long] =
      Option(r.get(r.fieldIndex(f))).map(_.asInstanceOf[Long])
    out.foreach { r =>
      val rs = optL(r, "r_sparse")
      val rd = optL(r, "r_dense")
      assert(rs.nonEmpty || rd.nonEmpty, s"candidate from neither rung: $r")
      val want = rs.fold(0L)(v => 1000000L / (Similarity.RrfK + v)) +
        rd.fold(0L)(v => 1000000L / (Similarity.RrfK + v))
      assert(r.getAs[Long]("rrf_e6") == want, s"rrf arithmetic drifted: $r")
    }
    // the sparse-rung keys are EXACTLY the gated x17 result's pairs
    val sparseKeys = TextAnalysis.x17Bm25(spark, sf).collect()
      .map(r => (r.getAs[Long]("test_doc"), r.getAs[Long]("train_doc"))).toSet
    val fusedSparse = out.filter(r => optL(r, "r_sparse").nonEmpty)
      .map(r => (r.getAs[Long]("test_doc"), r.getAs[Long]("cand_doc"))).toSet
    assert(fusedSparse == sparseKeys,
      s"sparse rung drifted from x17: ${fusedSparse.diff(sparseKeys).take(3)}" +
        s" | ${sparseKeys.diff(fusedSparse).take(3)}")
    // per query: ranks contiguous from 1, ordered by (rrf desc, cand)
    out.groupBy(_.getAs[Long]("test_doc")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to rs.length.toLong), s"ranks not contiguous for query $q")
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        val (ra, rb) = (a.getAs[Long]("rrf_e6"), b.getAs[Long]("rrf_e6"))
        assert(ra > rb || (ra == rb &&
          a.getAs[Long]("cand_doc") < b.getAs[Long]("cand_doc")),
          s"fused order violated for query $q")
      }
    }
    // the fusion is meaningful on the gate corpus: candidates that only
    // one rung surfaced exist on BOTH sides
    assert(out.exists(r => optL(r, "r_sparse").isEmpty))
    assert(out.exists(r => optL(r, "r_dense").isEmpty))
  }

  test("d23 capped edit verify ≡ full tier under the bound; over-bound " +
      "pairs answer NULL distance and unverified — both classes present") {
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (Option(r.get(r.fieldIndex("lev"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("max_len"),
          Option(r.get(r.fieldIndex("edit_sim_e6"))).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("verified"))
    }.toMap
    val full = keyed(Dedup.d21EditVerify(spark, sf).collect())
    val capped = keyed(Dedup.d23EditVerifyCapped(spark, sf).collect())
    assert(full.keySet == capped.keySet,
      "capped tier changed the candidate pair set")
    // the per-pair length-relative band the production tier runs with
    def bandOf(maxLen: Long): Long =
      math.min(math.max(maxLen * (1000000L - Dedup.D21SimE6) / 1000000L,
        Dedup.D23MaxLev.toLong), Dedup.D23LevClamp)
    val (under, over) = full.partition { case (_, (lev, maxLen, _, _)) =>
      lev.get <= bandOf(maxLen) }
    assert(under.nonEmpty && over.nonEmpty,
      s"gate corpus does not exercise both sides of the band: " +
        full.values.map(v => s"lev=${v._1.get}/band=${bandOf(v._2)}")
          .toSeq.sorted)
    under.foreach { case (k, v) =>
      assert(capped(k) == v, s"under-band pair $k diverged: " +
        s"full=$v capped=${capped(k)}")
    }
    over.foreach { case (k, (_, maxLen, _, _)) =>
      assert(capped(k) == (None, maxLen, None, false),
        s"over-band pair $k not NULL+unverified: ${capped(k)}")
    }
    // the ADVICE r15 recall-loss class is closed up to the clamp: every
    // pair inside the exactness horizon gets the FULL tier's verdict
    val horizon = Dedup.D23LevClamp * 1000000L / (1000000L - Dedup.D21SimE6)
    full.foreach { case (k, v @ (_, maxLen, _, verified)) =>
      if (maxLen <= horizon)
        assert(capped(k)._4 == verified,
          s"pair $k inside the exactness horizon diverged on verified: " +
            s"full=$v capped=${capped(k)}")
    }
  }

  test("d23 standing-tier projection ≡ an independent banded-kernel run, " +
      "byte for byte — gate corpus and every constructed band class") {
    import spark.implicits._
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (Option(r.get(r.fieldIndex("lev"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("max_len"),
          Option(r.get(r.fieldIndex("edit_sim_e6"))).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("verified"))
    }.toMap
    // gate corpus: d23's shared-tier projection vs the inline kernel
    // form over the same candidates — the r17 sharing refactor must be
    // invisible row for row
    val inline = keyed(Dedup.editVerifyCapped(
      Dedup.sharedLshPairs(spark, sf),
      Tables.documents(spark, sf)).collect())
    val derived = keyed(Dedup.d23EditVerifyCapped(spark, sf).collect())
    assert(derived == inline,
      s"shared-tier d23 diverged from the inline kernel form: " +
        s"${derived.toSet.diff(inline.toSet).take(3)} | " +
        s"${inline.toSet.diff(derived.toSet).take(3)}")
    // constructed corpus covering every class the derivation gates on:
    // in-band verified (tiny edit), in-band UNverified (lev in
    // (max_len/2, band] — only possible under the 32 floor),
    // over-band (lev > band), over-gap (|len gap| > band — the
    // kernel's O(len) char-count early-out, no DP run)
    val docs = Seq(
      (1L, "a" * 40), (2L, "a" * 38 + "bb"),         // lev 2  ≤ band 32, sim ≥ τ
      (3L, "a" * 15 + "b" * 25),                      // vs 1: lev 25 ≤ 32, sim < τ
      (4L, "c" * 100), (5L, "d" * 100),               // lev 100 > band 50
      (6L, "a" * 200), (7L, "a" * 10)                 // gap 190 > band 100
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L), (4L, 5L), (6L, 7L)).toDF("a", "b")
    val full = Dedup.editVerify(cands, docs)
    val want = keyed(Dedup.editVerifyCapped(cands, docs).collect())
    val got = keyed(Dedup.bandedFromExact(full).collect())
    assert(got == want, s"bandedFromExact diverged: got=$got want=$want")
    assert(want((1L, 2L))._4, "in-band verified class missing")
    assert(want((1L, 3L))._1.contains(25L) && !want((1L, 3L))._4,
      s"in-band unverified class wrong: ${want((1L, 3L))}")
    assert(want((4L, 5L)) == (None, 100L, None, false),
      "over-band class must be NULL+unverified")
    assert(want((6L, 7L)) == (None, 200L, None, false),
      "over-gap class must be NULL+unverified")
  }

  test("banded kernel contract: exact distance iff ≤ threshold, −1 past " +
      "it, and the over-gap rejection happens without a DP pass") {
    import spark.implicits._
    val rows = Seq(
      ("kitten", "sitting", 3L),   // classic lev 3
      ("kitten", "sitting", 2L),   // threshold below → -1
      ("a" * 5000, "a" * 4000, 999L), // gap 1000 > 999 → char-count early-out
      ("a" * 5000, "a" * 4000, 1000L) // gap = threshold → exact 1000
    ).toDF("l", "r", "t")
      .select(graft.functions.GraftFunctions
        .levenshtein_banded(col("l"), col("r"), col("t")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(3, -1, -1, 1000),
      s"banded kernel contract drifted: $rows")
  }

  test("d24 cross-source dup matrix: cells equal a driver-side census " +
      "of d21's verified pairs joined to sources; within flag correct") {
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val verified = Dedup.d21EditVerify(spark, sf).collect()
      .filter(_.getAs[Boolean]("verified"))
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val want = verified
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = Dedup.d24CrossSourceDups(spark, sf).collect()
      .map { r =>
        assert(r.getAs[Boolean]("within") ==
          (r.getString(0) == r.getString(1)))
        (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_pairs")
      }.toMap
    assert(out == want, s"cell census diverged: out=$out want=$want")
    assert(out.nonEmpty && out.values.sum == verified.length.toLong)
  }

  test("d14 verified dedup: near-identical docs cluster, sub-threshold " +
      "overlap does not, keep-one picks the quality argmax") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"alpha$i").mkString(" ") + " CHANGED"
    val half = (1 to 15).map(i => s"alpha$i").mkString(" ") + " " +
      (1 to 15).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, nearDup),     // jaccard 27/29 ≈ 0.93 ≥ 0.8
      (3L, half),                    // ≈ 0.30 vs doc 1 — below τ
      (4L, (1 to 30).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.verifiedManifest(docs,
      Dedup.lshCandidatesRaw(Dedup.lshIndex(docs), maxBucket = None))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[Long]("keep"))).toMap
    assert(out(1L)._1 == out(2L)._1, "verified pair must cluster")
    assert(out(3L)._1 != out(1L)._1, "sub-threshold overlap must NOT cluster")
    assert(out(4L)._1 != out(1L)._1)
    // exactly one keeper in the {1,2} cluster, singletons keep themselves
    assert(out(1L)._2 + out(2L)._2 == 1L)
    assert(out(3L)._2 == 1L && out(4L)._2 == 1L)
    // every doc appears exactly once in the manifest
    assert(out.size == 4)
  }

  test("x28 DSIR: target-domain-looking docs outrank generic ones, the " +
      "selected set is target-enriched, and ranking is deterministic") {
    import spark.implicits._
    // tiny corpus: the target stratum ('en') speaks 'alpha'; a raw doc
    // written in 'alpha' should out-rank a raw doc written in 'zeta'
    // even though NEITHER is labeled en
    val docs = (
      (1 to 10).map(i => (i.toLong, "en", s"alpha beta gamma tok$i")) ++
      Seq((100L, "xx", "alpha beta gamma alpha beta"),
          (101L, "xx", "zeta eta theta zeta eta"))
    ).toDF("doc_id", "lang", "text")
    val sel = TextAnalysis.dsirSelect(docs).collect()
    val byId = sel.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("mean_imp_e4")).toMap
    assert(byId(100L) > byId(101L),
      s"target-like doc must outrank: ${byId(100L)} vs ${byId(101L)}")
    // corpus run: the selected set is enriched in the target stratum
    val out = TextAnalysis.x28Dsir(spark, sf).collect()
    assert(out.length == TextAnalysis.DsirN)
    val enSel = out.count(_.getAs[String]("lang") == "en").toDouble / out.length
    val corp = Tables.documents(spark, sf)
    val enAll = corp.filter(col("lang") === "en").count().toDouble / corp.count()
    assert(enSel > enAll,
      s"selection not target-enriched: $enSel vs corpus $enAll")
    // deterministic under re-partitioning (integer scoring end to end)
    val again = TextAnalysis.dsirSelect(
      corp.repartition(7, col("text"))).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("m17 cross-modal manifest: joint groups intersect the per-modality " +
      "clusters, one keeper per joint group, and a text-duplicated doc " +
      "with a DISTINCT image is kept (the policy's whole point)") {
    val txt = Dedup.d6DupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[Long]("is_canonical"))).toMap
    val rows = Multimodal.m17CrossModalManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("text_cluster"),
        r.getAs[Long]("img_cluster"), r.getAs[Long]("n_joint"),
        r.getAs[Long]("canonical_id"), r.getAs[Long]("keep")))
    assert(rows.length == txt.size, "manifest must cover the corpus")
    // text_cluster column IS d6's resolution
    rows.foreach { case (id, tc, _, _, _, _) =>
      assert(tc == txt(id)._1, s"doc $id text cluster drifted from d6") }
    // exactly one keeper per joint group, and it is the min doc_id
    rows.groupBy(r => (r._2, r._3)).foreach { case (g, members) =>
      assert(members.count(_._6 == 1L) == 1, s"joint group $g keeper count")
      assert(members.filter(_._6 == 1L).head._1 == members.map(_._1).min,
        s"joint group $g keeper is not the min id")
      assert(members.forall(_._4 == members.length.toLong),
        s"joint group $g n_joint mismatch")
    }
    // the decision the per-modality manifests get wrong: a doc whose
    // TEXT is a near-dup (d6 non-canonical) but whose joint group is
    // a singleton (its image separates it) must be KEPT
    val savedByImage = rows.filter { case (id, _, _, nj, _, keep) =>
      txt(id)._2 == 0L && nj == 1L && keep == 1L }
    assert(savedByImage.nonEmpty,
      "no text-dup doc with a distinct image at this SF — policy untested")
    // and the composition actually drops something (non-degenerate)
    assert(rows.exists(_._6 == 0L), "no cross-modal duplicate dropped")
  }

  test("m14 image manifest: m7 pairs co-cluster, exactly one keeper per " +
      "cluster and it is the pixel-count argmax, singletons keep themselves") {
    val rows = Multimodal.m14ImgManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Long]("n_px"), r.getAs[Long]("canonical_id"),
        r.getAs[Long]("keep")))
    assert(rows.nonEmpty)
    val cluster = rows.map(t => t._1 -> t._2).toMap
    // every m7 near-dup pair resolved into ONE cluster
    val pairs = Multimodal.m7ImgNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters") }
    // exactly one keeper per cluster — the pixel-count argmax with
    // doc_id tiebreak — and every member points at it
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._5 == 1L) == 1, s"cluster $rep keeper count")
      val argmax = members.minBy(m => (-m._3, m._1))
      members.foreach { m =>
        assert(m._4 == argmax._1, s"canonical of ${m._1} is not the argmax") }
      assert(argmax._5 == 1L)
    }
    // singletons keep themselves; n_px reconciles with the m6 decode
    val wh = Multimodal.m6ImgHash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("width") * r.getAs[Long]("height")).toMap
    rows.foreach { m =>
      assert(m._3 == wh(m._1), s"n_px drift for doc ${m._1}")
      if (rows.count(_._2 == m._2) == 1)
        assert(m._4 == m._1 && m._5 == 1L, s"singleton ${m._1} not kept")
    }
  }

  test("m15 audio manifest: m11 pairs co-cluster, one keeper per cluster " +
      "is the longest clip, singletons keep themselves") {
    val rows = Multimodal.m15AudioManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Long]("n_samples"), r.getAs[Long]("canonical_id"),
        r.getAs[Long]("keep")))
    assert(rows.nonEmpty)
    val cluster = rows.map(t => t._1 -> t._2).toMap
    val pairs = Multimodal.m11AudioNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters") }
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._5 == 1L) == 1, s"cluster $rep keeper count")
      val argmax = members.minBy(m => (-m._3, m._1))
      members.foreach { m =>
        assert(m._4 == argmax._1, s"canonical of ${m._1} not the longest") }
    }
    rows.filter(m => rows.count(_._2 == m._2) == 1).foreach { m =>
      assert(m._4 == m._1 && m._5 == 1L, s"singleton ${m._1} not kept") }
  }

  test("m16 video manifest: m13 pairs co-cluster, one keeper per cluster " +
      "is the most-frames clip, singletons keep themselves") {
    val rows = Multimodal.m16VideoManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Long]("n_frames"), r.getAs[Long]("canonical_id"),
        r.getAs[Long]("keep")))
    assert(rows.nonEmpty)
    val cluster = rows.map(t => t._1 -> t._2).toMap
    val pairs = Multimodal.m13VideoNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty, "no video near-dup pairs — fixture degenerate")
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters") }
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._5 == 1L) == 1, s"cluster $rep keeper count")
      val argmax = members.minBy(m => (-m._3, m._1))
      members.foreach { m =>
        assert(m._4 == argmax._1, s"canonical of ${m._1} not most-frames") }
    }
    rows.filter(m => rows.count(_._2 == m._2) == 1).foreach { m =>
      assert(m._4 == m._1 && m._5 == 1L, s"singleton ${m._1} not kept") }
  }

  test("m13 temporal near-dup: aligned runs vote one offset, scattered " +
      "coincidences stay below threshold, offset ties break to the smallest " +
      "delta, and the sig cap sheds constant-frame pairs count-first") {
    import spark.implicits._
    def frames(rows: (Long, Seq[Long])*): org.apache.spark.sql.DataFrame =
      rows.flatMap { case (id, sigs) =>
        sigs.zipWithIndex.map { case (sg, fi) => (id, fi.toLong, sg) }
      }.toDF("doc_id", "frame_idx", "sig")
    val f = frames(
      1L -> Seq(10L, 11L, 12L, 13L, 14L, 15L),
      2L -> Seq(90L, 91L, 10L, 11L, 12L, 13L),   // clip 1 shifted by −2
      3L -> Seq(11L, 99L, 14L, 98L, 97L, 96L),   // 2 hits at 2 offsets
      5L -> Seq(1L, 2L, 3L, 1L, 2L, 3L),         // periodic: ties with 6
      6L -> Seq(1L, 2L, 3L),
      7L -> Seq(777L, 777L, 777L, 777L, 777L, 777L), // constant frame
      8L -> Seq(777L, 777L, 777L, 777L, 777L, 777L))
    val out = Multimodal.temporalNearDup(f, maxSig = None).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("best_delta"), r.getAs[Long]("n_aligned"))).toMap
    assert(out((1L, 2L)) == (-2L, 4L), out.toString) // 4 votes at one offset
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)),
      "scattered single-offset coincidences crossed the threshold")
    // 3 votes at delta 0 AND at delta 3 — deterministic smallest wins
    assert(out((5L, 6L)) == (0L, 3L), out.toString)
    // the degenerate constant-frame pair rides offset 0 with 6 votes…
    assert(out((7L, 8L))._2 == 6L)
    // …and the count-first cap sheds it wholesale while real aligned
    // pairs survive untouched
    val capped = Multimodal.temporalNearDup(f, maxSig = Some(5L)).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("best_delta"), r.getAs[Long]("n_aligned"))).toMap
    assert(!capped.contains((7L, 8L)), "mega-sig pair survived the cap")
    assert(capped((1L, 2L)) == (-2L, 4L) && capped((5L, 6L)) == (0L, 3L))
    // sf gate: pairs exist, ordered a < b, all at/above the vote floor
    val sfOut = Multimodal.m13VideoNearDup(spark, sf).collect()
    assert(sfOut.nonEmpty)
    sfOut.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("n_aligned") >= Multimodal.M13MinAligned)
    }
  }

  test("m10 shot boundaries: identical frames yield one shot, a planted " +
      "content flip yields exactly the hand-computed cuts, short payloads " +
      "frame partially") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sig(s: String) = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    def expectedCuts(payload: String): (Long, Long) = {
      val fl = math.max(payload.length / Multimodal.NFrames, 1)
      val frames = (0 until Multimodal.NFrames)
        .map(k => payload.slice(k * fl, k * fl + fl)).filter(_.nonEmpty)
      val cuts = frames.sliding(2).count {
        case Seq(a, b) =>
          java.lang.Long.bitCount(sig(a) ^ sig(b)) >= Multimodal.ShotCutHamming
        case _ => false
      }
      (frames.size.toLong, cuts.toLong)
    }
    val steady = "AB" * 16                    // 16 identical "AB" frames
    val flip = "A" * 16 + "B" * 16           // content change mid-clip
    val short = "xyz"                        // 3 one-char frames
    val docs = Seq((1L, steady), (2L, flip), (3L, short))
      .toDF("doc_id", "text")
    // drive through a fixture dir so the query path itself is tested
    val dir = java.nio.file.Files.createTempDirectory("m10").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.m10ShotBoundaries(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          r.getAs[Long]("n_shots"))).toMap
    Seq(1L -> steady, 2L -> flip, 3L -> short).foreach { case (id, p) =>
      val (nf, nc) = expectedCuts(p)
      assert(out(id) == ((nf, nc, nc + 1L)),
        s"doc $id: got ${out(id)}, expected ($nf, $nc, ${nc + 1})")
    }
    assert(out(1L)._2 == 0L, "identical frames must produce zero cuts")
    assert(out(3L)._1 == 3L, "short payload frames partially")
  }

  test("e24 delta join: the four bilinear terms partition the recomputed " +
      "join exactly, and the delta sides broadcast") {
    val out = Events.e24DeltaJoin(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pairs") ==
        r.getAs[Long]("n_bb") + r.getAs[Long]("n_db") +
          r.getAs[Long]("n_bd") + r.getAs[Long]("n_dd"),
        s"terms must partition the join: $r")
    }
    // delta terms are non-trivial on the corpus (the last-10% split
    // contains clicks and purchases)
    assert(out.map(_.getAs[Long]("n_db")).sum > 0L)
    assert(out.map(_.getAs[Long]("n_bd")).sum > 0L)
    // full recompute ≡ the four-term union, independently of the oracle
    val ev = graft.Tables.events(spark, sf)
    val mxv = ev.agg(max(col("event_id"))).collect()(0).getLong(0)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"))
    val full = c.join(p, Seq("user_id")).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    val ours = out.map(r => r.getAs[Long]("user_id") ->
      r.getAs[Long]("n_pairs")).toMap
    assert(ours == full, "decomposition lost or duplicated pairs")
    // the delta sides plan as broadcasts
    val plan = Events.e24DeltaJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"delta terms should broadcast:\n$plan")
  }

  test("e25 optional stage: A-C completes without B, A-B-C counts the " +
      "optional use, extra Bs are inert, greedy non-overlap holds") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      // user 1: click → purchase (B skipped)
      (1L, ts(0), 1L, "click"), (1L, ts(1), 2L, "purchase"),
      // user 2: click → view → purchase (B used)
      (2L, ts(0), 11L, "click"), (2L, ts(1), 12L, "view"),
      (2L, ts(2), 13L, "purchase"),
      // user 3: click → view → view → purchase (second B inert)
      (3L, ts(0), 21L, "click"), (3L, ts(1), 22L, "view"),
      (3L, ts(2), 23L, "view"), (3L, ts(3), 24L, "purchase"),
      // user 4: two back-to-back completions, one of each path
      (4L, ts(0), 31L, "click"), (4L, ts(1), 32L, "purchase"),
      (4L, ts(2), 33L, "click"), (4L, ts(3), 34L, "view"),
      (4L, ts(4), 35L, "purchase"),
      // user 5: view then purchase with no click — nothing
      (5L, ts(0), 41L, "view"), (5L, ts(1), 42L, "purchase"),
      // user 6: open at state 2 (click, view, no purchase yet)
      (6L, ts(0), 51L, "click"), (6L, ts(1), 52L, "view")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.patternCountOptional(rows, "click", "view", "purchase")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_complete"), r.getAs[Long]("n_with_b"),
          r.getAs[Long]("open_state"))).toMap
    assert(out(1L) == ((1L, 0L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == ((1L, 1L, 0L)))
    assert(out(3L) == ((1L, 1L, 0L)), s"extra B must be inert: ${out(3L)}")
    assert(out(4L) == ((2L, 1L, 0L)))
    assert(out(5L) == ((0L, 0L, 0L)))
    assert(out(6L) == ((0L, 0L, 2L)))
  }

  test("e27 counted repeat B{2,}: two Bs complete, one fails on C, long " +
      "runs count fully, non-overlap and partition-invariance hold") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      // user 1: A B B C — the minimum completion (sum_b = 2)
      (1L, ts(0), 1L, "click"), (1L, ts(1), 2L, "view"),
      (1L, ts(2), 3L, "view"), (1L, ts(3), 4L, "purchase"),
      // user 2: A B C — one B short: the C fails the attempt
      (2L, ts(0), 11L, "click"), (2L, ts(1), 12L, "view"),
      (2L, ts(2), 13L, "purchase"),
      // user 3: A B B B B C — greedy run counts all four Bs
      (3L, ts(0), 21L, "click"), (3L, ts(1), 22L, "view"),
      (3L, ts(2), 23L, "view"), (3L, ts(3), 24L, "view"),
      (3L, ts(4), 25L, "view"), (3L, ts(5), 26L, "purchase"),
      // user 4: failed attempt (A B C) then a completion (A B B C):
      // the failing C must not leak Bs into the next match
      (4L, ts(0), 31L, "click"), (4L, ts(1), 32L, "view"),
      (4L, ts(2), 33L, "purchase"), (4L, ts(3), 34L, "click"),
      (4L, ts(4), 35L, "view"), (4L, ts(5), 36L, "view"),
      (4L, ts(6), 37L, "purchase"),
      // user 5: open attempt with one B so far
      (5L, ts(0), 41L, "click"), (5L, ts(1), 42L, "view"),
      // user 6: repeated A mid-attempt is ignored (A B A B C completes
      // with bc=2 — the second A neither resets nor restarts)
      (6L, ts(0), 51L, "click"), (6L, ts(1), 52L, "view"),
      (6L, ts(2), 53L, "click"), (6L, ts(3), 54L, "view"),
      (6L, ts(4), 55L, "purchase")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Events.patternCountRepeat(df, "click", "view", "purchase", minB = 2)
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_complete"), r.getAs[Long]("sum_b"),
            r.getAs[Long]("open_state"), r.getAs[Long]("open_b"))).toMap
    val out = run(rows)
    assert(out(1L) == ((1L, 2L, 0L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 0L, 0L)), s"one B must fail: ${out(2L)}")
    assert(out(3L) == ((1L, 4L, 0L, 0L)), s"greedy run: ${out(3L)}")
    assert(out(4L) == ((1L, 2L, 0L, 0L)), s"no B leak across fail: ${out(4L)}")
    assert(out(5L) == ((0L, 0L, 1L, 1L)), s"open attempt: ${out(5L)}")
    assert(out(6L) == ((1L, 2L, 0L, 0L)), s"mid-attempt A ignored: ${out(6L)}")
    assert(run(rows.repartition(7)) == out, "partitioning changed the fold")
  }

  test("e31 bounded repeat B{2,4}: in-range completes, the 5th B kills the " +
      "attempt greedily, boundary counts complete, partition-invariant") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    def ev(u: Long, ids: Seq[(Long, String)]) =
      ids.zipWithIndex.map { case ((id, ty), i) => (u, ts(i), id, ty) }
    val A = "click"; val B = "view"; val C = "purchase"
    val rows = (
      // user 1: A B B C — lower boundary completes (bc = 2)
      ev(1L, Seq((1L, A), (2L, B), (3L, B), (4L, C))) ++
      // user 2: A B B B B C — upper boundary completes exactly (bc = 4)
      ev(2L, Seq((11L, A), (12L, B), (13L, B), (14L, B), (15L, B), (16L, C))) ++
      // user 3: A B B B B B C — the 5th B OVERFLOWS: attempt dies on the
      // spot, the later C finds no open attempt
      ev(3L, Seq((21L, A), (22L, B), (23L, B), (24L, B), (25L, B), (26L, B),
        (27L, C))) ++
      // user 4: overflow then a fresh attempt completes — the kill must
      // not poison the next A (A 5×B, then A B B C)
      ev(4L, Seq((31L, A), (32L, B), (33L, B), (34L, B), (35L, B), (36L, B),
        (37L, A), (38L, B), (39L, B), (40L, C))) ++
      // user 5: A B C — under minB, C fails the attempt
      ev(5L, Seq((41L, A), (42L, B), (43L, C))) ++
      // user 6: open attempt at the cap (A B B B B, no C yet): state
      // stays live — only the (maxB+1)-th B kills
      ev(6L, Seq((51L, A), (52L, B), (53L, B), (54L, B), (55L, B)))
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Events.patternCountRepeatBounded(df, A, B, C, minB = 2, maxB = 4)
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_complete"), r.getAs[Long]("sum_b"),
            r.getAs[Long]("n_overflow"), r.getAs[Long]("open_state"),
            r.getAs[Long]("open_b"))).toMap
    val out = run(rows)
    assert(out(1L) == ((1L, 2L, 0L, 0L, 0L)), s"min boundary: ${out(1L)}")
    assert(out(2L) == ((1L, 4L, 0L, 0L, 0L)), s"max boundary: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1L, 0L, 0L)), s"overflow kill: ${out(3L)}")
    assert(out(4L) == ((1L, 2L, 1L, 0L, 0L)), s"kill not poisoning: ${out(4L)}")
    assert(out(5L) == ((0L, 0L, 0L, 0L, 0L)), s"under min: ${out(5L)}")
    assert(out(6L) == ((0L, 0L, 0L, 1L, 4L)), s"open at cap: ${out(6L)}")
    assert(run(rows.repartition(7)) == out, "partitioning changed the fold")
    // unbounded agreement: where no attempt ever exceeds maxB, e31 ≡ e27
    val small = rows.filter(col("user_id").isin(1L, 5L, 6L))
    val unb = Events.patternCountRepeat(small, A, B, C, minB = 2)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_complete"), r.getAs[Long]("sum_b"))).toMap
    val bnd = run(small).view.mapValues(t => (t._1, t._2)).toMap
    assert(bnd == unb, s"bounded drifted from e27 under the cap: $bnd vs $unb")
  }

  test("e32 overlap: suffix-shared matches under SKIP TO NEXT ROW, strict " +
      "superset of the SKIP PAST LAST ROW spans, same-timestamp ties break " +
      "by event id, null users survive the null-safe join, " +
      "partition-invariant") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val A = "click"; val V = "view"; val P = "purchase"
    val rows = Seq(
      // user 1: A V A V P — two overlapping matches share purchase 5
      (Some(1L), ts(0), 1L, A), (Some(1L), ts(1), 2L, V),
      (Some(1L), ts(2), 3L, A), (Some(1L), ts(3), 4L, V),
      (Some(1L), ts(4), 5L, P),
      // user 2: A V P A — trailing click never completes
      (Some(2L), ts(0), 11L, A), (Some(2L), ts(1), 12L, V),
      (Some(2L), ts(2), 13L, P), (Some(2L), ts(3), 14L, A),
      // user 3: V P A — wrong order, no match
      (Some(3L), ts(0), 21L, V), (Some(3L), ts(1), 22L, P),
      (Some(3L), ts(2), 23L, A),
      // user 4: two clicks at the SAME timestamp — id order decides
      (Some(4L), ts(0), 31L, A), (Some(4L), ts(0), 32L, A),
      (Some(4L), ts(1), 33L, V), (Some(4L), ts(2), 34L, P),
      // null user: the null-safe join must keep the match
      (None, ts(0), 41L, A), (None, ts(1), 42L, V), (None, ts(2), 43L, P)
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Events.patternOverlap(df, Seq(A, V, P)).collect()
        .map(r => (Option(r.get(r.fieldIndex("user_id")))
            .map(_.asInstanceOf[Long]),
          r.getAs[Long]("start_event_id"), r.getAs[Long]("mid_event_id"),
          r.getAs[Long]("end_event_id"))).toSet
    val out = run(rows)
    assert(out == Set(
      (Some(1L), 1L, 2L, 5L), (Some(1L), 3L, 4L, 5L),
      (Some(2L), 11L, 12L, 13L),
      (Some(4L), 31L, 33L, 34L), (Some(4L), 32L, 33L, 34L),
      (None, 41L, 42L, 43L)), out.toString)
    assert(run(rows.repartition(7)) == out, "partitioning changed the matches")
    // non-overlap (e20, SKIP PAST LAST ROW) on the same input: 1 span
    // for user 1 — and every one of its span starts also starts an
    // overlap match
    val spans = Events.patternMatches(rows, Seq(A, V, P)).collect()
      .map(r => (Option(r.get(r.fieldIndex("user_id")))
          .map(_.asInstanceOf[Long]),
        r.getAs[Long]("start_event_id"))).toSet
    assert(spans.count(_._1 == Some(1L)) == 1)
    val overlapStarts = out.map(m => (m._1, m._2))
    assert(spans.subsetOf(overlapStarts),
      s"a greedy span start is missing from the overlap set: $spans")
    // sf gate: the superset property holds on real events too
    val sfOut = Events.e32PatternOverlap(spark, sf).collect()
      .map(r => (Option(r.get(r.fieldIndex("user_id")))
          .map(_.asInstanceOf[Long]),
        r.getAs[Long]("start_event_id"))).toSet
    assert(sfOut.nonEmpty)
    val sfSpans = Events.patternMatches(
        graft.Tables.events(spark, sf), Seq(A, V, P)).collect()
      .map(r => (Option(r.get(r.fieldIndex("user_id")))
          .map(_.asInstanceOf[Long]),
        r.getAs[Long]("start_event_id"))).toSet
    assert(sfSpans.subsetOf(sfOut))
  }

  test("e33 delta distinct: support counting survives partial retraction, " +
      "full retraction vanishes, delta-only net-zero never appears, and " +
      "the merged state equals a from-scratch multiset recompute at SF") {
    import spark.implicits._
    val h0 = 3600L
    def f(rows: (Long, Long, String, Long)*) =
      rows.toDF("hour_s", "user_id", "event_type", "event_id")
    val base = f(
      (h0, 1L, "click", 10L), (h0, 1L, "error", 12L), // user 1: support 2
      (h0, 2L, "error", 21L))                          // user 2: support 1
    val ins = f(
      (h0, 3L, "click", 91L),                          // user 3 appears
      (h0, 4L, "click", 92L))                          // user 4 appears
    // retract ONE of user 1's two events and user 2's only event —
    // retractions target base rows by construction
    val del = base.filter(col("event_id").isin(12L, 21L))
    val out = Events.deltaDistinct(base, ins, del).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_before") == 2L, r.toString)
    // user 1 survives partial retraction (2−1), user 2 vanishes (1−1),
    // users 3 and 4 appear: after = {1, 3, 4}
    assert(r.getAs[Long]("n_after") == 3L, r.toString)
    assert(r.getAs[Long]("n_appear") == 2L && r.getAs[Long]("n_vanish") == 1L,
      r.toString)
    // sf gate: transition identity + merged ≡ from-scratch multiset
    val sfOut = Events.e33DeltaDistinct(spark, sf).collect()
    assert(sfOut.nonEmpty)
    sfOut.foreach { r =>
      assert(r.getAs[Long]("n_after") == r.getAs[Long]("n_before") -
        r.getAs[Long]("n_vanish") + r.getAs[Long]("n_appear"), r.toString)
    }
    assert(sfOut.map(_.getAs[Long]("n_appear")).sum > 0L,
      "delta decile introduced no new users — scenario degenerate")
    // independent scratch recompute (the weights formulation, not the
    // engine's stored-state merge)
    val ev = graft.Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_s"),
        col("user_id"), col("event_type"), col("event_id"))
    val mx = ev.agg(max(col("event_id")).as("mx"))
    val t = ev.crossJoin(broadcast(mx))
    val scratch = t.select(col("hour_s"), col("user_id"), lit(1L).as("w"))
      .unionByName(t.filter(col("event_id") * 10L < col("mx") * 9L &&
          col("event_type") === "error" && col("event_id") % 3L === 0L)
        .select(col("hour_s"), col("user_id"), lit(-1L).as("w")))
      .groupBy(col("hour_s"), col("user_id"))
      .agg(sum(col("w")).as("supp"))
      .filter(col("supp") > 0L)
      .groupBy(col("hour_s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("hour_s") -> r.getAs[Long]("n")).toMap
    sfOut.foreach { r =>
      assert(r.getAs[Long]("n_after") ==
        scratch.getOrElse(r.getAs[Long]("hour_s"), 0L),
        s"merged state diverged from scratch at hour ${r.getAs[Long]("hour_s")}")
    }
  }

  test("e34 overlap within: matches are exactly the in-window subset of " +
      "e32, the deadline is armed on real events, and the greedy chain " +
      "never retries a missed completion") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val W = 5000000L // 5 s
    val rows = Seq(
      // in-window match: A at 0, V at 1, P at 3 → span 3 s ≤ 5 s
      (1L, ts(0), 1L, "click"), (1L, ts(1), 2L, "view"),
      (1L, ts(2), 3L, "click"), (1L, ts(3), 4L, "purchase"),
      // greedy no-retry: A at 0, first V at 1, first P after it at 10
      // (span 10 s > W) — dropped even though a LATER chain could not
      // exist; the second A at 8 chains V?  no view after 8 → no match
      (2L, ts(0), 11L, "click"), (2L, ts(1), 12L, "view"),
      (2L, ts(8), 13L, "click"), (2L, ts(10), 14L, "purchase")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Events.patternOverlapWithin(rows,
        Seq("click", "view", "purchase"), W).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_event_id"),
        r.getAs[Long]("end_event_id"), r.getAs[Long]("span_us"))).toSet
    // user 1: click1 → view2 → purchase4 (span 3 s); click3 → no view
    // after it. user 2: click11 → view12 → purchase14 span 10 s > W
    // dropped; click13 → no view after it.
    assert(got == Set((1L, 1L, 4L, 3000000L)), got.toString)
    // sf gate: e34 ⊆ e32 with spans within the 7-day window, and the
    // deadline drops real matches (armed)
    val within = Events.e34OverlapWithin(spark, sf).collect()
      .map(r => (Option(r.get(r.fieldIndex("user_id")))
          .map(_.asInstanceOf[Long]),
        r.getAs[Long]("start_event_id"), r.getAs[Long]("end_event_id")))
      .toSet
    val all = Events.e32PatternOverlap(spark, sf).collect()
      .map(r => (Option(r.get(r.fieldIndex("user_id")))
          .map(_.asInstanceOf[Long]),
        r.getAs[Long]("start_event_id"), r.getAs[Long]("end_event_id")))
      .toSet
    assert(within.subsetOf(all), "within-matches not a subset of e32")
    assert(within.size < all.size,
      "the 7-day deadline dropped nothing — window check idle at SF")
  }

  test("m12 keyframes: one per shot, shot indexes dense from 0, first " +
      "keyframe at clip start, counts reconcile with m10") {
    val kf = Multimodal.m12Keyframes(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shot_idx"),
        r.getAs[Long]("start_frame")))
    val shots = Multimodal.m10ShotBoundaries(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shots")).toMap
    val byDoc = kf.groupBy(_._1)
    assert(byDoc.keySet == shots.keySet)
    byDoc.foreach { case (doc, g) =>
      assert(g.length.toLong == shots(doc),
        s"doc $doc: ${g.length} keyframes != ${shots(doc)} shots")
      assert(g.map(_._2).sorted.sameElements(0L until shots(doc)),
        s"doc $doc: shot indexes not dense")
      assert(g.minBy(_._2)._3 == 0L, s"doc $doc: first keyframe not frame 0")
    }
    assert(kf.exists(_._2 > 0L), "no multi-shot clip in the fixture")
  }

  test("m11 audio near-dup: the MIH blocking equals brute force over the " +
      "decoded audio hashes") {
    import spark.implicits._
    val rows = Multimodal.m11AudioNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(rows.nonEmpty, "no audio near-dup pairs found")
    assert(rows.values.forall(_ <= Multimodal.M7MaxHamming))
    assert(rows.forall { case ((a, b), _) => a < b })
    // brute force over the m9 hashes, driver-side — the blocking must
    // lose nothing and invent nothing
    val hs = Multimodal.audioHash(
      graft.Tables.documents(spark, sf).select(col("doc_id")).as[Long])
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo"))).sortBy(_._1)
    val brute = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2._1 ^ hs(j)._2._1) +
        java.lang.Long.bitCount(hs(i)._2._2 ^ hs(j)._2._2)
      if ham <= Multimodal.M7MaxHamming
    } yield (hs(i)._1, hs(j)._1) -> ham.toLong).toMap
    assert(rows == brute,
      s"blocked-only=${rows.keySet -- brute.keySet} " +
        s"brute-only=${brute.keySet -- rows.keySet}")
  }

  test("x34 train order: slots unique, per-source stride-k progressions, " +
      "round-robin head, deterministic under repartition") {
    val rows = TextAnalysis.x34TrainOrder(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("src_rank"), r.getAs[Long]("slot")))
    val k = rows.map(_._2).distinct.length.toLong
    assert(k >= 2, "fixture needs several sources")
    assert(rows.map(_._4).distinct.length == rows.length, "slots collide")
    // per source: slots are an arithmetic progression with stride k
    rows.groupBy(_._2).foreach { case (src, g) =>
      val slots = g.sortBy(_._3).map(_._4)
      assert(slots.head < k, s"$src does not start in the first round")
      slots.sliding(2).foreach {
        case Array(a, b) => assert(b - a == k, s"$src stride broken")
        case _ =>
      }
    }
    // the first k slots hold exactly one doc from each source
    val head = rows.filter(_._4 < k)
    assert(head.length == k.toInt && head.map(_._2).distinct.length == k.toInt,
      "first round is not one-per-source")
    // deterministic: recompute over a repartitioned frame
    val re = TextAnalysis.trainOrder(
      Tables.documents(spark, sf).repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("slot")).toMap
    assert(rows.forall(r => re(r._1) == r._4), "order not reshuffle-proof")
  }

  test("x33 budget selection: kept tokens fit the half budget TIGHTLY " +
      "(next-priority doc would overflow), reshuffle-proof") {
    val rows = TextAnalysis.x33BudgetSelect(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Boolean]("kept")))
    val total = rows.map(_._2).sum
    val budget = total / 2
    val keptTok = rows.filter(_._3).map(_._2).sum
    assert(keptTok <= budget, s"kept $keptTok > budget $budget")
    // tight: the highest-priority dropped doc would not have fit
    def hd(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$id:budget".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val dropped = rows.filter(!_._3)
    assert(dropped.nonEmpty && rows.exists(_._3))
    val firstDropped = dropped.minBy(r => (hd(r._1), r._1))
    assert(keptTok + firstDropped._2 > budget,
      s"selection not tight: $keptTok + ${firstDropped._2} <= $budget")
    // keep set = the priority-order prefix (driver recompute)
    val inOrder = rows.sortBy(r => (hd(r._1), r._1))
    var cum = 0L
    val expect = inOrder.map { r => cum += r._2; (r._1, cum <= budget) }.toMap
    assert(rows.forall(r => expect(r._1) == r._3), "keep set != cumsum prefix")
  }

  test("x33 degenerate budget: an all-empty-doc corpus (budget = 0) yields " +
      "every doc with kept = false, not an empty frame") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.budgetSelect(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Boolean]("kept")))
    assert(rows.length == 20, s"degenerate budget dropped rows: ${rows.length}")
    assert(rows.forall(r => r._2 == 0L && !r._3),
      "zero budget must keep nothing but still emit every doc")
  }

  test("x32 waterfall reconciles against its three source stages, and " +
      "survivorship is monotone") {
    val row = TextAnalysis.x32DedupWaterfall(spark, sf).collect()(0)
    def g(c: String) = row.getAs[Long](c)
    // monotone: each stage can only drop mass
    assert(g("n_docs") >= g("n_after_exact") &&
      g("n_after_exact") >= g("n_after_near") &&
      g("n_after_near") >= g("n_after_subsume"))
    assert(g("n_tokens") >= g("tok_after_exact") &&
      g("tok_after_exact") >= g("tok_after_near") &&
      g("tok_after_near") >= g("tok_after_subsume"))
    // reconcile against the source queries driver-side
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.operators.TextOps.words(col("text")))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kExact = Dedup.d1ExactDedup(spark, sf).collect()
      .filter(!_.getAs[Boolean]("is_dup")).map(_.getAs[Long]("doc_id")).toSet
    val kNear = Dedup.d6DupClusters(spark, sf).collect()
      .filter(_.getAs[Long]("is_canonical") == 1L)
      .map(_.getAs[Long]("doc_id")).toSet
    val kSub = Dedup.d15Subsumption(spark, sf).collect()
      .filter(!_.getAs[Boolean]("subsumed")).map(_.getAs[Long]("doc_id")).toSet
    val afterNear = kExact.intersect(kNear)
    val afterSub = afterNear.intersect(kSub)
    assert(g("n_after_exact") == kExact.size.toLong)
    assert(g("tok_after_exact") == kExact.toSeq.map(toks).sum)
    assert(g("n_after_near") == afterNear.size.toLong)
    assert(g("n_after_subsume") == afterSub.size.toLong)
    assert(g("tok_after_subsume") == afterSub.toSeq.map(toks).sum)
    // the waterfall must drop something overall on this corpus, or
    // the query proves nothing (which stage drops is corpus-dependent:
    // the sf0.001 fixture has near-dups and subsumed docs but no
    // exact dups)
    assert(g("n_after_subsume") < g("n_docs"))
  }

  test("x31 chunking: full coverage, fixed overlap, no redundant tail, " +
      "boundary counts exact") {
    import spark.implicits._
    // docs straddling every boundary of the 64/48 geometry:
    // n <= 64 -> 1 chunk; n = 112 (= 48 + 64) -> 2; n = 113 -> 3; empty -> 0
    val mk = (id: Long, n: Int) => (id, (1 to n).map(i => s"w$i").mkString(" "))
    val docs = Seq(mk(1L, 10), mk(2L, 64), mk(3L, 65), mk(4L, 112),
      mk(5L, 113), mk(6L, 200), (7L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocs(docs, 64L, 48L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("start_word"), r.getAs[Long]("n_chunk_words")))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(!byDoc.contains(7L), "empty doc must emit no chunks")
    assert(byDoc(1L).length == 1 && byDoc(2L).length == 1)
    assert(byDoc(3L).length == 2 && byDoc(4L).length == 2)
    assert(byDoc(5L).length == 3 && byDoc(6L).length == 4)
    val lens = Map(1L -> 10L, 2L -> 64L, 3L -> 65L, 4L -> 112L,
      5L -> 113L, 6L -> 200L)
    byDoc.foreach { case (id, cs) =>
      // geometry: chunk k starts at k*48+1; sizes truncate at n
      cs.foreach { case (_, k, s0, w) =>
        assert(s0 == k * 48L + 1L)
        assert(w == math.min(64L, lens(id) - s0 + 1L))
      }
      // coverage: union of [start, start+w) is exactly [1, n]
      val covered = cs.flatMap { case (_, _, s0, w) => s0 until (s0 + w) }.toSet
      assert(covered == (1L to lens(id)).toSet, s"coverage hole in doc $id")
      // no redundant tail: every chunk past the first adds new words
      cs.sliding(2).foreach {
        case Array((_, _, s1, w1), (_, _, s2, w2)) =>
          assert(s2 + w2 > s1 + w1, s"subset tail chunk in doc $id")
        case _ =>
      }
    }
  }

  test("e29 range frame: tie rows share one frame, the boundary is " +
      "inclusive at 3599s, and gaps shrink the frame") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      (1L, ts(0)), (2L, ts(0)),          // ties at t=0
      (3L, ts(3599)),                    // exactly on the boundary
      (4L, ts(3600)),                    // one past: 0/2 drop out
      (5L, ts(100000))                   // far gap: frame of one
    ).map { case (id, t) => (0L, t, id, "click", 1.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3599L, 0L)
    val out = rows.select(col("event_id"),
        count(lit(1)).over(w).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L && out(2L) == 2L, "ties must share the frame")
    assert(out(3L) == 3L, "3599s back is inside the inclusive boundary")
    assert(out(4L) == 2L, "t=3600 must drop the t=0 ties (3,4 remain)")
    assert(out(5L) == 1L, "a gap shrinks the frame to the row itself")
  }

  test("e30 repeat-within: in-window completes, late C expires the attempt " +
      "and is consumed idle, a breaching A reopens fresh") {
    import spark.implicits._
    import java.sql.Timestamp
    val day = 86400L
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val w = 7L * day * 1000000L // micros
    val rows = Seq(
      // user 1: A B B C inside the window — completes
      (1L, ts(0), 1L, "click"), (1L, ts(10), 2L, "view"),
      (1L, ts(20), 3L, "view"), (1L, ts(30), 4L, "purchase"),
      // user 2: A B B then C at day 8 — the attempt expires; the C
      // lands idle (no completion, one expiry)
      (2L, ts(0), 11L, "click"), (2L, ts(10), 12L, "view"),
      (2L, ts(20), 13L, "view"), (2L, ts(8 * day), 14L, "purchase"),
      // user 3: A at t0, then a SECOND A at day 8 breaches the window
      // and reopens fresh; B B C complete inside the new window
      (3L, ts(0), 21L, "click"), (3L, ts(8 * day), 22L, "click"),
      (3L, ts(8 * day + 10), 23L, "view"), (3L, ts(8 * day + 20), 24L, "view"),
      (3L, ts(8 * day + 30), 25L, "purchase"),
      // user 4: open attempt inside the window (no expiry yet)
      (4L, ts(0), 31L, "click"), (4L, ts(10), 32L, "view")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.patternCountRepeatWithin(rows,
        "click", "view", "purchase", minB = 2, windowMicros = w)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_complete"), r.getAs[Long]("sum_b"),
          r.getAs[Long]("n_expired"), r.getAs[Long]("open_state"),
          r.getAs[Long]("open_b"))).toMap
    assert(out(1L) == ((1L, 2L, 0L, 0L, 0L)), s"in-window: ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 1L, 0L, 0L)), s"late C: ${out(2L)}")
    assert(out(3L) == ((1L, 2L, 1L, 0L, 0L)), s"breaching A: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L, 1L, 1L)), s"open: ${out(4L)}")
  }

  test("e28 permute: any order completes, a repeat restarts the attempt, " +
      "non-overlap and partition-invariance hold") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      // user 1: reverse order completes (purchase view click)
      (1L, ts(0), 1L, "purchase"), (1L, ts(1), 2L, "view"),
      (1L, ts(2), 3L, "click"),
      // user 2: A B A C — the repeated A invalidates {A,B}; the match
      // restarts at the second A, leaving {A,C} open (mask 1|4 = 5)
      (2L, ts(0), 11L, "click"), (2L, ts(1), 12L, "view"),
      (2L, ts(2), 13L, "click"), (2L, ts(3), 14L, "purchase"),
      // user 3: two disjoint completions in different orders
      (3L, ts(0), 21L, "click"), (3L, ts(1), 22L, "view"),
      (3L, ts(2), 23L, "purchase"), (3L, ts(3), 24L, "view"),
      (3L, ts(4), 25L, "purchase"), (3L, ts(5), 26L, "click"),
      // user 4: non-stage noise is transparent mid-attempt
      (4L, ts(0), 31L, "view"), (4L, ts(1), 32L, "error"),
      (4L, ts(2), 33L, "click"), (4L, ts(3), 34L, "purchase"),
      // user 5: open two-of-three (mask view|purchase = 6)
      (5L, ts(0), 41L, "view"), (5L, ts(1), 42L, "purchase")
    ).map { case (u, t, id, ty) => (u, t, id, ty, 0.0d) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Events.patternCountPermute(df, Seq("click", "view", "purchase"))
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_complete"), r.getAs[Long]("open_mask"))).toMap
    val out = run(rows)
    assert(out(1L) == ((1L, 0L)), s"reverse order: ${out(1L)}")
    assert(out(2L) == ((0L, 5L)), s"repeat restarts: ${out(2L)}")
    assert(out(3L) == ((2L, 0L)), s"disjoint completions: ${out(3L)}")
    assert(out(4L) == ((1L, 0L)), s"noise transparent: ${out(4L)}")
    assert(out(5L) == ((0L, 6L)), s"open mask: ${out(5L)}")
    assert(run(rows.repartition(5)) == out, "partitioning changed the fold")
  }

  test("property: e27/e28 folds match independent reference automata on " +
      "random event runs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    import java.sql.Timestamp
    val types = Seq("click", "view", "purchase", "noise")
    val runGen = Gen.listOfN(6, Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(types))))
    def refRepeat(seq: List[String], minB: Int): (Long, Long, Long, Long) = {
      var st = 0L; var bc = 0L; var done = 0L; var sum = 0L
      seq.foreach {
        case "click" => if (st == 0L) { st = 1L; bc = 0L }
        case "view" => if (st == 1L) bc += 1L
        case "purchase" => if (st == 1L) {
          if (bc >= minB) { done += 1L; sum += bc }; st = 0L; bc = 0L
        }
        case _ =>
      }
      (done, sum, st, bc)
    }
    def refPermute(seq: List[String]): (Long, Long) = {
      var mask = 0L; var done = 0L
      seq.foreach { t =>
        val c = t match {
          case "click" => 1L; case "view" => 2L; case "purchase" => 3L
          case _ => 0L
        }
        if (c >= 1L) {
          val bit = 1L << (c - 1L).toInt
          mask = if ((mask & bit) != 0L) bit else mask | bit
          if (mask == 7L) { done += 1L; mask = 0L }
        }
      }
      (done, mask)
    }
    val prop = Prop.forAll(runGen) { users =>
      val rows = users.zipWithIndex.flatMap { case (seq, u) =>
        seq.zipWithIndex.map { case (t, i) =>
          (u.toLong, new Timestamp(1700000000000L + i * 1000L),
            u * 1000L + i, t, 0.0d)
        }
      }
      rows.isEmpty || {
        val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        val gotR = Events.patternCountRepeat(df, "click", "view", "purchase", 2)
          .collect().map(r => r.getAs[Long]("user_id") ->
            (r.getAs[Long]("n_complete"), r.getAs[Long]("sum_b"),
              r.getAs[Long]("open_state"), r.getAs[Long]("open_b"))).toMap
        val gotP = Events.patternCountPermute(df, Seq("click", "view", "purchase"))
          .collect().map(r => r.getAs[Long]("user_id") ->
            (r.getAs[Long]("n_complete"), r.getAs[Long]("open_mask"))).toMap
        users.zipWithIndex.forall { case (seq, u) =>
          seq.isEmpty ||
            (gotR(u.toLong) == refRepeat(seq, 2) &&
              gotP(u.toLong) == refPermute(seq))
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("e26 variant: binary variant probes match text-json extraction on " +
      "nested paths; missing paths null; malformed input nulls under try_") {
    import spark.implicits._
    val docs = Seq(
      """{"k": 7, "nest": {"a": [1, 2, 3]}}""",
      """{"k": 9}""",
      """not json at all""").toDF("js")
    val out = docs.select(
      try_parse_json(col("js")).as("v"))
      .select(
        variant_get(col("v"), "$.k", "bigint").as("k"),
        variant_get(col("v"), "$.nest.a[1]", "bigint").as("a1"),
        variant_get(col("v"), "$.gone", "bigint").as("gone"),
        col("v").isNull.as("bad"))
      .collect()
    assert(out(0).getAs[Long]("k") == 7L)
    assert(out(0).getAs[Long]("a1") == 2L, "nested array path must probe")
    assert(out(0).isNullAt(out(0).fieldIndex("gone")))
    assert(out(1).getAs[Long]("k") == 9L)
    assert(out(2).getAs[Boolean]("bad"),
      "malformed json must null under try_parse_json")
    // the corpus query's variant answers equal the text-json answers
    val viaVariant = Events.e26VariantExtract(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sum_k")).toMap
    val viaText = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("s"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("s")).toMap
    assert(viaVariant == viaText,
      "variant representation changed an answer")
  }

  test("x29 corpus card: one row whose components reconcile with their " +
      "source queries (gopher rate, dup rate, quality mean)") {
    val card = TextAnalysis.x29CorpusCard(spark, sf).collect()
    assert(card.length == 1)
    val r = card(0)
    assert(r.getAs[Long]("n_docs") > 0L && r.getAs[Long]("n_tokens") > 0L)
    // gopher pass rate ≡ the x24 query's own pass fraction
    val g = TextAnalysis.x24GopherRules(spark, sf).collect()
    val expG = g.count(_.getAs[Boolean]("gopher_pass")).toLong * 1000000L / g.length
    assert(r.getAs[Long]("gopher_pass_e6") == expG)
    // dup rate ≡ d13's drop rate (same cluster resolution)
    val d13 = Dedup.d13DedupStats(spark, sf).collect()(0)
    assert(r.getAs[Long]("dup_rate_e6") == d13.getAs[Long]("drop_rate_e6"))
    // quality mean ≡ the x2 signals' floor-mean
    val q = TextAnalysis.qualitySignals(Tables.documents(spark, sf)).collect()
    val expQ = q.map(_.getAs[Long]("quality_e3")).sum / q.length
    assert(r.getAs[Long]("mean_quality_e3") == expQ)
  }

  test("x30 lang confusion: mislabels flag, matching labels don't, 'und' is " +
      "excluded from the noise rate, rates are per declared label") {
    import spark.implicits._
    def run(docs: org.apache.spark.sql.DataFrame) = {
      val dir = java.nio.file.Files.createTempDirectory("x30").toString
      docs.withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      TextAnalysis.x30LangConfusion(spark, dir).collect()
    }
    val docs = Seq(
      (1L, "en", "the cat and the dog of a house"),   // correct
      (2L, "en", "the fish and a bird"),              // correct
      (3L, "de", "the dog and the cat"),              // MISLABELED (en text)
      (4L, "de", "der hund und die katze nicht"),     // correct
      (5L, "de", "zzz qqq xxx")                       // no markers → und
    ).toDF("doc_id", "lang", "text")
    val out = run(docs).map(r => (r.getAs[String]("declared"),
      r.getAs[String]("pred_lang")) ->
      (r.getAs[Long]("n"), r.getAs[Boolean]("mismatch"),
        r.getAs[Long]("noise_rate_e6"))).toMap
    assert(out(("en", "en"))._1 == 2L && !out(("en", "en"))._2)
    assert(out(("de", "en"))._2, "mislabel must flag")
    assert(!out(("de", "und"))._2, "'und' must not count as noise")
    // de noise rate: 1 mislabel of 3 declared-de docs
    assert(out(("de", "en"))._3 == 1000000L / 3L, s"got ${out(("de", "en"))}")
    assert(out(("en", "en"))._3 == 0L)
  }

  test("x22 safe split: near-dup clusters never straddle splits; singletons " +
      "keep x6's per-doc assignment; flagged leakage exists under x6 but " +
      "cannot under the cluster-grain split") {
    val out = TextAnalysis.x22SafeSplit(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[String]("split")))
    assert(out.length == Tables.documents(spark, sf).count())
    // the no-straddle invariant: one split per cluster
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    perCluster.foreach { case (rep, splits) =>
      assert(splits.size == 1, s"cluster $rep straddles: $splits")
    }
    // singletons (doc_id == rep and nothing else in the cluster) get
    // exactly the bucket x6 would give the doc itself
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    val bucketOf = Tables.documents(spark, sf).select(col("doc_id"),
      TextAnalysis.hashBucket(col("doc_id").cast("string")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def splitOfBucket(b: Long) =
      if (b < 80L) "train" else if (b < 90L) "val" else "test"
    out.filter(r => r._1 == r._2 && sizes(r._2) == 1).foreach { case (id, _, sp) =>
      assert(sp == splitOfBucket(bucketOf(id)), s"singleton $id moved splits")
    }
    // multi-doc clusters exist on this corpus, so the invariant bites
    assert(sizes.values.exists(_ > 1), "no clusters — fixture degenerate")
  }

  test("d12 SemDeDup: components = union-find over s3's global pairs restricted " +
      "to co-clustered vectors (the method's documented approximation, exactly)") {
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val cents = Similarity.collectCodebook(e)
    val clusterOf = Similarity.assignClusters(e, cents)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = Similarity.s3CosinePairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(global.nonEmpty, "no global near-dup pairs at this sf")
    val coClustered = global.filter { case (a, b) => clusterOf(a) == clusterOf(b) }
    // reference union-find over the restricted pair set
    val parent = scala.collection.mutable.Map(clusterOf.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    coClustered.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = clusterOf.keys.map(k => k -> find(k)).toMap
    val got = Similarity.d12SemDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("rep"), r.getAs[Long]("keep"))).toMap
    assert(got.keySet == clusterOf.keySet)
    got.foreach { case (v, (rep, keep)) =>
      assert(rep == want(v), s"rep mismatch for $v: $rep != ${want(v)}")
      assert(keep == (if (v == rep) 1L else 0L))
    }
  }

  test("d12 maxCluster sub-shards a mega-cluster: pairs = uncapped pairs " +
      "restricted to co-sharded members; small clusters and cap-inactive " +
      "runs are untouched") {
    import spark.implicits._
    // 40 identical embeddings in one cluster (every pair is a near-dup:
    // the degenerate boilerplate case) + a 4-member small cluster of
    // the same vector (its pairs must survive any cap)
    val mega = (0L until 40L).map(i => (i, Seq.fill(8)(0.5f), 0L))
    val small = (100L until 104L).map(i => (i, Seq.fill(8)(0.5f), 1L))
    val assigned = Similarity.withNorm(
      (mega ++ small).toDF("vec_id", "embedding", "cluster")
        .select(col("vec_id"), col("embedding"), col("cluster")))
      .select(col("vec_id"), col("embedding"), col("norm_fp"), col("cluster"))
    def pairs(cap: Option[Int]) =
      Similarity.withinClusterPairs(assigned, cap).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val uncapped = pairs(None)
    assert(uncapped.size == 40 * 39 / 2 + 4 * 3 / 2,
      s"uncapped should be all within-cluster pairs, got ${uncapped.size}")
    val cap = 8
    val capped = pairs(Some(cap))
    assert(capped.subsetOf(uncapped), "cap invented pairs")
    // small cluster (size 4 <= cap): exact, nothing dropped
    val smallPairs = uncapped.filter(_._1 >= 100L)
    assert(smallPairs.subsetOf(capped), "cap touched an under-cap cluster")
    // mega cluster: EXACTLY the co-sharded pairs survive — recompute
    // the shard assignment with the same engine expression
    val nShards = (40 + cap - 1) / cap
    // independent DRIVER-side re-derivation of the shard hash (md5
    // 16-bit prefix mod shards — the DuckDB-expressible form d18's
    // oracle restates), not the engine expression
    val shardOf = (0L until 40L).map { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 8) | (h(1) & 0xffL)
      id -> (v % nShards)
    }.toMap
    val wantMega = uncapped.filter { case (a, b) =>
      a < 100L && b < 100L && shardOf(a) == shardOf(b)
    }
    val gotMega = capped.filter(p => p._1 < 100L && p._2 < 100L)
    assert(gotMega == wantMega,
      s"sharded pair set wrong: missing ${wantMega -- gotMega}, extra ${gotMega -- wantMega}")
    assert(gotMega.nonEmpty && gotMega.size < 40 * 39 / 2,
      "cap should keep intra-shard dup pairs while shedding cross-shard work")
    // a cap at or above the largest cluster is a no-op
    assert(pairs(Some(40)) == uncapped, "inactive cap changed the result")
  }

  test("m9 audio hash: decode-derived bits equal the closed-form spec; the MIH " +
      "pair machinery is modality-blind over the audio hashes") {
    import spark.implicits._
    val rows = Multimodal.m9AudioHash(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = Multimodal.audioSamples(id)
      assert(r.getAs[Long]("n_samples") == n.toLong, s"decode length doc $id")
      // independent closed-form re-derivation, no codec in the loop
      val ws = new Array[Long](64); val wn = new Array[Long](64); var tot = 0L
      for (t <- 0 until n) {
        val av = math.abs(Multimodal.audioSample(id, t)).toLong
        val wi = t * 64 / n
        ws(wi) += av; wn(wi) += 1; tot += av
      }
      var hi = 0L; var lo = 0L
      for (b <- 0 until 64) if (ws(b) * n > tot * wn(b)) {
        if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
      }
      assert(r.getAs[Long]("ahash_hi") == hi, s"hi mismatch doc $id")
      assert(r.getAs[Long]("ahash_lo") == lo, s"lo mismatch doc $id")
    }
    // cross-modal blocking: the image MIH pair stage runs unchanged on
    // audio hashes and finds exactly the brute-force hamming<=7 pairs
    val hs = rows.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo")))
    val brute = (for {
      (a, ah, al) <- hs; (b, bh, bl) <- hs if a < b
      d = java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl)
      if d <= 7
    } yield (a, b, d.toLong)).toSet
    val mih = Multimodal.imgNearDupPairs(
      hs.toSeq.toDF("doc_id", "ahash_hi", "ahash_lo"), maxBucket = None)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("hamming"))).toSet
    assert(mih == brute,
      s"MIH/brute divergence on audio hashes: ${mih -- brute} | ${brute -- mih}")
  }

  test("s27 graph search: exact cosines over a two-hop-reachable visited " +
      "set, ranked contiguously, and never worse than seeds-only recall") {
    val res = Similarity.s27GraphSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("nid"), r.getAs[Long]("cos_e6")))
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    def cosE6(q: Long, n: Long): Long = {
      val (a, b) = (vecs(q), vecs(n))
      math.round(dotFp(a, b).toDouble /
        (math.sqrt(dotFp(a, a).toDouble) * math.sqrt(dotFp(b, b).toDouble)) * 1e6)
    }
    // per query: contiguous ranks from 1, descending cosine, no self,
    // and every reported cosine is the exact fixed-point value
    res.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.size),
        s"query $q: ranks not contiguous")
      assert(sorted.length <= Similarity.GraphK)
      assert(sorted.forall(_._3 != q), s"query $q returned itself")
      val cs = sorted.map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"query $q: cosines not descending")
    }
    res.foreach { case (q, _, n, c) =>
      assert(math.abs(c - cosE6(q, n)) <= 1L,
        s"($q,$n): reported $c, driver ${cosE6(q, n)}")
    }
    // reachability: every result sits within two graph hops of the
    // query's NEntry seeds (the beam only narrows this superset)
    val adj = Similarity.s23KnnGraphIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nid")))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val cents = vecs.keys.filter(_ < Similarity.NCentroids.toLong).toSeq
    def seeds(q: Long): Seq[Long] = cents
      .map(c => (c, cosE6(q, c)))
      .sortBy { case (c, cos) => (-cos, c) }
      .take(Similarity.NEntry).map(_._1)
    res.groupBy(_._1).foreach { case (q, rows) =>
      val s0 = seeds(q).toSet
      val r1 = s0 ++ s0.flatMap(adj.getOrElse(_, Set.empty))
      val r2 = r1 ++ r1.flatMap(adj.getOrElse(_, Set.empty))
      rows.foreach { case (_, _, n, _) =>
        assert(r2.contains(n), s"query $q: result $n not two-hop reachable")
      }
    }
    // candidate-set monotonicity: the final cut's recall vs the exact
    // top-k is >= the seeds-only baseline (top-k over a superset keeps
    // every exact neighbor the subset found)
    val qids = res.map(_._1).distinct
    def topK(q: Long, cand: Iterable[Long]): Set[Long] = cand
      .filter(_ != q).map(n => (n, cosE6(q, n))).toSeq
      .sortBy { case (n, c) => (-c, n) }
      .take(Similarity.GraphK).map(_._1).toSet
    val exactHits = qids.map { q =>
      q -> topK(q, vecs.keys.filter(_ != q)) }.toMap
    val finalHits = qids.map { q =>
      exactHits(q).intersect(res.filter(_._1 == q).map(_._3).toSet).size }.sum
    val seedHits = qids.map { q =>
      exactHits(q).intersect(topK(q, seeds(q))).size }.sum
    assert(finalHits >= seedHits,
      s"graph expansion lost recall: seeds-only $seedHits, final $finalHits")
  }

  test("x40 ingest decide: one decision per arriving doc, precedence " +
      "honored, exact/near components re-derived independently, and " +
      "value-threshold buckets totally ordered by score") {
    val split = Dedup.IncrementalSplit
    val rows = TextAnalysis.x40IngestDecide(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val arriving = docs.filter(org.apache.spark.sql.functions.col("doc_id") >= split)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == arriving,
      "one decision per arriving doc, none for standing docs")
    rows.foreach { r =>
      val reason = Option(r.getAs[String]("reason"))
      assert(r.getAs[Boolean]("keep") == reason.isEmpty)
      assert((r.getAs[String]("bucket") == null) == reason.nonEmpty,
        s"doc ${r.getAs[Long]("doc_id")}: bucket iff kept")
      // precedence: a later reason implies every earlier check passed
      reason match {
        case Some("lang") => assert(r.getAs[String]("pred_lang") != "en")
        case Some("quality") =>
          assert(r.getAs[String]("pred_lang") == "en")
          assert(r.getAs[Long]("quality_e3") < TextAnalysis.CurateMinQuality)
        case Some("holdout") =>
          assert(r.getAs[String]("pred_lang") == "en")
          assert(r.getAs[Long]("quality_e3") >= TextAnalysis.CurateMinQuality)
          assert(r.getAs[String]("split") != "train")
        case Some("decontam") => assert(r.getAs[String]("split") == "train")
        case _ => ()
      }
    }
    // exact_dup re-derived from d1's whole-corpus manifest: the
    // group-min rule IS "matches standing or an earlier arrival"
    val exactWant = Dedup.d1ExactDedup(spark, sf).collect()
      .filter(r => r.getAs[Long]("doc_id") >= split && r.getAs[Boolean]("is_dup"))
      .map(_.getAs[Long]("doc_id")).toSet
    val exactGot = rows.filter(r => r.getAs[String]("reason") == "exact_dup")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(exactGot == exactWant, s"exact_dup drift: $exactGot vs $exactWant")
    // near_dup re-derived through the OTHER pair path (full d3
    // candidates instead of the d8 incremental postings — the
    // batch-touching restriction of one equals the other)
    val nearWant = Dedup.verifiedPairsFrom(docs,
        Dedup.d3LshCandidates(spark, sf)).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
      .filter(_._2 >= split).map(_._2).toSet -- exactWant
    val nearGot = rows.filter(r => r.getAs[String]("reason") == "near_dup")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(nearGot == nearWant, s"near_dup drift: $nearGot vs $nearWant")
    // value-threshold buckets: every head score >= every middle score
    // >= every scored tail; unscorable kept docs land in tail
    def scoresOf(b: String) = rows
      .filter(r => r.getAs[String]("bucket") == b && !r.isNullAt(r.fieldIndex("mean_lp_e4")))
      .map(_.getAs[Long]("mean_lp_e4"))
    val (h, m, t) = (scoresOf("head"), scoresOf("middle"), scoresOf("tail"))
    if (h.nonEmpty && m.nonEmpty) assert(h.min >= m.max, "head below middle")
    if (m.nonEmpty && t.nonEmpty) assert(m.min >= t.max, "middle below tail")
    if (h.nonEmpty && t.nonEmpty) assert(h.min >= t.max, "head below tail")
    rows.filter(r => r.getAs[String]("bucket") == null && r.getAs[Boolean]("keep"))
      .foreach(r => fail(s"kept doc ${r.getAs[Long]("doc_id")} without a bucket"))
  }

  test("d22 soft dedup: weights are the floored per-cluster split of d6's " +
      "resolution, cluster mass never exceeds one document's worth, and " +
      "effective tokens follow exactly") {
    val rows = Dedup.d22SoftDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Long]("cluster_size"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("weight_e6"), r.getAs[Long]("eff_tokens_e6")))
    val clusters = Dedup.d6DupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    val sizes = clusters.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    assert(rows.map(_._1).toSet == clusters.keySet, "one row per document")
    rows.foreach { case (id, rep, n, tok, w, eff) =>
      assert(rep == clusters(id), s"doc $id: cluster drifted from d6")
      assert(n == sizes(rep), s"doc $id: cluster size drifted")
      assert(w == 1000000L / n, s"doc $id: weight not the floored split")
      assert(eff == tok * w, s"doc $id: effective tokens drifted")
    }
    // per-cluster mass: n * floor(1e6/n) <= 1e6, and within n of it
    rows.groupBy(_._2).foreach { case (rep, g) =>
      val mass = g.map(_._5).sum
      assert(mass <= 1000000L, s"cluster $rep overweighted: $mass")
      assert(mass > 1000000L - g.length, s"cluster $rep underweighted: $mass")
    }
    // armed: some cluster is non-trivial, so some weight < 1e6
    assert(rows.exists(_._5 < 1000000L), "no near-dup cluster on this corpus")
  }

  test("e35 decayed hitters: integer-exact vs a driver-side recompute, " +
      "and decay genuinely reorders the raw-count ranking") {
    val out = Events.e35DecayedHitters(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("decayed_e6"),
        r.getAs[Long]("n_events")))
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_timestamp(date_trunc('hour', ts)) AS h")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = ev.map(_._2).max
    val byUser = ev.groupBy(_._1).map { case (u, xs) =>
      val dec = xs.map { case (_, h) =>
        val age = (ref - h) / 3600L
        if (age >= Events.DecayCapHours) 0L else 1000000L / (1L << age)
      }.sum
      (u, dec, xs.length.toLong)
    }.toSeq.sortBy { case (u, d, _) => (-d, u) }.take(10)
    assert(out.toSeq == byUser,
      s"decayed ranking diverged: ${out.take(3).toSeq} vs ${byUser.take(3)}")
    // armed: the decayed top-10 order differs from the raw-count order
    val rawTop = ev.groupBy(_._1).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (u, n) => (-n, u) }.take(10).map(_._1)
    assert(out.map(_._1).toSeq != rawTop,
      "decay changed nothing — the gate would pass a raw count")
  }

  test("s29 residual IVFPQ: integer-exact vs a driver-side mirror of the " +
      "decomposed fixed-point pipeline") {
    val out = Similarity.s29KnnIvfPqResidual(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("nid"), r.getAs[Long]("cos_e6"))).toSet
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    def sub(v: Array[Float], i: Int): Array[Float] =
      v.slice(i * Similarity.PqSubDim, (i + 1) * Similarity.PqSubDim)
    val cents = (0L until Similarity.NCentroids.toLong).map(vecs).toArray
    val cbk = (0L until Similarity.PqK.toLong).map(vecs).toArray
    def cosOf(d: Long, na: Long, nb: Long): Double =
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    def cluster(x: Array[Float]): Int =
      cents.zipWithIndex.map { case (c, ci) =>
        (-cosOf(dotFp(x, c), dotFp(x, x), dotFp(c, c)), ci) }.min._2
    def codes(x: Array[Float], cl: Int): Array[Int] =
      (0 until Similarity.PqSubs).map { i =>
        (0 until Similarity.PqK).map { k =>
          val kk = sub(cbk(k), i)
          (dotFp(kk, kk) - 2L * (dotFp(sub(x, i), kk) -
            dotFp(sub(cents(cl), i), kk)), k)
        }.min._2
      }.toArray
    def recon(cl: Int, cd: Array[Int]): Long =
      dotFp(cents(cl), cents(cl)) + (0 until Similarity.PqSubs).map { i =>
        val kk = sub(cbk(cd(i)), i)
        2L * dotFp(sub(cents(cl), i), kk) + dotFp(kk, kk)
      }.sum
    val assignedAll = vecs.map { case (id, x) => id -> cluster(x) }
    val codedAll = vecs.map { case (id, x) =>
      id -> codes(x, assignedAll(id)) }
    val want = (0L until Similarity.NQueries.toLong).flatMap { q =>
      val qv = vecs(q)
      val qn = dotFp(qv, qv)
      val probed = cents.zipWithIndex.map { case (c, ci) =>
        (-cosOf(dotFp(qv, c), qn, dotFp(c, c)), ci) }.sorted
        .take(Similarity.NProbe).map(_._2).toSet
      vecs.keys.filter(n => n != q && probed(assignedAll(n))).toSeq
        .map { n =>
          val cl = assignedAll(n); val cd = codedAll(n)
          val adot = dotFp(qv, cents(cl)) + (0 until Similarity.PqSubs)
            .map(i => dotFp(sub(qv, i), sub(cbk(cd(i)), i))).sum
          (n, cosOf(adot, qn, recon(cl, cd)))
        }
        .sortBy { case (n, c) => (-c, n) }
        .take(Similarity.TopK).zipWithIndex
        .map { case ((n, c), i) =>
          (q, i + 1L, n, BigDecimal(c * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong) }
    }.toSet
    assert(out == want,
      s"residual IVFPQ diverges: ${(out diff want).take(3)} | ${(want diff out).take(3)}")
  }

  test("s29 trained path: a residual-TRAINED codebook strictly beats the " +
      "raw-slice stand-in on residual coding (training must match what " +
      "is being quantized)") {
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val cents = Similarity.collectCodebook(e)
    val byCid = cents.sortBy(_.cid)
    val centArr2d = org.apache.spark.sql.functions.array(
      byCid.map(c => org.apache.spark.sql.functions.array(
        c.emb.map(org.apache.spark.sql.functions.lit): _*)): _*)
    val c = org.apache.spark.sql.functions.col _
    val resid = Similarity.assignClusters(e, cents)
      .select(c("vec_id"),
        org.apache.spark.sql.functions.zip_with(c("embedding"),
          org.apache.spark.sql.functions.element_at(centArr2d,
            c("cluster").cast("int") + 1),
          (a, b) => (a - b).cast("float")).as("embedding"))
    val cbRes = Similarity.trainPqCodebook(resid)
    val exact = Similarity.s1KnnBrute(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val trained = recallOf(Similarity.knnIvfPqResidualWith(e, cents, cbRes))
    val standin = recallOf(Similarity.knnIvfPqResidualWith(e, cents,
      Similarity.collectPqCodebook(e)))
    assert(trained > standin,
      s"residual-trained codebook did not beat the stand-in: $trained vs $standin")
  }

  test("x41 BPE fertility: the gated row is bpeFertility over the first " +
      "three trained merges, and the merges genuinely reduce fertility") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.x41BpeFertility(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("fertility_e4"))).toMap
    val wired = TextAnalysis.bpeFertility(docs,
        TextAnalysis.trainBpe(docs, TextAnalysis.X41Merges)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("fertility_e4"))).toMap
    assert(out == wired, "x41 drifted from bpeFertility(trainBpe(3))")
    val base = TextAnalysis.bpeFertility(docs, Nil).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("fertility_e4")).toMap
    assert(out.keySet == base.keySet)
    out.foreach { case (src, (_, f)) =>
      assert(f <= base(src), s"$src: merges increased fertility") }
    assert(out.values.map(_._2).sum < base.values.sum,
      "three merges changed no source's fertility — the gate is unarmed")
  }

  test("s28 MMR rerank: integer-exact vs a driver-side greedy reference") {
    val out = Similarity.s28MmrRerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("nid"), r.getAs[Long]("cos_e6"),
        r.getAs[Long]("penalty_e6"), r.getAs[Long]("mmr_x10_e6"))).toSet
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    // Spark's round() is HALF_UP decimal rounding — mirror it exactly
    def cosE6(x: Long, y: Long): Long = {
      val (a, b) = (vecs(x), vecs(y))
      BigDecimal(dotFp(a, b).toDouble /
        (math.sqrt(dotFp(a, a).toDouble) * math.sqrt(dotFp(b, b).toDouble))
        * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val want = (0L until Similarity.NQueries.toLong).flatMap { qid =>
      val pool = vecs.keys.filter(_ != qid).toSeq
        .map(n => (n, cosE6(qid, n)))
        .sortBy { case (n, c) => (-c, n) }
        .take(Similarity.MmrPool)
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)] // (nid, cos, pen, mmr)
      (1 to Similarity.GraphK).foreach { _ =>
        val selected = picks.map(_._1).toSet
        val cand = pool.filter(p => !selected(p._1)).map { case (n, c) =>
          val pen =
            if (selected.isEmpty) 0L
            else selected.map(s => cosE6(n, s)).max
          (n, c, pen, Similarity.MmrLambda10 * c -
            (10L - Similarity.MmrLambda10) * pen)
        }
        picks += cand.minBy { case (n, _, _, mmr) => (-mmr, n) }
      }
      picks.zipWithIndex.map { case ((n, c, p, mm), i) =>
        (qid, i + 1L, n, c, p, mm) }
    }.toSet
    assert(out == want,
      s"MMR diverges from the greedy reference: ${(out diff want).take(3)} " +
        s"| ${(want diff out).take(3)}")
  }

  test("x40 cross-derivation: ingestDecideBatch over the whole arriving " +
      "set equals the gated x40 row-for-row (different exact/near/" +
      "subsumption constructions, same decisions)") {
    val split = Dedup.IncrementalSplit
    val docs = Tables.documents(spark, sf)
    val c = org.apache.spark.sql.functions.col _
    val batchForm = TextAnalysis.ingestDecideBatch(
      docs.filter(c("doc_id") < split).select("doc_id", "text"),
      docs.filter(c("doc_id") >= split).select("doc_id", "text"),
      docs.filter(c("doc_id") < split).select("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val gated = TextAnalysis.x40IngestDecide(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(batchForm == gated,
      s"ingestDecideBatch/x40 drift: ${(batchForm -- gated).take(3)} | " +
        s"${(gated -- batchForm).take(3)}")
  }

  test("x39 PMI collocations: integer-exact vs a driver-side census, " +
      "floored at MinColloCount, cut to the top-lift ColloTopK") {
    val out = TextAnalysis.x39PmiCollocations(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("lift_e6")))
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).split(' ').filter(_.nonEmpty).toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val nUni = docs.map(_.size.toLong).sum
    val nBig = docs.filter(_.size >= 2).map(_.size.toLong - 1).sum
    val bigs = docs.filter(_.size >= 2)
      .flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
      .filter(_._2 >= TextAnalysis.MinColloCount)
    val want = bigs.map { case ((w1, w2), nAb) =>
      val (nA, nB) = (uni(w1), uni(w2))
      val lift = nAb * 1000000L * nUni / (nBig * nA) * nUni / nB
      (w1, w2, nAb, nA, nB, lift)
    }.toSeq
      .sortBy { case (w1, w2, _, _, _, l) => (-l, w1, w2) }
      .take(TextAnalysis.ColloTopK)
    assert(out.toSeq.sortBy(t => (-t._6, t._1, t._2)) == want,
      s"collocation census diverged (got ${out.length}, want ${want.length})")
  }

  test("s30 k-center coreset: integer-exact vs a driver-side greedy " +
      "farthest-point mirror; the farness ladder is non-increasing; the " +
      "round stage plans with zero Exchange") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    val norms = vecs.map { case (id, v) => id -> dotFp(v, v) }
    def cosE6(a: Long, b: Long): Long =
      BigDecimal(dotFp(vecs(a), vecs(b)).toDouble /
          (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var centers = Vector(0L)
    var want = Vector((1L, 0L, 2000000L))
    (2 to Similarity.KCenterK).foreach { r =>
      val (vid, mx) = vecs.keys.filterNot(centers.contains).map { id =>
        (id, centers.map(c => cosE6(id, c)).max)
      }.minBy { case (id, m) => (m, id) }
      want :+= ((r.toLong, vid, 1000000L - mx))
      centers :+= vid
    }
    val out = Similarity.s30KCenterCoreset(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(out == want, s"greedy traversal diverged: $out vs $want")
    // coverage certificate: each later pick is no farther than the prior
    val far = want.drop(1).map(_._3)
    assert(far == far.sortBy(-(_: Long)),
      s"farness ladder not non-increasing: $far")
    val e = Similarity.withNorm(Tables.embeddings(spark, sf))
    val plan = planOf(
      Similarity.kcenterRound(e, Similarity.collectCodebook(e).take(2)))
    assert(!plan.contains("Exchange"),
      s"k-center round stage shuffles — must stay a narrow projection:\n$plan")
  }

  test("m18 alignment filter: integer-exact vs a driver-side mirror " +
      "(closed-form histogram + e6 chunk fold + HALF_UP cosine); the " +
      "decode stage plans with zero Exchange") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def mirror(id: Long): (Long, Long) = {
      val hist = new Array[Long](Multimodal.AlignBins)
      for (y <- 0 until Multimodal.imgHeight(id);
           x <- 0 until Multimodal.imgWidth(id))
        hist(Multimodal.imgPixel(id, x, y) / 32) += 1
      val tvec = (0 until Multimodal.AlignBins).map { j =>
        embs(id).slice(j * 8, j * 8 + 8).map(x =>
          BigDecimal(x.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      }
      val dot = hist.zip(tvec).map { case (a, b) => a * b }.sum
      val na = hist.map(x => x * x).sum
      val nb = tvec.map(x => x * x).sum
      val align = if (nb == 0L) 0L
        else BigDecimal(dot.toDouble /
            (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (align, if (align >= Multimodal.AlignKeepE6) 1L else 0L)
    }
    val out = Multimodal.m18AlignmentFilter(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == embs.keySet, "doc coverage diverged")
    out.foreach { case (id, got) =>
      assert(got == mirror(id), s"alignment diverged at doc $id: $got")
    }
    // both keep outcomes must actually occur — a filter, not a rubber stamp
    assert(out.values.map(_._2).toSet == Set(0L, 1L),
      "alignment threshold does not discriminate on this corpus")
    import spark.implicits._
    val plan = planOf(Multimodal.imgHistogram(
      Tables.documents(spark, sf).select(col("doc_id")).as[Long]))
    assert(!plan.contains("Exchange"),
      s"decode/histogram stage shuffles — payloads must never shuffle:\n$plan")
  }

  test("s31 retrieval metrics: integer-exact vs a driver-side NDCG/MRR " +
      "mirror over the method rankings; bounds hold") {
    def ranked(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Long]("rank")).toMap
    val exact = ranked(Similarity.s1KnnBrute(spark, sf))
    val nq = exact.keys.map(_._1).toSet.size
    def mirror(m: Map[(Long, Long), Long]): (Long, Long) = {
      val perQ = exact.keys.map(_._1).toSet.toSeq.map { (q: Long) =>
        val hits = exact.toSeq.collect { case ((qq, nid), exRank)
          if qq == q && m.contains((q, nid)) => (exRank, m((q, nid))) }
        val dcg = hits.map { case (exRank, mRank) =>
          (Similarity.TopK + 1L - exRank) * 1000000000L /
            Similarity.NdcgDiscE3(mRank.toInt - 1) }.sum
        val rr = hits.collectFirst { case (1L, mRank) => 1000000L / mRank }
          .getOrElse(0L)
        (dcg * 1000000L / Similarity.IdcgE6, rr)
      }
      (perQ.map(_._2).sum / nq, perQ.map(_._1).sum / nq)
    }
    val want = Map(
      "jl_rp16" -> mirror(ranked(Similarity.s14KnnRp(spark, sf))),
      "mrl_rerank" -> mirror(ranked(Similarity.s16MrlRerank(spark, sf))),
      "pq8" -> mirror(ranked(Similarity.s6KnnPq(spark, sf))),
      "opq_pq8" -> mirror(ranked(Similarity.s19KnnOpq(spark, sf))),
      "ivfpq_residual" ->
        mirror(ranked(Similarity.s29KnnIvfPqResidual(spark, sf))))
    val out = Similarity.s31RetrievalMetrics(spark, sf).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("mrr_e6"), r.getAs[Long]("ndcg_e6"))).toMap
    assert(out == want, s"graded metrics diverged: $out vs $want")
    out.foreach { case (m, (mrr, ndcg)) =>
      assert(mrr >= 0L && mrr <= 1000000L, s"$m MRR out of bounds: $mrr")
      assert(ndcg >= 0L && ndcg <= 1000000L, s"$m NDCG out of bounds: $ndcg")
    }
  }

  test("s32 prototypicality coreset: integer-exact vs a driver mirror of " +
      "assignment + quota; every cluster keeps >= 1; plan carries <= 1 " +
      "hash exchange") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    val norms = vecs.map { case (id, v) => id -> dotFp(v, v) }
    def cos(a: Long, b: Long): Double =
      dotFp(vecs(a), vecs(b)).toDouble /
        (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble))
    val cents = (0L until Similarity.NCentroids.toLong).toSeq
    val assigned = vecs.keys.toSeq.map { id =>
      id -> cents.map(c => ((-cos(id, c), c), c)).min._2
    }.toMap
    def cosE6(a: Long, b: Long): Long = BigDecimal(cos(a, b) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val n = vecs.size.toLong
    val want = assigned.groupBy(_._2).flatMap { case (cl, members) =>
      val ranked = members.keys.toSeq
        .sortBy(id => (-cosE6(id, cl), id)).zipWithIndex
      val quota = math.max(1L,
        Similarity.CoresetBudget.toLong * members.size / n)
      ranked.filter(_._2 < quota).map { case (id, i) =>
        (cl, i + 1L, id, cosE6(id, cl)) }
    }.toSet
    val out = Similarity.s32ProtoCoreset(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == want,
      s"coreset diverged: extra=${(out -- want).take(3)} " +
        s"missing=${(want -- out).take(3)}")
    // every cluster is represented (the min-1 floor)
    assert(out.map(_._1) == assigned.values.toSet,
      "a cluster lost all its representatives")
    val plan = planOf(Similarity.s32ProtoCoreset(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1,
      s"rank + census + quota must share one cluster exchange:\n$plan")
  }

  test("s33 kNN outliers: integer-exact vs a driver-side kth-neighbor " +
      "mirror; scores ascend; the kth neighbor is audit-consistent") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        graft.functions.DotFp9.roundHalfAway(x.toDouble * y.toDouble * 1e9) }.sum
    val norms = vecs.map { case (id, v) => id -> dotFp(v, v) }
    def cosE6(a: Long, b: Long): Long =
      BigDecimal(dotFp(vecs(a), vecs(b)).toDouble /
          (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val kth = vecs.keys.toSeq.map { src =>
      val (nid, c) = vecs.keys.filter(_ != src).toSeq
        .map(n => (n, cosE6(src, n)))
        .sortBy { case (n, c) => (-c, n) }
        .apply(Similarity.GraphK - 1)
      (src, nid, c)
    }
    val want = kth.sortBy { case (src, _, c) => (c, src) }
      .take(Similarity.OutlierTopN).zipWithIndex
      .map { case ((src, nid, c), i) => (i + 1L, src, nid, c) }
    val out = Similarity.s33KnnOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == want, s"outlier ranking diverged: $out vs $want")
    val scores = out.map(_._4)
    assert(scores == scores.sorted, "outlier scores must ascend with rank")
  }

  test("m19 audio alignment: integer-exact vs a driver-side mirror " +
      "(closed-form amplitude histogram + the m18 cosine chain); both " +
      "keep outcomes occur") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def mirror(id: Long): (Long, Long) = {
      val n = Multimodal.audioSamples(id)
      val hist = new Array[Long](Multimodal.AlignBins)
      for (t <- 0 until n)
        hist(((Multimodal.audioSample(id, t) + 1024) / 256).toInt) += 1
      val tvec = (0 until Multimodal.AlignBins).map { j =>
        embs(id).slice(j * 8, j * 8 + 8).map(x =>
          BigDecimal(x.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      }
      val dot = hist.zip(tvec).map { case (a, b) => a * b }.sum
      val na = hist.map(x => x * x).sum
      val nb = tvec.map(x => x * x).sum
      val align = if (nb == 0L) 0L
        else BigDecimal(dot.toDouble /
            (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (align, if (align >= Multimodal.AlignKeepE6) 1L else 0L)
    }
    val out = Multimodal.m19AudioAlignFilter(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == embs.keySet, "doc coverage diverged")
    out.foreach { case (id, got) =>
      assert(got == mirror(id), s"audio alignment diverged at doc $id: $got")
    }
    assert(out.values.map(_._2).toSet == Set(0L, 1L),
      "audio alignment threshold does not discriminate on this corpus")
  }

  test("e37 EWMA: the 16-lag exact-integer linear form equals the " +
      "zero-seeded λ=1/2 recurrence truncated at 16 lags, replayed " +
      "driver-side; hot rows rare but present; one exchange") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (tpe, evs) =>
      val ordered = evs.sortBy { case (_, ts, id, _) => (ts.getTime, id) }
      val vs = ordered.map { case (_, _, _, v) =>
        BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong * 10000L
      }
      ordered.zipWithIndex.map { case ((_, _, id, _), t) =>
        // the literal truncated statistic: Σ_{j<16} v_{t−j}·2^(15−j),
        // missing lags zero — exactly the λ=1/2 recurrence S←(S+v·2^16)/2
        // unrolled 16 steps from a zero seed
        val s = (0 until Events.EwmaLags).map { j =>
          if (t - j >= 0) vs(t - j) * (1L << (15 - j)) else 0L
        }.sum
        (tpe, id) -> (s, if (s >= Events.EwmaHotE6 * 65536L) 1L else 0L)
      }
    }.toMap
    val out = Events.e37EwmaSmooth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == want,
      s"EWMA linear form diverged: ${(out.toSet -- want.toSet).take(3)}")
    val hot = out.values.count(_._2 == 1L)
    assert(hot > 0 && hot * 10 < out.size,
      s"hot rate degenerate: $hot of ${out.size}")
    val plan = planOf(Events.e37EwmaSmooth(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1,
      s"the 16 lags must share one event_type exchange:\n$plan")
  }

  test("e38 seasonal residual: the day-back RANGE lookup equals a " +
      "driver-side map on (event_type, hour−86400); no-baseline hours " +
      "never flag; flags rare but present; one exchange") {
    val hourly = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 1000L / 3600L * 3600L,
        BigDecimal(r.getDouble(2) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .groupBy(t => (t._1, t._2))
      .map { case (k, ts) => k -> ts.map(_._3).sum }
    val want = hourly.map { case ((tpe, h), sumC) =>
      val base = hourly.get((tpe, h - 86400L))
      (h, tpe) -> (sumC, base, base.map(sumC - _),
        if (base.exists(b => math.abs(sumC - b) >= Events.SeasonalResidC))
          1L else 0L)
    }
    val out = Events.e38SeasonalResid(spark, sf).collect()
      .map { r =>
        def optL(i: Int) = Option(r.get(i)).map(_.asInstanceOf[Long])
        (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), optL(3), optL(4), r.getLong(5))
      }.toMap
    assert(out == want,
      s"seasonal residual diverged: ${(out.toSet -- want.toSet).take(3)}")
    val flags = out.values.count(_._4 == 1L)
    assert(flags > 0 && flags * 5 < out.size,
      s"flag rate degenerate: $flags of ${out.size}")
    assert(out.values.exists(v => v._2.isEmpty && v._4 == 0L),
      "gate corpus has no baseline-free hour to exercise the NULL path")
    // two exchanges by design: the corpus-sized rollup keys on the
    // wide (hour, type) key; the window re-keys only the tiny rollup
    val plan = planOf(Events.e38SeasonalResid(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2,
      s"seasonal residual grew a third exchange:\n$plan")
  }

  test("e39 concurrency census: boundary counts equal a driver-side " +
      "sweep over e2's sessions; at most one active session per " +
      "(user, boundary); explode form — no join in the plan") {
    val sess = Events.e2Sessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_s"), r.getAs[Long]("end_s")))
    val spans = sess.flatMap { case (u, s0, e0) =>
      val sh = (s0 + 3599L) / 3600L * 3600L
      val eh = e0 / 3600L * 3600L
      (sh to eh by 3600L).map(h => (u, sh, h))
    }
    val want = spans.groupBy(_._3).map { case (h, xs) =>
      h -> (xs.length.toLong, xs.count(x => x._2 == x._3).toLong) }
    val out = Events.e39Concurrency(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == want, s"census diverged: " +
      s"${(out.toSet -- want.toSet).take(3)} | ${(want.toSet -- out.toSet).take(3)}")
    assert(out.nonEmpty, "no session spans an hour boundary at the gate SF")
    // the session gap (30 min) < 1 h ⇒ one active session per
    // (user, boundary): n_active doubles as the distinct-user count
    val perUser = spans.groupBy(x => (x._1, x._3)).values.map(_.size)
    assert(perUser.forall(_ == 1), "a user was double-counted at a boundary")
    val plan = planOf(Events.e39Concurrency(spark, sf))
    assert(!plan.contains("Join"), s"census must not plan a join:\n$plan")
  }

  test("s35 LSH range search: output = exactly s10's ball restricted " +
      "to hamming ≤ 1 sketches (blocking is exact by pigeonhole); " +
      "recall measured; no hash exchange") {
    val buckets = Similarity.signBucketed(
      Similarity.withNorm(Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))))
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val exact = Similarity.s10RadiusSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val out = Similarity.s35RangeLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the pruned ball is EXACTLY the exact ball restricted to probed
    // sketches: subset + identical values + hamming-≤1 completeness
    val want = exact.filter { case ((q, n), _) =>
      ham(buckets(q), buckets(n)) <= 1 }
    assert(out == want,
      s"pruned ball is not the hamming-≤1 restriction of s10: " +
        s"out=${out.size} want=${want.size} exact=${exact.size}")
    assert(out.nonEmpty, "no in-ball pair survived the 1-probe budget")
    // recall is MEASURED, not assumed (honest-recording contract):
    // the miss class is sketches differing in ≥2 bits
    val recall = out.size.toDouble / exact.size
    assert(recall > 0.0 && recall <= 1.0)
    info(f"s35 1-probe recall vs s10: $recall%.2f (${out.size}/${exact.size})")
    val plan = planOf(Similarity.s35RangeLsh(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"probes not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed range search must not hash-shuffle:\n$plan")
  }

  test("s36 range recall ladder: radius-1 rung counts exactly s35's " +
      "rows, radius-2 is the hamming-≤2 restriction of s10 (pigeonhole " +
      "exact), recall monotone in the probe radius") {
    val buckets = Similarity.signBucketed(
      Similarity.withNorm(Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))))
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val exact = Similarity.s10RadiusSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val out = Similarity.s36RangeRecall(spark, sf).collect()
      .map(r => r.getAs[Long]("probe_radius") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("recall_e6"))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out.values.forall(_._1 == exact.size.toLong),
      s"n_exact drifted from s10: $out vs ${exact.size}")
    // radius 1 IS the gated s35 statement's cardinality
    val s35n = Similarity.s35RangeLsh(spark, sf).count()
    assert(out(1L)._2 == s35n, s"radius-1 rung drifted from s35: " +
      s"${out(1L)._2} vs $s35n")
    // radius 2 = the exact ball restricted to hamming ≤ 2 sketches
    val want2 = exact.count { case ((q, n), _) =>
      ham(buckets(q), buckets(n)) <= 2 }
    assert(out(2L)._2 == want2.toLong,
      s"radius-2 rung is not the hamming-≤2 restriction: " +
        s"${out(2L)._2} vs $want2")
    // the knob buys recall monotonically, and the arithmetic is the
    // stated integer division
    assert(out(2L)._2 >= out(1L)._2)
    assert(out(2L)._3 >= out(1L)._3)
    out.values.foreach { case (ne, nh, re) =>
      assert(re == nh * 1000000L / ne, s"recall arithmetic drifted: $out")
    }
    info(s"s36 recall_e6 by radius: 1 -> ${out(1L)._3}, 2 -> ${out(2L)._3}")
  }

  test("x44 temperature mixture: α=1/2 weights equal a BigInt-isqrt " +
      "driver recompute; shares sum to ≤1e6 and low-resource sources " +
      "are boosted; token counts come from the standing docstats") {
    val toks = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) ->
        r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .groupBy(_._1)
      .map { case (src, xs) => src -> (xs.length.toLong, xs.map(_._2).sum) }
    def isqrt(n: Long): Long = {
      var r = math.sqrt(n.toDouble).toLong
      while (r * r > n) r -= 1
      while ((r + 1) * (r + 1) <= n) r += 1
      r
    }
    val wTot = toks.values.map(v => isqrt(v._2)).sum
    val tokTot = toks.values.map(_._2).sum
    val want = toks.map { case (src, (nDocs, nToks)) =>
      val w = isqrt(nToks)
      src -> (nDocs, nToks, w,
        w * 1000000L / wTot, nToks * 1000000L / tokTot)
    }
    val out = TextAnalysis.x44TempMixture(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out == want, s"mixture diverged: out=$out want=$want")
    // the temperature property on the exact rationals (no floors):
    // the lightest source is boosted, the heaviest shaved — the α<1
    // crossover sits strictly between the extremes of sqrt(n)
    val (minSrc, maxSrc) = (toks.minBy(_._2._2), toks.maxBy(_._2._2))
    assert(BigInt(isqrt(minSrc._2._2)) * tokTot >=
      BigInt(minSrc._2._2) * wTot,
      s"lightest source ${minSrc._1} not boosted")
    assert(BigInt(isqrt(maxSrc._2._2)) * tokTot <=
      BigInt(maxSrc._2._2) * wTot,
      s"heaviest source ${maxSrc._1} not shaved")
    assert(out.values.map(_._4).sum <= 1000000L,
      "floor-divided shares exceeded one")
    val plan = planOf(TextAnalysis.x44TempMixture(spark, sf))
    assert(plan.contains("graft_docstats"),
      s"x44 is not reading the standing docstats stage:\n$plan")
  }

  test("e36 CUSUM: the closed-form window statement equals the literal " +
      "max(0, S+x-k) recurrence replayed driver-side; alarms are rare " +
      "but present; one exchange") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (tpe, evs) =>
      var sAcc = 0L
      evs.sortBy { case (_, ts, id, _) => (ts.getTime, id) }.toSeq.map {
        case (_, _, id, v) =>
          val d = BigDecimal(v * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong *
            10000L - Events.CusumSlackE6
          sAcc = math.max(0L, sAcc + d)
          (tpe, id) -> (sAcc,
            if (sAcc >= Events.CusumAlarmE6) 1L else 0L)
      }
    }
    val out = Events.e36CusumDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == want.toMap,
      s"closed form diverged from the literal recurrence: " +
        s"${want.toMap.toSet.diff(out.toSet).take(3)}")
    val alarms = out.values.count(_._2 == 1L)
    assert(alarms > 0 && alarms * 10 < out.size,
      s"alarm rate degenerate: $alarms of ${out.size}")
    val plan = planOf(Events.e36CusumDrift(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1,
      s"cumsum + running-min must share one event_type exchange:\n$plan")
  }
}
