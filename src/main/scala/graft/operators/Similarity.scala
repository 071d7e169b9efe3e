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
  *  - IVF: centroid assignment is a broadcast join (codebook is tiny);
  *    the probe touches only nprobe/nlist of the corpus. At real scale
  *    the corpus would be written bucketed by cluster id, making the
  *    probe a partition-pruned read instead of a filter;
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

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm_fp", normFp9(col("embedding")))

  /** s1: brute-force cosine top-k — queries are vec_id < NQueries; for
    * each, the TopK nearest neighbors (self excluded) by exact cosine. */
  def s1KnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
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

  /** s2: IVF probe — codebook = vectors with vec_id < NCentroids
    * (deterministic stand-in for trained centroids); every vector is
    * assigned to its nearest centroid; a query searches only the NProbe
    * clusters nearest to it. Approximate: recall < 1 vs s1 by design. */
  def s2KnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    val cent = e.filter(col("vec_id") < NCentroids.toLong)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        col("norm_fp").as("c_norm"))

    // assignment: nearest centroid per vector (broadcast the codebook)
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(col("a_cos").desc, col("cid"))
    val assigned = e.join(broadcast(cent), lit(true))
      .withColumn("a_cos",
        cosine(dotFp9(col("embedding"), col("c_emb")), col("norm_fp"), col("c_norm")))
      .withColumn("arank", row_number().over(aw))
      .filter(col("arank") === 1)
      .select(col("vec_id"), col("embedding"), col("norm_fp"),
        col("cid").as("cluster"))

    // probe list: NProbe nearest centroids per query
    val qw = Window.partitionBy(col("qid"))
      .orderBy(col("p_cos").desc, col("cid"))
    val probes = e.filter(col("vec_id") < NQueries.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("norm_fp").as("q_norm"))
      .join(broadcast(cent), lit(true))
      .withColumn("p_cos",
        cosine(dotFp9(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm")))
      .withColumn("prank", row_number().over(qw))
      .filter(col("prank") <= NProbe)
      .select(col("qid"), col("q_emb"), col("q_norm"), col("cid").as("cluster"))

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

  /** s3: cosine near-dup pairs — all pairs above 0.40 (the synthetic
    * corpus tops out ≈0.51, so this returns the genuinely-close tail). */
  def s3CosinePairs(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d))
    // The pair scan is quadratic in rows-per-partition: spread the left
    // side across all cores (the corpus arrives as one small parquet
    // split at test scale) and broadcast the right side — the same
    // "stream the corpus, broadcast the comparison set" shape the
    // brute-force kNN uses.
    val a = e.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
      col("norm_fp").as("a_norm")).repartition(col("a"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
      col("norm_fp").as("b_norm"))
    // The cosine threshold lives in the JOIN CONDITION, not a post-join
    // filter: the nested-loop join then only materializes surviving
    // pairs (~1e-4 of the pair space) instead of copying every candidate
    // pair row — two 64-float embeddings each — before filtering
    // (measured 2× at sf0.1). The condition short-circuits on a < b
    // before evaluating the dot.
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
    val sigBit = (h: Int) =>
      when(dotFp9(col("embedding"),
        array(planeWeights(h).map(lit): _*)) >= 0L, "1").otherwise("0")
    val eb = withNorm(embeddings(s, d))
      .withColumn("bucket", concat((0 until NPlanes).map(sigBit): _*))
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_brute"    -> s1KnnBrute _,
    "s2_knn_ivf"      -> s2KnnIvf _,
    "s3_cosine_pairs" -> s3CosinePairs _,
    "s4_knn_sign_lsh" -> s4KnnSignLsh _,
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

  def oracleSql: Map[String, String] = Map(
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
  )
}
