package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.operators.Similarity

/** Dev probe: the ANN recall ladder under codebook variants — stand-in
  * vs trained, plain vs residual PQ, Lloyd depth — on the real corpus
  * and on synthetic structured corpora. Test scope only.
  * Usage: Test/runMain graft.RecallProbe [sfDir] */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet

    def ladder(label: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val e = Similarity.withNorm(corpus)
      val exact = pairs(Similarity.knnBruteWith(e))
      def recall(s: Set[(Long, Long)]) =
        s.intersect(exact).size.toDouble / exact.size
      val cents = Similarity.trainCodebook(corpus)
      val cbP = Similarity.trainPqCodebook(corpus)
      val (anchors, cbR) = Similarity.trainResidualPqCodebook(corpus, cents)
      val energy = Similarity.residualEnergyRatio(corpus, cents, anchors)
      println(f"[$label] energy=$energy%.3f " +
        f"ivf=${recall(pairs(Similarity.knnIvfWith(e, cents)))}%.2f " +
        f"plain=${recall(pairs(Similarity.knnIvfPqWith(e, cents, cbP)))}%.2f " +
        f"resid=${recall(pairs(Similarity.knnIvfPqResidualWith(e, cents, anchors, cbR)))}%.2f")
    }

    ladder("real-sf0.01", Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")))

    val dim = Similarity.PqSubs * Similarity.PqSubDim
    val k = Similarity.NCentroids
    // A: clusters + isotropic noise (residual stays isotropic — no win expected)
    val rndA = new scala.util.Random(42)
    val synthA = (0 until 400).map { id =>
      val c = id % k
      (id.toLong, Array.tabulate(dim)(j =>
        (if (j % k == c) 0.5f else 0.0f) + 0.05f * (rndA.nextFloat() - 0.5f)).toSeq)
    }.toDF("vec_id", "embedding")
    ladder("synthA-isonoise", synthA)

    // B: clusters + 1-D within-cluster structure (residual is ~1-D —
    // 16 codes/subspace should quantize it nearly exactly)
    val synthB = (0 until 400).map { id =>
      val c = id % k
      val t = (id / k) * 0.004f
      (id.toLong, Array.tabulate(dim)(j =>
        (if (j % k == c) 0.5f else 0.0f) + (if (j < 8) t + 0.01f * ((id * 31 + j * 17) % 7 - 3) * 0.1f else 0.0f)).toSeq)
    }.toDF("vec_id", "embedding")
    ladder("synthB-1d", synthB)

    // C: clusters + 2-D per-cluster offsets on a grid
    val synthC = (0 until 400).map { id =>
      val c = id % k
      val a = ((id / k) % 5 - 2) * 0.06f
      val b = ((id / (k * 5)) % 5 - 2) * 0.06f
      (id.toLong, Array.tabulate(dim)(j =>
        (if (j % k == c) 0.5f else 0.0f) +
          (if (j == (c * 2) % dim + 8) a else 0.0f) +
          (if (j == (c * 2) % dim + 9) b else 0.0f)).toSeq)
    }.toDF("vec_id", "embedding")
    ladder("synthC-2d", synthC)

    // D: per-subspace budget asymmetry — cluster c's offsets live in
    // SUBSPACE c (2 dims, avoiding its center dim), 4×4 grid. Per
    // subspace, plain PQ must code 7 foreign one-hot centers + 16
    // offset combos (23 > 16 codes → aliasing); residual PQ codes just
    // 16 offsets + zero (17 ≈ 16 codes)
    val synthD = (0 until 400).map { id =>
      val c = id % k
      val a = ((id / k) % 4) * 0.08f - 0.12f
      val b = ((id / (k * 4)) % 4) * 0.08f - 0.12f
      val da = 8 * c + ((c + 1) % 8)
      val db = 8 * c + ((c + 2) % 8)
      (id.toLong, Array.tabulate(dim)(j =>
        (if (j % k == c) 0.5f else 0.0f) +
          (if (j == da) a else 0.0f) + (if (j == db) b else 0.0f)).toSeq)
    }.toDF("vec_id", "embedding")
    ladder("synthD-subspace", synthD)

    // E: DENSE well-separated centers + a shared 4×4 offset grid in
    // dims 0/1. Plain PQ per subspace sees 8 tight clouds (≈2 codes
    // per cloud — no within-cluster resolution); residual PQ sees ONE
    // cloud of 16 grid points (16 codes — exact)
    val synthE = (0 until 400).map { id =>
      val c = id % k
      val a = ((id / k) % 4) * 0.1f - 0.15f
      val b = ((id / (k * 4)) % 4) * 0.1f - 0.15f
      (id.toLong, Array.tabulate(dim)(j =>
        (((c * 37 + j * 11) % 13) - 6) * 0.05f +
          (if (j == 0) a else 0.0f) + (if (j == 1) b else 0.0f)).toSeq)
    }.toDF("vec_id", "embedding")
    ladder("synthE-dense", synthE)

    spark.stop()
  }
}
