package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm parquet reader, codegen, shuffle machinery (as Bench does)
    spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    def x(name: String): DataFrame =
      spark.read.parquet(Seq.fill(m)(s"$d/$name.parquet"): _*)

    def time(name: String)(df: => DataFrame): (String, Double) = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }

    // setup for the bucketed_knn_probe shape (untimed): a 100k×m-vector
    // corpus written partitioned by sign-LSH bucket, and a query vector
    // taken from the base table
    val (vectorDir, probeQuery) = {
      val base = spark.read.parquet(s"$d/embeddings.parquet")
      val corpus = base.select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0L), lit(200L * m - 1L))).as("c"))
        .select((col("vec_id") * lit(200L * m) + col("c")).as("vec_id"),
          col("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("scaleprobe-vectors").toString
      operators.Warehouse.writeVectors(corpus, dir)
      val q = base.filter(col("vec_id") === 3L)
        .select(col("embedding")).collect()(0).getSeq[Float](0)
      (dir, q)
    }

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
      // warehouse ANN shape: probe a sign-LSH-partitioned corpus of
      // 100k×m vectors (written untimed above). Probe wall time should
      // stay ~flat in m: the scan partition-prunes to the query's
      // bucket directory (≈ bucket fraction of the corpus)
      time("bucketed_knn_probe") {
        operators.Warehouse.knnProbe(spark, vectorDir, probeQuery, 5)
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
      })

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"probe":"scale","multiplier":$m,"queries":$qs}""")
    spark.stop()
  }
}
