package graft

import org.apache.spark.sql.SparkSession

/** Fresh-session standing-table probe (dev tool, like ScaleProbe):
  * session A pays the modality/text closure builds; a `newSession`
  * (fresh session state, shared catalog — the standing-table
  * contract's consumer) then re-runs the manifests COLD. Prints one
  * JSON line with both sides, per query — the measurement behind the
  * round-13 claim that a fresh session reads standing artifacts
  * instead of re-decoding the corpus.
  *
  * Usage: runMain graft.StandingProbe [sfDir]
  */
object StandingProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", TempPath.scratch("standing-wh"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/documents.parquet").count() // warm the reader

    val targets: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "m14_img_manifest" -> operators.Multimodal.m14ImgManifest _,
        "m15_audio_manifest" -> operators.Multimodal.m15AudioManifest _,
        "m16_video_manifest" -> operators.Multimodal.m16VideoManifest _,
        "m17_crossmodal" -> operators.Multimodal.m17CrossModalManifest _,
        "d6_dup_clusters" -> operators.Dedup.d6DupClusters _,
        // r14: the registry families beyond the modality closures
        "d14_minhash_dedup" -> operators.Dedup.d14MinhashDedup _,
        "d12_semdedup" -> operators.Similarity.d12SemDedup _,
        "s18_recall_ladder" -> operators.Similarity.s18RecallLadder _,
        "x40_ingest_decide" -> operators.TextAnalysis.x40IngestDecide _)
    def time(s: SparkSession,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(s, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val build = targets.map { case (n, f) => n -> time(spark, f) }
    val fresh = spark.newSession() // shared catalog, no session caches
    val cold = targets.map { case (n, f) => n -> time(fresh, f) }
    def j(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"probe":"standing","sf":"$d","build":${j(build)},"fresh_cold":${j(cold)}}""")
    spark.stop()
  }
}
