package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r18): same-JVM A/B bisect of x5_tfidf's tokenizer —
  * the `split_words` kernel vs the interpreted `wordsHof` spec — the
  * adjudication VERDICT r17 #1 asked for (x5 read 0.61× on the driver
  * while byte-identical except for the kernel). Variants run
  * INTERLEAVED so a machine-window swing lands on both.
  * Usage: runMain graft.X5Bisect [sfDir] [repeat]; SPARK_GRAFT_CPUS. */
object X5Bisect {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempPath.scratch("bisect-wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new BenchMeter
    spark.sparkContext.addSparkListener(meter)
    // warm: parquet pages + codegen for both variants
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    val variants = Seq(
      "kernel" -> operators.TextOps.words _,
      "hof" -> operators.TextOps.wordsHof _)
    variants.foreach { case (tag, fn) =>
      operators.TextAnalysis.x5TfidfWith(spark, sfDir, fn)
        .write.format("noop").mode("overwrite").save()
      println(s"[bisect] warmed $tag")
    }
    (1 to repeat).foreach { i =>
      variants.foreach { case (tag, fn) =>
        org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
        meter.reset()
        val t0 = System.nanoTime()
        operators.TextAnalysis.x5TfidfWith(spark, sfDir, fn)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
        val (ms, r, w) = meter.read()
        println(f"BISECT x5 variant=$tag run=$i sec=$sec%.2f " +
          f"taskTime=${ms / 1e3}%.1fs shufR=$r%.1fMB shufW=$w%.1fMB")
      }
    }
    spark.stop()
  }
}
