package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r18, VERDICT r17 #8): settle the q24 checkpoint-cadence
  * question with an INTERLEAVED same-JVM sweep — cadence values run
  * round-robin per repetition so a machine-window swing lands on all
  * of them, and the meter reports task-time (clock-immune) beside
  * wall. Also sweeps a deeper loop (12 iters over the shared edge
  * invariants) to expose the lineage cliff the cadence exists for.
  * Usage: runMain graft.PrProbe [sfDir] [repeat] [cadences=1,2,3,6]. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 1) args(1).toInt else 3
    val cadences = (if (args.length > 2) args(2) else "1,2,3,6")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempPath.scratch("prprobe-wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    val meter = new BenchMeter
    spark.sparkContext.addSparkListener(meter)
    def sweep(): Unit = {
      val live = operators.SessionCaches.liveRddIds(spark)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!live.contains(id)) rdd.unpersist(blocking = false)
      }
    }
    // warm: standing invariants + codegen
    SparkEntry.queries("q24_pagerank")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    sweep()
    Seq(("q24", () => SparkEntry.queries("q24_pagerank")(spark, sfDir)),
      ("iters12", () => operators.Relational.pageRankLoop(
        operators.Relational.sharedPrInvariants(spark, sfDir), 12)))
      .foreach { case (tag, mk) =>
        (1 to repeat).foreach { i =>
          cadences.foreach { c =>
            sys.props("graft.pr.cadence") = c.toString
            org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
            meter.reset()
            val t0 = System.nanoTime()
            mk().write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
            val (ms, r, w) = meter.read()
            sweep()
            println(f"PRPROBE $tag cadence=$c run=$i sec=$sec%.2f " +
              f"taskTime=${ms / 1e3}%.1fs shufR=$r%.1fMB shufW=$w%.1fMB")
          }
        }
      }
    sys.props.remove("graft.pr.cadence"): Unit
    spark.stop()
  }
}
