package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r18, VERDICT r17 #4): same-JVM A/B/C of the duplicated-
  * subtree cut modes (lazy localCheckpoint / eager localCheckpoint /
  * no cut) for the queries whose r17 eager cuts are re-adjudicated
  * this round. Modes run INTERLEAVED per repetition so machine-window
  * swings land on all three; `graft.cut.mode` is read at construction
  * time by [[graft.operators.Cuts]], so one JVM covers every mode.
  * Usage: runMain graft.CutProbe <name[,name...]> [sfDir] [repeat]
  *        [modes=lazy,eager,none]; honors SPARK_GRAFT_CPUS. */
object CutProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 3
    val modes = (if (args.length > 3) args(3) else "lazy,eager,none")
      .split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempPath.scratch("cutprobe-wh"))
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
    names.foreach { name =>
      // one untimed warm execution per mode: codegen + standing stages
      modes.foreach { m =>
        sys.props("graft.cut.mode") = m
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        sweep()
      }
      (1 to repeat).foreach { i =>
        modes.foreach { m =>
          sys.props("graft.cut.mode") = m
          org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
          meter.reset()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
          val (ms, r, w) = meter.read()
          sweep()
          println(f"CUTPROBE $name mode=$m run=$i sec=$sec%.2f " +
            f"taskTime=${ms / 1e3}%.1fs shufR=$r%.1fMB shufW=$w%.1fMB")
        }
      }
    }
    sys.props.remove("graft.cut.mode"): Unit
    spark.stop()
  }
}
