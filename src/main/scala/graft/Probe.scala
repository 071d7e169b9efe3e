package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch plan/timing probe (dev tool, not part of the library API).
  * Usage: runMain graft.Probe <name[,name...]> [sfDir] [explain|time|timec|both] [repeat]
  * Honors SPARK_GRAFT_CPUS (default 8).
  *
  * Besides wall time it reports, per run, the scheduler-level shape the
  * optimization guide (§1, §2) says to measure: job count, stage count,
  * task count, summed executor task time, and shuffle read/write bytes —
  * the numbers that actually explain a tiny-input query's cost (at sf0.1
  * most queries are overhead-bound: jobs × round-trip + exchanges ×
  * stage latency, not data volume). */
object Probe {

  /** Accumulates scheduler counters between `mark()` calls. */
  private final class Meter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val info = sc.stageInfo
      tasks.addAndGet(info.numTasks.toLong)
      val m = info.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES"))
          println(f"  STAGE ${info.stageId}%4d tasks=${info.numTasks} " +
            f"run=${m.executorRunTime / 1e3}%.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%.2fs " +
            f"${info.name.linesIterator.next().take(120)}")
      }
    }
    def snap(): String = {
      val s = f"jobs=${jobs.get()} stages=${stages.get()} tasks=${tasks.get()} " +
        f"taskTime=${taskMs.get() / 1e3}%.1fs shufR=${shufR.get() / 1e6}%.1fMB " +
        f"shufW=${shufW.get() / 1e6}%.1fMB"
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      shufR.set(0); shufW.set(0)
      s
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "both"
    val repeat = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", TempPath.scratch("probe-wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    names.foreach { name =>
      // lazy: in `timec` mode NOTHING may construct outside the timed
      // section — eager stages (checkpointed loops, standing builds)
      // run at construction, and an untimed warm-up would both waste
      // work and pre-fill session caches, under-measuring run=1
      lazy val df = SparkEntry.queries(name)(spark, sfDir)
      if (mode != "time" && mode != "timec") df.explain("formatted")
      if (mode != "explain") {
        meter.snap(): Unit // reset counters accumulated by construction
        (1 to repeat).foreach { i =>
          val t0 = System.nanoTime()
          // noop sink = full-plan execution (count() lets Catalyst prune
          // output-only columns — same reasoning as Bench). `timec`
          // RECONSTRUCTS the frame inside the timed section — the Bench
          // cost shape, and the only honest timing for queries that run
          // eager stages at construction
          val run = if (mode == "timec") SparkEntry.queries(name)(spark, sfDir)
                    else df
          run.write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          // deterministic listener-bus drain (ADVICE r17): under load
          // the bus can lag past any fixed sleep, silently attributing
          // a run's stage counters to the following run
          org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 10000)
          println(f"TIMING $name run=$i sec=$sec%.2f ${meter.snap()}")
        }
      }
    }
    spark.stop()
  }
}
