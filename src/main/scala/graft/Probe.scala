package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan/timing probe (dev tool, not part of the library API).
  * Usage: runMain graft.Probe <queryName> [sfDir] [explain|time] [repeat]
  * Honors SPARK_GRAFT_CPUS (default 8). */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "both"
    val repeat = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // lazy: in `timec` mode NOTHING may construct outside the timed
    // section — eager stages (checkpointed loops, standing builds)
    // run at construction, and an untimed warm-up would both waste
    // work and pre-fill session caches, under-measuring run=1
    lazy val df = SparkEntry.queries(name)(spark, sfDir)
    if (mode != "time" && mode != "timec") df.explain("formatted")
    if (mode != "explain") (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      // noop sink = full-plan execution (count() lets Catalyst prune
      // output-only columns — same reasoning as Bench). `timec`
      // RECONSTRUCTS the frame inside the timed section — the Bench
      // cost shape, and the only honest timing for queries that run
      // eager stages at construction
      val run = if (mode == "timec") SparkEntry.queries(name)(spark, sfDir)
                else df
      run.write.format("noop").mode("overwrite").save()
      println(f"TIMING $name run=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
