package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Prints ONE JSON line to stdout and also writes it to a
  * file (`SPARK_GRAFT_BENCH_OUT`, default `bench_out.json` in the working
  * directory) so the driver has a machine-readable channel that does not
  * depend on scraping sbt's `[info]`-prefixed log tail.
  *
  * Failures are loud: a query that throws is recorded in an `"errors"` map
  * (name → message) and its wall time still reflects the time burned before
  * the throw — a broken query can no longer silently record ~0 s and
  * flatter the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once (parquet reader, codegen, shuffle machinery)
    // with a trivial job, then touch every table the queries read so no
    // measured query is charged for first-read footer/page-init on its
    // table. Does not execute the measured queries themselves.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    Seq(Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(t => t(spark, sfDir).count(): Unit)
    // Optional comma-separated query-name filter for iterating on one
    // operator without paying for the whole grid (dev-only knob; the
    // driver never sets it, so official rounds always run everything).
    // Fixed-reference calibration: a data-independent CPU-bound job
    // whose wall time tracks the machine's CURRENT speed. This host's
    // effective clock varies up to ~2x across rounds (BASELINE.md), so
    // cross-round per-query deltas are only meaningful relative to this
    // field: same plan + same calibration-relative time = noise, not a
    // regression. Runs after warmup so it measures the machine, not
    // JVM startup.
    val calibration = {
      val t0 = System.nanoTime()
      // per-row mod a prime so the ANSI-mode sum cannot overflow
      spark.range(1L << 26)
        .selectExpr("sum(pmod(xxhash64(id), 1000000007))").collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      // loud on an empty/all-comma value: Some(empty) would pass the
      // unknown-name check and silently bench zero queries
      require(names.nonEmpty,
        "SPARK_GRAFT_BENCH_ONLY is set but names no queries (unset it to bench everything)")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    // name-sorted run order: Map hash order reshuffles whenever a query
    // is added, silently moving residual warm-up between queries across
    // rounds — sorted order keeps per-query times comparable round over
    // round (and the calibration field normalizes the machine itself)
    val selected = (only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    var errors = List.empty[(String, String)]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink executes the FULL plan — count() would let Catalyst
      // prune the projected columns (e.g. a signature column feeding
      // nothing but the output), understating the real query cost.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[bench] $name FAILED: $msg")
        errors ::= name -> msg
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jstr(s: String): String = JsonText.quote(s)
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.reverse.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","calibration":$calibration,"queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}"""
    // stdout first: an unwritable SPARK_GRAFT_BENCH_OUT must not destroy
    // the run's results on both channels
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(out), line + "\n"): Unit
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
