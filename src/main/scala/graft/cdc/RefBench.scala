package graft.cdc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's three benchmark grids, re-run under this engine to
  * produce the first real numbers (the reference ships the harnesses but
  * no results — see BASELINE.md §6; reference trigger_test.go:298-437).
  *
  *  - grid 1 (trigger_test.go:298-346): bootstrap cost vs column count —
  *    the row→JSON image projection width.
  *  - grid 2 (trigger_test.go:348-403): bootstrap cost vs rows × batch
  *    size — ordered batch delivery through the engine.
  *  - grid 3 (trigger_test.go:405-437): BLOB hex-encoding cost vs
  *    payload size.
  *
  * Prints one JSON line per cell: {"grid":…, …dims…, "sec":…}.
  * In-memory snapshots (no SQLite in this environment) — measures the
  * engine-side projection/delivery cost, which is the part this library
  * owns; trigger capture cost stays inside SQLite in any deployment.
  *
  * Usage: runMain graft.cdc.RefBench [quick]
  */
object RefBench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def syntheticDf(spark: SparkSession, rows: Int, cols: Int): DataFrame = {
    val schema = StructType(
      StructField("id", LongType, nullable = false) +:
        (1 until cols).map(i => StructField(s"c$i", StringType, nullable = true)))
    val data = (0 until rows).map { r =>
      Row.fromSeq(r.toLong +: (1 until cols).map(i => s"v${r}_$i"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, rows / 2048)), schema)
  }

  private def blobDf(spark: SparkSession, rows: Int, blobBytes: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val data = (0 until rows).map { r =>
      Row(r.toLong, Array.tabulate[Byte](blobBytes)(i => ((r + i) % 251).toByte))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 4), schema)
  }

  def main(args: Array[String]): Unit = {
    val quick = args.contains("quick")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up (JVM + codegen init, not measured)
    Bootstrap.snapshotToChanges("w", syntheticDf(spark, 100, 5)).collect()

    // grid 1: columns × 1k rows (the reference uses 1 row; 1k makes the
    // per-row projection cost visible above fixed overhead)
    val colGrid = if (quick) Seq(1, 20, 200) else Seq(1, 5, 10, 20, 50, 100, 200, 400, 800, 1000)
    colGrid.foreach { nc =>
      val df = syntheticDf(spark, 1000, nc)
      df.count() // materialize input outside the timed section
      val sec = time(Bootstrap.snapshotToChanges("t", df).write
        .mode("overwrite").format("noop").save())
      println(s"""{"grid":"columns","columns":$nc,"rows":1000,"sec":$sec}""")
    }

    // grid 2: rows × batch through the full engine delivery loop
    val rowsGrid = if (quick) Seq(1000) else Seq(100, 1000, 10000)
    val batchGrid = if (quick) Seq(100) else Seq(10, 100, 1000, 10000)
    for (nr <- rowsGrid; nb <- batchGrid) {
      val df = syntheticDf(spark, nr, 10); df.count()
      val handler = new ChangesHandler {
        var n = 0L
        override def handle(changes: org.apache.spark.sql.Dataset[Change]): Unit =
          n += changes.count()
      }
      val log = new ParquetChangeLog(graft.TempPath.scratch("refbench"))
      val engine = new CdcEngine(spark, log, handler, maxBatchSize = nb)
      val sec = time(engine.bootstrap(Seq(("t", df))))
      println(s"""{"grid":"rows_x_batch","rows":$nr,"batch":$nb,"sec":$sec}""")
    }

    // grid 3: blob hex encoding, 100 rows per size
    val blobGrid = if (quick) Seq(1024, 65536)
      else Seq(16, 256, 1024, 4096, 16384, 65536, 262144, 1048576)
    blobGrid.foreach { bytes =>
      val df = blobDf(spark, 100, bytes); df.count()
      val sec = time(Bootstrap.snapshotToChanges("t", df, blobSupport = true)
        .write.mode("overwrite").format("noop").save())
      println(s"""{"grid":"blob_size","blob_bytes":$bytes,"rows":100,"sec":$sec}""")
    }
    spark.stop()
  }
}
