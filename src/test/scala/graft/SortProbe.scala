package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: which queries end in a range-partitioned sort whose child
  * subtree has NO shuffle boundary? Those re-execute the whole narrow
  * child during range-bound sampling. Test scope only. */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val lines = fn(spark, d).queryExecution.executedPlan.toString.linesIterator.toSeq
        val ri = lines.indexWhere(_.contains("Exchange rangepartitioning"))
        if (ri < 0) println(f"$name%-22s rangeSort=no")
        else {
          val below = lines.drop(ri + 1)
          val shielded = below.exists(l => l.contains("Exchange") || l.contains("Broadcast"))
          println(f"$name%-22s rangeSort=yes shielded=$shielded")
        }
      } catch { case ex: Throwable => println(s"$name ERR ${ex.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
