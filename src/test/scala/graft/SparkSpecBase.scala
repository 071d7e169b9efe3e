package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM; sbt forks one
  * test JVM, suites share the session via getOrCreate). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  def sf: String = "/root/testdata/sf0.001"

  /** Physical-plan text for audit assertions (pushdown, join strategy). */
  def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      // catalog tables (bucketed-layout specs) land in a temp dir, not the repo
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      // the cross-JVM standing registry gets a scratch root too: test
      // runs must not accumulate sf0.001 artifacts under the machine
      // default (/tmp/graft-standing) that later JVMs would adopt
      .config("spark.graft.standing.dir",
        java.nio.file.Files.createTempDirectory("graft-standing").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
