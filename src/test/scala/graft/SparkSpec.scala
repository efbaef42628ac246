package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the suite (one JVM-wide session keeps
  * the suite fast — codegen/JIT warmup is paid once). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Fixture root, overridable per machine (ADVICE r10: specs
    * hard-coding /root/testdata mis-skip elsewhere). */
  lazy val TestData: String =
    sys.env.getOrElse("GRAFT_TEST_DATA", "/root/testdata")
  lazy val Sf: String = s"$TestData/sf0.001"
  /** The CORRECTNESS-run corpus — scale-contract tests state their
    * claims against this SF. */
  lazy val SfMid: String = s"$TestData/sf0.01"
  /** Cancel (not fail) when a fixture SF is absent on this machine. */
  def requireFixture(path: String): Unit =
    assume(new java.io.File(path).isDirectory, s"fixture $path not present")
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      // managed-table home for the bucketed-store tests; keeps
      // `spark-warehouse` litter out of the repo root
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
