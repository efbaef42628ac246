package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: run named SparkEntry queries N times in one JVM
  * and print per-rep wall times. Not part of the driver contract —
  * exists because single-run numbers on this host are noise (multi-
  * second contention windows inflate trivial queries 10-30x); rep
  * timings in one JVM separate plan cost from host noise.
  *
  * Usage: runMain graft.Profile <sfDir> <name1,name2> [reps=3]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
        math.max(4, cpus.toInt / 4).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // let one-file-per-bucket scans advertise their in-bucket sort
      // (required by the layout-served as-of face; see BucketedStore)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse-profile")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.CacheManager",
      org.apache.logging.log4j.Level.ERROR)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (reps == 0) { // explain mode: dump the formatted physical plan
        println(s"===== $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[profile] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
