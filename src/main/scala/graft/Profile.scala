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
    val timed = names.flatMap { name =>
      val fn = SparkEntry.queries(name)
      if (reps == 0) { // explain mode: dump the formatted physical plan
        println(s"===== $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        None
      } else Some(name -> (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name rep$r $dt%.2fs rows=$n")
        dt
      })
    }
    // machine-readable tail for scripts/profile_flags.py and
    // scripts/residency_probe.py: this is the COLD-session half of
    // the residency measurement (fresh JVM, only the probed queries'
    // state resident), same line shape as Bench's resident probe
    if (timed.nonEmpty) {
      def fmt(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val qobj = timed.map { case (n, ts) =>
        "\"" + n + "\":[" + ts.map(fmt).mkString(",") + "]"
      }.mkString("{", ",", "}")
      println(Bench.residencyLine("cold", qobj, spark, sfDir))
    }
    spark.stop()
  }
}
