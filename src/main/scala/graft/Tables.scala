package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All tables are plain parquet under `sfDir`; reading them through one
  * helper keeps scan options uniform and gives Catalyst a clean
  * `FileSourceScanExec` it can push filters/projections into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Parquet schema inference launches a footer-read job on EVERY
  // `spark.read.parquet` call — ~139 construction-time jobs per full
  // sweep for schemas that never change (testdata files are
  // immutable). Infer once per path, then read with the explicit
  // schema: query construction after first touch is fully job-free
  // (pinned by SurprisalSpec).
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Single-file tables scan as ONE task, and Catalyst evaluates
    // scan-stage projections/filters inside that task — any
    // compute-heavy query over a small table would single-thread its
    // hottest stage (measured: random 30-90 s stalls). An explicit
    // repartition count restores parallelism for those (AQE may not
    // undo a numbered repartition) — but ONLY when the scan would
    // actually under-parallelize: an unconditional repartition of a
    // multi-file table is a full-input shuffle AND caps scan
    // parallelism at numShufflePartitions, which at 100 TB is the
    // dominant cost of every query. getNumPartitions reflects the
    // file listing + maxPartitionBytes splitting and runs no job.
    val df = raw(spark, sfDir, name)
    val target = spark.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Raw scan without the parallelism guard — for consumers that
    * immediately impose their own partitioning (the cached corpora
    * repartition by doc_id before materializing; a round-robin exchange
    * in front of that is a pure waste, observed in the plan audit). */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` arrives in whatever precision the generator wrote:
    * TIMESTAMP(NANOS) (which Spark 4 refuses to read natively —
    * PARQUET_TYPE_ILLEGAL — so the legacy flag surfaces it as raw
    * nanos LONG), µs TIMESTAMP_NTZ, or a session-tz TIMESTAMP.
    * Normalize all three to the µs TimestampType every downstream
    * window/date function was built against (session tz is pinned
    * UTC, so the NTZ→LTZ cast is value-preserving). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => // ns-since-epoch: integer div (double would overflow)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
