package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** S1/K4 — the streaming entry (SURVEY.md §2.1 S1, §2.8 K4).
  *
  * The reference's production path is a Kafka micro-batch loop:
  * getmany(timeout_ms=1000, max_records=10) → validate JSON →
  * per-type workflows → Dynamo merge (kafka_event_controller.py:57-81).
  * Here that is a Structured Streaming query: source → from_json →
  * foreachBatch{ batch merge }. The batch functions are the SAME code
  * the batch path uses; checkpointing + an idempotent merge upgrade the
  * reference's at-most-once delivery to effectively-exactly-once
  * (SURVEY.md §2.10) — replaying a batch leaves the store unchanged,
  * which also neutralizes the reference's double-execute defect (O3).
  */
object StreamingEtl {

  /** ProcessDocumentRequest (camelCase wire aliases —
    * process_document.py:5-12). */
  val requestSchema: StructType = StructType(Seq(
    StructField("recordId", StringType),
    StructField("parentId", StringType),
    StructField("sessionId", StringType),
    StructField("documentType", StringType),
    StructField("key", StringType)))

  /** S1 source assembly — the deployable mirror of the reference's
    * consumer loop (kafka_event_controller.py:44-61): subscribe to the
    * request topic with a per-micro-batch record cap matching
    * `getmany(timeout_ms=1000, max_records=10)`. Not exercisable in the
    * broker-less test env (StreamingSpec drives [[runStream]] through a
    * MemoryStream instead — same DataFrame contract), but with a broker
    * this one-liner plugs straight into [[runStream]]. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topic: String, maxRecordsPerTrigger: Int = 10): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxRecordsPerTrigger.toLong)
      .load()

  /** S1 decode/validate: raw JSON value column → typed request columns.
    * Invalid JSON → null columns, diverted to quarantine by the caller
    * (the reference logs-and-skips, kafka_event_controller.py:121-124). */
  def parseRequests(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), requestSchema).as("r"))
      .select(
        col("r.recordId").as("record_id"),
        col("r.parentId").as("parent_id"),
        col("r.sessionId").as("session_id"),
        col("r.documentType").as("document_type"),
        col("r.key"))

  /** K2 merge, kv representation: last-writer-wins upsert of `updates`
    * (id, mkey, mvalue) into `store` — pure function used by both batch
    * and foreachBatch. Deterministic and idempotent: applying the same
    * updates twice yields the same store. */
  def mergeKv(store: DataFrame, updates: DataFrame): DataFrame =
    store.select(col("id"), col("mkey"), col("mvalue"), lit(0).as("pri"))
      .unionAll(updates.select(col("id"), col("mkey"), col("mvalue"), lit(1).as("pri")))
      .groupBy("id", "mkey")
      .agg(max_by(col("mvalue"), col("pri")).as("mvalue"))

  /** Parquet-backed metadata store with merge-overwrite semantics (the
    * no-lakehouse K2 plan, SURVEY.md §7.4 risk 1).
    *
    * The store is hash-partitioned on the item id into `pid=N/`
    * directories, and [[merge]] is PARTITION-SCOPED: only the pids that
    * the batch's update ids hash into are read, merged, and replaced
    * (dynamic partition overwrite — untouched pids' files are never
    * listed, read, or rewritten). A micro-batch therefore costs
    * O(batch ∩ touched partitions), not O(store): the property that
    * keeps a long-lived 100 TB store mergeable. The touched-pid list is
    * a ≤numPartitions-element driver collect, not a data collect. */
  final class ParquetMetadataStore(spark: SparkSession, path: String,
                                   numPartitions: Int = 16) {
    private val emptyKv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", StringType),
        StructField("mkey", StringType), StructField("mvalue", StringType))))
    private def pidOf(id: org.apache.spark.sql.Column) =
      pmod(xxhash64(id), lit(numPartitions.toLong)).cast("int")
    // Hadoop FileSystem resolved from the store path: the store works on
    // local disk, HDFS, or S3A alike (java.io.File would be local-only)
    private def fs: org.apache.hadoop.fs.FileSystem =
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def nonEmptyDir(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val f = fs
      f.exists(hp) && f.listStatus(hp).nonEmpty
    }
    private def exists: Boolean = nonEmptyDir(path)
    def read(): DataFrame =
      if (exists) spark.read.parquet(path).select("id", "mkey", "mvalue")
      else emptyKv
    def merge(updates: DataFrame): Unit = {
      val touched = updates.select(pidOf(col("id")).as("pid"))
        .distinct().collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return // empty micro-batch: nothing to merge
      val current =
        if (exists)
          // partition pruning: only the touched pid dirs are scanned
          spark.read.parquet(path)
            .filter(col("pid").isin(touched.map(Integer.valueOf): _*))
            .select("id", "mkey", "mvalue")
        else emptyKv
      val merged = mergeKv(current, updates)
        .withColumn("pid", pidOf(col("id")))
      // stage via a temp dir (the merge reads the same files its commit
      // replaces), then dynamic-overwrite: only partitions present in
      // the staged data — exactly the touched pids — are replaced
      val tmp = path + ".tmp"
      merged.write.mode("overwrite").partitionBy("pid").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pid").parquet(path)
    }
    /** Housekeeping: collapse each pid directory's shuffle-width file
      * fan-out (every overwrite leaves one file per writing task)
      * toward `targetBytes` files via [[graft.sources.Compactor]] —
      * run off the merge path, partition-by-partition, so a long-lived
      * store keeps scan-efficient file sizes without ever pausing
      * merges globally. */
    def compact(targetBytes: Long = 128L * 1024 * 1024): Unit =
      (0 until numPartitions)
        .map(i => s"$path/pid=$i")
        .filter(nonEmptyDir)
        .foreach(d => graft.sources.Compactor.compact(spark, d, targetBytes))
  }

  /** U4 — bounded exponential-backoff retry, the reference's policy
    * around every external call (bed_rock_transformer_document.py:
    * 108-146: max_retries=5, base 1 s, factor 2, cap 30 s, uniform
    * jitter). Inside the engine Spark already retries failed TASKS with
    * its own policy; the surface the reference's wrapper maps to is
    * DRIVER-side sink commits (store merges), guarded here the same
    * way. Deviations: no random jitter (determinism is an engine
    * invariant; irrelevant without contending clients) and a pluggable
    * transient-fault predicate instead of boto3 exception classes. */
  def withRetry[T](maxRetries: Int = 5, backoffBaseMs: Long = 1000,
                   backoffFactor: Double = 2.0, maxBackoffMs: Long = 30000,
                   isTransient: Throwable => Boolean = _.isInstanceOf[java.io.IOException],
                   sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var retries = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if isTransient(e) && retries < maxRetries =>
          sleep(math.min(backoffBaseMs * math.pow(backoffFactor, retries),
            maxBackoffMs.toDouble).toLong)
          retries += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The streaming wrapper: request stream → parse → per-batch typed
    * extraction updates → idempotent merge (retry-guarded, U4).
    * `maxRecords`/trigger mirror the reference's getmany(1000 ms, ≤10). */
  def runStream(spark: SparkSession, raw: DataFrame,
                store: ParquetMetadataStore, checkpoint: String): StreamingQuery =
    parseRequests(raw).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val updates = batch
          .filter(col("record_id").isNotNull)
          .select(concat(lit("item-"), col("record_id")).as("id"),
            explode(map(
              lit("document_type"), col("document_type"),
              lit("key"), col("key"),
              lit("session_id"), col("session_id"))).as(Seq("mkey", "mvalue")))
        withRetry()(store.merge(updates))
        ()
      }
      .start()
}
