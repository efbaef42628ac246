package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for join-heavy relations — the storage-side
  * half of shuffle avoidance at 100 TB: a relation written with
  * `bucketBy(n, key)` + `sortBy(key)` carries its hash-partitioning
  * (and in-bucket order) in the catalog, so every later equi-join or
  * aggregation on that key reads co-located buckets and skips both the
  * exchange AND the sort. One shuffle at write time is amortized over
  * every downstream consumer — the right trade for relations joined
  * repeatedly (the embeddings↔IVF-cell assignment, the metadata store,
  * a dedup sketch table), vs `repartition` which must re-shuffle per
  * query. Uses native (non-Hive) data-source tables, which support
  * bucketing in the in-memory catalog.
  */
object BucketedStore {

  /** Persist `df` as a managed bucketed table (overwriting), bucketed
    * and sorted by `key` into `buckets` files per partition. A restarted
    * session's in-memory catalog forgets the table while its managed
    * LOCATION survives on disk, and `saveAsTable` then refuses with
    * LOCATION_ALREADY_EXISTS — so clear both first; rewriting the store
    * is this API's contract. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    write(df, table, Seq(key), buckets)

  /** Composite-key variant: bucketed AND sorted by the full key list —
    * an equi-join on exactly these columns then needs neither exchange
    * nor sort on the stored side (the minhash band index joins on
    * (band_idx, k1, k2)). */
  def write(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    write(df, table, keys, keys, buckets)

  /** Separate sort columns (must lead with the bucket keys to be useful
    * to the planner): a table bucketed by k and sorted by (k, t) serves
    * MERGE-regime operators — sort-merge equi-joins, the native as-of —
    * with neither exchange NOR sort, provided each bucket holds exactly
    * one file (the scan only advertises its in-bucket order then).
    * Callers that want the order advertised must pre-repartition the
    * input onto the bucket function ([[oneFilePerBucket]]) so each
    * write task owns exactly one bucket. */
  def write(df: DataFrame, table: String, keys: Seq[String],
            sortCols: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  /** Repartition onto the bucket hash so each task holds exactly one
    * bucket → the bucketed write emits ONE file per bucket. Spark's
    * `repartition(n, col)` and the data-source bucketing use the same
    * Murmur3-pmod function, so partition i IS bucket i. */
  def oneFilePerBucket(df: DataFrame, keys: Seq[String], buckets: Int): DataFrame =
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
