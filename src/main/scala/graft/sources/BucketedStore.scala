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
  def write(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
