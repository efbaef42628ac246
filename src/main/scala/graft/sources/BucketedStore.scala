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
    * and sorted by `key` into `buckets` files per partition. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
