package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain managed-parquet persistence for TRAINED MODEL state — the
  * write-model/load-model split a 100 TB deployment actually has:
  * training and serving are different jobs, so a model that lives only
  * in a session memo ([[graft.pipeline.CachePool.memoized]]) cannot be
  * served by anything but the process that trained it. Model tables
  * are tiny (16 classifier weights, ≤|domains| mixture rows, k×dim
  * centroids) so no bucketing — one overwrite per (re)train, one
  * sub-second scan per serving job. Same drop-table + clear-location
  * discipline as [[BucketedStore]]: rewriting the store is the
  * contract, and a restarted session's catalog must not trip over the
  * surviving managed LOCATION. */
object ModelStore {

  def write(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
