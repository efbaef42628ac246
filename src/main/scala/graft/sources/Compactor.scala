package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Small-file compaction for parquet stores — the operational chore
  * every long-running 100 TB pipeline needs: streaming micro-batches
  * and partition-scoped merges accrete files far below the scan-
  * efficient size, and scan cost degrades with per-file open/footer
  * overhead long before byte volume matters. Compaction sizes the
  * rewrite from the ACTUAL on-disk bytes (not a guessed partition
  * count): ceil(bytes / targetBytes) output files via one shuffle-free
  * coalesce when shrinking (the common case), or a repartition when
  * the store has fewer-but-huge files.
  *
  * All file ops go through Hadoop's `FileSystem` resolved from the
  * store path, so the same code runs on local disk, HDFS, or an
  * S3A-style object store. The swap is two directory renames
  * (root → .old, tmp → root): at every instant the data exists intact
  * in exactly one directory, so a crash mid-swap can lose at most the
  * directory NAME (recoverable from `.compact-old`/`.compact-tmp`),
  * never the rows — unlike a delete-then-move-files sequence, which
  * has a window where the originals are gone and the rewrite is not
  * yet in place. The tmp/old siblings are dot-prefixed so partition
  * discovery over an enclosing store (e.g. a `pid=N` parent) ignores
  * them.
  */
object Compactor {

  /** Compact `dir` (flat parquet) toward `targetBytes` per file.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val root = new Path(dir)
    val fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetCount(p: Path): Int =
      fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = before.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out =
      if (n <= df.rdd.getNumPartitions) df.coalesce(n) // no shuffle
      else df.repartition(n)
    val parent = root.getParent
    val tmp = new Path(parent, "." + root.getName + ".compact-tmp")
    val old = new Path(parent, "." + root.getName + ".compact-old")
    fs.delete(tmp, true); fs.delete(old, true) // stale leftovers of a crash
    out.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(root, old) || !fs.rename(tmp, root))
      throw new java.io.IOException(s"compaction swap failed for $dir")
    fs.delete(old, true)
    (before.length, parquetCount(root))
  }
}
