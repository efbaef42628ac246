package graft.sources

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Small-file compaction for parquet stores — the operational chore
  * every long-running 100 TB pipeline needs: streaming micro-batches
  * and partition-scoped merges accrete files far below the scan-
  * efficient size, and scan cost degrades with per-file open/footer
  * overhead long before byte volume matters. Compaction sizes the
  * rewrite from the ACTUAL on-disk bytes (not a guessed partition
  * count): ceil(bytes / targetBytes) output files via one shuffle-free
  * coalesce when shrinking (the common case), or a repartition when
  * the store has fewer-but-huge files. The rewrite goes to a temp dir
  * and swaps in atomically-per-directory, same pattern as the
  * metadata store's merge.
  */
object Compactor {

  /** Compact `dir` (flat parquet) toward `targetBytes` per file.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(p: Path): Seq[Path] =
      Files.list(p).iterator.asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
    val root = Paths.get(dir)
    val before = parquetFiles(root)
    val bytes = before.map(Files.size).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out =
      if (n <= df.rdd.getNumPartitions) df.coalesce(n) // no shuffle
      else df.repartition(n)
    val tmp = dir.stripSuffix("/") + ".compact-tmp"
    out.write.mode("overwrite").parquet(tmp)
    // swap: clear originals, move the rewrite in
    before.foreach(Files.delete)
    Files.list(root).iterator.asScala.toSeq
      .filter(_.getFileName.toString.startsWith("_")).foreach(Files.delete)
    val moved = Files.list(Paths.get(tmp)).iterator.asScala.toSeq
      .filter(!_.getFileName.toString.startsWith("."))
    moved.foreach(f => Files.move(f, root.resolve(f.getFileName.toString),
      StandardCopyOption.REPLACE_EXISTING))
    Files.list(Paths.get(tmp)).iterator.asScala.toSeq.foreach(Files.delete)
    Files.delete(Paths.get(tmp))
    (before.size, parquetFiles(root).size)
  }
}
