package graft

import graft.sources.Compactor
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactorSpec extends SparkSpec {

  test("compaction merges small files, preserves data, sizes from bytes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/store"
    // accrete 40 micro-batch-sized files
    (0 until 40).foreach { i =>
      Seq.tabulate(50)(j => (i * 50L + j, s"row-$i-$j")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(beforeRows.size === 2000)
    // target sized so the 40 files collapse to a handful
    val perFile = Files.list(java.nio.file.Paths.get(dir)).iterator()
    val (nBefore, nAfter) = Compactor.compact(spark, dir, targetBytes = 16 * 1024)
    assert(nBefore === 40)
    assert(nAfter < 10 && nAfter >= 1, s"got $nAfter files")
    val afterRows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterRows === beforeRows)
    // re-compaction never grows the store (it may shrink once more:
    // larger row groups compress better, dropping the byte-derived
    // file count) and keeps the data intact
    val (b2, a2) = Compactor.compact(spark, dir, targetBytes = 16 * 1024)
    assert(b2 === nAfter && a2 <= nAfter)
    assert(spark.read.parquet(dir).count() === 2000)
  }
}
