package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-15 pins: the GlobalRank scaffold-cache lifecycle (ADVICE r10
  * #1) and this round's serving/selection loop-closers. */
class Round15Spec extends SparkSpec {

  test("cachedPair: scaffold reaped after the derived cache materializes") {
    import spark.implicits._
    // distinctive values so no other suite's canonical plan collides
    val df = Seq((150731, "r15a"), (150732, "r15b"), (150733, "r15c"),
      (150734, "r15d")).toDF("x", "k")
    val ranked = graft.operators.GlobalRank.withRank(
      df, Seq(col("x"), col("k")), "rk", parts = 2)
    // pre-materialization: the scaffold (input) cache is pinned —
    // RangePartitioner's sampling pass + shuffle write both read it
    assert(df.storageLevel.useMemory, "scaffold must be cached until " +
      "the keyed relation materializes")
    assert(ranked.orderBy("rk").select("k").as[String].collect().toSeq ==
      Seq("r15a", "r15b", "r15c", "r15d"))
    // any later pool touch reaps the now-redundant scaffold; the
    // derived keyed cache keeps the single-materialization invariant
    val touch = graft.pipeline.CachePool.cached(
      Seq(150739).toDF("touch_r15"))
    try assert(df.storageLevel == StorageLevel.NONE,
      "scaffold must be unpersisted once the derived cache is loaded")
    finally touch.unpersist()
    // and the ranks are still served (from the keyed cache / shuffle
    // files), identical to before
    assert(ranked.orderBy("rk").select("k").as[String].collect().toSeq ==
      Seq("r15a", "r15b", "r15c", "r15d"))
  }
}
