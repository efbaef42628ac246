package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.execution.window.WindowExec

/** Pins the two scale properties of `text_surprisal`'s vocabulary rank
  * (the round-6 weak finding): the data-sized rank is computed by a
  * PARTITIONED window (two-phase distributed rank), never a
  * single-task global sort, and building the query runs no eager job
  * (the vocabulary size is a broadcast 1-row aggregate, not a
  * construction-time `count()`). */
class SurprisalSpec extends SparkSpec {

  test("vocabulary rank is distributed: no partitionless window over vocab-sized data") {
    val df = SparkEntry.queries("text_surprisal")(spark, Sf)
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in the surprisal plan")
    // The data-sized rank window must be partitioned (per-range-partition
    // row_number over pid; the `rn` alias lives in the Project above, so
    // look at the partition spec itself).
    assert(wins.exists(w =>
      w.partitionSpec.exists(_.references.exists(_.name == "pid"))),
      "the vocabulary rank window must be partitioned by pid")
    // Any partitionless window may only ride the per-partition-counts
    // relation — one row per range partition (≤32 rows, constant in SF),
    // recognizable by its `pc` count column.
    val offenders = wins.filter(w => w.partitionSpec.isEmpty &&
      !w.child.output.exists(_.name == "pc"))
    assert(offenders.isEmpty,
      s"partitionless window over a data-sized input:\n${offenders.mkString("\n")}")
  }

  test("query construction is plan-only: no eager job") {
    // warm: first touch of a path pays the one-off schema-inference job
    SparkEntry.queries("text_surprisal")(spark, Sf)
    Thread.sleep(300)
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("text_surprisal")(spark, Sf)
      // an eager action would have blocked until its job was submitted;
      // give the (async) listener bus a moment to drain
      Thread.sleep(500)
      assert(jobs == 0, s"construction triggered $jobs Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
