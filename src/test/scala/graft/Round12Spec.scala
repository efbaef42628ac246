package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 additions: the shared distributed global-rank/ntile
  * primitive and the queries it repaired. */
class Round12Spec extends SparkSpec {

  test("GlobalRank.withRank equals a single-task row_number") {
    import spark.implicits._
    // keys deliberately skewed + colliding on the sort metric so the
    // (metric, id) tie-break and range boundaries both get exercised
    val df = (1L to 997L).map(i => (i, i % 13)).toDF("id", "m")
    val got = GlobalRank.withRank(df, Seq(col("m").desc, col("id")), "r", 7)
      .select("id", "r")
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(col("m").desc, col("id"))).cast("long"))
      .select("id", "r")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("GlobalRank.withNtile reproduces Window.ntile exactly, incl. ragged splits") {
    import spark.implicits._
    // N=103, n=5 → q=20, r=3: three 21-row buckets then two 20-row —
    // the floor/ceil split ntile is defined by; also N<n (N=3, n=5)
    for ((rows, n) <- Seq((103, 5), (3, 5), (100, 4), (1, 3))) {
      val df = (1 to rows).map(i => (i.toLong, (i * 37) % 11)).toDF("id", "m")
      val got = GlobalRank.withNtile(df, n, Seq(col("m"), col("id")), "b", 7)
        .select("id", "b")
      val want = df.withColumn("b",
        ntile(n).over(Window.orderBy(col("m"), col("id"))))
        .select("id", "b")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at rows=$rows n=$n")
    }
  }

  test("rfm plan has no eager action and no single-partition data window") {
    // construction must be action-free (the anchor is a broadcast
    // 1-row aggregate now) — pin by asserting no Spark job runs while
    // building the plan. First touch of a table pays a one-time parquet
    // footer-read job (Tables' schema cache); warm it before counting.
    SparkEntry.queries("events_rfm")(spark, Sf).queryExecution.executedPlan
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = SparkEntry.queries("events_rfm")(spark, Sf)
    df.queryExecution.executedPlan // force planning
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "events_rfm ran a job during plan construction")
  }
}
