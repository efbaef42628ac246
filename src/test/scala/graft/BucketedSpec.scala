package graft

import graft.sources.BucketedStore
import org.apache.spark.sql.functions._

/** The storage-side shuffle-avoidance contract: two relations bucketed
  * on the same key must join with NO exchange and NO sort at read time
  * — the property that amortizes one write-time shuffle over every
  * downstream join of a hot relation at 100 TB. */
class BucketedSpec extends SparkSpec {

  test("bucketed tables join without exchange or sort") {
    // the SAME relations the registered infra_bucketed_join query
    // persists — this pins the plan shape of the oracle-checked path
    val (profile, fingerprint) =
      graft.queries.InfraQueries.bucketedRelations(spark, Sf)
    BucketedStore.write(profile, "emb_bucketed", "doc_id", 8)
    BucketedStore.write(fingerprint, "stats_bucketed", "doc_id", 8)
    // bucketing matters in the non-broadcast regime (at scale neither
    // side fits a broadcast); on these test-sized tables the planner
    // would broadcast and skip the bucketed scan entirely, so pin the
    // shuffle-join path for the assertion
    val (bcast, aqe) = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = BucketedStore.read(spark, "emb_bucketed")
        .join(BucketedStore.read(spark, "stats_bucketed"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("+- Sort"),
        s"sortBy buckets must also kill the join sort:\n$plan")
      // and it is not vacuous: the join actually matches every row
      assert(joined.count() === profile.count())
      // same property for an aggregation on the bucket key: no exchange
      // in front of the partial/final aggregate pair
      val agg = BucketedStore.read(spark, "emb_bucketed")
        .groupBy("doc_id").agg(sum("n_chars"))
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$aplan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }
}
