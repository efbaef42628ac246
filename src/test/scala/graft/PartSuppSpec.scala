package graft

import graft.queries.PartSuppQueries
import org.apache.spark.sql.functions._

/** Invariants of the synthesized partsupp relation and the plan shapes
  * of the five TPC-H queries over it — the properties the value-level
  * oracle compare can't see. */
class PartSuppSpec extends SparkSpec {

  test("partsupp: exact PK, 4 distinct suppliers per part, bounded attributes") {
    val ps = PartSuppQueries.partsupp(spark, Sf).cache()
    try {
      val nParts = Tables.part(spark, Sf).count()
      assert(ps.count() === nParts * 4)
      // (partkey, suppkey) is a real PK: the suppkey stride must not
      // alias mod S at this supplier count
      assert(ps.select("ps_partkey", "ps_suppkey").distinct().count()
        === nParts * 4)
      val bad = ps.filter(col("ps_availqty") < 1 || col("ps_availqty") > 9999 ||
        col("ps_supplycost") < 1.0 || col("ps_supplycost") > 1000.01 ||
        col("ps_suppkey") < 0).count()
      assert(bad === 0, "attribute out of derivation range")
      // supplycost must be EXACTLY cents/100.0 — the single-division
      // contract both engines rely on for bit-equal doubles
      val drift = ps.filter(
        col("ps_supplycost") =!= col("ps_cost_cents") / lit(100.0)).count()
      assert(drift === 0)
    } finally ps.unpersist()
  }

  test("partsupp derivation is a projection fan-out: no shuffle, no cartesian") {
    val plan = PartSuppQueries.partsupp(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only join is the 1-row supplier count: broadcast NLJ
    assert(plan.contains("BroadcastNestedLoopJoin"))
    // the only exchanges allowed: the 1-row supplier count's aggregate
    // exchange + its broadcast, and the two single-file parallelism
    // guards (Tables' documented repartition of one-file test tables —
    // absent on multi-file input at real scale). The fan-out itself
    // must add none.
    val exch = "Exchange".r.findAllIn(plan).size
    assert(exch <= 4, s"partsupp fan-out must not add exchanges:\n$plan")
  }

  test("Q2: correlated min decorrelated into ONE partsupp pass + window") {
    val q = PartSuppQueries.queries("tpch_min_cost_supplier")(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "per-part min must ride a window")
    // one explode = one partsupp construction — the correlated form
    // would build it twice (outer + subquery)
    assert("Generate explode".r.findAllIn(plan).size === 1,
      s"partsupp must be constructed exactly once:\n$plan")
  }

  test("SF-growing broadcast hints are size-gated, not unconditional") {
    // shrink the threshold below the part/supplier scan bytes: the gate
    // must drop the hint and the fact-side joins fall back to shuffles
    // (the behavior a 100 TB install needs — an unconditional hint
    // would still force the broadcast here)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, (4 * 1024).toString)
      val plan = PartSuppQueries.queries("tpch_profit_rollup")(spark, Sf)
        .queryExecution.executedPlan.toString
      assert("SortMergeJoin".r.findAllIn(plan).size >= 2,
        s"gated sides must stop broadcasting past the threshold:\n$plan")
    } finally spark.conf.set(key, old)
  }

  test("test-scale plans still broadcast every gated dim side") {
    for (name <- Seq("tpch_min_cost_supplier", "tpch_important_stock",
        "tpch_parts_supplier_cnt", "tpch_promo_suppliers")) {
      val plan = PartSuppQueries.queries(name)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1,
        s"$name: gated sides must still broadcast at test scale:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("Q9: the only wide join is lineitem x orders — dims broadcast") {
    val q = PartSuppQueries.queries("tpch_profit_rollup")(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    val wide = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    assert(wide <= 1, s"only the fact-fact join may shuffle:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "partsupp and supplier/nation sides must broadcast")
  }
}
