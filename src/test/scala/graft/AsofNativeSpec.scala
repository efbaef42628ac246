package graft

import org.apache.spark.sql.functions._

import graft.plans.AsofJoin

/** Pins the native as-of operator's physical shape and its edge
  * semantics (the oracle pins bulk values at the driver gate). */
class AsofNativeSpec extends SparkSpec {

  test("plans as AsofJoinExec under the sort-merge regime") {
    val df = graft.pipeline.EventQueries
      .queries("events_asof_native")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native operator must plan:\n$plan")
    // one hash exchange + one sort per side, nothing more — the same
    // regime a sort-merge join would get
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$plan")
  }

  test("merge semantics: latest-at-or-before, max-tie on equal ts, inner drop") {
    import spark.implicits._
    // left: (key, time, id) — right: (key, time, tie, payload)
    val left = Seq(
      (1L, 100L, 10L), // after two rights at t=100 (tie 7 wins) — inclusive
      (1L, 150L, 11L), // carry-forward: still tie 7
      (1L, 50L, 12L),  // before any right of key 1 — dropped
      (2L, 999L, 13L), // key 2 has rights — latest is t=900
      (3L, 10L, 14L))  // key 3 has no rights — dropped
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("lid"))
    val right = Seq(
      (1L, 100L, 6L, "a"), (1L, 100L, 7L, "b"), (1L, 60L, 5L, "c"),
      (2L, 900L, 1L, "d"), (2L, 800L, 2L, "e"))
      .toDF("rk", "rt0", "tie", "payload")
      .select(col("rk"), timestamp_micros(col("rt0")).as("rts"),
        col("tie"), col("payload"))
    val out = AsofJoin.asof(left, right,
        key = "k", time = "ts", rightKey = "rk", rightTime = "rts",
        rightTie = "tie")
      .select(col("lid"), col("tie"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set((10L, 7L, "b"), (11L, 7L, "b"), (13L, 1L, "d")))
  }
}
