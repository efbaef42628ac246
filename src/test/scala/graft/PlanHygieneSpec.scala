package graft

/** Whole-surface plan hygiene: every registered query must (a) build a
  * physical plan at all (catches registration typos and analysis
  * regressions in one sweep), (b) contain NO CartesianProduct — every
  * cross join in the engine is against a broadcast constant-size set
  * and must plan as BroadcastNestedLoopJoin, never a shuffled
  * all-pairs product — and (c) stay under a generous exchange ceiling
  * (static plans top out at 30 today, broadcasts and pre-AQE duplicate
  * subtrees included; a blown self-join or lost broadcast hint shows
  * up as an exchange explosion long before it shows up in a timing). */
class PlanHygieneSpec extends SparkSpec {

  test("all registered queries plan cleanly: no cartesian, bounded exchanges") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, Sf).queryExecution.executedPlan.toString
          val cart = "CartesianProduct".r.findAllIn(plan).size
          val exch = "Exchange".r.findAllIn(plan).size
          if (cart > 0) Some(s"$name: $cart CartesianProduct node(s)")
          else if (exch > 32) Some(s"$name: $exch exchanges (ceiling 32)")
          else None
        } catch {
          case e: Throwable => Some(s"$name: failed to plan — ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no single-partition Window over a data-sized relation") {
    // The house rule VERDICT r7 caught events_rfm/events_uplift breaking:
    // an unpartitioned Window (SinglePartition distribution) moves the
    // WHOLE child relation to one task. That is only ever acceptable over
    // a constant-size relation. Two shapes are recognized as bounded:
    //  (a) the GlobalRank offset relation — child aggregates on a
    //      partition id derived from spark_partition_id() or the
    //      monotonically_increasing_id encoding, ≤ shuffle-partition
    //      rows by construction;
    //  (b) a child whose subtree aggregates to a bounded key, declared
    //      below with its bound's justification (each is a grouping on a
    //      closed vocabulary or fixed grid, NOT on data-sized ids).
    import org.apache.spark.sql.execution.window.WindowExec
    // Every other unpartitioned window in the registered plans is a
    // GlobalRank-style offset window (shape a). A new entry here must
    // name its bound ("per-hour grain", "≤64-row grid", …).
    val boundedByAggKey = Map(
      "search_hybrid_rrf" -> "rank windows over the two ≤20-row top-k arms")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, Sf).queryExecution.executedPlan
          val bad = plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty &&
              !w.child.toString.contains("SPARK_PARTITION_ID") &&
              !w.child.toString.contains("monotonically_increasing_id") &&
              !boundedByAggKey.contains(name) => w
          }
          if (bad.nonEmpty)
            Some(s"$name: ${bad.size} unpartitioned Window(s) over an " +
              "undeclared relation — use graft.operators.GlobalRank")
          else None
        } catch { case _: Throwable => None } // planning failures → test 1
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle registration is total: every query has SQL or a declared rows-only hole") {
    // empty since round 6: the two approximate queries now carry
    // hash-matched tolerance contracts instead of rows-only holes
    val declaredNoOracle = Set.empty[String]
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- declaredNoOracle
    assert(missing.isEmpty, s"unpaired queries: ${missing.toSeq.sorted}")
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: ${dangling.toSeq.sorted}")
  }
}
