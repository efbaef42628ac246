package graft

import graft.pipeline.{EventQueries, TextQueries}
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Properties of the round-5 reporting/prep additions that the oracle
  * compare can't see: internal consistency across rollup levels,
  * quantile ordering, plan shapes (broadcast eval set, broadcast dims,
  * agg-below-join), and planted-contamination detection. */
class ReportingSpec extends SparkSpec {

  test("rollup levels reconcile: per-type subtotals sum to the grand total") {
    val r = EventQueries.queries("events_rollup_daily")(spark, Sf)
      .select("lvl", "event_type", "n_events").collect()
    val grand = r.filter(_.getInt(0) == 3).map(_.getLong(2)).sum
    val perType = r.filter(_.getInt(0) == 1).map(_.getLong(2)).sum
    val perDay = r.filter(_.getInt(0) == 0).map(_.getLong(2)).sum
    val total = Tables.events(spark, Sf).count()
    assert(grand === total && perType === total && perDay === total,
      s"levels must each partition the event count: $grand/$perType/$perDay vs $total")
    // one aggregate, not three scans unioned: the grouping sets expand
    // in a single Expand node feeding one aggregation
    val plan = EventQueries.queries("events_rollup_daily")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "rollup must plan as grouping-set expand")
    assert("(?s)Scan parquet".r.findAllIn(plan).size === 1,
      s"rollup must scan events exactly once:\n$plan")
  }

  test("quantiles are ordered and bounded by the per-type min/max") {
    val q = EventQueries.queries("events_quantiles")(spark, Sf)
      .select("event_type", "p50", "p90", "p99").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val bounds = Tables.events(spark, Sf).groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(q.nonEmpty)
    q.foreach { case (t, (p50, p90, p99)) =>
      assert(p50 <= p90 && p90 <= p99, s"$t: quantiles must be monotone")
      val (lo, hi) = bounds(t)
      // pinned display rounding can nudge past the true bound by 5e-5
      assert(p50 >= lo - 5e-5 && p99 <= hi + 5e-5,
        s"$t: quantiles must lie within [$lo, $hi]")
    }
  }

  test("approx quantiles honor the sketch's rank contract per group") {
    // since round 6 the rank contract is computed IN-QUERY (the query
    // joins the sketch output back to the events and emits per-group
    // pXX_ok booleans — see quantilesApprox's doc); the spec asserts
    // every group passes and that the group census matches the table,
    // mirroring what the DuckDB oracle pins at the driver gate.
    val rows = EventQueries.queries("events_quantiles_approx")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getBoolean(2), s"$t: p50 estimate left its rank envelope")
      assert(r.getBoolean(3), s"$t: p90 estimate left its rank envelope")
      assert(r.getBoolean(4), s"$t: p99 estimate left its rank envelope")
    }
    val census = Tables.events(spark, Sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === census)
  }

  test("returned-items report: dims broadcast, fact aggregated before the join") {
    val df = AnalyticsQueries.queries("tpch_returned_items")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "customer/nation must broadcast")
    assert(!plan.contains("CartesianProduct"))
    // the revenue agg keys on o_custkey — proof it runs on the fact
    // stream below the customer join (the post-join form would key on
    // the five output columns)
    assert(plan.contains("functions=[sum") && plan.contains("keys=[o_custkey"),
      s"revenue agg must collapse lineitem per custkey before the dim joins:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0), "returned revenue must be positive")
  }

  test("contamination: planted 8-gram overlap detected, 7-gram overlap is not") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8"            // 8 shared tokens
    val short = "v1 v2 v3 v4 v5 v6 v7"               // only 7 shared tokens
    val docs = Seq(
      (0L, s"eval doc left $base right tail"),       // eval member
      (1L, s"clean corpus doc with nothing shared at all here ok"),
      (2L, s"contaminated corpus doc $base trailing words"),
      (3L, s"near miss corpus doc $short trailing words"),
      (4L, s"eval only gram $short here")            // 7-gram also in eval
    ).toDF("doc_id", "text")
    val hits = TextQueries.contamination(docs, col("doc_id").isin(0L, 4L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(2L), "the planted 8-gram overlap must be flagged")
    assert(hits(2L) >= 1L)
    assert(!hits.contains(1L) && !hits.contains(3L),
      "clean and 7-gram-overlap docs must pass decontamination")
    // eval docs are never reported as contaminated corpus docs
    assert(!hits.contains(0L) && !hits.contains(4L))
    // the eval gram set must broadcast: corpus-side probe is map-side
    val plan = TextQueries.contamination(docs, col("doc_id").isin(0L, 4L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast — the corpus side never shuffles for the probe:\n$plan")
  }

  test("funnel stages are time-ordered and strictly nested") {
    val rows = EventQueries.queries("events_funnel")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, c, p) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (c >= 0) assert(c >= s, "first click must be at/after signup")
      if (p >= 0) assert(c >= 0 && p >= c,
        "purchase stage requires the click stage and follows it in time")
    }
    val nClick = rows.count(_.getLong(2) >= 0)
    val nPurchase = rows.count(_.getLong(3) >= 0)
    assert(rows.length >= nClick && nClick >= nPurchase,
      "stage populations must be non-increasing")
  }

  test("retention and funnel plan with a single fact scan") {
    // both were rewritten from self-join / per-stage-join forms that
    // read the fact table 2-3x; the window forms must keep one scan
    for (q <- Seq("events_retention", "events_funnel")) {
      val plan = EventQueries.queries(q)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert("(?s)Scan parquet".r.findAllIn(plan).size === 1,
        s"$q must scan events exactly once:\n$plan")
    }
  }

  test("distribution reports reconcile: deciles, histogram, and the event count") {
    val total = Tables.events(spark, Sf).count()
    val decileN = EventQueries.queries("events_deciles")(spark, Sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    val histoN = EventQueries.queries("events_histogram")(spark, Sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(decileN === total && histoN === total,
      s"every event lands in exactly one band: $decileN/$histoN vs $total")
    // NTILE's equi-height contract: within a type, bucket sizes differ
    // by at most one
    EventQueries.queries("events_deciles")(spark, Sf)
      .select("event_type", "n_events").collect()
      .groupBy(_.getString(0)).foreach { case (t, rows) =>
        val sizes = rows.map(_.getLong(1))
        assert(sizes.max - sizes.min <= 1, s"$t: NTILE buckets must be even")
      }
  }

  test("range search is consistent with the brute-force top-k above the radius") {
    import graft.pipeline.SimilarityQueries
    val tau = 0.25
    val range = SimilarityQueries.queries("ann_range_search")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteAbove = SimilarityQueries.queries("ann_topk_brute")(spark, Sf)
      .filter(col("sim") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every top-5 neighbor at/above the radius must be in the range
    // result (range search has no k cut, so it can only be a superset)
    assert(bruteAbove.subsetOf(range),
      s"missing from range: ${bruteAbove.diff(range).take(3)}")
    assert(range.nonEmpty)
  }

  test("json props: payload pruned to the extracted value before the aggregate") {
    val df = EventQueries.queries("events_json_props")(spark, Sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kMin, kMax, kDist) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(kMin <= kMax && kDist <= n, s"${r.getString(0)}: stats inconsistent")
    }
    val plan = df.queryExecution.executedPlan.toString
    // the aggregate's input carries the extracted long, not the raw
    // JSON string: props appears only below the projection
    assert(plan.contains("get_json_object"), "extraction must be in-plan (no UDF)")
  }
}
