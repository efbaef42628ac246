package graft

import graft.pipeline.SimilarityQueries
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Properties of the round-4 additions that the oracle compare can't
  * see: ANN recall against the exact brute-force answer (both engines
  * could agree on an index that returns garbage neighbors), and the
  * analytical family's scale-relevant plan shapes. */
class AnnSpec extends SparkSpec {

  private def top1(name: String): Set[(Long, Long)] =
    SimilarityQueries.queries(name)(spark, Sf)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k-means IVF (nprobe=2/8 cells) keeps rank-1 recall >= 60%") {
    // probing 2 of 8 cells scans ~25% of the corpus; an index no better
    // than random scanning would put the true rank-1 neighbor in the
    // probe set ~25% of the time. Measured at sf0.001: 8/10.
    val brute = top1("ann_topk_brute")
    val hits = brute.intersect(top1("ann_topk_ivf_kmeans")).size
    assert(hits >= 6, s"rank-1 recall $hits/10")
  }

  test("LSH (3x4-bit bands) beats its candidate-selectivity baseline") {
    // candidates are ~18% of the corpus (measured), so an index no
    // better than random sampling would hold the true rank-1 neighbor
    // ~18% of the time (~2/10). Measured at sf0.001: 5/10 — these
    // synthetic embeddings are near-random (rank-1 cosine ~0.3), which
    // inherently caps sign-LSH alignment; the assertion pins
    // "meaningfully better than its scan fraction", the property that
    // matters at scale, not a number this fixture can't support.
    val brute = top1("ann_topk_brute")
    val hits = brute.intersect(top1("ann_topk_lsh")).size
    assert(hits >= 4, s"rank-1 recall $hits/10")
  }

  test("k-means assigns every vector to exactly one of k cells") {
    val n = Tables.embeddings(spark, Sf).count()
    val perQuery = SimilarityQueries.queries("ann_topk_ivf_kmeans")(spark, Sf)
      .groupBy("query_id").count()
    // 10 queries, each with exactly 5 ranked neighbors from its cells
    assert(perQuery.count() === 10 && n > 0)
    assert(perQuery.filter(col("count") =!= 5).count() === 0)
  }

  test("analytics plans: pushdown + broadcast dims + partial aggregates") {
    val q1 = AnalyticsQueries.queries("tpch_pricing_summary")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(q1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"),
      "shipdate filter must reach the parquet scan")
    val q5 = AnalyticsQueries.queries("tpch_region_revenue")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(q5.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!q5.contains("CartesianProduct"), "no cartesian products")
  }
}
