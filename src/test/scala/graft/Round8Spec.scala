package graft

import graft.pipeline.DedupQueries
import graft.queries.InfraQueries
import org.apache.spark.sql.functions._

/** Properties of the round-8 additions the oracle compare can't see:
  * BFS structural invariants (triangle inequality over edges,
  * convergence strictly under the cap) and the quality report's
  * fail-capability (it must report REAL violations where the generator
  * plants them, and zero where constraints genuinely hold). */
class Round8Spec extends SparkSpec {

  test("bfs hops: canonical at 0, neighbors differ by ≤1, converged under cap") {
    val hops = DedupQueries.queries("graph_bfs_hops")(spark, Sf)
    val rows = hops.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // exactly the canonical node of each cluster sits at hop 0
    rows.foreach { case (doc, cl, h) =>
      assert((h == 0) == (doc == cl), s"doc $doc cluster $cl hops $h")
    }
    // every node converged strictly below the safety cap (else the cap,
    // not the graph, defined the answer)
    assert(rows.map(_._3).max < DedupQueries.BfsMaxHops,
      "eccentricity hit the BFS round cap")
    // cluster ids match the cluster face (BFS did not invent components)
    val cc = DedupQueries.queries("dedup_cluster")(spark, Sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (doc, cl, _) =>
      assert(cc(doc) == cl, s"doc $doc: bfs cluster $cl vs cc ${cc(doc)}")
    }
  }

  test("quality checks: planted PK violations caught, true constraints pass") {
    val rep = InfraQueries.queries("infra_quality_checks")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(rep.size == 10, s"${rep.size} checks in report")
    // the generator does not deduplicate (orderkey, linenumber): the PK
    // check must FAIL — a quality suite that can't fail proves nothing
    assert(rep("lineitem_pk_unique")._1 > 0, "expected real PK violations")
    assert(!rep("lineitem_pk_unique")._2)
    // referential integrity genuinely holds in the generated data
    assert(rep("lineitem_fk_orders") == ((0L, true)))
    assert(rep("orders_fk_customer") == ((0L, true)))
    // pass flag is exactly violations == 0 everywhere
    rep.values.foreach { case (v, p) => assert(p == (v == 0L)) }
  }
}
