package graft

import org.apache.spark.sql.functions._

/** The cost-based-optimizer evidence: at 100 TB, join order and
  * broadcast decisions ride on CATALOG STATISTICS, not file sizes —
  * a filtered dimension that scans as 10 GB may estimate as 50 MB
  * once ndv-based selectivity applies, flipping a shuffle join to a
  * broadcast. This pins the chain on this build: ANALYZE computes
  * row/column stats, the optimizer surfaces them, and an equality
  * filter's cardinality estimate shrinks by the column's ndv — the
  * input every downstream cost decision consumes. */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE column stats drive ndv-based filter selectivity estimates") {
    val conf = spark.conf
    val saved = Seq("spark.sql.cbo.enabled")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_docs_stats")
      Tables.documents(spark, Sf).select("doc_id", "lang", "n_chars")
        .write.saveAsTable("graft_docs_stats")
      spark.sql(
        "ANALYZE TABLE graft_docs_stats COMPUTE STATISTICS FOR ALL COLUMNS")
      val full = spark.table("graft_docs_stats")
      val fullStats = full.queryExecution.optimizedPlan.stats
      assert(fullStats.rowCount === Some(BigInt(500)),
        s"ANALYZE row count missing: $fullStats")
      assert(fullStats.attributeStats.nonEmpty, "column stats missing")
      // equality filter on a 5-value column: the estimate must shrink
      // to ~rowCount/ndv, far below the unfiltered count — the
      // selectivity signal broadcast decisions and join reorder use
      val filtered = full.filter(col("lang") === "en")
      val filteredRows = filtered.queryExecution.optimizedPlan.stats
        .rowCount.getOrElse(BigInt(-1))
      assert(filteredRows > 0 && filteredRows <= 250,
        s"expected an ndv-shrunk estimate, got $filteredRows of 500")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_docs_stats")
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
