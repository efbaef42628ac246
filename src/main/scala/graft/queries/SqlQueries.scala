package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-string entry face: an analytics engine's first real user
  * types SQL, not DataFrame code. [[registerViews]] exposes every
  * testdata loader as a temp view, and each query below is an existing
  * oracle-paired query EXECUTED FROM ITS OWN ORACLE STRING via
  * `spark.sql` — the SQL text, the Spark result, and the DuckDB oracle
  * are one artifact, so a driver MATCH proves the string surface parses,
  * plans, and evaluates identically to the DataFrame surface (SqlFaceSpec
  * additionally pins row-parity and plan hygiene against the DataFrame
  * forms). Only dialect-portable oracle strings qualify (ANSI
  * expressions, TIMESTAMP literals, EXISTS subqueries); the DuckDB-only
  * oracles (strftime, unnest-CTEs) keep their DataFrame-only face.
  *
  * Three representative shapes:
  *  - pricing summary: scan → filter → 6-row aggregate (Catalyst pushes
  *    the shipdate filter into the parquet scan from the SQL form the
  *    same as from the DataFrame form);
  *  - order priority: EXISTS → left-semi join decorrelation done by the
  *    OPTIMIZER from the SQL text (RewritePredicateSubquery), proving
  *    subquery handling end-to-end;
  *  - brand revenue: 3-arm disjunctive predicate decomposition
  *    (per-table conjuncts factored out of the OR and pushed to both
  *    scans).
  */
object SqlQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Register every testdata table as a session temp view over its
    * loader (the events loader carries the nanos→µs ts conversion).
    * Registered once per (session, dataset) — the loaders list files at
    * construction, so per-query re-registration would re-pay that for
    * all 10 tables on every invocation; a view registry is session
    * state, set up once like a real application does. Re-registering
    * only when the dataset CHANGES keeps a session that alternates
    * datasets (the bench's warmup-then-measure pattern) correct: view
    * names are session-global, so the currently-bound dataset is
    * whatever registered last. */
  private val boundDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def registerViews(s: SparkSession, d: String): Unit =
    if (boundDir.put(s, d) != d) {
      Tables.names.filterNot(_ == "events")
        .foreach(n => Tables(s, d, n).createOrReplaceTempView(n))
      Tables.events(s, d).createOrReplaceTempView("events")
    }

  /** Oracle strings (and DataFrame faces, for SqlFaceSpec's parity
    * pins) of every family contributing promoted queries. Built from
    * the family objects directly, NOT SparkEntry — SparkEntry's maps
    * include this object, so going through them at init would be
    * circular. */
  private[graft] def sourceOracle(name: String): String =
    (AnalyticsQueries.oracle ++ graft.pipeline.EventQueries.oracle)(name)
  private[graft] def sourceQuery(name: String): Q =
    (AnalyticsQueries.queries ++ graft.pipeline.EventQueries.queries)(name)

  private def fromSql(name: String): Q = (s, d) => {
    registerViews(s, d)
    s.sql(sourceOracle(name))
  }

  /** sql_* name → the DataFrame-face query whose oracle string it
    * executes. Membership = the MATCH set of [[graft.tools.SqlSweep]]
    * (every dialect-portable oracle that runs in Spark row-identical to
    * its DataFrame face), minus the infra_* matches — their oracles
    * state the EXPECTED result from base tables rather than driving
    * the roundtrip/rewrite machinery, so a SQL face of them would
    * prove oracle math, not engine behavior. Feature notes beyond the
    * three shapes in the object doc: untapped_accounts exercises CTEs
    * + a comma cross join against a 1-row scalar + correlated NOT
    * EXISTS (anti-join decorrelation from SQL text); small_qty_revenue
    * the multi-CTE aggregate-join formulation whose window rewrite the
    * DataFrame face carries. */
  val pairs: Map[String, String] = Map(
    "sql_pricing_summary" -> "tpch_pricing_summary",
    "sql_order_priority" -> "tpch_order_priority",
    "sql_brand_revenue" -> "tpch_brand_revenue",
    "sql_untapped_accounts" -> "tpch_untapped_accounts",
    "sql_small_qty_revenue" -> "tpch_small_qty_revenue",
    // Q6: the pure scan-side shape — proves filter pushdown happens
    // identically from parsed SQL text (TIMESTAMP literals, BETWEEN)
    "sql_filtered_revenue" -> "tpch_filtered_revenue",
    // Q12 shape: join + conditional aggregation + INTERVAL arithmetic
    // from SQL text
    "sql_late_lines" -> "tpch_late_lines",
    // Q5/Q7/Q8/Q10/Q13/Q21 from SQL text: multi-join star shapes, a
    // two-sided date band, CASE-share aggregation, LEFT OUTER +
    // count-distribution, and the double-correlated EXISTS/NOT EXISTS
    // of Q21 (two decorrelations against the same fact)
    "sql_region_revenue" -> "tpch_region_revenue",
    "sql_nation_volume" -> "tpch_nation_volume",
    "sql_market_share" -> "tpch_market_share",
    "sql_returned_items" -> "tpch_returned_items",
    "sql_customer_dist" -> "tpch_customer_dist",
    // INTENTIONAL PLAN GAP (the suite's slowest query, ~1.5× its
    // DataFrame face): this face executes the literal correlated
    // EXISTS + NOT EXISTS string, which decorrelates into TWO extra
    // joins against lineitem (three fact scans), while the DataFrame
    // face carries the hand-decorrelated one-pass collect_set window
    // form. That gap IS the point — the SQL face proves the engine
    // runs the textbook text correctly; the DataFrame face proves the
    // rewrite; the bench shows what the rewrite buys. The other
    // subquery faces (order_priority, untapped_accounts) decorrelate
    // to single semi/anti joins, where optimizer output ≈ hand form.
    "sql_waiting_suppliers" -> "tpch_waiting_suppliers",
    // events family from SQL text: dense_rank over grouped aggregates,
    // NTILE deciles, width_bucket histogram, INTERSECT set op, LEAD
    // self-transition matrix, and the stddev z-score anomaly gate
    "sql_user_rank" -> "events_user_rank",
    "sql_deciles" -> "events_deciles",
    "sql_histogram" -> "events_histogram",
    "sql_intersect_days" -> "events_intersect_days",
    "sql_markov" -> "events_markov",
    "sql_anomaly" -> "events_anomaly",
    // Welch A/B readout from SQL text: chained CTEs of conditional
    // DECIMAL moment aggregates + the IEEE stat projection
    "sql_ab_test" -> "events_ab_test",
    // trigram path mining from SQL text: a named WINDOW clause with two
    // lead offsets + ranked LIMIT over the census
    "sql_trigram_paths" -> "events_trigram_paths",
    // market-basket association rules from SQL text: DISTINCT reduction,
    // inequality self-join, and a comma scalar join mixed with ANSI JOINs
    "sql_basket_lift" -> "events_basket_lift",
    // Q15 argmax shape from SQL text: 1-row scalar-max CTE joined back
    // with decimal-exact tie semantics
    "sql_top_supplier" -> "tpch_top_supplier",
    // audience-overlap matrix from SQL text: DISTINCT reduction, an
    // inequality self-join, ordinal GROUP BY, and two dimension
    // re-joins of one CTE
    "sql_audience_overlap" -> "events_audience_overlap",
    // the proportion tests from SQL text: per-user flag aggregation,
    // chained CTEs, NTILE segmentation (uplift), and the guarded
    // CASE z expression
    "sql_ab_conversion" -> "events_ab_conversion",
    "sql_uplift" -> "events_uplift")

  /** The summary-rewrite face FROM SQL TEXT: registers the lineitem
    * summary, then executes `infra_summary_rewrite`'s oracle string via
    * `spark.sql` — the optimizer rule must catch the aggregate in its
    * SQL-parsed form, where the post-processing (round/cast) sits
    * INLINE in the aggregate list rather than in a Project above it.
    * Plan re-route pinned by SummaryRewriteSpec's SQL-face test. */
  private val summaryRollup: Q = (s, d) => {
    graft.plans.SummaryRewrite.register(s, d, "lineitem",
      keys = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity", "l_extendedprice"))
    registerViews(s, d)
    s.sql(InfraQueries.oracle("infra_summary_rewrite"))
  }

  /** The DECORRELATED Q21 as portable SQL text — the second face the
    * sql_waiting_suppliers plan-gap note promises: the same result as
    * the literal EXISTS/NOT-EXISTS string, but with the correlation
    * already folded into ONE pass over the order-filtered fact
    * (per-order distinct-supplier counts gate each late line:
    * n_supp > 1 ∧ exactly-one-late-supplier ≡ "some other supplier
    * exists, no other supplier was late"). Row-per-late-line counting
    * preserved, so numwait matches the correlated form exactly; both
    * engines execute the identical text, and the bench shows what the
    * rewrite buys over the three-scan literal plan. */
  private val waitingSuppliersFastSql =
    """WITH lf AS (
  SELECT l.l_orderkey, l.l_suppkey,
    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), po AS (
  SELECT l_orderkey,
    count(DISTINCT l_suppkey) AS n_supp,
    count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lf GROUP BY l_orderkey
), waiters AS (
  SELECT lf.l_orderkey, lf.l_suppkey
  FROM lf JOIN po ON po.l_orderkey = lf.l_orderkey
  WHERE lf.is_late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
)
SELECT s.s_name, count(*) AS numwait
FROM waiters w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10"""
  private val waitingSuppliersFast: Q = (s, d) => {
    registerViews(s, d)
    s.sql(waitingSuppliersFastSql)
  }

  val queries: Map[String, Q] =
    pairs.map { case (n, src) => n -> fromSql(src) } +
      ("sql_summary_rollup" -> summaryRollup) +
      ("sql_waiting_suppliers_fast" -> waitingSuppliersFast)

  /** The oracle IS the executed SQL — shared verbatim. */
  val oracle: Map[String, String] =
    pairs.map { case (n, src) => n -> sourceOracle(src) } +
      ("sql_summary_rollup" -> InfraQueries.oracle("infra_summary_rewrite")) +
      ("sql_waiting_suppliers_fast" -> waitingSuppliersFastSql)
}
