package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The five classic TPC-H shapes that need a `partsupp` relation
  * (Q2 / Q9 / Q11 / Q16 / Q20), over a partsupp SYNTHESIZED
  * deterministically from part × supplier — the testdata ships no
  * partsupp table, so it is derived as a pure function of the keys,
  * identically in Scala and in the DuckDB oracle CTE (the same
  * derived-relation trick as `etl.Corpus` / `oracle.OracleCorpus`).
  *
  * Derivation (0-based keys, S = |supplier|):
  *   - each part gets 4 suppliers: ps_suppkey_i = (p_partkey +
  *     i·(S div 4 + 1)) mod S, i ∈ 0..3 — the +1 keeps the stride
  *     coprime-ish with S so the four keys are distinct at every
  *     testdata S (10/100/1000) and spread across the key space,
  *     the same *shape* as the public TPC-H dbgen scatter.
  *   - ps_availqty  = (p_partkey·17 + ps_suppkey·31)  mod 9999 + 1
  *   - ps_cost_cents = (p_partkey·131 + ps_suppkey·7919) mod 99901 + 100
  *   - ps_supplycost = ps_cost_cents / 100.0  (single IEEE division of
  *     an exact integer — both engines compute the identical double;
  *     money arithmetic that must survive a hash compare uses the
  *     integer cents column instead, see Q11).
  *
  * Scale posture: the derivation is a PROJECTION fan-out (×4 explode)
  * over the part scan plus one broadcast 1-row supplier count — no
  * shuffle to build it. At a real 100 TB install partsupp would be a
  * stored table; everything downstream treats it as one (the queries
  * only assume its schema, not its provenance). All five queries keep
  * the fact-side shuffles to the honest minimum: filtered part /
  * supplier / nation sides broadcast; Q9's only wide shuffle is
  * lineitem ⋈ orders on the order key; Q20's is the per-(part,supp)
  * quantity aggregate.
  */
object PartSuppQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Order-independent exact sum of a double expression. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(25,10)")).cast("double")

  /** Broadcast hint for SF-GROWING relations, size-gated — an
    * unconditional `broadcast()` on a slice that grows linearly with
    * the data would eventually OOM an executor at a real 100 TB
    * install (the round-6 watchlist finding). The gate sums the LEAF
    * scan sizes feeding the slice (linear in SF and grounded in actual
    * file bytes) rather than trusting `stats.sizeInBytes` of the
    * derived plan, whose default join estimate is the *product* of the
    * children — wildly inflated for the synthesized partsupp's
    * crossJoin — and hints only while those scans are comfortably
    * inside the session's autoBroadcastJoinThreshold (×4 headroom for
    * parquet→in-memory expansion and the partsupp fan-out). Past the
    * gate, no hint: join strategy falls to Catalyst statics + AQE's
    * runtime size check. `boundBy` supplies a semantically bounding
    * relation when the slice is provably no larger than it (e.g. a
    * distinct supplier-key set is bounded by supplier) but its own
    * lineage includes a fact-table scan that would spook the gate. */
  private def broadcastIfSmall(df: DataFrame, boundBy: Option[DataFrame] = None)
      : DataFrame = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val gauge = boundBy.getOrElse(df)
    val leafBytes: BigInt = gauge.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => BigInt(l.relation.sizeInBytes)
    }.sum
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 && leafBytes * 4 <= thr) broadcast(df) else df
  }
  private def ts(s: String): Column = expr(s"TIMESTAMP '$s 00:00:00'")

  /** Synthesized partsupp — see object doc for the derivation contract.
    * Mirrored byte-for-byte by [[psCte]] on the oracle side. */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    val sn = Tables.supplier(s, d).agg(count(lit(1)).as("n_supp"))
    Tables.part(s, d).select("p_partkey")
      .crossJoin(broadcast(sn)) // 1-row count → BroadcastNestedLoopJoin
      .select(col("p_partkey"), col("n_supp"),
        explode(array(lit(0), lit(1), lit(2), lit(3))).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") + col("i") * (expr("n_supp div 4") + lit(1))) %
          col("n_supp"))
      .withColumn("ps_cost_cents",
        (col("p_partkey") * 131 + col("ps_suppkey") * 7919) % 99901 + 100)
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        ((col("p_partkey") * 17 + col("ps_suppkey") * 31) % 9999 + 1)
          .cast("int").as("ps_availqty"),
        col("ps_cost_cents"),
        (col("ps_cost_cents") / lit(100.0)).as("ps_supplycost"))
  }

  /** DuckDB mirror of [[partsupp]] — prefixed to every oracle below. */
  private val psCte =
    """WITH sn AS (SELECT count(*) AS n_supp FROM supplier),
ps0 AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * (n_supp // 4 + 1)) % n_supp AS ps_suppkey
  FROM part, sn, (SELECT unnest([0,1,2,3]) AS i) g
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey*17 + ps_suppkey*31) % 9999 + 1 AS INT) AS ps_availqty,
         (ps_partkey*131 + ps_suppkey*7919) % 99901 + 100 AS ps_cost_cents,
         ((ps_partkey*131 + ps_suppkey*7919) % 99901 + 100) / 100.0 AS ps_supplycost
  FROM ps0
)"""

  /** EUROPE suppliers with their nation name (broadcastable dim). */
  private def regionSuppliers(s: SparkSession, d: String, r: String): DataFrame =
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === r)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))

  // --------------------------------------- min-cost supplier (Q2 shape)
  /** Minimum-cost supplier per mid-size ECONOMY part in EUROPE — the
    * correlated-scalar-subquery-on-min shape, decorrelated into a
    * per-part WINDOW min: partsupp joins the (broadcast) filtered part
    * and region-supplier dims once, the window computes min(cost) over
    * the ps_partkey partition, and the filter keeps the argmin rows —
    * ONE pass over partsupp, one shuffle (the window partition), where
    * the literal nested form re-scans partsupp per outer row. The
    * oracle keeps the correlated formulation, proving the rewrite.
    * Restricting the min to filtered parts first is semantics-
    * preserving because the subquery correlates on exactly ps_partkey.
    * The cost equality compares doubles both engines derived with the
    * identical single IEEE division — exact. */
  private val minCostSupplier: Q = (s, d) => {
    val prt = Tables.part(s, d)
      .filter(col("p_size").between(10, 20) && col("p_type") === "ECONOMY")
      .select("p_partkey", "p_brand")
    val sup = regionSuppliers(s, d, "EUROPE")
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val w = Window.partitionBy("ps_partkey")
    partsupp(s, d)
      .join(broadcastIfSmall(prt), col("ps_partkey") === col("p_partkey"))
      .join(broadcastIfSmall(sup), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min(col("ps_supplycost")).over(w))
      .filter(col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }
  private val minCostSupplierSql = psCte + """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
  AND ps_supplycost = (SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100"""

  // ------------------------------------------- profit rollup (Q9 shape)
  /** Profit (revenue − supply cost) by nation and order year over the
    * 'red%' part family. The only wide shuffle is lineitem ⋈ orders on
    * the order key; partsupp pre-filtered by the part predicate and
    * supplier⋈nation both broadcast, so the fact scans once and
    * shuffles once. Per-row profit is IEEE-identical in both engines
    * (products of identical doubles), then decimal-exact summed so
    * shuffle order can't move the total. */
  private val profitRollup: Q = (s, d) => {
    val ps = partsupp(s, d)
      .join(broadcastIfSmall(Tables.part(s, d)
        .filter(col("p_name").like("red%"))
        .select("p_partkey")), col("ps_partkey") === col("p_partkey"))
      .select("ps_partkey", "ps_suppkey", "ps_supplycost")
    val supNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(s, d)
      .join(broadcastIfSmall(ps), col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcastIfSmall(supNat), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")), 4).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }
  private val profitRollupSql = psCte + """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS DECIMAL(25,10))) AS DOUBLE), 4) AS profit
FROM lineitem
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC"""

  // ---------------------------------------- important stock (Q11 shape)
  /** Part stock concentrations held by EUROPE suppliers above 1/2000 of
    * the region total — the group-HAVING-scalar shape. The scalar gate
    * is the Q22 pattern: the total aggregates the (|parts|-bounded)
    * per-part stock relation and broadcasts back as one row, and the
    * compare `val·2000 > total` runs in pure BIGINT CENTS — supply
    * cost stays the exact integer ps_cost_cents through every multiply
    * and sum, so no decimal-precision-cap or rounding rule can move
    * the boundary between engines (max |val| ≈ 4·10⁹, |total| well
    * under 2⁶³ at any plausible scale). Display value converts to
    * currency by one exact-integer IEEE division at the end. */
  private val importantStock: Q = (s, d) => {
    val eu = regionSuppliers(s, d, "EUROPE").select("s_suppkey")
    val stock = partsupp(s, d)
      .join(broadcastIfSmall(eu), col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("val"))
    val tot = stock.agg(sum(col("val")).as("total"))
    stock.crossJoin(broadcast(tot)) // 1-row total → BNLJ
      .filter(col("val") * 2000 > col("total"))
      .select(col("ps_partkey"), (col("val") / lit(100.0)).as("stock_value"))
      .orderBy(col("stock_value").desc, col("ps_partkey"))
  }
  private val importantStockSql = psCte + """, stock AS (
  SELECT ps_partkey, CAST(sum(ps_cost_cents * ps_availqty) AS BIGINT) AS val
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY ps_partkey
), tot AS (SELECT CAST(sum(val) AS BIGINT) AS total FROM stock)
SELECT ps_partkey, val / 100.0 AS stock_value
FROM stock, tot
WHERE val * 2000 > total
ORDER BY stock_value DESC, ps_partkey"""

  // --------------------------------- parts/supplier counts (Q16 shape)
  /** Supplier counts per (brand, type, size) bucket excluding one brand,
    * one type family, and the negative-balance suppliers — the NOT-IN +
    * count-distinct shape. NOT IN compiles to a LEFT ANTI join against
    * the (distinct, null-free — s_suppkey is a key) exclusion set,
    * which broadcasts; the distinct count shuffles once on the 3-part
    * group key with partial aggregation. (TPC-H excludes suppliers by
    * a comment-text pattern; this supplier table has no comment column,
    * so the balance predicate stands in — same shape, declared
    * deviation.) */
  private val partsSupplierCnt: Q = (s, d) => {
    val excl = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val prt = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    partsupp(s, d)
      .join(broadcastIfSmall(prt), col("ps_partkey") === col("p_partkey"))
      .join(broadcastIfSmall(excl), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }
  private val partsSupplierCntSql = psCte + """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // ------------------------------------- promotion suppliers (Q20 shape)
  /** ASIA suppliers holding excess stock (availqty > half the 1997
    * shipped quantity) of 'red%' parts — the nested IN/EXISTS shape,
    * decorrelated bottom-up: the correlated quantity subquery becomes
    * ONE per-(part,supplier) aggregate over the date-sliced fact scan
    * (the only wide shuffle); the part-name IN prunes partsupp via a
    * broadcast join; the surviving (part,supplier) pairs collapse to
    * distinct supplier keys that drive a broadcast LEFT SEMI into the
    * region-filtered supplier dim. The inner join against the
    * aggregate reproduces TPC-H's NULL semantics (no shipments → NULL
    * comparison → excluded). The half compare is exact:
    * 2·availqty > Σqty in decimal, no 0.5 double. */
  private val promoSuppliers: Q = (s, d) => {
    val qty = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(25,10)")).as("sum_qty"))
    val redPs = partsupp(s, d)
      .join(broadcastIfSmall(Tables.part(s, d)
        .filter(col("p_name").like("red%"))
        .select("p_partkey")), col("ps_partkey") === col("p_partkey"))
      .select("ps_partkey", "ps_suppkey", "ps_availqty")
    val promo = qty
      .join(broadcastIfSmall(redPs), col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .filter(col("ps_availqty").cast("decimal(25,10)") * 2 > col("sum_qty"))
      .select("ps_suppkey").distinct()
    // promo's lineage includes the lineitem scan, but the relation is a
    // DISTINCT supplier-key set — provably no larger than supplier.
    regionSuppliers(s, d, "ASIA")
      .join(broadcastIfSmall(promo, Some(Tables.supplier(s, d))),
        col("s_suppkey") === col("ps_suppkey"),
        "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_name")
  }
  private val promoSuppliersSql = psCte + """, qty AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(25,10))) AS sum_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    JOIN qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    WHERE p_name LIKE 'red%' AND ps_availqty * 2 > sum_qty)
ORDER BY s_name"""

  val queries: Map[String, Q] = Map(
    "tpch_min_cost_supplier" -> minCostSupplier,
    "tpch_profit_rollup" -> profitRollup,
    "tpch_important_stock" -> importantStock,
    "tpch_parts_supplier_cnt" -> partsSupplierCnt,
    "tpch_promo_suppliers" -> promoSuppliers)

  val oracle: Map[String, String] = Map(
    "tpch_min_cost_supplier" -> minCostSupplierSql,
    "tpch_profit_rollup" -> profitRollupSql,
    "tpch_important_stock" -> importantStockSql,
    "tpch_parts_supplier_cnt" -> partsSupplierCntSql,
    "tpch_promo_suppliers" -> promoSuppliersSql)
}
