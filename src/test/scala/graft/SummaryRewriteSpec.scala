package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.SummaryRewrite

/** Pins the materialized-summary optimizer rule: matching aggregates
  * really re-route to the summary scan (not just produce right values),
  * non-derivable aggregates are left untouched, and the rewrite is
  * value-invisible including through key filters and coarser regroups. */
class SummaryRewriteSpec extends SparkSpec {
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.map(_.toString)

  private def registered(): Unit =
    SummaryRewrite.register(spark, Sf, "lineitem",
      keys = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity", "l_extendedprice"))

  private def rollup(): DataFrame =
    Tables.raw(spark, Sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,6)")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"))
      .orderBy("l_returnflag")

  test("matching rollup scans the summary, not the base table") {
    SummaryRewrite.clear()
    val direct = rollup().collect()
    assert(scanPaths(rollup()).exists(_.contains("lineitem.parquet")))

    registered()
    val paths = scanPaths(rollup())
    assert(!paths.exists(_.contains("lineitem.parquet")),
      s"base scan must be rewritten away, got $paths")
    assert(paths.exists(_.contains("/mv-lineitem-")),
      s"summary scan expected, got $paths")
    // value-invisible, including the coarser regroup (summary is keyed
    // by (returnflag, linestatus); the query groups by returnflag only)
    assert(rollup().collect() === direct)
  }

  test("filter on a summary key commutes through the rewrite") {
    registered()
    val q = Tables.raw(spark, Sf, "lineitem")
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
    assert(!scanPaths(q).exists(_.contains("lineitem.parquet")))
    SummaryRewrite.clear()
    assert(q.collect() === q.collect()) // stable
    val direct = Tables.raw(spark, Sf, "lineitem")
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"))
      .orderBy("l_returnflag").collect()
    registered()
    assert(q.collect() === direct)
  }

  test("SQL-face aggregate (inline round/cast over sum) re-routes too") {
    registered()
    val q = graft.queries.SqlQueries.queries("sql_summary_rollup")(spark, Sf)
    val paths = scanPaths(q)
    assert(!paths.exists(_.contains("lineitem.parquet")),
      s"SQL-parsed aggregate must re-route, got $paths")
    assert(paths.exists(_.contains("/mv-lineitem-")))
    // value-parity with the DataFrame face, which the oracle hash-pins
    val df = graft.queries.InfraQueries
      .queries("infra_summary_rewrite")(spark, Sf).collect()
    assert(q.collect() === df)
  }

  test("non-derivable aggregates bail: avg and non-key filters keep the base scan") {
    registered()
    val avgQ = Tables.raw(spark, Sf, "lineitem")
      .groupBy("l_returnflag").agg(avg("l_quantity").as("a"))
    assert(scanPaths(avgQ).exists(_.contains("lineitem.parquet")),
      "avg is not pre-aggregated; the rule must leave the plan alone")
    val measureFilter = Tables.raw(spark, Sf, "lineitem")
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(scanPaths(measureFilter).exists(_.contains("lineitem.parquet")),
      "a filter on a measure column does not commute with pre-aggregation")
    val otherSum = Tables.raw(spark, Sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(col("l_discount").cast("decimal(18,6)")).as("s"))
    assert(scanPaths(otherSum).exists(_.contains("lineitem.parquet")),
      "sums over unregistered measures must not be rewritten")
  }
}
