package graft

import graft.queries.{AnalyticsQueries, SqlQueries}

/** The SQL-string entry face must be the SAME engine surface as the
  * DataFrame face: identical rows (the two forms share one oracle
  * string, so any divergence is a planner/dialect bug, not a data
  * question) and the same plan hygiene (the optimizer must decorrelate
  * the EXISTS from SQL text exactly as the DataFrame form's explicit
  * semi-join — no cartesian, broadcasts intact). */
class SqlFaceSpec extends SparkSpec {

  private val pairs = SqlQueries.pairs.toSeq.sortBy(_._1)

  test("spark.sql face returns row-identical results to the DataFrame face") {
    pairs.foreach { case (sqlName, dfName) =>
      val viaSql = SqlQueries.queries(sqlName)(spark, Sf)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val viaDf = SqlQueries.sourceQuery(dfName)(spark, Sf)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(viaSql.toSeq === viaDf.toSeq, s"$sqlName diverges from $dfName")
    }
  }

  test("spark.sql face plans with the same hygiene as the DataFrame face") {
    pairs.foreach { case (sqlName, _) =>
      val plan = SqlQueries.queries(sqlName)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$sqlName: cartesian")
    }
    // the EXISTS in the SQL text must decorrelate to a semi join
    val existsPlan = SqlQueries.queries("sql_order_priority")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(existsPlan.contains("LeftSemi"),
      "EXISTS subquery must plan as a left-semi join")
  }
}
