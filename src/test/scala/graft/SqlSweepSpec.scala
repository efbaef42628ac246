package graft

import graft.queries.SqlQueries
import graft.tools.SqlSweep

/** SQL-face coverage sweep (analyze-only — no jobs): every registered
  * oracle string is attempted through `spark.sql` against the temp-view
  * catalog. The DuckDB-only dialect (strftime, epoch_ms, string_split,
  * unnest-CTEs, list functions) is EXPECTED to fail analysis — the pin
  * is that the portable subset stays portable, and that everything
  * promoted to a registered `sql_*` query analyzes. Execution parity
  * for the promoted set is SqlFaceSpec's job (row-identical to the
  * DataFrame face) plus the driver's DuckDB hash compare, where the
  * same string runs in both engines.
  *
  * Measured at round 7 (session 3) via `runMain graft.tools.SqlSweep`:
  * 222 oracle strings attempted, 46 analyze AND execute row-identical
  * to their DataFrame faces, 0 DIFF, 0 EXEC_FAIL — every
  * Spark-analyzable oracle is also value-correct. 28 of the 46 carry a
  * registered `sql_*` face (the others are infra_* expectation queries
  * and tolerance-contract shapes, declared non-promotable in
  * [[SqlQueries.pairs]]'s doc). */
class SqlSweepSpec extends SparkSpec {

  private lazy val sweep = SqlSweep.classify(spark, Sf, execute = false)

  test("every promoted sql_* source analyzes through spark.sql") {
    val broken = SqlQueries.pairs.values.filter(sweep(_) != "ANALYZES")
    assert(broken.isEmpty, s"promoted sources no longer analyze: $broken")
  }

  test("portable-oracle coverage holds the measured floor") {
    val n = sweep.values.count(_ == "ANALYZES")
    info(s"sweep: ${sweep.size} oracle strings, $n analyze in Spark, " +
      s"${SqlQueries.pairs.size} promoted")
    assert(n >= 34, s"portable-oracle count regressed to $n (was 36)")
    // >50% of the analyzable set carries a registered SQL face
    assert(2 * SqlQueries.pairs.size >= n)
  }
}
