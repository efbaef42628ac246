package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global order statistics — the shared primitive
  * behind every "rank the whole relation" query in the repo, extracted
  * from the four hand-rolled sites (pareto's user rank, surprisal's
  * vocabulary rank, the AUC prefix sum, peak-concurrency's sweep) so
  * no query ever falls back to a single-task global sort again.
  *
  * The house two-phase pattern:
  *
  *  1. `repartitionByRange` on the rank order — ranges are
  *     non-overlapping and emitted in partition order, so every row in
  *     partition i precedes every row in partition i+1;
  *  2. `row_number` WITHIN each partition (a per-partition sort, all
  *     32 tasks working);
  *  3. shift each partition's local ranks by the total row count of
  *     all earlier partitions. The offset relation is ONE row per
  *     partition (constant-size, never data-sized), so its
  *     cumulative-sum window runs over ≤`parts` rows and its
  *     single-partition `WindowExec` is the one shape the plan-hygiene
  *     ban explicitly whitelists (child aggregates on
  *     `spark_partition_id`).
  *
  * The sort columns must form a total order (tie-break on a unique
  * key) for ranks to be deterministic regardless of where the range
  * boundaries land. NTILE is then pure arithmetic on (rank, total):
  * with N rows and n buckets, q = N div n and r = N mod n, the first
  * r buckets take q+1 rows — `Window.ntile`'s exact floor/ceil split —
  * so the derived bands hash-match an oracle `NTILE(n) OVER (ORDER BY
  * …)` while never sorting the relation on one task.
  */
object GlobalRank {

  /** `df` plus a 1-based exact global `row_number` over `sortCols`
    * (which must totally order the rows), named `out` — computed with
    * the two-phase range-partition pattern above; no single-task sort
    * of the data-sized relation anywhere in the plan. */
  def withRank(df: DataFrame, sortCols: Seq[Column], out: String,
      parts: Int = 32): DataFrame =
    rankedWithN(df, sortCols, out, parts).drop("__n")

  /** The rank plus a `__n` total-count column (carried on the
    * broadcast offset relation, not via a second scan) — the internal
    * form [[withNtile]] derives its band arithmetic from. */
  private def rankedWithN(df: DataFrame, sortCols: Seq[Column], out: String,
      parts: Int): DataFrame = {
    val parted = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wP = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val local = parted.withColumn("__rn", row_number().over(wP).cast("long"))
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__pc"))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // __n (the relation's total row count) rides along on the same
    // ≤`parts`-row offset relation — a full-frame window over the
    // per-partition counts, so rank consumers (ntile) get N without a
    // second scan of `df`.
    val wTot = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = counts.select(col("__pid"),
      coalesce(sum("__pc").over(wOff), lit(0L)).as("__off"),
      sum("__pc").over(wTot).as("__n"))
    local.join(broadcast(offs), "__pid")
      .withColumn(out, col("__rn") + col("__off"))
      .drop("__pid", "__rn", "__off")
  }

  /** `df` plus an exact `NTILE(n) OVER (ORDER BY sortCols)` column
    * named `out` (IntegerType, matching `Window.ntile`), derived
    * arithmetically from the distributed global rank — identical band
    * boundaries to the single-task window form, without the
    * single-task sort. `sortCols` must totally order the rows. */
  def withNtile(df: DataFrame, n: Int, sortCols: Seq[Column], out: String,
      parts: Int = 32): DataFrame =
    rankedWithN(df, sortCols, "__i", parts)
      .withColumn(out, ntileExpr(n, col("__i"), col("__n")))
      .drop("__i", "__n")

  /** Per-group exact NTILE — ONE two-phase pass bands every group's
    * rows at once (the melt-then-band shape `events_rfm` uses for its
    * three metrics): range-partition on (group, sortCols), rank within
    * (partition, group), shift by the per-(partition, group) offsets.
    * The offset relation is one row per (partition, group) — `groupCol`
    * must therefore have BOUNDED cardinality (a vocabulary or metric
    * list, never data-sized ids) for the broadcast to stay constant.
    * Compared to one [[withNtile]] per group this references the input
    * twice TOTAL instead of twice per group — both plan size and
    * shuffle count stay flat as metrics are added. */
  def withNtilePerGroup(df: DataFrame, n: Int, groupCol: String,
      sortCols: Seq[Column], out: String, parts: Int = 32): DataFrame = {
    val parted = df.repartitionByRange(parts, col(groupCol) +: sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wP = Window.partitionBy("__pid", groupCol).orderBy(sortCols: _*)
    val local = parted.withColumn("__rn", row_number().over(wP).cast("long"))
    val counts = parted.groupBy("__pid", groupCol).agg(count(lit(1)).as("__pc"))
    val wOff = Window.partitionBy(groupCol).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(groupCol)
    val offs = counts.select(col("__pid"), col(groupCol),
      coalesce(sum("__pc").over(wOff), lit(0L)).as("__off"),
      sum("__pc").over(wTot).as("__n"))
    local.join(broadcast(offs), Seq("__pid", groupCol))
      .withColumn("__i", col("__rn") + col("__off"))
      .withColumn(out, ntileExpr(n, col("__i"), col("__n")))
      .drop("__pid", "__rn", "__off", "__i", "__n")
  }

  /** `NTILE(n)` as pure arithmetic on (global rank i, total N):
    * q = N div n, r = N mod n; ranks 1..r·(q+1) land in the first r
    * (size q+1) buckets, the rest split into size-q buckets — exactly
    * `Window.ntile`'s floor/ceil split. Integral long division of
    * non-negatives: a div b = (a - a mod b) / b — the numerator is
    * exactly divisible, so the double division is exact up to 2^53
    * rows (well past any real relation). The `greatest(q,1)` floor
    * only guards the divisor in the branch that is unreachable when
    * q = 0 (then cut = N, every rank ≤ cut). */
  private def ntileExpr(n: Int, i: Column, nTot: Column): Column = {
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val qi = idiv(nTot, lit(n.toLong))
    val r = nTot % n
    val cut = r * (qi + 1L)
    when(i <= cut, idiv(i - 1L, qi + 1L) + 1L)
      .otherwise(r + idiv(i - cut - 1L, greatest(qi, lit(1L))) + 1L)
      .cast("int")
  }
}
