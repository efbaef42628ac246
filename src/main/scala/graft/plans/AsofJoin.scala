package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A NATIVE as-of join operator — the full custom-operator stack the
  * composition form (`EventQueries.asofAgg`, union + carry-forward
  * window) deliberately avoids: a [[LogicalPlan]] node, a planner
  * [[SparkStrategy]] (injected by [[graft.functions.GraftExtensions]]),
  * and a [[SparkPlan]] whose per-partition merge is the textbook
  * single-pass algorithm. Each left row is matched to the LATEST right
  * row of the same key with right.time <= left.time, ties on equal
  * time broken toward the largest tie-break column value — exactly the
  * max-(ts, event_id) semantics of the composition form, so the two
  * share one oracle.
  *
  * Why a physical operator earns its keep at 100 TB: the declared
  * requirements hand Catalyst the SAME co-partitioned, co-sorted
  * regime a sort-merge join gets — one hash exchange per side, one
  * sort per side — and the merge itself holds ONE remembered row of
  * state, streams both inputs exactly once, and ships no carried
  * payload through a window frame. The composition form pays the same
  * single shuffle but unions both sides into one relation first: every
  * CLICK row travels with widened purchase-shaped columns and the
  * window must evaluate over the union. Here each side keeps its own
  * schema until the final projection.
  *
  * Contract (checked by the builder): equi-key and time columns are
  * 8-byte-backed (long / timestamp-micros) and non-null — the merge
  * compares raw longs; the generic-ordering variant is a mechanical
  * extension. Left rows with no eligible right row are dropped (inner
  * as-of). */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Same regime as a sort-merge join: both sides hash-clustered on
    * the key (EnsureRequirements makes the two exchanges compatible)
    * and sorted (key, time) — the right additionally by the tie-break
    * so "latest" is the last row the merge pointer passes. */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(Seq(lKeyOrd, lTimeOrd, rKeyOrd, rTimeOrd).forall(_ >= 0),
      "as-of columns must be direct child outputs")
    val attrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(attrs, attrs)
      val joined = new JoinedRow
      // one-row lookahead over the right side + the single remembered
      // best-so-far match; both sides stream exactly once
      var curRight: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIter.flatMap { lRow =>
        val lKey = lRow.getLong(lKeyOrd)
        val lTime = lRow.getLong(lTimeOrd)
        var continue = curRight != null
        while (continue) {
          val rKey = curRight.getLong(rKeyOrd)
          if (rKey < lKey ||
              (rKey == lKey && curRight.getLong(rTimeOrd) <= lTime)) {
            if (rKey == lKey) {
              // sort iterators reuse row buffers; the remembered match
              // outlives this step, so it must be copied
              lastMatch = curRight.copy()
              lastMatchKey = rKey
            }
            curRight = if (rIter.hasNext) rIter.next() else null
            continue = curRight != null
          } else continue = false
        }
        if (lastMatch != null && lastMatchKey == lKey)
          Iterator.single(proj(joined(lRow, lastMatch)))
        else Iterator.empty
      }
    }
  }
}

object AsofJoin {
  /** As-of join `left` to the latest `right` row per `key` with
    * right.`time` <= left.`time` (ties toward max `tie`). Column names
    * must be unambiguous across the two sides apart from the join
    * inputs themselves — alias the right side's columns. */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           key: String, time: String, rightKey: String, rightTime: String,
           rightTie: String): DataFrame = {
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"as-of column $n not found in ${p.output.map(_.name)}"))
    GraftDatasetBridge.ofRows(leftDf.sparkSession,
      AsofJoinPlan(lp, rp, attr(lp, key), attr(rp, rightKey),
        attr(lp, time), attr(rp, rightTime), attr(rp, rightTie)))
  }
}
