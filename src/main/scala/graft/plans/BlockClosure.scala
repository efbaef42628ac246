package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** J2 — block-graph closure (SURVEY.md §2.3 J2).
  *
  * The reference DFSes from each PAGE block over Relationships edges to
  * collect the page's block set (extract_async_helper.py:25-46), holding
  * one document's blocks in memory (`:68`). We keep exactly that
  * contract with ONE shuffle: collect_list the document's blocks into an
  * array (map-side-combinable hash aggregate, no sort), then a single
  * flatMap runs the in-memory DFS per document. A document's block graph
  * is bounded (pages × lines × words), so per-group memory is bounded
  * regardless of corpus size; 100 TB scales by documents, not by graph
  * size.
  *
  * Two rejected alternatives, both measured slower: the round-2
  * groupByKey+flatMapGroups DFS pays a per-block-row typed decode plus a
  * grouping sort (18.7 s at sf0.1); an iterative frontier join (the
  * general unbounded-graph answer) stacks every level's lineage into the
  * next plan, and driver-side analysis over the growing tree dominates
  * (measured 78-185 s at sf0.1 — ApplyLimitAll / generateTreeString hot
  * in jstack, executors idle). The frontier join remains the right shape
  * only for graphs too deep/wide for per-doc memory, which Textract's
  * (depth ≤ 3) is not.
  */
object BlockClosure {

  /** (doc_id, page_id, block_id) — every block reachable from each PAGE
    * block, the page itself included. */
  def closure(spark: SparkSession, blocks: DataFrame): DataFrame = {
    import spark.implicits._
    blocks
      .groupBy("doc_id")
      .agg(collect_list(struct(col("id"), col("block_type"), col("rel_ids"))).as("bs"))
      .as[(Long, Seq[(String, String, Seq[String])])]
      .flatMap { case (doc, bs) =>
        val adj = new java.util.HashMap[String, Seq[String]](bs.size * 2)
        bs.foreach(b => adj.put(b._1, b._3))
        bs.iterator.filter(_._2 == "PAGE").flatMap { pg =>
          val seen = mutable.LinkedHashSet[String]()
          val stack = mutable.ArrayDeque[String](pg._1)
          while (stack.nonEmpty) {
            val cur = stack.removeLast()
            if (seen.add(cur))
              adj.getOrDefault(cur, Nil).foreach(stack.append(_))
          }
          seen.iterator.map(id => (doc, pg._1, id))
        }
      }
      .toDF("doc_id", "page_id", "block_id")
  }
}
