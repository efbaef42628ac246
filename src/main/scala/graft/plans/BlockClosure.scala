package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** One OCR block: a node in the per-document Textract block graph.
  * `rel_ids` carries both CHILD and VALUE edges (the reference follows
  * both — extract_async_helper.py:18-22,25-46). */
case class Block(doc_id: Long, id: String, block_type: String, rel_ids: Seq[String])

/** J2 — block-graph closure (SURVEY.md §2.3 J2).
  *
  * The reference DFSes from each PAGE block over Relationships edges to
  * collect the page's block set (extract_async_helper.py:25-46), holding
  * one document's blocks in memory (`:68`). We keep exactly that
  * contract: `groupByKey(doc_id)` + `flatMapGroups` — one shuffle to
  * co-locate a document, then an in-memory DFS per document. A document's
  * block graph is bounded (pages × lines × words), so per-group memory is
  * bounded regardless of corpus size; 100 TB scales by documents, not by
  * graph size. (A general unbounded-graph closure would instead use an
  * iterative frontier join — documented fallback, not needed for the
  * reference's data shape.)
  */
object BlockClosure {

  /** (doc_id, page_id, block_id) — every block reachable from each PAGE
    * block, the page itself included. */
  def closure(spark: SparkSession, blocks: DataFrame): DataFrame = {
    import spark.implicits._
    blocks.as[Block]
      .groupByKey(_.doc_id)
      .flatMapGroups { (doc: Long, it: Iterator[Block]) =>
        val bs = it.toVector
        val adj: Map[String, Seq[String]] = bs.map(b => b.id -> b.rel_ids).toMap
        bs.filter(_.block_type == "PAGE").iterator.flatMap { pg =>
          val seen = mutable.LinkedHashSet[String]()
          val stack = mutable.ArrayDeque[String](pg.id)
          while (stack.nonEmpty) {
            val cur = stack.removeLast()
            if (seen.add(cur))
              adj.getOrElse(cur, Nil).foreach(stack.append(_))
          }
          seen.iterator.map(id => (doc, pg.id, id))
        }
      }
      .toDF("doc_id", "page_id", "block_id")
  }
}
