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
  * flatMap runs the in-memory DFS per document AND emits the per-page
  * summary row directly — counts plus the md5 over the sorted closure
  * set are computed inside the same pass, so the blocks relation is
  * scanned exactly once and nothing is joined back. A document's block
  * graph is bounded (pages × lines × words), so per-group memory is
  * bounded regardless of corpus size; 100 TB scales by documents, not by
  * graph size.
  *
  * Three rejected alternatives, all measured slower at sf0.1: the
  * round-2 groupByKey+flatMapGroups DFS pays a per-block-row typed
  * decode plus a grouping sort (18.7 s); an iterative frontier join (the
  * general unbounded-graph answer) stacks every level's lineage into the
  * next plan and driver-side analysis dominates (78-185 s —
  * ApplyLimitAll / generateTreeString hot in jstack, executors idle);
  * and the round-3 shape that emitted (doc, page, block) rows and
  * re-joined the synthesized blocks relation for block_type paid the
  * whole union-synthesis twice plus a join and second aggregation
  * (13.0 s in-bench vs ~2.5 s for this single-pass form).
  */
object BlockClosure {

  /** Hex md5 of an ASCII string — byte-identical to Spark's and
    * DuckDB's md5() (ids here are pure ASCII, so UTF-8 == the bytes and
    * JVM string sort == UTF8 binary sort). */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Per-page closure summary: (doc_id, page_id, n_blocks, n_lines,
    * n_words, closure_md5) — every block reachable from each PAGE block,
    * the page itself included; closure_md5 = md5 of the sorted
    * comma-joined closure ids. */
  def pageSummaries(spark: SparkSession, blocks: DataFrame): DataFrame = {
    import spark.implicits._
    blocks
      .groupBy("doc_id")
      .agg(collect_list(struct(col("id"), col("block_type"), col("rel_ids"))).as("bs"))
      .as[(Long, Seq[(String, String, Seq[String])])]
      .flatMap { case (doc, bs) =>
        val adj = new java.util.HashMap[String, (String, Seq[String])](bs.size * 2)
        bs.foreach(b => adj.put(b._1, (b._2, b._3)))
        bs.iterator.filter(_._2 == "PAGE").map { pg =>
          val seen = mutable.LinkedHashSet[String]()
          val stack = mutable.ArrayDeque[String](pg._1)
          var lines = 0L; var words = 0L
          while (stack.nonEmpty) {
            val cur = stack.removeLast()
            if (seen.add(cur)) {
              val node = adj.get(cur)
              if (node ne null) {
                node._1 match {
                  case "LINE" => lines += 1
                  case "WORD" => words += 1
                  case _ => ()
                }
                node._2.foreach(stack.append(_))
              }
            }
          }
          (doc, pg._1, seen.size.toLong, lines, words,
            md5Hex(seen.toSeq.sorted.mkString(",")))
        }
      }
      .toDF("doc_id", "page_id", "n_blocks", "n_lines", "n_words", "closure_md5")
  }
}
