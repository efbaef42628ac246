package graft.pipeline

import graft.Tables
import graft.plans.BlockClosure
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesized Textract-style `blocks` table + the J2 closure query
  * (SURVEY.md §2.3 J2; ref extract_async_helper.py:25-46). The graph is
  * a pure function of doc_id so the DuckDB oracle reconstructs it
  * byte-for-byte:
  *
  *   PAGE d{doc}-p{p}           → CHILD: lines, key block
  *   LINE d{doc}-p{p}-l{l}      → CHILD: 2 words
  *   KEY_VALUE_SET ...-k        → VALUE: ...-v
  *   VALUE ...-v                → CHILD: ...-v-w1
  *
  * npages = doc_id % 3 + 1; lines per page = (doc_id + p) % 3 + 2.
  */
object BlockQueries {
  type Q = (SparkSession, String) => DataFrame

  private def s(c: Column): Column = c.cast("string")

  /** The blocks table: (doc_id, id, block_type, rel_ids). */
  def blocks(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") % 3 + 1).as("npages"))
    val pg = d.select(col("doc_id"), explode(sequence(lit(1), col("npages"))).as("p"))
      .withColumn("page_id", concat(lit("d"), s(col("doc_id")), lit("-p"), s(col("p"))))
      .withColumn("nl", (col("doc_id") + col("p")) % 3 + 2)
    val ln = pg.select(col("doc_id"), col("page_id"),
      explode(sequence(lit(1), col("nl"))).as("l"))
      .withColumn("line_id", concat(col("page_id"), lit("-l"), s(col("l"))))
    val pageBlocks = pg.select(col("doc_id"), col("page_id").as("id"),
      lit("PAGE").as("block_type"),
      concat(
        transform(sequence(lit(1), col("nl")),
          l => concat(col("page_id"), lit("-l"), s(l))),
        array(concat(col("page_id"), lit("-k")))).as("rel_ids"))
    val lineBlocks = ln.select(col("doc_id"), col("line_id").as("id"),
      lit("LINE").as("block_type"),
      array(concat(col("line_id"), lit("-w1")),
        concat(col("line_id"), lit("-w2"))).as("rel_ids"))
    val wordBlocks = ln.select(col("doc_id"),
      explode(array(concat(col("line_id"), lit("-w1")),
        concat(col("line_id"), lit("-w2")))).as("id"))
      .select(col("doc_id"), col("id"), lit("WORD").as("block_type"),
        array().cast("array<string>").as("rel_ids"))
    val keyBlocks = pg.select(col("doc_id"),
      concat(col("page_id"), lit("-k")).as("id"),
      lit("KEY_VALUE_SET").as("block_type"),
      array(concat(col("page_id"), lit("-v"))).as("rel_ids"))
    val valueBlocks = pg.select(col("doc_id"),
      concat(col("page_id"), lit("-v")).as("id"),
      lit("VALUE").as("block_type"),
      array(concat(col("page_id"), lit("-v-w1"))).as("rel_ids"))
    val valueWords = pg.select(col("doc_id"),
      concat(col("page_id"), lit("-v-w1")).as("id"),
      lit("WORD").as("block_type"),
      array().cast("array<string>").as("rel_ids"))
    pageBlocks.unionAll(lineBlocks).unionAll(wordBlocks)
      .unionAll(keyBlocks).unionAll(valueBlocks).unionAll(valueWords)
  }

  /** J2: per-page closure summary — block/line/word counts plus an
    * order-independent md5 over the sorted closure set, emitted in one
    * pass by the per-doc DFS (no join-back, blocks scanned once). */
  private val blockClosure: Q = (sp, d) =>
    BlockClosure.pageSummaries(sp, blocks(sp, d))
      .orderBy("doc_id", "page_id")

  private val blockClosureSql = {
    val pid = "'d' || CAST(doc_id AS VARCHAR) || '-p' || CAST(p AS VARCHAR)"
    val lid = s"$pid || '-l' || CAST(l AS VARCHAR)"
    s"""WITH d AS (
  SELECT doc_id, doc_id % 3 + 1 AS npages FROM documents
), pg AS (
  SELECT doc_id, unnest(range(1, npages + 1)) AS p FROM d
), ln AS (
  SELECT doc_id, p, unnest(range(1, (doc_id + p) % 3 + 3)) AS l FROM pg
), wd AS (
  SELECT doc_id, p, l, unnest([1, 2]) AS w FROM ln
), pid AS (
  SELECT doc_id, p, $pid AS page_id FROM pg
), nodes AS (
  SELECT doc_id, page_id AS id, 'PAGE' AS block_type FROM pid
  UNION ALL SELECT doc_id, $lid, 'LINE' FROM ln
  UNION ALL SELECT doc_id, $lid || '-w' || CAST(w AS VARCHAR), 'WORD' FROM wd
  UNION ALL SELECT doc_id, page_id || '-k', 'KEY_VALUE_SET' FROM pid
  UNION ALL SELECT doc_id, page_id || '-v', 'VALUE' FROM pid
  UNION ALL SELECT doc_id, page_id || '-v-w1', 'WORD' FROM pid
), edges AS (
  SELECT doc_id, $pid AS src, $lid AS dst FROM ln
  UNION ALL SELECT doc_id, page_id, page_id || '-k' FROM pid
  UNION ALL SELECT doc_id, $lid, $lid || '-w' || CAST(w AS VARCHAR) FROM wd
  UNION ALL SELECT doc_id, page_id || '-k', page_id || '-v' FROM pid
  UNION ALL SELECT doc_id, page_id || '-v', page_id || '-v-w1' FROM pid
), reach AS (
  WITH RECURSIVE r(doc_id, page_id, id) AS (
    SELECT doc_id, page_id, page_id FROM pid
    UNION
    SELECT r.doc_id, r.page_id, e.dst
    FROM r JOIN edges e ON e.doc_id = r.doc_id AND e.src = r.id
  )
  SELECT * FROM r
)
SELECT r.doc_id, r.page_id, count(*) AS n_blocks,
  CAST(count(*) FILTER (WHERE n.block_type = 'LINE') AS BIGINT) AS n_lines,
  CAST(count(*) FILTER (WHERE n.block_type = 'WORD') AS BIGINT) AS n_words,
  md5(string_agg(r.id, ',' ORDER BY r.id)) AS closure_md5
FROM reach r JOIN nodes n ON n.doc_id = r.doc_id AND n.id = r.id
GROUP BY r.doc_id, r.page_id
ORDER BY r.doc_id, r.page_id"""
  }

  val queries: Map[String, Q] = Map("etl_block_closure" -> blockClosure)
  val oracle: Map[String, String] = Map("etl_block_closure" -> blockClosureSql)
}
