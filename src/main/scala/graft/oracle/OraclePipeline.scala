package graft.oracle

/** DuckDB mirrors for the LLM-data-pipeline corpora (dedup/text). Every
  * fragment must match [[graft.pipeline.DupCorpus]] byte-for-byte — the
  * driver hash-compares outputs.
  */
object OraclePipeline {

  /** 60-bit shared hash: BIGINT of first 15 hex chars of md5. Mirror of
    * DuckDB h60 (Spark: conv(substr(md5(s),1,15),16,10)). */
  def h60Sql(expr: String): String =
    s"CAST('0x' || substring(md5($expr),1,15) AS BIGINT)"

  /** Mirror of [[graft.pipeline.DupCorpus.perm]] — same (a, b, P)
    * constants, injected from the single Scala source of truth. */
  def permSql(seed: Int, h: String): String = {
    val (a, b) = graft.pipeline.DupCorpus.permConsts(seed)
    s"($a * ($h % ${graft.pipeline.DupCorpus.PermP}) + $b) % ${graft.pipeline.DupCorpus.PermP}"
  }

  private val NearText =
    "array_to_string(list_slice(string_split(text, ' '), 7, len(string_split(text, ' '))), ' ')"

  /** `WITH dup AS (...)` — documents ∪ exact dups (+10000, doc_id%7=0)
    * ∪ near dups (+20000, doc_id%11=0, first 6 words dropped). */
  val DupCte: String =
    s"""WITH dbase AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
), dup AS (
  SELECT doc_id, text, lang, source, n_chars FROM dbase
  UNION ALL
  SELECT doc_id + 10000, text, lang, source, n_chars FROM dbase WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 20000, $NearText, lang, source,
    CAST(length($NearText) AS BIGINT)
  FROM dbase WHERE doc_id % 11 = 0
)"""

  /** Word 3-gram shingles of lower(text) — mirror of
    * DupCorpus/DedupQueries.shingleRows. Appended CTEs:
    * shingled(doc_id, shingles), shh(doc_id, h) DISTINCT shingles with
    * their h60 hash, skh = bottom-128 sketch rows (mirror of the Spark
    * side's slice(sort_array(...), 1, 128)), nsh = sketch sizes. */
  val ShingleCtes: String = {
    val toks = "string_split(lower(text), ' ')"
    s""", shingled AS (
  SELECT doc_id,
    CASE WHEN len($toks) < 3 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(1, len($toks) - 1),
                i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])
    END AS shingles
  FROM dup
), sh AS (
  SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shingled
), shh AS (
  SELECT doc_id, ${h60Sql("shingle")} AS h FROM sh
), skh AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
    FROM shh)
  WHERE rk <= 128
), nsh AS (
  SELECT doc_id, count(*) AS n FROM skh GROUP BY doc_id
)"""
  }
}
