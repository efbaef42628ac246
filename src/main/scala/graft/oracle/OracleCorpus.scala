package graft.oracle

import graft.etl.{Corpus, Refine}

/** DuckDB mirror of [[graft.etl.Corpus]]. Every literal here must match
  * the Spark-side corpus byte-for-byte: the driver hash-compares query
  * outputs, so the synthetic request rows have to be identical in both
  * engines.
  */
object OracleCorpus {

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** `WITH req AS (...)` prelude reproducing Corpus.requests. */
  val ReqCte: String = {
    val types = sqlList(Corpus.DocTypes)
    val months = sqlList(Corpus.MonthNames)
    s"""WITH req0 AS (
  SELECT doc_id, text, lang, source, n_chars,
    'rec-' || CAST(doc_id AS VARCHAR) AS record_id,
    'parent-' || CAST(doc_id % 50 AS VARCHAR) AS parent_id,
    'sess-' || CAST(doc_id % 10 AS VARCHAR) AS session_id,
    list_extract($types, CAST(doc_id % 6 + 1 AS INT)) AS document_type,
    list_extract($months, CAST(doc_id % 12 + 1 AS INT)) AS month_name,
    CAST(doc_id % 5 + 2020 AS VARCHAR) AS period_year,
    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd,
    lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
    CAST(doc_id % 3 + 1 AS INT) AS npages
  FROM documents
), req1 AS (
  SELECT *,
    CASE WHEN document_type = 'REGISTRATION' THEN 'inscripciones'
         WHEN document_type = 'APPRAISAL' THEN 'tasaciones'
         ELSE 'polizas' END AS route,
    dd || '/' || mm || '/' || period_year AS d1
  FROM req0
), req2 AS (
  SELECT *,
    (CASE WHEN route = 'inscripciones' THEN 'Inscripciones'
          WHEN route = 'tasaciones' THEN 'Tasaciones'
          ELSE 'Polizas' END)
      || '/' || month_name || ' ' || period_year || '/doc_'
      || CAST(doc_id AS VARCHAR) || '.pdf' AS key,
    ['Partida N° 9' || CAST(doc_id AS VARCHAR) || '1' || chr(10) || 'acreedor hipotecario: BANCO ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) || 'el titulo fue presentado el ' || d1 || chr(10) || chr(10) || substring(text, 1, 60),
     'Partida N° 9' || CAST(doc_id AS VARCHAR) || '2' || chr(10) || 'acreedor hipotecario: BANCO ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) || 'el titulo fue presentado el ' || d1 || chr(10) || chr(10) || substring(text, 61, 60),
     'Partida N° 9' || CAST(doc_id AS VARCHAR) || '3' || chr(10) || 'acreedor hipotecario: BANCO ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) || 'el titulo fue presentado el ' || d1 || chr(10) || chr(10) || substring(text, 121, 60)
    ] AS pages3
  FROM req1
), req AS (
  SELECT * EXCLUDE (pages3),
    list_slice(pages3, 1, npages) AS pages,
    CASE WHEN route = 'tasaciones' THEN
        'Perito evaluador: PERITO ' || CAST(doc_id AS VARCHAR)
        || chr(10) || 'Fecha de tasacion: ' || d1
        || chr(10) || 'Valor comercial (VC) S/. ' || CAST(doc_id * 1000 + 500 AS VARCHAR) || '.00'
        || chr(10) || 'Valor de realización (VR) S/. ' || CAST(doc_id * 800 + 400 AS VARCHAR) || '.00'
        || chr(10) || 'Propietario: OWNER ' || CAST(doc_id AS VARCHAR)
        || chr(10) || chr(10) || text
      WHEN route = 'inscripciones' THEN
        array_to_string(list_slice(pages3, 1, npages), chr(10) || chr(10))
      ELSE
        'Poliza N° POL-' || CAST(doc_id AS VARCHAR)
        || chr(10) || 'Contratante: CLIENTE ' || CAST(doc_id AS VARCHAR) || ' S.A.'
        || chr(10) || 'Vigencia desde ' || d1 || ' hasta 28/' || mm || '/' || period_year
        || chr(10) || chr(10) || text
    END AS body
  FROM req2
)"""
  }

  /** SQL CASE mapping Spanish month names to "1".."12" (Refine.refineMonth). */
  def monthCase(expr: String): String =
    "CASE lower(" + expr + ") " +
      Refine.SpanishMonths.map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ") +
      " END"

  /** SQL mirror of Refine.refineDates. */
  def refineDatesSql(expr: String): String =
    s"nullif(regexp_extract($expr, '${Refine.DateRegex}', 1), '')"

  /** SQL mirror of Extractors' rx helper. */
  def rxSql(expr: String, pattern: String): String =
    s"nullif(regexp_extract($expr, '$pattern', 1), '')"
}
