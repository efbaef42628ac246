package graft.queries

import graft.etl.{Corpus, Extractors => Ex, Refine}
import graft.oracle.OracleCorpus._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL-parity queries: every dataflow operator from SURVEY.md §2 that the
  * reference performs, exercised over the deterministic Corpus and
  * hash-verified against the DuckDB oracle.
  */
object EtlQueries {
  type Q = (SparkSession, String) => DataFrame

  /** O1 router truth table (workflow_orchestator.py:61-71). */
  private val route: Q = (s, d) =>
    Corpus.requests(s, d)
      .groupBy("document_type", "route")
      .agg(count("*").as("n"))
      .orderBy("document_type")
  private val routeSql =
    s"""$ReqCte SELECT document_type, route, count(*) AS n
FROM req GROUP BY document_type, route ORDER BY document_type"""

  /** U1 polizas extraction + C1 refine_dates post-processing
    * (bed_rock_transformer_document.py:42-60; workflow_polizas.py:68-71). */
  private val polizaExtract: Q = (s, d) => {
    val reqs = Corpus.requests(s, d).filter(col("route") === "polizas")
    Ex.extractPoliza(reqs, "body")
      .select("record_id", "policy_number", "policy_name",
        "policy_start_date", "policy_end_date")
      .orderBy("record_id")
  }
  private val polizaExtractSql =
    s"""$ReqCte SELECT record_id,
  ${rxSql("body", Ex.PolicyNumberRx)} AS policy_number,
  rtrim(${rxSql("body", Ex.PolicyNameRx)}) AS policy_name,
  ${refineDatesSql(rxSql("body", Ex.PolicyStartRx))} AS policy_start_date,
  ${refineDatesSql(rxSql("body", Ex.PolicyEndRx))} AS policy_end_date
FROM req WHERE route = 'polizas' ORDER BY record_id"""

  /** U3 tasaciones extraction + money parse (SURVEY.md §1.2). */
  private val tasacionExtract: Q = (s, d) => {
    val reqs = Corpus.requests(s, d).filter(col("route") === "tasaciones")
    Ex.extractTasacion(reqs, "body")
      .withColumn("commercial_value_pen",
        Ex.moneyToDecimal(col("commercial_value")).cast("double"))
      .select("record_id", "expert_warranty_name", "tasacion_date",
        "commercial_value", "realization_value", "tasacion_owner",
        "commercial_value_pen")
      .orderBy("record_id")
  }
  private val tasacionExtractSql =
    s"""$ReqCte SELECT record_id,
  rtrim(${rxSql("body", Ex.ExpertNameRx)}) AS expert_warranty_name,
  ${refineDatesSql(rxSql("body", Ex.TasacionDateRx))} AS tasacion_date,
  ${rxSql("body", Ex.CommercialValueRx)} AS commercial_value,
  ${rxSql("body", Ex.RealizationValueRx)} AS realization_value,
  rtrim(${rxSql("body", Ex.OwnerRx)}) AS tasacion_owner,
  CAST(CAST(replace(${rxSql("body", Ex.CommercialValueRx)}, ',', '') AS DECIMAL(18,2)) AS DOUBLE) AS commercial_value_pen
FROM req WHERE route = 'tasaciones' ORDER BY record_id"""

  /** F2/F3 page fan-out + U2 per-page extraction
    * (textract_extractor_document.py:46-56; workflow_service.py:46-62). */
  private val inscripcionFanout: Q = (s, d) => {
    val reqs = Corpus.requests(s, d).filter(col("route") === "inscripciones")
    val pages = reqs.select(
      col("record_id"), col("parent_id"), col("period_year"),
      posexplode(col("pages")).as(Seq("page_idx", "page_text")))
      .withColumn("page_no", (col("page_idx") + 1).cast("int"))
    Ex.extractInscripcion(pages, "page_text")
      .select("record_id", "parent_id", "period_year", "page_no",
        "inscription_number", "legal_name", "inscription_date")
      .orderBy("record_id", "page_no")
  }
  private val inscripcionFanoutSql =
    s"""$ReqCte SELECT record_id, parent_id, period_year,
  CAST(generate_subscripts(pages, 1) AS INT) AS page_no,
  ${rxSql("unnest(pages)", Ex.InscriptionNumberRx)} AS inscription_number,
  rtrim(${rxSql("unnest(pages)", Ex.LegalNameRx)}) AS legal_name,
  ${refineDatesSql(rxSql("unnest(pages)", Ex.InscriptionDateRx))} AS inscription_date
FROM req WHERE route = 'inscripciones' ORDER BY record_id, page_no"""

  /** P1/P2 listing filter + key parse (s3_poller_document.py:14-55) and
    * C2/C3 refine_month / refine_year. Synthesizes a listing with dir
    * markers and non-pdf entries so the extension filter is exercised. */
  private val keyParse: Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
    val listing = reqs.select(col("record_id"),
      explode(array(
        col("key"),
        concat(regexp_extract(col("key"), "^(.*/)", 1)),          // dir marker
        regexp_replace(col("key"), "\\.pdf$", ".txt")              // wrong ext
      )).as("path"))
    // P1 filter. Semantically !endsWith("/") && lower(_).endsWith(".pdf"),
    // but expressed as a single rlike: Spark 4.1.2's first evaluation of
    // the StringEndsWith pair stalled ~90-230s (one-time codegen/init cost,
    // VERDICT r1 §wrong-4); the anchored regex compiles instantly and a
    // path matching "\.pdf$" can never end in "/".
    listing
      .filter(col("path").rlike("(?i)\\.pdf$"))
      .select(col("record_id"), col("path"),
        Refine.keyFolder(col("path")).as("folder"),
        Refine.keyFile(col("path")).as("file"),
        Refine.keyPeriodMonth(col("path")).as("period_month"),
        Refine.keyPeriodYear(col("path")).as("period_year"))
      .orderBy("record_id")
  }
  private val keyParseSql = {
    val folder = "nullif(regexp_extract(path, '^(?:.*/)?([^/]+)/[^/]+$', 1), '')"
    val file = "nullif(regexp_extract(path, '([^/]+)$', 1), '')"
    val mon = "nullif(regexp_extract(path, '([A-Za-zÁÉÍÓÚáéíóúñÑ]+) (\\d{4})/[^/]+$', 1), '')"
    val yr = "nullif(regexp_extract(path, '([A-Za-zÁÉÍÓÚáéíóúñÑ]+) (\\d{4})/[^/]+$', 2), '')"
    s"""$ReqCte, listing AS (
  SELECT record_id, unnest([
    key,
    regexp_extract(key, '^(.*/)', 1),
    regexp_replace(key, '\\.pdf$$', '.txt')]) AS path
  FROM req
)
SELECT record_id, path, $folder AS folder, $file AS file,
  ${monthCase(mon)} AS period_month,
  CASE WHEN trim($yr) SIMILAR TO '[0-9]{4}' THEN trim($yr) END AS period_year
FROM listing
WHERE NOT ends_with(path, '/') AND ends_with(lower(path), '.pdf')
ORDER BY record_id"""
  }

  /** P6: the reference truncates re-assembled documents to the first 20
    * pages (textract_extractor_document.py:59-60). */
  val PageTruncateDefault = 20

  /** A2/A3/P6: order-pinned line→page→document text reassembly with
    * first-N truncation (extract_async_helper.py:49-58,
    * textract_extractor_document.py:59-60). Round-trips pages through
    * line-level explode to prove order stability under shuffle.
    *
    * `truncN` defaults to the reference's 20; the REGISTERED query pins
    * it to 2 so truncation is observable on the ≤3-page testdata (with
    * N=20 every testdata doc passes through un-truncated and the oracle
    * could not tell truncation from a no-op — PageAggSpec covers the
    * default). */
  def pageAggTrunc(truncN: Int = PageTruncateDefault): Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
    val pages = reqs.select(col("record_id"),
      posexplode(col("pages")).as(Seq("page_idx", "page_text")))
    val lines = pages.select(col("record_id"), col("page_idx"),
      posexplode(split(col("page_text"), "\n")).as(Seq("line_idx", "line")))
    // A2: per-page text = "\n".join(lines in order) + line count
    val pageTexts = lines.groupBy("record_id", "page_idx").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("line_idx"), col("line")))),
        x => x.getField("line")), "\n").as("page_text"),
      count("*").as("lines_count"))
    // A3 + P6: full doc ("\n\n".join) and first-2-pages truncation
    pageTexts.groupBy("record_id").agg(
      count("*").cast("int").as("n_pages"),
      sum(col("lines_count")).as("n_lines"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("page_idx"), col("page_text")))),
        x => x.getField("page_text")), "\n\n")).as("full_md5"),
      md5(array_join(slice(transform(
        array_sort(collect_list(struct(col("page_idx"), col("page_text")))),
        x => x.getField("page_text")), 1, truncN), "\n\n")).as("first_pages_md5"))
      .orderBy("record_id")
  }
  private val pageAgg: Q = pageAggTrunc(2)
  private val pageAggSql =
    s"""$ReqCte, pg AS (
  SELECT record_id, generate_subscripts(pages, 1) - 1 AS page_idx,
         unnest(pages) AS page_text
  FROM req
), ln AS (
  SELECT record_id, page_idx,
         generate_subscripts(string_split(page_text, chr(10)), 1) - 1 AS line_idx,
         unnest(string_split(page_text, chr(10))) AS line
  FROM pg
), page_texts AS (
  SELECT record_id, page_idx,
         string_agg(line, chr(10) ORDER BY line_idx) AS page_text,
         count(*) AS lines_count
  FROM ln GROUP BY record_id, page_idx
)
SELECT record_id, CAST(count(*) AS INT) AS n_pages,
  CAST(sum(lines_count) AS BIGINT) AS n_lines,
  md5(string_agg(page_text, chr(10) || chr(10) ORDER BY page_idx)) AS full_md5,
  md5(string_agg(page_text, chr(10) || chr(10) ORDER BY page_idx) FILTER (WHERE page_idx < 2)) AS first_pages_md5
FROM page_texts GROUP BY record_id ORDER BY record_id"""

  /** J1+K2: GSI lookup join + metadata merge, last-writer-wins
    * (dynamo_loader_document.py:33-58). Key-value row representation so
    * the merge result is engine-comparable. */
  private val metadataMerge: Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
    // the Dynamo-analog dim: one item per record, pre-existing metadata
    val base = reqs.select(
      concat(lit("item-"), col("doc_id")).as("id"),
      col("record_id").as("supervisoryRecordId"),
      col("lang"), col("period_year"))
    val baseKv = base.select(col("id"), col("supervisoryRecordId"),
      explode(map(
        lit("lang"), col("lang"),
        lit("period_year"), col("period_year"),
        lit("status"), lit("ingested"))).as(Seq("mkey", "mvalue")))
    // updates from the tasaciones branch (J1: equi-join on record_id)
    val upd = Ex.extractTasacion(
      reqs.filter(col("route") === "tasaciones"), "body")
      .select(col("record_id"),
        explode(map(
          lit("document_type"), lit("tasaciones"),
          lit("tasacion_date"), col("tasacion_date"),
          lit("expert_warranty_name"), col("expert_warranty_name"),
          lit("status"), lit("loaded"))).as(Seq("mkey", "mvalue")))
    val bu = base.select("id", "supervisoryRecordId")
    val updKv = bu
      .join(upd, bu("supervisoryRecordId") === upd("record_id"), "inner")
      .select("id", "supervisoryRecordId", "mkey", "mvalue")
    // merge: update wins over base on the same key
    baseKv.select(col("id"), col("supervisoryRecordId"), col("mkey"),
      col("mvalue"), lit(0).as("pri"))
      .unionAll(updKv.withColumn("pri", lit(1)))
      .groupBy("id", "supervisoryRecordId", "mkey")
      .agg(max_by(col("mvalue"), col("pri")).as("mvalue"))
      .orderBy("id", "mkey")
  }
  private val metadataMergeSql =
    s"""$ReqCte, base AS (
  SELECT 'item-' || CAST(doc_id AS VARCHAR) AS id,
         record_id AS supervisoryRecordId, lang, period_year
  FROM req
), base_kv AS (
  SELECT id, supervisoryRecordId, kv.k AS mkey, kv.v AS mvalue, 0 AS pri
  FROM base, unnest([{'k': 'lang', 'v': lang},
                     {'k': 'period_year', 'v': period_year},
                     {'k': 'status', 'v': 'ingested'}]) AS t(kv)
), tas AS (
  SELECT record_id,
    ${refineDatesSql(rxSql("body", Ex.TasacionDateRx))} AS tasacion_date,
    rtrim(${rxSql("body", Ex.ExpertNameRx)}) AS expert_warranty_name
  FROM req WHERE route = 'tasaciones'
), upd_kv AS (
  SELECT b.id, b.supervisoryRecordId, kv.k AS mkey, kv.v AS mvalue, 1 AS pri
  FROM base b JOIN tas u ON b.supervisoryRecordId = u.record_id,
  unnest([{'k': 'document_type', 'v': 'tasaciones'},
          {'k': 'tasacion_date', 'v': u.tasacion_date},
          {'k': 'expert_warranty_name', 'v': u.expert_warranty_name},
          {'k': 'status', 'v': 'loaded'}]) AS t(kv)
)
SELECT id, supervisoryRecordId, mkey, max_by(mvalue, pri) AS mvalue
FROM (SELECT * FROM base_kv UNION ALL SELECT * FROM upd_kv)
GROUP BY id, supervisoryRecordId, mkey
ORDER BY id, mkey"""

  /** J1 — the GSI point-lookup's edge semantics
    * (dynamo_loader_document.py:36-41): the reference queries the
    * supervisory-record GSI with Limit=1 and takes Items[0], so
    * duplicate keys silently collapse to one item and a MISSING key
    * crashes the workflow. Here: dup keys collapse deterministically
    * (min(id) — the reference's "first item" depends on GSI order, so
    * we pin a total order; documented determinization) and missing keys
    * become quarantine rows instead of a crash (O6 error absorption,
    * SURVEY.md §2.3 J1). The dim gets injected duplicates (doc_id%5)
    * and the lookup set injected orphans (doc_id%9) so BOTH paths are
    * oracle-verified. */
  private val gsiLookup: Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
    val dim = reqs.select(
      concat(lit("item-"), col("doc_id")).as("id"),
      col("record_id").as("supervisoryRecordId"))
      .unionAll(reqs.filter(col("doc_id") % 5 === 0).select(
        concat(lit("item-dup-"), col("doc_id")).as("id"),
        col("record_id").as("supervisoryRecordId")))
    // Limit=1 determinized: one dim row per key, min(id) wins — a
    // map-side-combinable agg, not a window (no per-key sort at scale)
    val dim1 = dim.groupBy("supervisoryRecordId").agg(min("id").as("id"))
    val lookups = reqs.select(col("record_id"))
      .unionAll(reqs.filter(col("doc_id") % 9 === 0)
        .select(concat(lit("orphan-"), col("record_id")).as("record_id")))
    lookups.join(dim1,
        lookups("record_id") === dim1("supervisoryRecordId"), "left")
      .select(col("record_id"), col("id").as("resolved_id"),
        when(col("id").isNull, lit("missing_key")).otherwise(lit("ok")).as("status"))
      .orderBy("record_id")
  }
  private val gsiLookupSql =
    s"""$ReqCte, dim AS (
  SELECT 'item-' || CAST(doc_id AS VARCHAR) AS id,
         record_id AS supervisoryRecordId
  FROM req
  UNION ALL
  SELECT 'item-dup-' || CAST(doc_id AS VARCHAR), record_id
  FROM req WHERE doc_id % 5 = 0
), dim1 AS (
  SELECT supervisoryRecordId, min(id) AS id FROM dim GROUP BY supervisoryRecordId
), lookups AS (
  SELECT record_id FROM req
  UNION ALL
  SELECT 'orphan-' || record_id FROM req WHERE doc_id % 9 = 0
)
SELECT l.record_id, d.id AS resolved_id,
  CASE WHEN d.id IS NULL THEN 'missing_key' ELSE 'ok' END AS status
FROM lookups l LEFT JOIN dim1 d ON l.record_id = d.supervisoryRecordId
ORDER BY record_id"""

  /** K3 notifications with deterministic ids (C8 deviation: sha2 of the
    * business key instead of uuid4 — notification.py:5-29,
    * workflow_orchestator.py:147-164). */
  private val notifications: Q = (s, d) =>
    Corpus.requests(s, d).select(
      Refine.deterministicId(col("record_id"), col("parent_id"),
        col("session_id")).as("id"),
      col("session_id").as("sessionId"),
      lit("regulatory-compliance-prompts.insert-metadata").as("type"),
      col("record_id").as("recordId"),
      col("parent_id").as("parentId"))
      .orderBy("id")
  private val notificationsSql =
    s"""$ReqCte SELECT
  sha256(record_id || ':' || parent_id || ':' || session_id) AS id,
  session_id AS sessionId,
  'regulatory-compliance-prompts.insert-metadata' AS type,
  record_id AS recordId, parent_id AS parentId
FROM req ORDER BY id"""

  /** P3/O5/O6 success gating + quarantine: stage filters with failed rows
    * diverted to an error union (workflow_polizas.py:55-57,106-115). The
    * deterministic failure rule stands in for real stage errors. */
  private val successGate: Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
      .withColumn("extract_ok", col("n_chars") >= 200)
    val extracted = reqs.filter(col("extract_ok"))
      .withColumn("transform_ok", col("npages") < 3)
    val quarantineE = reqs.filter(!col("extract_ok"))
      .select(col("record_id"), lit("extract").as("stage_failed"))
    val quarantineT = extracted.filter(!col("transform_ok"))
      .select(col("record_id"), lit("transform").as("stage_failed"))
    val ok = extracted.filter(col("transform_ok"))
      .select(col("record_id"), lit(null).cast("string").as("stage_failed"))
    ok.unionAll(quarantineE).unionAll(quarantineT)
      .withColumn("succeeded", col("stage_failed").isNull)
      .orderBy("record_id")
  }
  private val successGateSql =
    s"""$ReqCte SELECT record_id,
  CASE WHEN NOT (n_chars >= 200) THEN 'extract'
       WHEN NOT (npages < 3) THEN 'transform' END AS stage_failed,
  (n_chars >= 200 AND npages < 3) AS succeeded
FROM req ORDER BY record_id"""

  val queries: Map[String, Q] = Map(
    "etl_route" -> route,
    "etl_poliza_extract" -> polizaExtract,
    "etl_tasacion_extract" -> tasacionExtract,
    "etl_inscripcion_fanout" -> inscripcionFanout,
    "etl_key_parse" -> keyParse,
    "etl_page_agg" -> pageAgg,
    "etl_metadata_merge" -> metadataMerge,
    "etl_gsi_lookup" -> gsiLookup,
    "etl_notifications" -> notifications,
    "etl_success_gate" -> successGate)

  val oracle: Map[String, String] = Map(
    "etl_route" -> routeSql,
    "etl_poliza_extract" -> polizaExtractSql,
    "etl_tasacion_extract" -> tasacionExtractSql,
    "etl_inscripcion_fanout" -> inscripcionFanoutSql,
    "etl_key_parse" -> keyParseSql,
    "etl_page_agg" -> pageAggSql,
    "etl_metadata_merge" -> metadataMergeSql,
    "etl_gsi_lookup" -> gsiLookupSql,
    "etl_notifications" -> notificationsSql,
    "etl_success_gate" -> successGateSql)
}
