package graft.queries

import graft.etl.{Corpus, Refine}
import graft.oracle.OracleCorpus._
import graft.streaming.StreamingEtl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-serialization operators (SURVEY.md §2.8 K1/K3, §2.6 C4/C5/C7):
  * the exact rows/bytes the reference's S3 text sink and SQS
  * notification sink would emit, as verifiable tables.
  */
object SinkQueries {
  type Q = (SparkSession, String) => DataFrame

  /** K1+C4+C5: the S3 text-sink rows — output key (per-page for
    * registrations, fixing the reference's last-page-wins collision,
    * workflow_inscripciones.py:82-88) plus UTF-8 byte length and md5 of
    * the body each put_object would carry (s3_loader_document.py:17-18). */
  private val textSink: Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
    val whole = reqs.filter(col("route") =!= "inscripciones")
      .select(col("record_id"), Refine.txtKey(col("record_id")).as("s3_key"),
        col("body").as("content"))
    val paged = reqs.filter(col("route") === "inscripciones")
      .select(col("record_id"),
        posexplode(col("pages")).as(Seq("page_idx", "content")))
      .select(col("record_id"),
        Refine.txtKeyPaged(col("record_id"), (col("page_idx") + 1).cast("int"))
          .as("s3_key"),
        col("content"))
    whole.unionAll(paged)
      .select(col("record_id"), col("s3_key"),
        length(encode(col("content"), "UTF-8")).as("byte_len"),
        md5(encode(col("content"), "UTF-8")).as("body_md5"))
      .orderBy("s3_key")
  }
  private val textSinkSql =
    s"""$ReqCte, whole AS (
  SELECT record_id, 'txt/' || record_id || '.txt' AS s3_key, body AS content
  FROM req WHERE route <> 'inscripciones'
), paged AS (
  SELECT record_id,
    'txt/' || record_id || '_p' || CAST(generate_subscripts(pages, 1) AS VARCHAR) || '.txt' AS s3_key,
    unnest(pages) AS content
  FROM req WHERE route = 'inscripciones'
), un AS (
  SELECT * FROM whole UNION ALL SELECT * FROM paged
)
SELECT record_id, s3_key, CAST(octet_length(encode(content)) AS INT) AS byte_len,
  md5(content) AS body_md5
FROM un ORDER BY s3_key"""

  /** K3+C7+C8: the serialized SQS message bodies — camelCase to_json of
    * {id, message:{sessionId, type, data:{recordId, parentId,
    * tasacionDate?}}} (sqs_notification.py:31, notification.py:5-29),
    * deterministic ids.
    *
    * C7 `exclude_none`: the reference's serialization DROPS null fields
    * (dynamo_loader_document.py:43, model_dump(exclude_none=True)).
    * Spark's to_json does the same by default
    * (spark.sql.jsonGenerator.ignoreNullFields=true) — exercised here by
    * `tasacionDate`, which is only present on the tasaciones route, so
    * ~2/3 of the bodies must omit the key entirely (not emit null). */
  private val notifyJson: Q = (s, d) =>
    Corpus.requests(s, d)
      .select(
        Refine.deterministicId(col("record_id"), col("parent_id"),
          col("session_id")).as("id"),
        col("session_id"), col("record_id"), col("parent_id"),
        when(col("route") === "tasaciones",
          Refine.refineDates(col("body"))).as("tasacion_date"))
      .select(col("id"), to_json(struct(
        col("id"),
        struct(
          col("session_id").as("sessionId"),
          lit("regulatory-compliance-prompts.insert-metadata").as("type"),
          struct(
            col("record_id").as("recordId"),
            col("parent_id").as("parentId"),
            col("tasacion_date").as("tasacionDate")).as("data")).as("message")))
        .as("body"))
      .orderBy("id")
  private val notifyJsonSql =
    s"""$ReqCte, n AS (
  SELECT sha256(record_id || ':' || parent_id || ':' || session_id) AS id,
    session_id, record_id, parent_id,
    CASE WHEN route = 'tasaciones'
         THEN ${refineDatesSql("body")} END AS tasacion_date
  FROM req
)
SELECT id,
  '{"id":"' || id || '","message":{"sessionId":"' || session_id
    || '","type":"regulatory-compliance-prompts.insert-metadata","data":{"recordId":"'
    || record_id || '","parentId":"' || parent_id || '"'
    || CASE WHEN tasacion_date IS NOT NULL
            THEN ',"tasacionDate":"' || tasacion_date || '"' ELSE '' END
    || '}}}' AS body
FROM n ORDER BY id"""

  /** S1 decode as a batch query: serialize each request to its Kafka
    * wire JSON, corrupt a deterministic subset (doc_id%13=0 truncated),
    * then from_json with the streaming schema — invalid rows surface as
    * valid=false quarantine rows (kafka_event_controller.py:66-72,
    * 121-124). */
  private val requestParse: Q = (s, d) => {
    val reqs = Corpus.requests(s, d)
    val wire = concat(
      lit("{\"recordId\":\""), col("record_id"),
      lit("\",\"parentId\":\""), col("parent_id"),
      lit("\",\"sessionId\":\""), col("session_id"),
      lit("\",\"documentType\":\""), col("document_type"),
      lit("\",\"key\":\""), col("key"), lit("\"}"))
    val withWire = reqs.select(col("doc_id"),
      when(col("doc_id") % 13 === 0, substring(wire, 1, 10)).otherwise(wire)
        .as("value"))
    val parsed = withWire.select(col("doc_id"),
      from_json(col("value"), StreamingEtl.requestSchema).as("r"))
    parsed.select(col("doc_id"),
      col("r.recordId").as("record_id"),
      col("r.documentType").as("document_type"),
      col("r.key"),
      col("r.recordId").isNotNull.as("valid"))
      .orderBy("doc_id")
  }
  private val requestParseSql =
    s"""$ReqCte, wire AS (
  SELECT doc_id,
    CASE WHEN doc_id % 13 = 0
      THEN substring('{"recordId":"' || record_id || '","parentId":"' || parent_id
        || '","sessionId":"' || session_id || '","documentType":"' || document_type
        || '","key":"' || key || '"}', 1, 10)
      ELSE '{"recordId":"' || record_id || '","parentId":"' || parent_id
        || '","sessionId":"' || session_id || '","documentType":"' || document_type
        || '","key":"' || key || '"}'
    END AS value
  FROM req
)
SELECT doc_id,
  CASE WHEN json_valid(value) THEN value->>'$$.recordId' END AS record_id,
  CASE WHEN json_valid(value) THEN value->>'$$.documentType' END AS document_type,
  CASE WHEN json_valid(value) THEN value->>'$$.key' END AS key,
  (CASE WHEN json_valid(value) THEN value->>'$$.recordId' END) IS NOT NULL AS valid
FROM wire ORDER BY doc_id"""

  val queries: Map[String, Q] = Map(
    "etl_text_sink" -> textSink,
    "etl_notify_json" -> notifyJson,
    "etl_request_parse" -> requestParse)

  val oracle: Map[String, String] = Map(
    "etl_text_sink" -> textSinkSql,
    "etl_notify_json" -> notifyJsonSql,
    "etl_request_parse" -> requestParseSql)
}
