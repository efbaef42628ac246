package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function layer: the reference's workflow_service helpers and
  * per-record formatting ops, re-expressed as codegen'd Catalyst column
  * functions (SURVEY.md §2.6, C1-C8). No UDFs — every function here stays
  * inside whole-stage codegen.
  *
  * Reference semantics (file:line cites are into /root/reference):
  *  - refine_dates: src/application/services/workflow_service.py:8-14
  *  - refine_month: workflow_service.py:16-36
  *  - refine_year:  workflow_service.py:38-44
  *  - txt key:      src/application/workflows/workflow_polizas.py:85
  *  - stringify:    src/infrastructure/adapters/loaders/dynamo_loader_document.py:45-46
  *  - uuid per notification: workflow_orchestator.py:154 (we use a
  *    deterministic sha2 id instead — documented deviation, replayable)
  */
object Refine {

  /** C1: first `dd/MM/yyyy` substring, else null. The reference returns
    * None both for null/empty input and for no-match; Spark's
    * regexp_extract returns "" on no-match, so wrap in nullif. */
  val DateRegex = "\\b(\\d{2}/\\d{2}/\\d{4})\\b"
  def refineDates(c: Column): Column = nullif(regexp_extract(c, DateRegex, 1), lit(""))

  /** C2: Spanish month name (any case) -> "1".."12" as STRING.
    * Unknown names -> null (the reference's str(None)=="None" quirk is a
    * bug with zero call sites — SURVEY.md §2.6 C2 — we normalize to null). */
  val SpanishMonths: Seq[(String, String)] = Seq(
    "enero" -> "1", "febrero" -> "2", "marzo" -> "3", "abril" -> "4",
    "mayo" -> "5", "junio" -> "6", "julio" -> "7", "agosto" -> "8",
    "septiembre" -> "9", "octubre" -> "10", "noviembre" -> "11", "diciembre" -> "12")
  private val monthMap: Column =
    map(SpanishMonths.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
  def refineMonth(c: Column): Column = element_at(monthMap, lower(c))

  /** C3: keep iff trimmed value is exactly 4 digits, else null. */
  def refineYear(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("^[0-9]{4}$"), t)
  }

  /** C4: output S3-style key `txt/<record_id>.txt`; registrations get a
    * per-page suffix (fixing the reference's last-page-wins collision,
    * workflow_inscripciones.py:82-88 — SURVEY.md §7.4). */
  def txtKey(recordId: Column): Column =
    concat(lit("txt/"), recordId, lit(".txt"))
  def txtKeyPaged(recordId: Column, page: Column): Column =
    concat(lit("txt/"), recordId, lit("_p"), page, lit(".txt"))

  /** C8 replacement: deterministic id from the business key (replayable
    * under retries, unlike uuid4). */
  def deterministicId(cols: Column*): Column =
    sha2(concat_ws(":", cols: _*), 256)

  /** P2: parse an object key `Prefix/<Month> <Year>/<file>.pdf` into
    * (folder, file, period_month, period_year); null components on parse
    * failure, matching s3_poller_document.py:30-41. */
  def keyFolder(key: Column): Column =
    nullif(regexp_extract(key, "^(?:.*/)?([^/]+)/[^/]+$", 1), lit(""))
  def keyFile(key: Column): Column =
    nullif(regexp_extract(key, "([^/]+)$", 1), lit(""))
  def keyPeriodMonth(key: Column): Column =
    refineMonth(nullif(regexp_extract(key, "([A-Za-zÁÉÍÓÚáéíóúñÑ]+) (\\d{4})/[^/]+$", 1), lit("")))
  def keyPeriodYear(key: Column): Column =
    refineYear(nullif(regexp_extract(key, "([A-Za-zÁÉÍÓÚáéíóúñÑ]+) (\\d{4})/[^/]+$", 2), lit("")))
}
