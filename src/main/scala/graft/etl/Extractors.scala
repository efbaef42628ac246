package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic rule-based field extractors replacing the reference's
  * Bedrock structured-output calls (SURVEY.md §2.7 U1-U3). Same contract:
  * String -> typed nullable fields; a miss yields null, never an error.
  *
  * The keyword windows come from the reference prompts' own field
  * descriptions (bed_rock_transformer_document.py:46-53, 67-74, 88-98),
  * e.g. "policy number near the word 'póliza'".
  *
  * Every pattern is valid in BOTH Java regex (Spark codegen'd
  * regexp_extract) and RE2 (DuckDB oracle): no lookaround, no backrefs.
  */
object Extractors {

  private def rx(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 1), lit(""))

  // ---- U1: polizas (etl_polizas_state.py:6-10) ----
  val PolicyNumberRx   = "(?i)p[óo]liza[ \\t]*(?:n[°ºo]?[.]?)?[ \\t:]*([A-Z0-9][A-Z0-9/-]*)"
  val PolicyNameRx     = "(?i)contratante[ \\t:]+([A-ZÁÉÍÓÚÑ][A-Za-zÁÉÍÓÚáéíóúñÑ0-9 .&]{2,60})"
  val PolicyStartRx    = "(?i)desde[ \\t:el]*[ \\t](\\d{2}/\\d{2}/\\d{4})"
  val PolicyEndRx      = "(?i)hasta[ \\t:el]*[ \\t](\\d{2}/\\d{2}/\\d{4})"

  def policyNumber(text: Column): Column    = rx(text, PolicyNumberRx)
  def policyName(text: Column): Column      = rtrim(rx(text, PolicyNameRx))
  def policyStartDate(text: Column): Column = Refine.refineDates(rx(text, PolicyStartRx))
  def policyEndDate(text: Column): Column   = Refine.refineDates(rx(text, PolicyEndRx))

  /** Apply all four U1 fields; post-processing mirrors
    * workflow_polizas.py:68-71 (refine_dates over both dates). */
  def extractPoliza(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("policy_number", policyNumber(t))
      .withColumn("policy_name", policyName(t))
      .withColumn("policy_start_date", policyStartDate(t))
      .withColumn("policy_end_date", policyEndDate(t))
  }

  // ---- U2: inscripciones (etl_inscripciones_state.py:9-16), per page ----
  val InscriptionNumberRx = "(?i)partida[ \\t]*(?:n[°ºo]?[.]?)?[ \\t:]*(\\d+)"
  val LegalNameRx         = "(?i)acreedor hipotecario[ \\t:]+([A-ZÁÉÍÓÚÑ][A-Za-zÁÉÍÓÚáéíóúñÑ0-9 .&]{2,60})"
  val InscriptionDateRx   = "(?i)presentado el[ \\t:]*(\\d{2}/\\d{2}/\\d{4})"

  def inscriptionNumber(text: Column): Column = rx(text, InscriptionNumberRx)
  def legalName(text: Column): Column         = rtrim(rx(text, LegalNameRx))
  def inscriptionDate(text: Column): Column   = Refine.refineDates(rx(text, InscriptionDateRx))

  def extractInscripcion(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("inscription_number", inscriptionNumber(t))
      .withColumn("legal_name", legalName(t))
      .withColumn("inscription_date", inscriptionDate(t))
  }

  // ---- U3: tasaciones (etl_tasaciones_state.py:6-11) ----
  val ExpertNameRx  = "(?i)perito[A-Za-z ]*[:][ \\t]*([A-Za-zÁÉÍÓÚáéíóúñÑ. ]{2,60})"
  val TasacionDateRx = "(?i)fecha[A-Za-z ]*[:][ \\t]*(\\d{2}/\\d{2}/\\d{4})"
  val CommercialValueRx  = "(?i)valor comercial[^0-9]*([0-9][0-9,.]*[0-9])"
  val RealizationValueRx = "(?i)valor de realizaci[óo]n[^0-9]*([0-9][0-9,.]*[0-9])"
  val OwnerRx       = "(?i)propietari[oa][ \\t:]+([A-ZÁÉÍÓÚÑ][A-Za-zÁÉÍÓÚáéíóúñÑ0-9 .&]{2,60})"

  def expertWarrantyName(text: Column): Column = rtrim(rx(text, ExpertNameRx))
  def tasacionDate(text: Column): Column       = Refine.refineDates(rx(text, TasacionDateRx))
  def commercialValue(text: Column): Column    = rx(text, CommercialValueRx)
  def realizationValue(text: Column): Column   = rx(text, RealizationValueRx)
  def tasacionOwner(text: Column): Column      = rtrim(rx(text, OwnerRx))

  /** Post-processing mirrors workflow_tasaciones.py:70 (refine_dates). */
  def extractTasacion(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("expert_warranty_name", expertWarrantyName(t))
      .withColumn("tasacion_date", tasacionDate(t))
      .withColumn("commercial_value", commercialValue(t))
      .withColumn("realization_value", realizationValue(t))
      .withColumn("tasacion_owner", tasacionOwner(t))
  }

  /** Parse a money string like "150,000.00" to DECIMAL(18,2) (internal
    * representation per SURVEY.md §1.2; the edge keeps strings). */
  def moneyToDecimal(c: Column): Column =
    regexp_replace(c, ",", "").cast("decimal(18,2)")
}
