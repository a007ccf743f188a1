package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.K — PII detection / redaction: the scrub pass every
  * training-data pipeline runs before text leaves curation. Spans are
  * found with anchored character-class regexes (codegen'd, single
  * projection pass — the operator is embarrassingly parallel and
  * scan-bound at 100 TB, exactly like the reference's name-cleaning
  * pass in src/services/externalData.ts:463-487 which strips
  * parenthesised/bracketed spans by regex).
  *
  * The synthetic corpus carries no real PII, so — like the fuzzy
  * suite's decorated names — each row is decorated with a
  * deterministic contact string derived from its key: an email local
  * part and a +65 phone number. The operator then detects and redacts
  * those spans; counts and the redacted text are oracle-checked
  * bit-for-bit. Patterns stay in the RE2 ∩ java.util.regex dialect
  * (character classes + bounded repetition, no lookaround) so Spark
  * and DuckDB agree.
  */
object PiiOps {

  private[operators] val EmailRe = "[A-Za-z0-9.]+@[A-Za-z0-9.]+"
  private[operators] val PhoneRe = "\\+[0-9]{2} [0-9]{7,8}"

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("c_name"), lit(" reach user"), col("c_custkey"),
      lit("@mail.example or call +65 9"),
      lpad((col("c_custkey") * 7919 % 10000000).cast("string"), 7, "0"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), raw.as("raw"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
  }

  /** §2.K q_pii_stats — the PII telemetry a pipeline reads BEFORE
    * paying for redaction (the preflight-family discipline applied to
    * the scrub pass): per nation, how many records carry each PII
    * kind, total spans, and the hit rate — the numbers that decide
    * whether a source needs the scrub at all and which kinds
    * dominate. Same decorated frame and the same RE2∩java patterns as
    * [[piiRedact]] (one copy of each constant), one scan + one keyed
    * aggregation; output bounded by |nations|.
    */
  def piiStats(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("c_name"), lit(" reach user"), col("c_custkey"),
      lit("@mail.example or call +65 9"),
      lpad((col("c_custkey") * 7919 % 10000000).cast("string"), 7, "0"))
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), raw.as("raw"))
      .select(col("c_nationkey"),
        size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).cast("long").as("ne"),
        size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0))).cast("long").as("np"))
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("ne") > 0, 1L).otherwise(0L)).as("n_with_email"),
        sum(when(col("np") > 0, 1L).otherwise(0L)).as("n_with_phone"),
        sum(col("ne") + col("np")).as("n_spans"),
        round(avg(when(col("ne") + col("np") > 0, 1.0).otherwise(0.0)), 6).as("pii_rate"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pii_redact" -> (piiRedact _),
    "q_pii_stats" -> (piiStats _))

  val oracle: Map[String, String] = Map(
    "q_pii_stats" ->
      s"""WITH d AS (
         |  SELECT c_nationkey,
         |         c_name || ' reach user' || CAST(c_custkey AS VARCHAR)
         |           || '@mail.example or call +65 9'
         |           || lpad(CAST(c_custkey * 7919 % 10000000 AS VARCHAR), 7, '0') AS raw
         |  FROM customer
         |), h AS (
         |  SELECT c_nationkey,
         |         len(regexp_extract_all(raw, '$EmailRe')) ne,
         |         len(regexp_extract_all(raw, '\\+[0-9]{2} [0-9]{7,8}')) np
         |  FROM d
         |)
         |SELECT c_nationkey,
         |  CAST(count(*) AS BIGINT) n_records,
         |  CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) n_with_email,
         |  CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) n_with_phone,
         |  CAST(sum(ne + np) AS BIGINT) n_spans,
         |  round(avg(CASE WHEN ne + np > 0 THEN 1.0 ELSE 0.0 END), 6)::DOUBLE pii_rate
         |FROM h GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_pii_redact" ->
      s"""WITH d AS (
         |  SELECT c_custkey,
         |         c_name || ' reach user' || CAST(c_custkey AS VARCHAR)
         |           || '@mail.example or call +65 9'
         |           || lpad(CAST(c_custkey * 7919 % 10000000 AS VARCHAR), 7, '0') AS raw
         |  FROM customer
         |)
         |SELECT c_custkey, raw,
         |  CAST(len(regexp_extract_all(raw, '$EmailRe')) AS BIGINT) n_emails,
         |  CAST(len(regexp_extract_all(raw, '\\+[0-9]{2} [0-9]{7,8}')) AS BIGINT) n_phones,
         |  regexp_replace(
         |    regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
         |    '\\+[0-9]{2} [0-9]{7,8}', '<PHONE>', 'g') redacted
         |FROM d ORDER BY c_custkey""".stripMargin)
}
