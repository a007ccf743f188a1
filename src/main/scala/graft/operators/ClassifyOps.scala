package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** §2.D — keyword classification + per-row enrichment, from the
  * reference's src/data/merchants.ts:123-151 (detectCuisine) and
  * src/services/externalData.ts:426-461 (halal keyword flags with
  * negative-keyword override).
  *
  * The keyword table is a literal broadcast dimension; classification
  * is a broadcast theta-join on substring-contains, so the fact side
  * streams through untouched — the natural shape at 100 TB.
  */
object ClassifyOps {

  /** category → keywords, analogous to the reference's cuisineMap. */
  val keywordMap: Seq[(String, String)] = Seq(
    "engine" -> "spark", "engine" -> "query", "engine" -> "join", "engine" -> "scan",
    "data" -> "table", "data" -> "column", "data" -> "batch", "data" -> "stream",
    "perf" -> "fast", "perf" -> "slow", "perf" -> "merge")

  val positiveKw: Seq[String] = Seq("spark", "stream", "vector")
  val negativeKw: Seq[String] = Seq("slow", "error")

  /** merchants.ts:123-151 — multi-label classification: each document
    * gets every category one of whose keywords appears in the text.
    */
  def keywordClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kw = keywordMap.toDF("category", "kw")
    Tables.documents(spark, dir)
      .join(broadcast(kw), col("text").contains(col("kw")))
      .select(col("doc_id"), col("category"))
      .distinct()
  }

  /** externalData.ts:426-461 — positive keyword list with a negative
    * override: flag = any(positive) AND NOT any(negative).
    */
  def flagExclusion(spark: SparkSession, dir: String): DataFrame = {
    val pos = positiveKw.map(k => col("text").contains(k)).reduce(_ || _)
    val neg = negativeKw.map(k => col("text").contains(k)).reduce(_ || _)
    Tables.documents(spark, dir)
      .select(col("doc_id"), (pos && !neg).as("flagged"))
  }

  /** merchants.ts:88-119 + externalData.ts:489-540 — single-pass per-row
    * enrichment: counts, ratios, flags, all computed in one projection
    * (one scan, no shuffle).
    */
  def enrich(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        Text.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        Text.regexTokenCount(col("text")).cast("long").as("regex_tokens"),
        Text.approxLlmTokens(col("text")).cast("long").as("est_llm_tokens"),
        Text.punctRatio(col("text")).as("punct_ratio"),
        col("text").contains("spark").as("has_spark"),
        upper(col("source")).as("source_uc"))

  /** externalData.ts:124-186 estimateHoursFromCategory — rule-based
    * enrichment: category keyword → operating-hours profile, as a CASE
    * ladder over the market segment.
    */
  def hoursRules(spark: SparkSession, dir: String): DataFrame = {
    val seg = lower(col("c_mktsegment"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        when(seg.contains("food") || seg.contains("household"), 11)
          .when(seg.contains("machinery") || seg.contains("automobile"), 8)
          .otherwise(9).as("open_hour"),
        when(seg.contains("food") || seg.contains("household"), 22)
          .when(seg.contains("machinery") || seg.contains("automobile"), 17)
          .otherwise(18).as("close_hour"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_keyword_classify" -> (keywordClassify _),
    "q_flag_exclusion" -> (flagExclusion _),
    "q_enrich" -> (enrich _),
    "q_hours_rules" -> (hoursRules _))

  private def sqlValues: String =
    keywordMap.map { case (c, k) => s"('$c','$k')" }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_keyword_classify" ->
      s"""SELECT DISTINCT doc_id, category
         |FROM documents, (VALUES $sqlValues) kw(category, kw)
         |WHERE contains(text, kw)
         |ORDER BY doc_id, category""".stripMargin,
    "q_flag_exclusion" ->
      s"""SELECT doc_id,
         |  ((${positiveKw.map(k => s"contains(text,'$k')").mkString(" OR ")})
         |   AND NOT (${negativeKw.map(k => s"contains(text,'$k')").mkString(" OR ")})) AS flagged
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_enrich" ->
      """SELECT doc_id, lang, n_chars,
        |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_ ]')) AS regex_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_llm_tokens,
        |  round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
        |        / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
        |  contains(text, 'spark') AS has_spark,
        |  upper(source) AS source_uc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_hours_rules" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN contains(lower(c_mktsegment), 'food') OR contains(lower(c_mktsegment), 'household') THEN 11
        |       WHEN contains(lower(c_mktsegment), 'machinery') OR contains(lower(c_mktsegment), 'automobile') THEN 8
        |       ELSE 9 END AS open_hour,
        |  CASE WHEN contains(lower(c_mktsegment), 'food') OR contains(lower(c_mktsegment), 'household') THEN 22
        |       WHEN contains(lower(c_mktsegment), 'machinery') OR contains(lower(c_mktsegment), 'automobile') THEN 17
        |       ELSE 18 END AS close_hour
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
