package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.A — search / filter / sort, from the reference's
  * src/utils/merchantUtils.ts.
  *
  * Each query is a single declarative plan: the multi-field predicate
  * and projections reach the parquet scan (column pruning + pushdown),
  * and sorts are total orders with unique-key tie-breaks so results
  * are deterministic sets.
  */
object SearchOps {

  /** merchantUtils.ts:64-116 — case-insensitive substring search across
    * several fields at once (name/postal/address/type/cuisine →
    * p_name/p_brand/p_type here).
    */
  def searchMultifield(spark: SparkSession, dir: String): DataFrame = {
    val term = "small"
    Tables.part(spark, dir)
      .filter(
        lower(col("p_name")).contains(term) ||
        lower(col("p_brand")).contains(term) ||
        lower(col("p_type")).contains(term))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy("p_partkey")
  }

  /** merchantUtils.ts:24-31 — numeric-code extraction from free text
    * (the postal-code regex), here the priority digit of
    * o_orderpriority, aggregated.
    */
  def codeExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).as("code"))
      .groupBy("code")
      .agg(count(lit(1)).as("n"))
      .orderBy("code")

  /** merchantUtils.ts:151-173 — category + boolean filter combo. */
  def filterCategory(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" && col("l_quantity") >= 25)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** merchantUtils.ts:182-207 — multi-key sort with deterministic
    * tie-breaking (distance→name analog: balance desc, name, key).
    */
  def sortMultikey(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("acctbal").desc, col("c_name"), col("c_custkey"))
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_search_multifield" -> (searchMultifield _),
    "q_code_extract" -> (codeExtract _),
    "q_filter_category" -> (filterCategory _),
    "q_sort_multikey" -> (sortMultikey _))

  val oracle: Map[String, String] = Map(
    "q_search_multifield" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE contains(lower(p_name), 'small') OR contains(lower(p_brand), 'small')
        |   OR contains(lower(p_type), 'small')
        |ORDER BY p_partkey""".stripMargin,
    "q_code_extract" ->
      """SELECT regexp_extract(o_orderpriority, '([0-9]+)', 1) AS code, count(*) AS n
        |FROM orders GROUP BY code ORDER BY code""".stripMargin,
    "q_filter_category" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity >= 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_sort_multikey" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer
        |ORDER BY acctbal DESC, c_name, c_custkey LIMIT 100""".stripMargin)
}
