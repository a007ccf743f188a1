package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q1_agg" -> (Queries.q1Agg _)) ++
      operators.SearchOps.queries ++
      operators.GeoOps.queries ++
      operators.FuzzyOps.queries ++
      operators.ClassifyOps.queries ++
      operators.CoreOps.queries ++
      operators.CdcOps.queries ++
      operators.DedupOps.queries ++
      operators.AnnOps.queries ++
      operators.TextOps.queries ++
      operators.MultimodalOps.queries ++
      operators.CorpusOps.queries ++
      operators.PiiOps.queries ++
      operators.HybridOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.SearchOps.oracle ++
    operators.GeoOps.oracle ++
    operators.FuzzyOps.oracle ++
    operators.ClassifyOps.oracle ++
    operators.CoreOps.oracle ++
    operators.CdcOps.oracle ++
    operators.DedupOps.oracle ++
    operators.AnnOps.oracle ++
    operators.TextOps.oracle ++
    operators.MultimodalOps.oracle ++
    operators.CorpusOps.oracle ++
    operators.PiiOps.oracle ++
    operators.HybridOps.oracle ++
    Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}

/** The query implementations, one def per SURVEY.md §2 row. */
object Queries {

  /** §2.E q1_agg — pricing summary (grouped sums/avgs/counts) over
    * lineitem. Declarative groupBy → Catalyst plans a partial
    * (map-side) HashAggregate before the single shuffle on the two
    * low-cardinality group keys; parquet scan reads only the 7 columns
    * referenced and pushes the shipdate predicate down.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
}
