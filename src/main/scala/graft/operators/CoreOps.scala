package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.{Codecs, Tables}

/** §2.E — core SQL analytics: star joins, windowed top-N, JSON
  * extraction, CSV round-trip (the reference's dataManager.ts
  * export/import, src/services/dataManager.ts:190-240).
  */
object CoreOps {

  /** Star join: revenue per nation. Dimensions (nation) are broadcast;
    * the two fact tables join on their natural keys so Catalyst plans
    * shuffled hash/sort-merge joins keyed on custkey/orderkey, and the
    * final rollup is a partial-agg + single shuffle on n_name.
    */
  def joinAggNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val n = Tables.nation(spark, dir)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Top-N per group via a single window (one shuffle on the group
    * key): 3 priciest orders per priority class.
    */
  def groupTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  /** JSON field extraction + aggregation over events.props. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("sum_k"),
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy("event_type")

  /** dataManager.ts:190-240 — CSV export/import round-trip with quoted
    * values; proves the codec preserves the data exactly.
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_csv").toString
    Codecs.exportCsv(Tables.nation(spark, dir), tmp, singleFile = true)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    Codecs.importCsv(spark, tmp, schema).orderBy("n_nationkey")
  }

  /** dataManager.ts:303-305 — JSON export/import round-trip. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_json").toString
    Codecs.exportJson(Tables.region(spark, dir), tmp, singleFile = true)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    Codecs.importJson(spark, tmp, schema)
      .select("r_regionkey", "r_name")
      .orderBy("r_regionkey")
  }

  /** Hierarchical totals via ROLLUP (subtotals + grand total). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Pivoted event counts: one column per event type per user cohort. */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(spark, dir)
      .select((col("user_id") % 10).as("cohort"), col("event_type"))
      .groupBy("cohort")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("cohort")
  }

  /** Per-user running value total in event order — the cumulative
    * metric window every event-analytics surface ships.
    */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 2).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Sliding event-time window via a RANGE frame: per user, each
    * event's count/sum over the trailing hour BY VALUE (all peers at
    * equal timestamps included, rows at gaps excluded) — the frame
    * semantics a ROWS window cannot express. One keyed window shuffle.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-3600L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000000000").as("ts_s"), col("value"))
      .withColumn("n_trailing_hour", count(lit(1)).over(w))
      .withColumn("sum_trailing_hour", round(sum(col("value")).over(w), 2))
      .select(col("user_id"), col("event_id"), col("ts_s"),
        col("n_trailing_hour"), col("sum_trailing_hour"))
      .orderBy("user_id", "event_id")
  }

  /** Full CUBE with grouping_id — every subtotal combination plus the
    * bitmask identifying which dimensions each row aggregates over
    * (the OLAP cross-tab beyond [[rollupAgg]]'s hierarchy).
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_price"), col("n"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact interpolated quantiles of event value per type. */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
      .orderBy("event_type")

  /** Semi join: customers that have at least one order (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Anti join: customers with no event activity (NOT EXISTS) — the
    * inactive-entity report.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.events(spark, dir).select("user_id"),
        col("c_custkey") === col("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Correlated-aggregate semantics: customers above their nation's
    * average balance — expressed as a window (one shuffle) rather than
    * a per-row correlated subquery.
    */
  def aboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    Tables.customer(spark, dir)
      .withColumn("nation_avg", avg(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("acctbal"),
        round(col("nation_avg"), 4).as("nation_avg"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_semi_join" -> (semiJoin _),
    "q_anti_join" -> (antiJoin _),
    "q_above_nation_avg" -> (aboveNationAvg _),
    "q_join_agg_nation" -> (joinAggNation _),
    "q_group_topn" -> (groupTopN _),
    "q_json_extract" -> (jsonExtract _),
    "q_csv_roundtrip" -> (csvRoundtrip _),
    "q_json_roundtrip" -> (jsonRoundtrip _),
    "q_rollup" -> (rollupAgg _),
    "q_cube" -> (cubeAgg _),
    "q_sliding_window" -> (slidingWindow _),
    "q_pivot" -> (pivotEvents _),
    "q_running_total" -> (runningTotal _),
    "q_quantiles" -> (quantiles _))

  val oracle: Map[String, String] = Map(
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_above_nation_avg" ->
      """WITH w AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         avg(c_acctbal) OVER (PARTITION BY c_nationkey) nation_avg
        |  FROM customer
        |)
        |SELECT c_custkey, c_nationkey, round(c_acctbal, 2) acctbal,
        |       round(nation_avg, 4) nation_avg
        |FROM w WHERE c_acctbal > nation_avg ORDER BY c_custkey""".stripMargin,
    "q_join_agg_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_group_topn" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS rn
        |FROM orders QUALIFY rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n,
        |  round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag, l_linestatus) AS INT) gid,
        |  round(sum(l_extendedprice), 2) sum_price, count(*) n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_sliding_window" ->
      """SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s,
        |  count(*) OVER w AS n_trailing_hour,
        |  round(sum(value) OVER w, 2) AS sum_trailing_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT user_id % 10 AS cohort,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q_running_total" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
