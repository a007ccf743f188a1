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

  /** merchantUtils.ts:182-207 — multi-key sort with deterministic
    * tie-breaking (distance→name analog: balance desc, name, key).
    */
  def sortMultikey(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("acctbal").desc, col("c_name"), col("c_custkey"))
      .limit(100)

  /** The merchant-shaped entity frame the dispatch searches: scalar
    * text fields, an ARRAY field (the reference's `cuisine`,
    * merchantUtils.ts:93-97), a postal code, and coordinates.
    */
  private def merchants(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey").as("merchant_id"),
      lower(col("p_name")).as("mname"),
      lpad((col("p_partkey") * 7919L % 1000000L).cast("string"), 6, "0").as("postal"),
      lower(col("p_brand")).as("address"),
      lower(col("p_type")).as("mtype"),
      array(lower(col("p_type")), lower(col("p_brand"))).as("tags"),
      graft.functions.Geo.synthLat(col("p_partkey")).as("lat"),
      graft.functions.Geo.synthLon(col("p_partkey")).as("lon"))

  /** merchantUtils.ts:25-62 — the reference's single most-used entry
    * point, composed from the already-verified pieces: if the search
    * term carries a 6-digit postal code (`\b\d{6}\b`), geocode it
    * (exact postal → 3-digit-prefix area → city-center default, as
    * locationUtils.ts:56-74) and return everything within 10 km
    * sorted by distance; otherwise run the multi-field substring
    * search across name/postal/address/type and the array-typed tags
    * field (merchantUtils.ts:64-116, including the `[^a-z]`-stripped
    * type match at :100).
    *
    * The branch is decided on the scalar search term (exactly as the
    * reference does on its input string); both branches are single
    * declarative plans — the geocode result is one broadcast row, the
    * text branch is a scan with a pushed disjunction.
    */
  def searchDispatch(spark: SparkSession, dir: String, term: String): DataFrame = {
    val t = term.trim.toLowerCase
    val m = merchants(spark, dir)
    "\\b(\\d{6})\\b".r.findFirstMatchIn(t).map(_.group(1)) match {
      case Some(pc) =>
        val lookup = GeoOps.postalLookup(spark, dir)
        val g = lookup.filter(col("postal") === pc)
          .select(col("lat").as("glat"), col("lon").as("glon"), lit(1).as("prio"))
          .union(GeoOps.prefixRep(lookup).filter(col("prefix") === pc.substring(0, 3))
            .select(col("plat"), col("plon"), lit(2)))
          .union(spark.range(1).select(lit(1.3521), lit(103.8198), lit(3)))
          .orderBy("prio").limit(1)
          .select(col("glat"), col("glon"))
        m.crossJoin(broadcast(g))
          .withColumn("dist_km", round(
            graft.functions.Geo.haversineKm(col("glat"), col("glon"), col("lat"), col("lon")), 3))
          .filter(col("dist_km") <= 10.0)
          .select(col("merchant_id"), col("dist_km"))
      case None =>
        val tt = t.replaceAll("[^a-z]", "")
        m.filter(col("mname").contains(t) || col("postal").contains(t) ||
            col("address").contains(t) || col("mtype").contains(tt) ||
            exists(col("tags"), x => x.contains(t)))
          .select(col("merchant_id"), lit(null).cast("double").as("dist_km"))
    }
  }

  /** Terms the registered dispatch query runs — one per branch. */
  private[operators] val DispatchPostalTerm = "stall 037231 singapore"
  private[operators] val DispatchTextTerm = "ar"

  /** Registered dispatch query: both branches, tagged and unioned. */
  def searchDispatchQ(spark: SparkSession, dir: String): DataFrame =
    searchDispatch(spark, dir, DispatchPostalTerm).withColumn("q", lit("postal"))
      .union(searchDispatch(spark, dir, DispatchTextTerm).withColumn("q", lit("text")))
      .select(col("q"), col("merchant_id"), col("dist_km"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_search_multifield" -> (searchMultifield _),
    "q_code_extract" -> (codeExtract _),
    "q_filter_category" -> (filterCategory _),
    "q_sort_multikey" -> (sortMultikey _),
    "q_search_dispatch" -> (searchDispatchQ _))

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
        |ORDER BY acctbal DESC, c_name, c_custkey LIMIT 100""".stripMargin,
    "q_search_dispatch" ->
      s"""WITH lookup AS (
         |  SELECT lpad(CAST(n_nationkey * 37231 % 1000000 AS VARCHAR), 6, '0') postal,
         |         ${GeoOps.sqlLat("(n_nationkey + 3)")} lat, ${GeoOps.sqlLon("(n_nationkey + 3)")} lon
         |  FROM nation
         |), rep AS (
         |  SELECT substr(postal, 1, 3) prefix, min(postal) rep_postal FROM lookup GROUP BY 1
         |), prefix_rep AS (
         |  SELECT prefix, lat plat, lon plon FROM rep JOIN lookup ON lookup.postal = rep.rep_postal
         |), g AS (
         |  SELECT glat, glon FROM (
         |    SELECT lat glat, lon glon, 1 prio FROM lookup WHERE postal = '037231'
         |    UNION ALL
         |    SELECT plat, plon, 2 FROM prefix_rep WHERE prefix = '037'
         |    UNION ALL
         |    SELECT 1.3521, 103.8198, 3
         |  ) ORDER BY prio LIMIT 1
         |), m AS (
         |  SELECT p_partkey merchant_id, lower(p_name) mname,
         |         lpad(CAST(p_partkey * 7919 % 1000000 AS VARCHAR), 6, '0') postal,
         |         lower(p_brand) address, lower(p_type) mtype,
         |         [lower(p_type), lower(p_brand)] tags,
         |         ${GeoOps.sqlLat("p_partkey")} lat, ${GeoOps.sqlLon("p_partkey")} lon
         |  FROM part
         |), p AS (
         |  SELECT 'postal' q, merchant_id,
         |         round(${GeoOps.sqlHav("glat", "glon", "lat", "lon")}, 3) dist_km
         |  FROM m CROSS JOIN g
         |), t AS (
         |  SELECT 'text' q, merchant_id, NULL::DOUBLE dist_km FROM m
         |  WHERE contains(mname, '$DispatchTextTerm') OR contains(postal, '$DispatchTextTerm')
         |     OR contains(address, '$DispatchTextTerm') OR contains(mtype, '$DispatchTextTerm')
         |     OR len(list_filter(tags, x -> contains(x, '$DispatchTextTerm'))) > 0
         |)
         |SELECT q, merchant_id, dist_km FROM p WHERE dist_km <= 10.0
         |UNION ALL
         |SELECT q, merchant_id, dist_km FROM t
         |ORDER BY q, merchant_id""".stripMargin)
}
