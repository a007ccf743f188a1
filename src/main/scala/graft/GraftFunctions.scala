package graft

import org.apache.spark.sql.SparkSession

import graft.plans.VectorExpressions

/** SQL-surface registration: exposes the graft operators to
  * `spark.sql(...)` users.
  *
  * Scalar helpers (`graft_clean_name`, `graft_haversine_km`) register
  * as SQL UDFs (`CREATE FUNCTION … RETURN expr`) so they inline into
  * the plan and stay codegen'd; the native vector expressions
  * (`graft_dot`, `graft_l2norm`, see plans.VectorExpressions) register
  * directly into the function registry.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_clean_name(s STRING)
        |RETURNS STRING RETURN
        |trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  lower(s), '\\b(pte|ltd|private|limited|sdn|bhd)\\b', ''),
        |  '\\b(stall|unit)\\s*[0-9]+[a-z]?\\b|#[0-9]+(-[0-9]+)?', ''),
        |  '[^a-z0-9 ]', ' '), ' +', ' '))""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_haversine_km(
        |  lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
        |RETURNS DOUBLE RETURN
        |2.0 * 6371.0 * asin(sqrt(
        |  pow(sin(radians(lat2 - lat1) / 2), 2) +
        |  cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)))""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_content_key(s STRING)
        |RETURNS STRING RETURN md5(cast(s AS BINARY))""".stripMargin)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => VectorExpressions.DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2norm",
      exprs => VectorExpressions.L2NormExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_long_dot",
      exprs => VectorExpressions.LongDotExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => GraftExtensions.cosineExpr(exprs), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_sigs",
      exprs => GraftExtensions.hyperplaneSigsExpr(exprs), "scala_udf")
  }
}
