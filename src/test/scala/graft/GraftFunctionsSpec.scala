package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered SQL functions evaluate") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_clean_name('Al-Amin Pte. Ltd. Stall 12') cn,
        |       round(graft_haversine_km(1.35, 103.8, 1.39, 103.85), 1) d,
        |       graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) dp,
        |       round(graft_l2norm(array(3.0F, 4.0F)), 6) nm
        |""".stripMargin).collect()(0)
    assert(row.getString(0) === "al amin")
    assert(row.getDouble(1) === 7.1)
    assert(row.getDouble(2) === 11.0)
    assert(row.getDouble(3) === 5.0)
  }

  test("SQL functions usable over tables") {
    GraftFunctions.register(spark)
    sources.Tables.documents(spark, TestSpark.Sf).createOrReplaceTempView("docs")
    val n = spark.sql(
      "SELECT count(*) FROM docs WHERE graft_clean_name(text) <> ''").collect()(0).getLong(0)
    assert(n > 0)
  }
}
