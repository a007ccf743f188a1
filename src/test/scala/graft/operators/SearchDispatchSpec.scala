package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The composite search dispatch (merchantUtils.ts:25-62): postal
  * detection routes to geocode + radius + distance sort; anything else
  * routes to multi-field substring search including the array field.
  */
class SearchDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("a term embedding a 6-digit postal takes the radius branch, sorted by distance") {
    val rows = SearchOps.searchDispatch(spark, sf, "320 tampines street 33 singapore 037231")
      .collect()
    assert(rows.nonEmpty)
    // every hit is within 10 km and dist_km is populated
    assert(rows.forall(r => !r.isNullAt(1) && r.getDouble(1) <= 10.0))
  }

  test("an unknown postal falls back through the prefix/default geocode tiers") {
    // 999999 is in no lookup row and no known prefix → city-center
    // default; the query must still answer (locationUtils.ts:73)
    val rows = SearchOps.searchDispatch(spark, sf, "999999").collect()
    assert(rows.forall(r => r.getDouble(1) <= 10.0))
  }

  test("a text term searches scalar fields AND the array field") {
    val byTag = SearchOps.searchDispatch(spark, sf, "brand#").collect()
    assert(byTag.nonEmpty) // matches only via address/tags, never mname
    assert(byTag.forall(_.isNullAt(1))) // text branch carries no distance
    val byName = SearchOps.searchDispatch(spark, sf, "gear").collect()
    assert(byName.nonEmpty)
  }

  test("a blank term is no dispatch at all — text branch over everything matches all") {
    val n = SearchOps.searchDispatch(spark, sf, "").count()
    val total = graft.sources.Tables.part(spark, sf).count()
    assert(n === total) // empty substring matches every row, as the reference returns all
  }
}
