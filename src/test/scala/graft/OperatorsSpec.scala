package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Cross-operator invariants at sf0.001. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("minhash-LSH pairs are a subset of exhaustive ngram pairs (verify step prunes only)") {
    val lsh = DedupOps.dedupMinhash(spark, sf).select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = DedupOps.dedupNgram(spark, sf).select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(full))
  }

  test("fuzzy resolve: one best match per left key, valid tiers") {
    val rows = FuzzyOps.fuzzyResolve(spark, sf).collect()
    val byLk = rows.groupBy(_.getLong(0))
    assert(byLk.values.forall(_.length == 1))
    assert(rows.forall(r => Set(1, 2, 3)(r.getInt(2))))
  }

  test("sessionize partitions all events") {
    val total = sources.Tables.events(spark, sf).count()
    val sessions = CdcOps.sessionize(spark, sf)
    val sum = sessions.agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(sum === total)
  }

  test("cdc latest yields one row per user") {
    val users = sources.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(CdcOps.cdcLatest(spark, sf).count() === users)
  }

  test("geo knn returns exactly k rows per probe with ascending distance") {
    val rows = GeoOps.geoKnn(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.length == 5)
      val byRank = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ann topk cosines bounded and ranked") {
    val rows = AnnOps.annTopK(spark, sf).collect()
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("keyword classify only emits known categories") {
    val cats = ClassifyOps.keywordClassify(spark, sf)
      .select("category").distinct().collect().map(_.getString(0)).toSet
    assert(cats.subsetOf(ClassifyOps.keywordMap.map(_._1).toSet))
  }
}
