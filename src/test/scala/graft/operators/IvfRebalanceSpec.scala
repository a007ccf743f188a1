package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The rebalance pass's maintenance contracts: it must repair the
  * heaviest cells, conserve membership exactly, and touch NOTHING
  * else — locality is what makes in-place split viable at index
  * scale, and conservation is what makes it safe (a lost vector is a
  * silent recall hole; an invented one corrupts the index).
  */
class IvfRebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    AnnOps.ivfRebalance(spark, TestSpark.Sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private lazy val parents = rows.filter(r => r._1 == r._2)
  private lazy val children = rows.filter(r => r._1 != r._2)

  test("exactly RebalSplit children, seeded, each split from one of the heaviest cells") {
    assert(parents.length === AnnOps.IvfCells)
    assert(children.length === AnnOps.RebalSplit)
    // the split set = the top cells by pre-split size (ties lower id)
    val wantHot = parents.sortBy(p => (-p._4, p._1)).take(AnnOps.RebalSplit).map(_._1).toSet
    assert(children.map(_._2).toSet === wantHot, "children must hang off the heaviest cells")
    children.foreach { c =>
      assert(c._1 === c._2 + AnnOps.IvfCells, "child id = parent + IvfCells")
      assert(c._3 >= 0L, "child must record its seed vector")
      assert(c._4 === 0L && c._5 >= 1L,
        "a child starts empty and must receive at least the seed (farthest member)")
    }
    parents.foreach(p => assert(p._3 === -1L, "parent rows carry the -1 seed sentinel"))
  }

  test("membership conserves exactly and the repair is local to the split cells") {
    assert(rows.map(_._5).sum === parents.map(_._4).sum,
      "total membership must be conserved by the split")
    val childByParent = children.map(c => c._2 -> c._5).toMap
    parents.foreach { p =>
      childByParent.get(p._1) match {
        case Some(moved) =>
          assert(p._5 + moved === p._4, s"cell ${p._1}: parent + child must equal pre-split size")
          assert(p._5 < p._4, s"cell ${p._1}: the split must strictly shrink the hot cell")
        case None =>
          assert(p._5 === p._4, s"cell ${p._1} was not split and must be untouched")
      }
    }
  }
}
