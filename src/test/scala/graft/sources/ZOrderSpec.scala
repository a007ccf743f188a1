package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The z-value must interleave exactly (proven against a driver-side
  * reference), and the layout must deliver the property it exists
  * for: per-partition bounding boxes small in BOTH dimensions, so
  * min/max statistics prune 2-D predicates.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < ZOrder.BitsPerDim) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("zValue equals the reference interleave on adversarial and random inputs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val edge = Seq((0L, 0L), (1L, 0L), (0L, 1L),
      ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1), ((1L << 31) - 1, (1L << 31) - 1))
    val rand = Seq.fill(200)((rng.nextLong().abs % (1L << 31), rng.nextLong().abs % (1L << 31)))
    val rows = (edge ++ rand).toDF("x", "y")
    val got = rows.withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z === refZ(x, y), s"interleave mismatch at ($x, $y)")
      assert(z >= 0L, "z must stay a positive BIGINT")
    }
  }

  test("zValue raises on out-of-domain coordinates instead of aliasing them") {
    import spark.implicits._
    // silently reading only the low 31 bits would z-cluster the row
    // with unrelated data — the contract is enforced, not documented
    for ((x, y) <- Seq((-1L, 5L), (5L, -1L), (1L << 31, 0L), (0L, Long.MaxValue))) {
      val ex = intercept[Exception] {
        Seq((x, y)).toDF("x", "y")
          .select(ZOrder.zValue(col("x"), col("y"))).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("zValue")), s"($x, $y): $ex")
    }
    // the domain edges themselves stay valid
    val m = ZOrder.MaxCoord
    val ok = Seq((0L, m), (m, 0L), (m, m)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z")).as[Long].collect()
    assert(ok.forall(_ >= 0L))
  }

  test("z-layout shrinks per-partition bounding boxes in both dimensions") {
    import spark.implicits._
    // uniform synthetic grid: 10k points over a 1024x1024 space. The
    // z win is bbox SHAPE, not area: 64 x-range slices are 16x1024
    // slivers (a square query box touches many), 64 z cells are
    // ~128x128 squares — so compare the x-span + y-span sum, the
    // quantity min/max pruning of a 2-D box actually sees.
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(10000)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
      .toDF("x", "y")
    val parts = 64
    def avgSpanSum(df: org.apache.spark.sql.DataFrame): Double =
      df.select(spark_partition_id().as("p"), col("x"), col("y"))
        .groupBy("p")
        .agg(((max("x") - min("x")) + (max("y") - min("y"))).as("spans"))
        .agg(avg("spans")).collect()(0).getDouble(0)
    val z = avgSpanSum(ZOrder.layout(pts, "x", "y", parts))
    val xOnly = avgSpanSum(pts.repartitionByRange(parts, col("x")).sortWithinPartitions("x"))
    // the sliver layout is pinned near 1024 by the unconstrained y
    // dimension; z cells must come in far below even with sampled
    // range boundaries splitting quadrants
    assert(z < xOnly * 0.6,
      s"z layout avg span-sum $z not clearly below single-dim layout $xOnly")
  }

  test("quantize clamps and buckets uniformly") {
    import spark.implicits._
    val xs = Seq(-200.0, 0.0, 0.49, 0.5, 0.99, 1.0, 250.0).toDF("v")
    val got = xs.select(ZOrder.quantize(col("v"), 0.0, 1.0, 4).as("q"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(0, 0, 1, 2, 3, 3, 3))
  }
}
