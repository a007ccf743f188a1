package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data clustering
  * for scan pruning: interleaving the bits of two sort dimensions
  * gives a single sort key under which rows close in BOTH dimensions
  * land in the same files, so parquet row-group min/max statistics
  * prune a 2-D predicate (a geo bounding box, a time×tenant slice)
  * instead of only the leading column of a lexicographic sort — the
  * layout trick lakehouse table formats expose as `ZORDER BY`/
  * `sort_order(z)`.
  *
  * Everything is a pure codegen'd projection (bit shifts and masks,
  * no UDF) plus one `repartitionByRange` on the z key, so laying out
  * 100 TB costs exactly one range shuffle — the same price as any
  * other sorted write.
  */
object ZOrder {

  /** Bits kept per dimension (two dims interleave into ≤ 62 bits,
    * keeping the z value a positive BIGINT).
    */
  val BitsPerDim = 31

  /** Largest coordinate [[zValue]] accepts: 2^[[BitsPerDim]] − 1. */
  val MaxCoord: Long = (1L << BitsPerDim) - 1

  /** The Morton z-value of two integral columns in [0, [[MaxCoord]]],
    * bits interleaved x₀y₀x₁y₁… from the most significant of the low
    * [[BitsPerDim]] bits. Built as one expression tree of shifts and
    * masks — whole-stage codegen keeps it a tight loop-free kernel.
    *
    * The domain is ENFORCED, not just documented: a negative or
    * too-wide coordinate would silently interleave only its low bits,
    * aliasing the row onto an unrelated z cell and corrupting the
    * layout with no error — so out-of-range values raise instead.
    */
  def zValue(x: Column, y: Column): Column = {
    def checked(c: Column, name: String): Column =
      when(c.cast("long").between(0L, MaxCoord), c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"zValue: $name out of [0, $MaxCoord]: "), c.cast("string"))))
    val (cx, cy) = (checked(x, "x"), checked(y, "y"))
    val terms = (0 until BitsPerDim).flatMap { i =>
      Seq(
        call_function("shiftleft",
          call_function("shiftright", cx, lit(i)).bitwiseAND(lit(1L)), lit(2 * i + 1)),
        call_function("shiftleft",
          call_function("shiftright", cy, lit(i)).bitwiseAND(lit(1L)), lit(2 * i)))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Quantizes a double in `[lo, hi]` onto `buckets` uniform cells —
    * the usual step before z-ordering continuous coordinates.
    */
  def quantize(c: Column, lo: Double, hi: Double, buckets: Int): Column =
    least(lit(buckets - 1), greatest(lit(0),
      floor((c - lit(lo)) / lit((hi - lo) / buckets)).cast("int")))

  /** Re-lays `df` out in z-order of the two given integral columns:
    * one range shuffle into `numPartitions` z-contiguous partitions,
    * rows sorted by z within each — the write-side layout whose
    * per-file bounding boxes stay small in BOTH dimensions.
    */
  def layout(df: DataFrame, x: String, y: String, numPartitions: Int): DataFrame = {
    require(!df.columns.contains("_z"), "input must not carry a _z column")
    df.withColumn("_z", zValue(col(x), col(y)))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
