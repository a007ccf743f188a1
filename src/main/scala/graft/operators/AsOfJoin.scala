package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic backward as-of join — for each left row, attach the most
  * recent right row with `rightTime` ≤ (or < if `strict`) the left
  * row's `leftTime`, per join key. The canonical event-attribution /
  * point-in-time-lookup operator (the specialized form behind
  * CdcOps.asofAttribution, lifted to a reusable API).
  *
  * Spark-first plan, no custom physical operator needed: both sides
  * are tagged and unioned, ONE shuffle on the join keys orders the
  * merged stream by time, and a `last(..., ignoreNulls)` running
  * window carries the latest right values forward into each left row.
  * Cost is a single exchange + sort regardless of how many left rows
  * match each right row — there is no range-join pair blowup. Works
  * unchanged on a 1000-executor cluster; skewed keys are ordinary
  * window skew (AQE/salting territory), not a join explosion.
  *
  * Matched right value columns come back as `_asof_<name>` plus
  * `_asof_t` (the matched right time); unmatched left rows carry
  * nulls. `tolerance` nulls out matches older than
  * `leftTime − tolerance`. Left column names must not collide with
  * the `_asof_` prefix.
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String],
      tolerance: Option[Long] = None, strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val asofCols = rightValues.map(n => s"_asof_$n")

    val l = left.withColumn("_t", col(leftTime).cast("long")).withColumn("_side", lit(1))
    val r = rightValues.zip(asofCols)
      .foldLeft(right.select(
        (keys.map(col) :+ col(rightTime).cast("long").as("_t")) ++ rightValues.map(col): _*)) {
        case (df, (from, to)) => df.withColumnRenamed(from, to)
      }
      .withColumn("_side", lit(0))
    val merged = l.unionByName(r, allowMissingColumns = true)

    // ties: with ≤ semantics a right row at the same instant must sort
    // BEFORE the left row (visible in its preceding frame); with <
    // semantics, after it
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), sideOrder)
      .rowsBetween(Window.unboundedPreceding, -1)

    val carried = (asofCols :+ "_asof_t").foldLeft(
      merged.withColumn("_asof_t", when(col("_side") === 0, col("_t")))) {
      case (df, c) =>
        df.withColumn(c, last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }

    val withinTol = tolerance match {
      case Some(tol) => col("_asof_t").isNotNull && col("_t") - col("_asof_t") <= tol
      case None => col("_asof_t").isNotNull
    }
    (asofCols :+ "_asof_t")
      .foldLeft(carried.filter(col("_side") === 1)) {
        case (df, c) => df.withColumn(c, when(withinTol, col(c)))
      }
      .drop("_side", "_t")
  }
}
