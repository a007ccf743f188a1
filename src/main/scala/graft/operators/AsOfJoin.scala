package graft.operators

import org.apache.spark.sql.DataFrame
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
  * window carries the latest right row forward into each left row.
  * Cost is a single exchange + sort regardless of how many left rows
  * match each right row — there is no range-join pair blowup. Works
  * unchanged on a 1000-executor cluster; skewed keys are ordinary
  * window skew (AQE/salting territory), not a join explosion.
  *
  * Row atomicity: the matched right time and ALL value columns ride
  * ONE struct through a single `last(ignoreNulls)`, so every
  * `_asof_*` output column comes from the same right row even when
  * some of its value columns are NULL (a per-column carry would mix
  * rows in that case).
  *
  * Tie rule: among right rows sharing the same (key, rightTime), the
  * one with the greatest (rightTime, values...) struct wins — a
  * deterministic, partitioning-independent pick (requires the value
  * columns to be of orderable types; atomic columns always are).
  *
  * Matched right value columns come back as `_asof_<name>` plus
  * `_asof_t` (the matched right time); unmatched left rows carry
  * nulls. `tolerance` nulls out matches older than
  * `leftTime − tolerance`. Left column names must not collide with
  * the `_asof_` prefix or the internal `_t`/`_side` tags.
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String],
      tolerance: Option[Long] = None, strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val internal = Seq("_t", "_side", "_asof_payload", "_asof_carried")
    require(!left.columns.exists(internal.contains),
      s"left side must not carry the internal columns ${internal.mkString(", ")}")
    val asofCols = rightValues.map(n => s"_asof_$n")

    val l = left.withColumn("_t", col(leftTime).cast("long")).withColumn("_side", lit(1))
    // the whole matched right row travels as ONE struct — time first,
    // then the value columns — so the carry below is atomic
    val r = right.select(
        keys.map(col) :+ col(rightTime).cast("long").as("_t") :+
          struct(col(rightTime).cast("long").as("_pt") +: rightValues.map(col): _*)
            .as("_asof_payload"): _*)
      .withColumn("_side", lit(0))
    val merged = l.unionByName(r, allowMissingColumns = true)

    // ties: with ≤ semantics a right row at the same instant must sort
    // BEFORE the left row (visible in its preceding frame); with <
    // semantics, after it. Among right rows equal on (key, _t) the
    // payload struct is the final, deterministic tiebreak (last()
    // picks the row sorting last = the greatest struct); left rows all
    // carry a NULL payload, so their relative order is immaterial.
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), sideOrder, col("_asof_payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)

    val carried = merged
      .withColumn("_asof_carried", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .withColumn("_asof_t", col("_asof_carried._pt"))

    val withinTol = tolerance match {
      case Some(tol) => col("_asof_t").isNotNull && col("_t") - col("_asof_t") <= tol
      case None => col("_asof_t").isNotNull
    }
    rightValues.zip(asofCols)
      .foldLeft(carried) { case (df, (from, to)) =>
        df.withColumn(to, when(withinTol, col("_asof_carried").getField(from)))
      }
      .withColumn("_asof_t", when(withinTol, col("_asof_t")))
      .drop("_side", "_t", "_asof_payload", "_asof_carried")
  }
}
