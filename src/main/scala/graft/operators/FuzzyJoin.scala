package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text

/** Reusable tiered fuzzy entity-resolution join — the generic form of
  * the reference's halal-register matcher (halalService.ts:103-177),
  * usable on any pair of DataFrames.
  *
  * Tier ladder (lower wins), mirroring the reference:
  *   1. exact cleaned-name match + auxiliary-key confirmation (postal)
  *   2. exact cleaned-name match
  *   3. token-set Jaccard ≥ `threshold` (requires ≥ 2 shared tokens —
  *      the reference's matchingWords rule — which makes sorted
  *      token-bigram blocking lossless)
  * One best match per left row, preferring lower tier, then aux-key
  * confirmation, then similarity, then lowest right key.
  *
  * Scale shape: candidates only from a bigram-blocked inverted-index
  * join; the exact intersection size is recovered from the
  * shared-bigram count (c = C(inter,2)) so no token arrays travel with
  * candidate pairs. Works unchanged on a 1000-executor cluster.
  */
object FuzzyJoin {

  /** @param left      entities to resolve; `leftKey` must be unique
    * @param right     register to resolve against
    * @param threshold tier-3 Jaccard threshold (≥ 0.5 keeps bigram blocking lossless)
    */
  def resolve(
      left: DataFrame, leftKey: String, leftName: Column, leftAux: Column,
      right: DataFrame, rightKey: String, rightName: Column, rightAux: Column,
      threshold: Double = 0.5): DataFrame = {
    require(threshold >= 0.5, "bigram blocking is only lossless for threshold >= 0.5")

    val l = left.select(col(leftKey).as("lk"), Text.cleanName(leftName).as("lcn"), leftAux.as("laux"))
      .withColumn("ln", size(array_distinct(split(col("lcn"), " "))))
    val r = right.select(col(rightKey).as("rk"), Text.cleanName(rightName).as("rcn"), rightAux.as("raux"))
      .withColumn("rn", size(array_distinct(split(col("rcn"), " "))))

    def combos(df: DataFrame, key: String, cn: String): DataFrame = {
      val tok = df.select(col(key), explode(array_distinct(split(col(cn), " "))).as("t"))
      tok.as("x").join(tok.as("y"),
          col(s"x.$key") === col(s"y.$key") && col("x.t") < col("y.t"))
        .select(col(s"x.$key").as(key), concat_ws(" ", col("x.t"), col("y.t")).as("c"))
    }

    val cand = combos(l, "lk", "lcn").repartition(col("c"))
      .join(combos(r, "rk", "rcn").repartition(col("c")), "c")
      .groupBy("lk", "rk")
      .agg(count(lit(1)).as("nc"))
      .withColumn("inter", round((lit(1) + sqrt(lit(1) + lit(8) * col("nc"))) / 2, 0).cast("long"))

    val scored = cand
      .join(l, "lk").join(r, "rk")
      .withColumn("jac", col("inter") / (col("ln") + col("rn") - col("inter")).cast("double"))
      .withColumn("aux_match", (col("laux") === col("raux")).cast("int"))
      .withColumn("tier",
        when(col("lcn") === col("rcn") && col("aux_match") === 1, 1)
          .when(col("lcn") === col("rcn"), 2)
          .when(col("jac") >= threshold, 3))
      .filter(col("tier").isNotNull)

    val w = Window.partitionBy(col("lk"))
      .orderBy(col("tier"), col("aux_match").desc, col("jac").desc, col("rk"))
    scored
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") === 1)
      .select(col("lk"), col("rk"), col("tier"), col("aux_match"), round(col("jac"), 6).as("jac"))
  }
}
