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
  *   3. token-set Jaccard ≥ `threshold`
  * One best match per left row, preferring lower tier, then aux-key
  * confirmation, then similarity, then lowest right key.
  *
  * Scale shape: candidates come from a df-capped sorted-bigram
  * inverted-index join UNIONED with a cleaned-name equi-join, so exact
  * tiers (1/2) are found even for names that clean to a single token
  * (which have no bigram). Tier-3 matches are guaranteed only when
  * both names have ≥ 2 distinct tokens — the reference's
  * ≥ 2-matching-words rule (halalService.ts:138,151) — and when at
  * least one shared bigram survives the hot-key cap. Similarity is
  * verified exactly on the full token sets, so the cap and blocking
  * never distort the measure of a found pair. Works unchanged on a
  * 1000-executor cluster.
  */
object FuzzyJoin {

  /** @param left      entities to resolve; `leftKey` must be unique
    * @param right     register to resolve against
    * @param threshold tier-3 Jaccard threshold (≥ 0.5 implies ≥ 2
    *                  shared tokens on ≥ 2-token names, which bigram
    *                  blocking covers)
    * @param dfCap     blocking keys hotter than this are dropped from
    *                  candidate generation (bounds the worst key at
    *                  ~cap²/2 pairs)
    */
  def resolve(
      left: DataFrame, leftKey: String, leftName: Column, leftAux: Column,
      right: DataFrame, rightKey: String, rightName: Column, rightAux: Column,
      threshold: Double = 0.5, dfCap: Int = 1000): DataFrame = {
    require(threshold >= 0.5, "bigram blocking only covers tier 3 for threshold >= 0.5")

    val l = left.select(col(leftKey).as("lk"), Text.cleanName(leftName).as("lcn"), leftAux.as("laux"))
      .withColumn("ltoks", array_distinct(split(col("lcn"), " ")))
    val r = right.select(col(rightKey).as("rk"), Text.cleanName(rightName).as("rcn"), rightAux.as("raux"))
      .withColumn("rtoks", array_distinct(split(col("rcn"), " ")))

    val cand = FuzzyOps.bigramCands(
        l.select(col("lk"), col("ltoks").as("toks")), "lk",
        r.select(col("rk"), col("rtoks").as("toks")), "rk", dfCap)
      .union(l.select(col("lk"), col("lcn"))
        .join(r.select(col("rk"), col("rcn")), col("lcn") === col("rcn"))
        .select(col("lk"), col("rk")))
      .distinct()

    val scored = cand
      .join(l, "lk").join(r, "rk")
      .withColumn("inter", size(array_intersect(col("ltoks"), col("rtoks"))))
      .withColumn("jac",
        col("inter") / size(array_union(col("ltoks"), col("rtoks"))).cast("double"))
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
