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

    // Candidates as COUNTS: the bigram-bucket join is aggregated to
    // (lk, rk, nc) — the shared-bigram count — instead of a distinct
    // pair list that token arrays are re-joined to. nc = C(inter, 2)
    // exactly unless both sides touched a df-capped hot key, so the
    // similarity of almost every pair is recovered arithmetically.
    val (pairs, hotL, hotR) = FuzzyOps.twoSidePairCounts(
      l.select(col("lk"), col("ltoks").as("toks")), "lk",
      r.select(col("rk"), col("rtoks").as("toks")), "rk", dfCap)
    val eq = l.select(col("lk"), col("lcn"))
      .join(r.select(col("rk"), col("rcn")), col("lcn") === col("rcn"))
      .select(col("lk"), col("rk"), lit(1).as("eqf"))
    val lmeta = l.select(col("lk"), col("laux"), size(col("ltoks")).as("ln"))
      .join(hotL.withColumnRenamed("hd", "hd1"), Seq("lk"), "left").na.fill(0L, Seq("hd1"))
    val rmeta = r.select(col("rk"), col("raux"), size(col("rtoks")).as("rn"))
      .join(hotR.withColumnRenamed("hd", "hd2"), Seq("rk"), "left").na.fill(0L, Seq("hd2"))
    val m = pairs.join(eq, Seq("lk", "rk"), "full_outer")
      .join(lmeta, "lk").join(rmeta, "rk")

    // equal cleaned names ⟹ identical token sets ⟹ jac = 1: the
    // exact tiers never need arrays, even for single-token names
    val clean = m.filter(col("eqf") === 1 || least(col("hd1"), col("hd2")) === 0)
      .withColumn("inter",
        when(col("eqf") === 1, col("ln")).otherwise(FuzzyOps.interFromNc(col("nc"))))
      .withColumn("jac", when(col("eqf") === 1, lit(1.0))
        .otherwise(col("inter") / (col("ln") + col("rn") - col("inter")).cast("double")))
    // pairs whose nc may undercount (both sides dropped hot bigrams —
    // empty below the cap): bound the true intersection by
    // nc + min(hd1, hd2), prune pairs that cannot reach tier 3 even
    // at the bound, and exact-verify the survivors
    val dirty = m.filter(col("eqf").isNull && least(col("hd1"), col("hd2")) > 0)
      .withColumn("iub",
        least(FuzzyOps.interUbFromNc(col("nc") + least(col("hd1"), col("hd2"))),
          least(col("ln"), col("rn"))))
      .filter(col("iub") / (col("ln") + col("rn") - col("iub")).cast("double") >= threshold)
      .join(l.select(col("lk"), col("ltoks")), "lk")
      .join(r.select(col("rk"), col("rtoks")), "rk")
      .withColumn("inter", size(array_intersect(col("ltoks"), col("rtoks"))))
      .withColumn("jac",
        col("inter") / size(array_union(col("ltoks"), col("rtoks"))).cast("double"))

    val cols = Seq("lk", "rk", "eqf", "laux", "raux", "jac").map(col)
    val scored = clean.select(cols: _*).union(dirty.select(cols: _*))
      .withColumn("aux_match", (col("laux") === col("raux")).cast("int"))
      .withColumn("tier",
        when(col("eqf") === 1 && col("aux_match") === 1, 1)
          .when(col("eqf") === 1, 2)
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
