package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{TopKAgg, VectorExpressions}

/** Two-level (anchor-of-anchors) IVF coarse assignment — the scale
  * path past the flat broadcast's ceiling. Flat assignment crossJoins
  * the corpus against a BROADCAST anchor table; with corpus-adaptive
  * cell counts (`semCells`) the anchor table grows with the corpus
  * and past ~10⁸ vectors it no longer fits in a broadcast — the seam
  * the SemDeDup scale note names, and the faiss IVF two-level answer:
  *
  *   1. a SMALL top-level "super anchor" set (the `groups` lowest-id
  *      leaf anchors — the same deterministic-init discipline as the
  *      leaves themselves) is the ONLY table broadcast against the
  *      corpus;
  *   2. each LEAF anchor is routed to its nearest super (a tiny
  *      K × G self-assignment, same 6-decimal/lowest-id decision
  *      contract as every assignment in this repo);
  *   3. each vector takes its `route` nearest supers (bounded
  *      [[TopKAgg]], map-side combinable) and resolves against ONLY
  *      the leaves routed under them through a GROUP-KEYED JOIN —
  *      deliberately not broadcast-hinted: the leaf table is
  *      corpus-derived at scale (AQE still broadcasts it while
  *      small), and the per-vector candidate work drops from K to
  *      ~route · K / G.
  *
  * Exactness: candidate scores are the SAME rounded cosines as flat
  * assignment, so the result is bit-identical to flat whenever each
  * vector's true nearest leaf lies under one of its `route` nearest
  * supers — GUARANTEED at route = groups (every leaf reachable),
  * data-dependent below it. The registered queries
  * (q_ann_ivf_hier / q_semdedup_hier, whose oracles are the flat
  * pipelines' own SQL) run route = groups: what the two-level shape
  * buys at scale is dropping the LEAF-TABLE BROADCAST, and that is
  * bought in exact mode too. route < groups is the nprobe-like
  * recall/cost knob for corpora with real cluster structure — on
  * THIS repo's near-orthogonal synthetic embeddings super-routing
  * carries no locality signal (measured: route = 3 of 4 still
  * diverges), so exact mode is the only hash-stable setting here.
  */
object HierAssign {

  /** Default fan-out: G = ⌈√K⌉ supers keeps both the broadcast (G)
    * and the per-group leaf lists (~K/G) at √K — the balanced
    * two-level split.
    */
  def defaultGroups(cells: Int): Int =
    math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)

  /** Float-layout assignment (the lowest-id anchor layout of
    * [[DedupOps]]' semAssign and [[AnnOps]]' assignCells): `cents` is
    * (cell, c_emb: array<float>, c_nrm: double), `e` is (vec_id,
    * embedding, nrm). Returns (vec_id, cell, ccos) — the flat
    * assignment's exact schema, ccos = the winning rounded cosine.
    */
  def assignFloat(e: DataFrame, cents: DataFrame,
      groups: Int, route: Int): DataFrame = {
    val supers = broadcast(cents.filter(col("cell") < groups)
      .select(col("cell").as("grp"), col("c_emb").as("g_emb"), col("c_nrm").as("g_nrm")))
    def gcos(emb: Column, nrm: Column): Column =
      round(VectorExpressions.cosineNative(col("g_emb"), col("g_nrm"), emb, nrm), 6)
    // leaf → nearest super: K × G rows, the only pass that sees every
    // leaf against every super
    val leafGrp = cents.crossJoin(supers)
      .withColumn("gc", gcos(col("c_emb"), col("c_nrm")))
      .groupBy(col("cell"))
      .agg(min(struct(negate(col("gc")).as("ng"), col("grp").as("grp"))).as("best"),
        first(col("c_emb")).as("c_emb"), first(col("c_nrm")).as("c_nrm"))
      .select(col("best.grp").as("grp"), col("cell"), col("c_emb"), col("c_nrm"))
    // vector → `route` nearest supers; only (vec_id, grp) rides out
    val vgrp = e.crossJoin(supers)
      .withColumn("gc", gcos(col("embedding"), col("nrm")))
      .groupBy(col("vec_id"))
      .agg(TopKAgg.topK(
        struct(negate(col("gc")).as("ng"), col("grp").as("grp")), route).as("_tk"))
      .select(col("vec_id"), explode(col("_tk.grp")).as("grp"))
    // resolve against the routed leaves: the grp-keyed join (no
    // broadcast hint — see the object doc), then the flat argmax
    vgrp.join(e, "vec_id").join(leafGrp, "grp")
      .withColumn("ccos", round(VectorExpressions.cosineNative(
        col("c_emb"), col("c_nrm"), col("embedding"), col("nrm")), 6))
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("ccos")).as("nc"), col("cell").as("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        negate(col("best.nc")).as("ccos"))
  }

  /** Unit-double-layout assignment (the [[Kmeans.anchors]] layout
    * behind annIvfWith): `cents` is (cell, c: unit-norm
    * array<double>), scored as dot / ‖x‖ with the SAME codegen'd
    * widened dot (and the same `roundCcos` pin) as the flat
    * annIvfWith pass, so candidate scores are bit-identical.
    * Returns (vec_id, cell, ccos).
    */
  def assignUnit(e: DataFrame, cents: DataFrame,
      groups: Int, route: Int, roundCcos: Boolean): DataFrame = {
    def anchorCos(c: Column, emb: Column, nrm: Column): Column = {
      val v = VectorExpressions.widenedDotNative(emb, c) / nrm
      if (roundCcos) round(v, 6) else v
    }
    val supers = broadcast(cents.filter(col("cell") < groups)
      .select(col("cell").as("grp"), col("c").as("g_c")))
    // leaf supers-routing scores both unit anchors with the same fold;
    // the leaf side needs (emb, nrm) shape → (c, 1.0), both unit-norm
    val leafGrp = cents.crossJoin(supers)
      .withColumn("gc", anchorCos(col("g_c"), col("c"), lit(1.0)))
      .groupBy(col("cell"))
      .agg(min(struct(negate(col("gc")).as("ng"), col("grp").as("grp"))).as("best"),
        first(col("c")).as("c"))
      .select(col("best.grp").as("grp"), col("cell"), col("c"))
    val vgrp = e.crossJoin(supers)
      .withColumn("gc", anchorCos(col("g_c"), col("embedding"), col("nrm")))
      .groupBy(col("vec_id"))
      .agg(TopKAgg.topK(
        struct(negate(col("gc")).as("ng"), col("grp").as("grp")), route).as("_tk"))
      .select(col("vec_id"), explode(col("_tk.grp")).as("grp"))
    vgrp.join(e, "vec_id").join(leafGrp, "grp")
      .withColumn("ccos", anchorCos(col("c"), col("embedding"), col("nrm")))
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("ccos")).as("nc"), col("cell").as("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        negate(col("best.nc")).as("ccos"))
  }
}
