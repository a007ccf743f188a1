package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.H — hybrid lexical+vector retrieval: reciprocal rank fusion
  * (Cormack, Clarke & Buettcher 2009) of the BM25 arm and the exact
  * cosine arm — the standard RAG-era retrieval composition (every
  * production vector store ships it as "hybrid search"). RRF is
  * rank-based and integer-friendly: `score(d) = Σ_arms 1/(k + rank)`
  * with k = [[RrfK]], so the oracle reproduces the fusion exactly
  * from the two arms' (integer) ranks — no score normalization across
  * heterogeneous scales, the reason RRF beats score interpolation in
  * practice and the reason it hash-checks cleanly here.
  *
  * 100 TB: each arm is already scale-shaped (BM25 = one scan + a
  * bounded global top-k; exact cosine = one streaming pass against
  * broadcast probes — swap in the IVF path unchanged when the corpus
  * outgrows brute force). The fusion itself touches only the arms'
  * top-k lists: ≤ probes × (|lex| + |vec|) rows, constant in corpus
  * size.
  */
object HybridOps {

  private[operators] val RrfK = 60
  private[operators] val VecArmK = 20
  private[operators] val HybridTopK = 10

  /** The fusion core, factored for the spec's planted-doc test: both
    * inputs carry (probe_id, doc_id, <arm>_rnk); a doc absent from an
    * arm contributes 0 from it. Per-probe top-[[HybridTopK]] by
    * (rrf desc, doc_id) through the ANN family's mergeable bounded
    * top-k — the fused input is bounded by construction (arm top-k
    * lists only), never corpus-sized.
    */
  private[operators] def rrfFuse(lex: DataFrame, vec: DataFrame): DataFrame = {
    val fused = lex.join(vec, Seq("probe_id", "doc_id"), "full_outer")
      .select(col("probe_id"), col("doc_id"), col("lex_rnk"), col("vec_rnk"),
        round(
          when(col("lex_rnk").isNotNull, lit(1.0) / (lit(RrfK) + col("lex_rnk")))
            .otherwise(lit(0.0)) +
          when(col("vec_rnk").isNotNull, lit(1.0) / (lit(RrfK) + col("vec_rnk")))
            .otherwise(lit(0.0)), 6).as("rrf"))
    AnnOps.probeTopKDesc(
        fused.withColumnRenamed("doc_id", "vec_id"), col("rrf"), HybridTopK,
        Seq("vec_id", "lex_rnk", "vec_rnk", "rrf"))
      .withColumnRenamed("vec_id", "doc_id")
      .select(col("probe_id"), col("doc_id"), col("lex_rnk"), col("vec_rnk"),
        col("rrf"), col("rnk"))
      .orderBy("probe_id", "rnk")
  }

  /** §2.H q_hybrid_rank — per probe, fuse the corpus BM25 top-k (the
    * lexical arm, shared across probes — the fixed text query) with
    * the probe's exact cosine top-[[VecArmK]] (the vector arm,
    * doc_id ≡ vec_id on this corpus). The probe's own document is
    * excluded from both arms, matching the ANN family's convention.
    */
  def hybridRank(spark: SparkSession, dir: String): DataFrame =
    hybridWith(spark, dir, AnnOps.exactCosineTopK(spark, dir, VecArmK))

  /** The whole fusion against a caller-supplied vector arm
    * (probe_id, vec_id, rnk) — lexical arm, probe set and
    * self-exclusion live HERE so the exact- and IVF-armed variants
    * cannot drift (only the arm changes, by construction).
    */
  private def hybridWith(spark: SparkSession, dir: String, vecArm: DataFrame): DataFrame = {
    val lex = TextOps.bm25(spark, dir).select(col("doc_id"), col("rnk").as("lex_rnk"))
    val vec = vecArm
      .select(col("probe_id"), col("vec_id").as("doc_id"), col("rnk").as("vec_rnk"))
    val probes = spark.range(AnnOps.NProbes).select(col("id").as("probe_id"))
    val lexPerProbe = probes.crossJoin(broadcast(lex))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"), col("lex_rnk"))
    rrfFuse(lexPerProbe, vec)
  }

  /** §2.H q_hybrid_rank_ivf — the hybrid fusion's 100 TB vector arm,
    * PROVEN not just claimed: identical fusion ([[rrfFuse]], same RRF
    * constant, same tie-breaks, same lexical arm) with the exact
    * cosine arm swapped for [[AnnOps.ivfTopK]]'s cell-bounded IVF
    * search at the same arm depth. Only the arm changes; the oracle
    * mirrors the registered q_ann_ivf pipeline at that depth, so the
    * scale-path composition is itself hash-gated.
    */
  def hybridRankIvf(spark: SparkSession, dir: String): DataFrame =
    hybridWith(spark, dir, AnnOps.ivfTopK(spark, dir, VecArmK))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rank" -> (hybridRank _),
    "q_hybrid_rank_ivf" -> (hybridRankIvf _))

  /** The shared oracle skeleton: BM25 lexical arm (the SAME
    * [[TextOps.sqlBm25Cte]] chain the registered q_bm25 mirror is
    * built from — one copy, so the fusion oracles cannot drift from
    * the lexical arm they claim to share) + a supplied
    * `vec(probe_id, doc_id, vec_rnk)` CTE + the rank-only fusion.
    * NULL rank ≡ 0 contribution.
    */
  private def fusionSql(vecCte: String): String = {
    import graft.operators.TextOps.Bm25TopK
    s"""WITH ${TextOps.sqlBm25Cte}, lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) lex_rnk
       |  FROM sc QUALIFY lex_rnk <= $Bm25TopK
       |), e AS (SELECT vec_id, embedding FROM embeddings),
       |$vecCte, lexp AS (
       |  SELECT t.i probe_id, lex.doc_id, lex.lex_rnk
       |  FROM range(0, ${AnnOps.NProbes}) t(i) CROSS JOIN lex
       |  WHERE lex.doc_id <> t.i
       |), fused AS (
       |  SELECT coalesce(l.probe_id, v.probe_id) probe_id,
       |         coalesce(l.doc_id, v.doc_id) doc_id,
       |         l.lex_rnk, v.vec_rnk,
       |         round(coalesce(1.0 / ($RrfK + l.lex_rnk), 0)
       |             + coalesce(1.0 / ($RrfK + v.vec_rnk), 0), 6) rrf
       |  FROM lexp l FULL OUTER JOIN vec v
       |    ON l.probe_id = v.probe_id AND l.doc_id = v.doc_id
       |)
       |SELECT probe_id, doc_id, lex_rnk, vec_rnk, rrf,
       |       row_number() OVER (PARTITION BY probe_id ORDER BY rrf DESC, doc_id) rnk
       |FROM fused QUALIFY rnk <= $HybridTopK
       |ORDER BY probe_id, rnk""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // exact cosine arm (the registered q_ann_topk mirror at arm depth)
    "q_hybrid_rank" -> fusionSql(
      s"""p AS (SELECT vec_id probe_id, embedding probe_emb FROM e WHERE vec_id < ${AnnOps.NProbes}),
         |xs AS (
         |  SELECT p.probe_id, e.vec_id doc_id,
         |         ${AnnOps.sqlCos("p.probe_emb", "e.embedding")} cos
         |  FROM e CROSS JOIN p WHERE e.vec_id <> p.probe_id
         |), vec AS (
         |  SELECT probe_id, doc_id,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, doc_id) vec_rnk
         |  FROM xs QUALIFY vec_rnk <= $VecArmK
         |)""".stripMargin),
    // IVF arm (the registered q_ann_ivf mirror at arm depth) — same
    // fusion, only the arm changes
    "q_hybrid_rank_ivf" -> fusionSql(
      s"""cents AS (SELECT vec_id cell, embedding c_emb FROM e WHERE vec_id < ${AnnOps.IvfCells}),
         |asg AS (
         |  SELECT e.vec_id, cell, ${AnnOps.sqlCos("c_emb", "e.embedding")} ccos
         |  FROM e CROSS JOIN cents
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY ccos DESC, cell) = 1
         |), pc AS (
         |  SELECT p.vec_id probe_id, cell, ${AnnOps.sqlCos("c_emb", "p.embedding")} ccos
         |  FROM e p CROSS JOIN cents WHERE p.vec_id < ${AnnOps.NProbes}
         |  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY ccos DESC, cell) <= ${AnnOps.IvfProbeCells}
         |), cand AS (
         |  SELECT pc.probe_id, asg.vec_id
         |  FROM asg JOIN pc USING (cell)
         |  WHERE asg.vec_id <> pc.probe_id
         |), ivfsc AS (
         |  SELECT cand.probe_id, cand.vec_id doc_id,
         |         ${AnnOps.sqlCos("pe.embedding", "ce.embedding")} cos
         |  FROM cand JOIN e pe ON pe.vec_id = cand.probe_id
         |            JOIN e ce ON ce.vec_id = cand.vec_id
         |), vec AS (
         |  SELECT probe_id, doc_id,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, doc_id) vec_rnk
         |  FROM ivfsc QUALIFY vec_rnk <= $VecArmK
         |)""".stripMargin))
}
