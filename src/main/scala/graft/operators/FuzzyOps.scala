package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text
import graft.sources.Tables

/** §2.C — fuzzy entity resolution, from the reference's
  * src/services/halalService.ts.
  *
  * The reference resolves each merchant against the halal register with
  * a tier ladder: exact cleaned-name (+postal confirmation) first, then
  * a word-overlap similarity match with postal-preference tie-breaking
  * (halalService.ts:103-177). Here the two "registers" are derived
  * decorations of the part table so the join has genuine dup groups.
  *
  * Scale design: candidate pairs are ONLY generated through a
  * token-blocked inverted-index join (explode distinct tokens → equi
  * join on token) — never a cross join — so the shuffle is keyed by
  * token and the pair space stays proportional to real overlap.
  */
object FuzzyOps {

  private def tokensOf(c: Column): Column = array_distinct(split(c, " "))

  /** halalService.ts:249-257 — name normalization over decorated names. */
  def cleanNameQ(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        concat(col("p_name"),
          when(col("p_partkey") % 2 === 0, lit(" Pte. Ltd. Stall 12"))
            .otherwise(lit(" #03-21 (Unit 4B)"))).as("raw"))
      .withColumn("cleaned", Text.cleanName(col("raw")))
      .orderBy("p_partkey")

  /** halalService.ts:107-116 — exact tier: equal cleaned names across
    * two differently-decorated sides.
    */
  def fuzzyJoinExact(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val a = p.select(col("p_partkey").as("k1"),
      Text.cleanName(concat(col("p_name"), lit(" Pte Ltd"))).as("cn"))
    val b = p.select(col("p_partkey").as("k2"),
      Text.cleanName(concat(col("p_name"), lit(" #01-77"))).as("cn"))
    a.join(b, Seq("cn")).filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"), col("cn")).orderBy("k1", "k2")
  }

  /** halalService.ts:119-164 — word-overlap (Jaccard) similarity join
    * over name+type token sets at ≥ 0.5. The reference requires ≥ 2
    * matching words (halalService.ts:138,151), which makes sorted
    * token-BIGRAM blocking lossless: any pair at the threshold shares
    * ≥ 2 tokens, hence ≥ 1 bigram. Single-token blocking on hot tokens
    * (df in the thousands) would generate ~25× the candidate pairs.
    * The shared-bigram count c = C(inter,2) recovers the exact
    * intersection arithmetically.
    */
  def tokenJaccardJoin(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.part(spark, dir)
      .select(col("p_partkey").as("k"),
        explode(tokensOf(concat(lower(col("p_name")), lit(" "), lower(col("p_type"))))).as("t"))
    val sz = tok.groupBy("k").agg(count(lit(1)).as("n"))
    val combos = tok.as("x").join(tok.as("y"),
        col("x.k") === col("y.k") && col("x.t") < col("y.t"))
      .select(col("x.k").as("k"), concat_ws(" ", col("x.t"), col("y.t")).as("c"))
      .repartition(col("c"))
    val pairs = combos.as("a").join(combos.as("b"),
        col("a.c") === col("b.c") && col("a.k") < col("b.k"))
      .groupBy(col("a.k").as("k1"), col("b.k").as("k2"))
      .agg(count(lit(1)).as("nc"))
      .withColumn("inter",
        round((lit(1) + sqrt(lit(1) + lit(8) * col("nc"))) / 2, 0).cast("long"))
    pairs
      .join(sz.as("s1"), col("k1") === col("s1.k"))
      .join(sz.as("s2"), col("k2") === col("s2.k"))
      .withColumn("jac", col("inter") / (col("s1.n") + col("s2.n") - col("inter")))
      .filter(col("jac") >= 0.5)
      .select(col("k1"), col("k2"), round(col("jac"), 6).as("jac"))
      .orderBy("k1", "k2")
  }

  /** halalService.ts:194-247 — per-word edit-distance similarity over
    * the (small, broadcastable) name vocabulary.
    */
  def levenshteinPairs(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.part(spark, dir)
      .select(explode(split(lower(col("p_name")), " ")).as("t"))
      .distinct()
    val j = vocab.as("a").crossJoin(broadcast(vocab.as("b")))
      .filter(col("a.t") < col("b.t"))
      .withColumn("maxlen", greatest(length(col("a.t")), length(col("b.t"))))
      .withColumn("sim",
        (col("maxlen") - levenshtein(col("a.t"), col("b.t"))) / col("maxlen").cast("double"))
      .filter(col("sim") >= 0.4)
    j.select(col("a.t").as("t1"), col("b.t").as("t2"), round(col("sim"), 6).as("sim"))
      .orderBy("t1", "t2")
  }

  /** halalService.ts:103-177 — the full tiered resolve: for each left
    * entity pick the single best right match by
    * (tier, postal-analog confirmation, similarity, key) preference.
    * Tier 1 = exact clean name + size match ("postal" confirmation),
    * tier 2 = exact clean name, tier 3 = Jaccard ≥ 0.5.
    */
  def fuzzyResolve(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val left = p.select(col("p_partkey").as("lk"), col("p_size").as("lsize"),
      Text.cleanName(concat(col("p_name"), lit(" Pte Ltd"))).as("lcn"))
      .withColumn("ln", size(tokensOf(col("lcn"))))
    val right = p.select(col("p_partkey").as("rk"), col("p_size").as("rsize"),
      Text.cleanName(concat(col("p_name"), lit(" "), lower(col("p_type")))).as("rcn"))
      .withColumn("rn", size(tokensOf(col("rcn"))))

    // Token-BIGRAM blocking: jaccard ≥ 0.5 over 2-3 token names forces
    // every true pair to share ≥ 2 tokens, so blocking on sorted token
    // pairs is lossless here and cuts the candidate blowup ~25× vs
    // single-token blocking (hot single tokens have df in the
    // thousands; bigrams in the hundreds). The shared-bigram count c
    // per pair equals C(inter, 2), so the exact intersection size is
    // recovered arithmetically — no token arrays ever travel with
    // candidate pairs.
    def combos(tok: DataFrame, key: String): DataFrame =
      tok.as("x").join(tok.as("y"),
          col(s"x.$key") === col(s"y.$key") && col("x.t") < col("y.t"))
        .select(col(s"x.$key").as(key), concat_ws(" ", col("x.t"), col("y.t")).as("c"))
    val lt = left.select(col("lk"), explode(tokensOf(col("lcn"))).as("t"))
    val rt = right.select(col("rk"), explode(tokensOf(col("rcn"))).as("t"))
    val cand = combos(lt, "lk").repartition(col("c"))
      .join(combos(rt, "rk").repartition(col("c")), "c")
      .groupBy("lk", "rk")
      .agg(count(lit(1)).as("nc"))
      .withColumn("inter", round((lit(1) + sqrt(lit(1) + lit(8) * col("nc"))) / 2, 0).cast("long"))

    val scored = cand
      .join(left, "lk").join(right, "rk")
      .withColumn("uni", col("ln") + col("rn") - col("inter"))
      .withColumn("jac", col("inter") / col("uni").cast("double"))
      .withColumn("size_match", (col("lsize") === col("rsize")).cast("int"))
      .withColumn("tier",
        when(col("lcn") === col("rcn") && col("size_match") === 1, 1)
          .when(col("lcn") === col("rcn"), 2)
          .when(col("jac") >= 0.5, 3))
      .filter(col("tier").isNotNull)

    val w = Window.partitionBy(col("lk"))
      .orderBy(col("tier"), col("size_match").desc, col("jac").desc, col("rk"))
    scored
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") === 1)
      .select(col("lk"), col("rk"), col("tier"), col("size_match"), round(col("jac"), 6).as("jac"))
      .orderBy("lk")
  }

  /** halalService.ts:194-227 isWordSimilar — abbreviation dictionary
    * first, edit-distance fallback. Evaluated over the (tiny,
    * broadcast) name vocabulary, labeled by which sim_rule matched.
    */
  def wordSimilar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dict = Seq(
      ("restaurant", "rest"), ("restaurant", "resto"), ("kitchen", "kitch"),
      ("house", "hse"), ("corner", "cnr"), ("centre", "ctr"),
      ("international", "intl"), ("company", "co"), ("private", "pte"),
      ("limited", "ltd")).toDF("full", "abbrev")
    val vocab = Tables.part(spark, dir)
      .select(explode(split(lower(col("p_name")), " ")).as("t"))
      .distinct()
    val pairs = vocab.as("a").crossJoin(broadcast(vocab.as("b")))
      .filter(col("a.t") < col("b.t"))
      .withColumn("maxlen", greatest(length(col("a.t")), length(col("b.t"))))
      .withColumn("editsim",
        (col("maxlen") - levenshtein(col("a.t"), col("b.t"))) / col("maxlen").cast("double"))
    pairs
      .join(broadcast(dict),
        (col("a.t") === col("abbrev") && col("b.t") === col("full")) ||
          (col("a.t") === col("full") && col("b.t") === col("abbrev")), "left")
      .withColumn("sim_rule",
        when(col("full").isNotNull, "abbrev").when(col("editsim") >= 0.6, "edit"))
      .filter(col("sim_rule").isNotNull)
      .select(col("a.t").as("t1"), col("b.t").as("t2"), col("sim_rule"),
        round(col("editsim"), 6).as("editsim"))
      .orderBy("t1", "t2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean_name" -> (cleanNameQ _),
    "q_fuzzy_join_exact" -> (fuzzyJoinExact _),
    "q_token_jaccard_join" -> (tokenJaccardJoin _),
    "q_levenshtein_pairs" -> (levenshteinPairs _),
    "q_word_similar" -> (wordSimilar _),
    "q_fuzzy_resolve" -> (fuzzyResolve _))

  private val cn = Text.sqlCleanName _

  val oracle: Map[String, String] = Map(
    "q_clean_name" ->
      s"""WITH d AS (
         |  SELECT p_partkey,
         |         p_name || CASE WHEN p_partkey % 2 = 0 THEN ' Pte. Ltd. Stall 12'
         |                        ELSE ' #03-21 (Unit 4B)' END AS raw
         |  FROM part
         |)
         |SELECT p_partkey, raw, ${cn("raw")} AS cleaned FROM d ORDER BY p_partkey""".stripMargin,
    "q_fuzzy_join_exact" ->
      s"""WITH a AS (SELECT p_partkey k1, ${cn("p_name || ' Pte Ltd'")} cn FROM part),
         |     b AS (SELECT p_partkey k2, ${cn("p_name || ' #01-77'")} cn FROM part)
         |SELECT k1, k2, a.cn AS cn FROM a JOIN b USING (cn) WHERE k1 < k2 ORDER BY k1, k2""".stripMargin,
    "q_token_jaccard_join" ->
      """WITH tok AS (
        |  SELECT p_partkey k,
        |         unnest(list_distinct(string_split(lower(p_name) || ' ' || lower(p_type), ' '))) t
        |  FROM part
        |), sz AS (SELECT k, count(*) n FROM tok GROUP BY k),
        |pairs AS (
        |  SELECT a.k k1, b.k k2, count(*) inter FROM tok a JOIN tok b ON a.t = b.t AND a.k < b.k
        |  GROUP BY 1, 2
        |)
        |SELECT k1, k2, round(inter / (s1.n + s2.n - inter), 6) jac
        |FROM pairs JOIN sz s1 ON s1.k = k1 JOIN sz s2 ON s2.k = k2
        |WHERE inter / (s1.n + s2.n - inter) >= 0.5
        |ORDER BY k1, k2""".stripMargin,
    "q_levenshtein_pairs" ->
      """WITH vocab AS (SELECT DISTINCT unnest(string_split(lower(p_name), ' ')) t FROM part)
        |SELECT a.t t1, b.t t2,
        |       round((greatest(length(a.t), length(b.t)) - levenshtein(a.t, b.t))
        |             / greatest(length(a.t), length(b.t))::DOUBLE, 6) sim
        |FROM vocab a JOIN vocab b ON a.t < b.t
        |WHERE (greatest(length(a.t), length(b.t)) - levenshtein(a.t, b.t))
        |      / greatest(length(a.t), length(b.t))::DOUBLE >= 0.4
        |ORDER BY t1, t2""".stripMargin,
    "q_word_similar" ->
      """WITH vocab AS (SELECT DISTINCT unnest(string_split(lower(p_name), ' ')) t FROM part),
        |dict(yfull, yabbrev) AS (VALUES
        |  ('restaurant','rest'), ('restaurant','resto'), ('kitchen','kitch'),
        |  ('house','hse'), ('corner','cnr'), ('centre','ctr'),
        |  ('international','intl'), ('company','co'), ('private','pte'),
        |  ('limited','ltd')),
        |pairs AS (
        |  SELECT a.t t1, b.t t2,
        |         (greatest(length(a.t), length(b.t)) - levenshtein(a.t, b.t))
        |           / greatest(length(a.t), length(b.t))::DOUBLE editsim
        |  FROM vocab a JOIN vocab b ON a.t < b.t
        |), lab AS (
        |  SELECT t1, t2, editsim,
        |         CASE WHEN EXISTS (SELECT 1 FROM dict
        |                           WHERE (t1 = yabbrev AND t2 = yfull)
        |                              OR (t1 = yfull AND t2 = yabbrev)) THEN 'abbrev'
        |              WHEN editsim >= 0.6 THEN 'edit' END sim_rule
        |  FROM pairs
        |)
        |SELECT t1, t2, sim_rule, round(editsim, 6) editsim FROM lab
        |WHERE sim_rule IS NOT NULL ORDER BY t1, t2""".stripMargin,
    "q_fuzzy_resolve" ->
      s"""WITH l AS (
         |  SELECT p_partkey lk, p_size lsize, ${cn("p_name || ' Pte Ltd'")} lcn FROM part
         |), lt AS (SELECT lk, lsize, lcn, list_distinct(string_split(lcn, ' ')) ltoks FROM l),
         |r AS (
         |  SELECT p_partkey rk, p_size rsize, ${cn("p_name || ' ' || lower(p_type)")} rcn FROM part
         |), rt AS (SELECT rk, rsize, rcn, list_distinct(string_split(rcn, ' ')) rtoks FROM r),
         |cand AS (
         |  SELECT DISTINCT a.lk, b.rk
         |  FROM (SELECT lk, unnest(ltoks) t FROM lt) a
         |  JOIN (SELECT rk, unnest(rtoks) t FROM rt) b USING (t)
         |), scored AS (
         |  SELECT lk, rk,
         |         len(list_intersect(ltoks, rtoks)) inter,
         |         len(list_distinct(list_concat(ltoks, rtoks))) uni,
         |         len(list_intersect(ltoks, rtoks)) / len(list_distinct(list_concat(ltoks, rtoks)))::DOUBLE jac,
         |         CASE WHEN lsize = rsize THEN 1 ELSE 0 END size_match,
         |         CASE WHEN lcn = rcn AND lsize = rsize THEN 1
         |              WHEN lcn = rcn THEN 2
         |              WHEN len(list_intersect(ltoks, rtoks)) / len(list_distinct(list_concat(ltoks, rtoks)))::DOUBLE >= 0.5 THEN 3
         |         END tier
         |  FROM cand JOIN lt USING (lk) JOIN rt USING (rk)
         |)
         |SELECT lk, rk, tier, size_match, round(jac, 6) jac
         |FROM scored
         |WHERE tier IS NOT NULL
         |QUALIFY row_number() OVER (PARTITION BY lk ORDER BY tier, size_match DESC, jac DESC, rk) = 1
         |ORDER BY lk""".stripMargin)
}
