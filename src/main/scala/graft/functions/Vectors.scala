package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * Built from `zip_with`/`aggregate` higher-order functions so the dot
  * products run inside codegen with no UDF boundary. Elements are
  * widened to double before accumulation for cross-engine FP parity.
  */
object Vectors {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Fixed-width dot product: an unrolled 64-term (etc.) sum of
    * `element_at` products. Unlike the higher-order-function form this
    * is fully whole-stage-codegen'd — the HOF lambda interpreter costs
    * ~10× on pair-join hot paths. Fold order matches [[dot]]
    * (left-to-right from 0.0), so results are bit-identical.
    */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")).reduce(_ + _)

  /** Fixed-width L2 norm, codegen'd; fold order matches [[norm]]. */
  def normFixed(a: Column, dim: Int): Column =
    sqrt((1 to dim).map { i =>
      val e = element_at(a, i).cast("double"); e * e
    }.reduce(_ + _))

  /** Integer components of `nPlanes` deterministic pseudo-random
    * hyperplanes for random-hyperplane (angular) LSH: component
    * `(seed, i)` is `md5("seed:i")`'s first 8 hex chars as an unsigned
    * int, mod 100000, shifted to [-50000, 49999]. md5-derived so the
    * DuckDB oracle rebuilds the identical planes from SQL alone
    * (`sqlHyperplaneCte` below); integer-valued so band bits come from
    * the sign of an INTEGER dot product with the floor-quantized
    * vector — bit-for-bit portable, no FP accumulation-order hazard.
    */
  def hyperplaneWeights(nPlanes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nPlanes) { seed =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { i =>
        val h = md.digest(s"$seed:$i".getBytes("UTF-8"))
        val u32 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        u32 % 100000L - 50000L
      }
    }

  /** DuckDB CTE mirroring [[hyperplaneWeights]] +
    * [[graft.plans.VectorExpressions.HyperplaneSigsExpr]]: emits
    * `sigs(vec_id, band, sig)` for table alias `src`(vec_id, embedding)
    * with `bands × bitsPerBand` planes over `dim` dimensions.
    */
  /** The corpus-adaptive bits-per-band rule shared by
    * [[graft.operators.DedupOps.dedupEmbedding]] and its oracle:
    * enough bits that the expected band-bucket occupancy stays near
    * `target` (2^bits ∝ n keeps candidate volume LINEAR in corpus
    * size; any static bits is n²/2^bits — quadratic). The 1e-9 slack
    * inside the ceil keeps the two engines' float log2 from straddling
    * an integer boundary when n/target is an exact power of two.
    */
  def adaptiveBits(n: Long, minBits: Int, target: Int): Int =
    math.max(minBits,
      math.ceil(math.log(math.max(n, 1L).toDouble / target) / math.log(2.0) - 1e-9).toInt)

  /** Hard ceiling of the SQL mirror's plane pool:
    * [[sqlHyperplaneSigsCteAdaptive]] generates seeds from a fixed
    * `bands × MaxSqlAdaptiveBits` range and truncates with a WHERE, so
    * an adaptive bits beyond the pool would silently misalign the
    * `seed // bits` band packing between the engines. 2^20 buckets
    * ≈ 52M vectors at target 50; raise BOTH sides together to go past.
    */
  val MaxSqlAdaptiveBits = 20

  /** [[adaptiveBits]] guarded against the SQL mirror's plane-pool
    * ceiling — every operator whose oracle uses
    * [[sqlHyperplaneSigsCteAdaptive]] must size its banding through
    * THIS entry point, so the divergence fails loudly with the cause
    * named instead of surfacing as an unexplained oracle mismatch.
    */
  def adaptiveBitsSqlSafe(n: Long, minBits: Int, target: Int): Int = {
    val b = adaptiveBits(n, minBits, target)
    require(b <= MaxSqlAdaptiveBits,
      s"adaptive banding needs $b bits for n=$n (target=$target), but the SQL " +
        s"mirror's plane pool stops at $MaxSqlAdaptiveBits bits/band " +
        "(Vectors.sqlHyperplaneSigsCteAdaptive); raise MaxSqlAdaptiveBits and " +
        "the SQL pool together")
    b
  }

  /** [[sqlHyperplaneSigsCte]] with the [[adaptiveBits]] rule computed
    * IN SQL from `src`'s row count — the oracle stays a pure mirror of
    * the data-dependent banding with no value baked in.
    */
  def sqlHyperplaneSigsCteAdaptive(src: String, bands: Int, dim: Int,
      minBits: Int, target: Int, cntSrc: String = ""): String =
    s"""prm AS (
       |  SELECT greatest($minBits,
       |           CAST(ceil(log2(greatest(count(*), 1) / $target.0) - 1e-9) AS INT)) bits
       |  FROM ${if (cntSrc.nonEmpty) cntSrc else src}
       |), qv AS (
       |  SELECT vec_id, list_transform(range(0, $dim),
       |           i -> CAST(floor(embedding[i + 1]::DOUBLE * 1000000) AS BIGINT)) q
       |  FROM $src
       |), planes AS (
       |  -- range() cannot take a subquery bound; generate to the fixed
       |  -- MaxSqlAdaptiveBits ceiling (the Scala side fails loudly via
       |  -- adaptiveBitsSqlSafe before bits can exceed it) and filter
       |  -- to the adaptive count
       |  SELECT t.seed, list_transform(range(0, $dim),
       |           i -> (('0x' || substr(md5(t.seed || ':' || i), 1, 8))::BIGINT % 100000) - 50000) w
       |  FROM range(0, $bands * $MaxSqlAdaptiveBits) t(seed)
       |  WHERE t.seed < $bands * (SELECT bits FROM prm)
       |), pbits AS (
       |  SELECT qv.vec_id, p.seed,
       |         CASE WHEN CAST(list_sum(list_transform(range(0, $dim),
       |                    i -> qv.q[i + 1] * p.w[i + 1])) AS BIGINT) >= 0 THEN 1 ELSE 0 END bt
       |  FROM qv CROSS JOIN planes p
       |), sigs AS (
       |  SELECT vec_id, seed // (SELECT bits FROM prm) band,
       |         CAST(sum(bt << (seed % (SELECT bits FROM prm))) AS BIGINT) sig
       |  FROM pbits GROUP BY 1, 2
       |)""".stripMargin

  def sqlHyperplaneSigsCte(src: String, bands: Int, bitsPerBand: Int, dim: Int): String =
    s"""qv AS (
       |  SELECT vec_id, list_transform(range(0, $dim),
       |           i -> CAST(floor(embedding[i + 1]::DOUBLE * 1000000) AS BIGINT)) q
       |  FROM $src
       |), planes AS (
       |  SELECT t.seed, list_transform(range(0, $dim),
       |           i -> (('0x' || substr(md5(t.seed || ':' || i), 1, 8))::BIGINT % 100000) - 50000) w
       |  FROM range(0, ${bands * bitsPerBand}) t(seed)
       |), pbits AS (
       |  SELECT qv.vec_id, p.seed,
       |         CASE WHEN CAST(list_sum(list_transform(range(0, $dim),
       |                    i -> qv.q[i + 1] * p.w[i + 1])) AS BIGINT) >= 0 THEN 1 ELSE 0 END bt
       |  FROM qv CROSS JOIN planes p
       |), sigs AS (
       |  SELECT vec_id, seed // $bitsPerBand band,
       |         CAST(sum(bt << (seed % $bitsPerBand)) AS BIGINT) sig
       |  FROM pbits GROUP BY 1, 2
       |)""".stripMargin
}
