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

  /** Sign bit of the projection of `v` onto a deterministic pseudo-random
    * hyperplane (index `seed`): the building block of random-hyperplane
    * LSH for angular distance. The hyperplane's components are derived
    * per-dimension from a splitmix-style integer mix of (seed, dim) so
    * they need no stored model and rebuild identically everywhere.
    */
  def hyperplaneBit(v: Column, seed: Int): Column = {
    // component(seed, i) in [-1, 1): deterministic integer mix → double
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => {
        val mixed = pmod(hash(lit(seed), i) cast "long", lit(100000L)).cast("double")
        x.cast("double") * (mixed / 50000.0 - 1.0)
      }),
      lit(0.0),
      (acc, x) => acc + x)
    (proj >= 0).cast("int")
  }

  /** Pack `nBits` hyperplane sign bits starting at `seedBase` into one
    * long — an LSH band signature.
    */
  def bandSignature(v: Column, seedBase: Int, nBits: Int): Column =
    (0 until nBits).map(i => hyperplaneBit(v, seedBase + i) * (1L << i)).reduce(_ + _)
}
