package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the classic 100 TB shuffle reducer:
  * build a compact bitmap of the build side's join keys, broadcast it,
  * and drop probe rows that cannot match BEFORE the join's shuffle.
  * When the join is selective (most probe rows match nothing), the
  * wide fact scan shrinks by the filter's selectivity for the cost of
  * one tiny broadcast — the manual form of the runtime row-level
  * filtering modern optimizers inject.
  *
  * Everything is DataFrame-native: the bitmap is built by a map-side
  * combinable `bit_or` aggregation (never a driver-side sketch), is
  * carried as ONE row holding an `array<long>` (m/64 words — 16 KB at
  * m = 2^17), and rides a broadcast crossJoin into a pure projection
  * filter on the probe side: no extra shuffle anywhere. Hashes are
  * md5-derived, so membership is deterministic and engine-portable
  * like every other hash decision in this repo.
  *
  * The filter is one-sided: NO FALSE NEGATIVES (a true match always
  * survives, BloomFilterSpec proves it), so following it with the
  * exact join preserves semantics bit for bit; false positives only
  * cost the exact join a little extra input.
  */
object BloomFilter {

  /** `k` bit positions of `key` in an `mBits`-bit filter. xxhash64
    * (not md5): the membership check runs per PROBE ROW in the hot
    * path, xxhash64 is a codegen'd native expression an order of
    * magnitude cheaper than md5's hex round-trip, and no oracle
    * mirrors the bitmap so cross-engine portability isn't needed —
    * determinism within Spark is (xxhash64 is seed-stable).
    */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      pmod(xxhash64(lit(i), key), lit(mBits.toLong))
    }

  /** Builds the bitmap: one row, `bits` = dense `array<long>` of
    * m/64 or-ed words. The position stream partial-aggregates
    * map-side; the final single-row assembly touches only the ≤ m/64
    * distinct words.
    */
  def buildBits(build: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    val nWords = mBits / 64
    val pos = build.select(explode(array(positions(col(keyCol), mBits, k): _*)).as("p"))
      .select(call_function("div", col("p"), lit(64L)).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("mask"))
    pos.groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("m"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bits"))
  }

  /** Membership test of `key` against a `bits` array column: every
    * one of the k positions must be set. `forall` keeps the k hash
    * expressions inside one codegen'd projection.
    */
  def mightContain(bits: Column, key: Column, mBits: Int, k: Int): Column =
    forall(array(positions(key, mBits, k): _*), p =>
      element_at(bits, call_function("div", p, lit(64L)).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0)

  /** The probe side reduced to rows whose `probeKey` MIGHT be in the
    * filter — a superset of the true matches. One broadcast crossJoin
    * of the single bitmap row plus a projection filter; no shuffle.
    */
  def prune(probe: DataFrame, probeKey: String, bitmap: DataFrame, mBits: Int, k: Int): DataFrame = {
    require(!probe.columns.contains("_bf_bits"), "probe must not carry a _bf_bits column")
    probe.crossJoin(broadcast(bitmap.select(col("bits").as("_bf_bits"))))
      .filter(mightContain(col("_bf_bits"), col(probeKey), mBits, k))
      .drop("_bf_bits")
  }

  /** Bloom-accelerated LEFT SEMI join: prune `probe` with the filter,
    * then the exact semi join — identical results to the plain semi
    * join (no false negatives), with the shuffle fed only the
    * bloom-surviving slice.
    *
    * The semi-join condition carries the (post-filter constant-true)
    * bloom verdict `_bf_pass` on purpose: a plain key-equality
    * condition lets PushDownLeftSemiAntiJoin hoist the semi join BELOW
    * the bloom filter — feeding it the unpruned probe, exactly the
    * shuffle the filter exists to shrink. Referencing a column born
    * above the bitmap crossJoin makes that descent illegal, pinning
    * filter-then-join without any materialization barrier.
    */
  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 1 << 17, k: Int = 5): DataFrame = {
    require(!probe.columns.contains("_bf_bits") && !probe.columns.contains("_bf_tag")
        && !probe.columns.contains("_bf_build_key"),
      "probe must not carry _bf_bits/_bf_tag/_bf_build_key columns")
    val bitmap = buildBits(build, buildKey, mBits, k)
    // _bf_tag is 0 for every row but DERIVES from the bitmap column,
    // and it rides inside the equi-join key expression: any conjunct
    // referencing only probe columns gets extracted and the semi join
    // pushed below the bloom filter (PushDownLeftSemiAntiJoin),
    // feeding it the unpruned probe — a bitmap-derived key term makes
    // that descent illegal while hashing identically to the plain key.
    // 8 bytes per row on the shuffle, vs the 16 KB bitmap it anchors.
    probe.crossJoin(broadcast(bitmap.select(col("bits").as("_bf_bits"))))
      .filter(mightContain(col("_bf_bits"), col(probeKey), mBits, k))
      .withColumn("_bf_tag",
        call_function("shiftright", size(col("_bf_bits")), lit(31)).cast("long"))
      .drop("_bf_bits")
      // the build key joins under a reserved alias: with probeKey ==
      // buildKey (the common same-name join) a bare col(buildKey)
      // would be ambiguous against the probe side after the join
      .join(build.select(col(buildKey).as("_bf_build_key")),
        (col(probeKey) + col("_bf_tag")) === col("_bf_build_key"), "left_semi")
      .drop("_bf_tag")
  }
}
