package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.CoreOps

/** §2.F (streaming twins) — the HyperLogLog sketch maintained as
  * keyed streaming state: the live half of
  * [[graft.operators.CoreOps.approxDistinct]]'s cardinality pipeline,
  * so a dashboard reads per-key distinct-count estimates that are
  * current to the last micro-batch without ever re-scanning the
  * stream's history.
  *
  * State per key is the dense register array — [[CoreOps.HllM]]
  * bytes, O(1) regardless of stream length (THE reason HLL is the
  * 100 TB cardinality sketch: the same 1 KiB that lets shards merge
  * by register max lets a stream fold forever). Every update is the
  * batch pipeline's own algebra on the same 60-bit md5-derived hash:
  * bucket = h mod m, rho = position of the remaining word's leading
  * bit, register = max. The estimate emitted per touched key per
  * micro-batch applies the identical integer scaled-sum and
  * small-range correction — same constants, same operation order —
  * so the stream's answer is not merely close to the batch sketch
  * over the same prefix, it is EQUAL (HllStreamSpec pins register
  * table and estimate, exactly, against the batch pipeline at every
  * batch boundary).
  *
  * Restarts: the register array lives in the state store, so
  * recovery resumes the sketch (standard checkpointed-state
  * semantics, same as the suite's other keyed-state twins).
  */
object HllStream {

  /** One keyed observation: `h` is the 60-bit hash
    * ([[CoreOps.hash60]] — the SAME derivation the batch pipeline
    * applies, which is what makes stream ≡ batch exact).
    */
  case class KeyedHash(key: String, h: Long)

  /** Per-key state: the dense HLL register array (1 byte per bucket;
    * rho ≤ [[CoreOps.HllRegBits]] fits comfortably).
    */
  case class RegState(key: String, regs: Array[Byte])

  /** One emission: the key's estimate after folding the batch, with
    * the items-seen count as telemetry (not part of the sketch).
    */
  case class Estimate(key: String, n_items: Long, est: Double)

  /** rho of one hash — mirrors the batch expression
    * `when(w = 0, RegBits).otherwise(RegBits - length(bin(w)))`
    * (`length(bin(w))` = 64 − nlz(w) for w > 0).
    */
  private[graft] def rho(h: Long): Int = {
    val w = h / CoreOps.HllM
    if (w == 0) CoreOps.HllRegBits
    else CoreOps.HllRegBits - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  /** The estimate of one register array — the batch
    * [[CoreOps.hllFromRegs]] math verbatim: integer scaled sum
    * (absent buckets contribute 2^51 exactly), one division, the
    * small-range ln correction. All operands are exactly
    * representable, so the double result is bit-identical to the
    * batch plan's.
    */
  private[graft] def estimate(regs: Array[Byte]): Double = {
    var s = 0L
    var v = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) == 0) { s += CoreOps.HllTwoPow51; v += 1 }
      else s += 1L << (CoreOps.HllRegBits - regs(i))
      i += 1
    }
    val eRaw = CoreOps.HllC / s
    if (eRaw <= 2.5 * CoreOps.HllM && v > 0)
      CoreOps.HllM.toDouble * math.log(CoreOps.HllM.toDouble / v)
    else eRaw
  }

  /** Keyed running distinct-count estimates over a stream of hashed
    * observations; one [[Estimate]] per touched key per micro-batch
    * (Update mode upserts).
    */
  def perKey(spark: SparkSession, obs: Dataset[KeyedHash]): Dataset[Estimate] = {
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[KeyedHash], state: GroupState[(RegState, Long)]) => {
          val (st, seen) = state.getOption
            .getOrElse((RegState(key, new Array[Byte](CoreOps.HllM)), 0L))
          var n = seen
          batch.foreach { o =>
            val b = (o.h % CoreOps.HllM).toInt
            val r = rho(o.h)
            if (r > st.regs(b)) st.regs(b) = r.toByte
            n += 1
          }
          state.update((st, n))
          Iterator.single(Estimate(key, n, estimate(st.regs)))
        })
  }
}
