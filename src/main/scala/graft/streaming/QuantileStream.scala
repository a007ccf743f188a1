package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.QuantileSketch

/** §2.F (streaming twins) — the mergeable quantile sketch maintained
  * as keyed streaming state: the live half of
  * [[graft.operators.QuantileSketch]], so a latency/score dashboard
  * reads per-key percentiles current to the last micro-batch without
  * re-scanning history.
  *
  * The batch sketch needs the per-key [lo, hi] range BEFORE it bins
  * (two passes); a stream cannot see its future range, so the stream
  * bins against a FIXED base range supplied at start — the
  * [[DriftStream]] stored-base discipline: in production the range
  * comes from the previous snapshot, and [[QuantileSketch.binOf]]'s
  * edge-clamping is exactly the documented behavior for values a
  * later shard (here: a later micro-batch) pushes outside the base
  * range.
  *
  * That fixed range is what buys the strong contract: the histogram
  * is ORDER-FREE (integer counts, bin = pure function of (v, lo, hi)
  * — the property the batch sketch was designed around, since it is
  * also what makes shards mergeable), so the stream's state after
  * any prefix EQUALS the batch histogram over the same prefix
  * against the same range — exactly, not approximately — and the
  * interpolated estimates emitted per micro-batch equal
  * [[QuantileSketch.estimates]] run on that batch histogram
  * (QuantileStreamSpec pins both, at every micro-batch boundary;
  * state is a plain (bin counts, n) tuple in the state store, so
  * recovery resumes the sketch like the suite's other keyed-state
  * twins).
  *
  * 100 TB shape: state per key is the bin array — [[QuantileSketch.Bins]]
  * longs, O(1) forever; emissions are |qs| slim rows per touched key
  * per batch.
  */
object QuantileStream {

  /** One keyed observation. */
  case class Obs(key: String, v: Double)

  /** The fixed base range one key bins against. */
  case class KeyRange(key: String, lo: Double, hi: Double)

  /** One emission: the interpolated estimate of quantile `q` for
    * `key` after folding the micro-batch; `n` = values seen so far.
    */
  case class QEst(key: String, q: Double, n: Long, est: Double)

  /** Scalar mirror of [[QuantileSketch.binOf]] — same degenerate-range
    * collapse, same edge clamping, same double arithmetic.
    */
  private[graft] def binOf(v: Double, lo: Double, hi: Double): Int = {
    if (hi == lo) 0
    else {
      val b = math.floor((v - lo) / ((hi - lo) / QuantileSketch.Bins.toDouble))
      math.min(math.max(b, 0.0), (QuantileSketch.Bins - 1).toDouble).toInt
    }
  }

  /** Scalar mirror of [[QuantileSketch.estimates]]'s rank selection +
    * interpolation: the bin where the cumulative count first reaches
    * rank q·n, interpolated by rank inside it — identical double
    * operation order, so the estimate is bit-equal to the batch
    * column expression.
    */
  private[graft] def estimate(cnts: Array[Long], n: Long, lo: Double, hi: Double,
      q: Double): Double = {
    val target = q * n
    var cum = 0L
    var bin = 0
    while (bin < cnts.length) {
      val cnt = cnts(bin)
      cum += cnt
      if (cnt > 0 && (cum - cnt).toDouble < target && cum.toDouble >= target)
        return lo + (hi - lo) / QuantileSketch.Bins.toDouble *
          (bin.toDouble + (target - (cum - cnt).toDouble) / cnt.toDouble)
      bin += 1
    }
    // unreachable while n ≥ 1 and q ∈ (0, 1]: rank ≤ n = final cum
    Double.NaN
  }

  /** Keyed running percentiles over a stream of observations, binned
    * against `base` (one fixed range per key; observations for keys
    * absent from `base` are dropped — there is nothing to bin them
    * against). Emits one [[QEst]] per quantile per touched key per
    * micro-batch (Update mode upserts).
    */
  def perKey(spark: SparkSession, obs: Dataset[Obs], base: Map[String, (Double, Double)],
      qs: Seq[Double]): Dataset[QEst] = {
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[Obs], state: GroupState[(Array[Long], Long)]) => {
          base.get(key) match {
            case None => Iterator.empty
            case Some((lo, hi)) =>
              val (cnts, seen) = state.getOption
                .getOrElse((new Array[Long](QuantileSketch.Bins), 0L))
              var n = seen
              batch.foreach { o => cnts(binOf(o.v, lo, hi)) += 1; n += 1 }
              state.update((cnts, n))
              qs.iterator.map(q => QEst(key, q, n, estimate(cnts, n, lo, hi, q)))
          }
        })
  }
}
