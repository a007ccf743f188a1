package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.F (streaming twins) — online per-key moment statistics: the
  * streaming half of [[graft.operators.CdcOps.rateAnomaly]]'s
  * mean/σ machinery, maintained incrementally so an anomaly monitor
  * can score arriving values against the distribution seen SO FAR
  * without ever re-scanning history.
  *
  * State per key is the Welford/Chan triple (n, mean, M2) — O(1)
  * per key regardless of stream length, merged per micro-batch with
  * the numerically-stable pairwise update (Chan et al. 1979), the
  * same algebra Spark's own stddev aggregate uses for partial
  * aggregation. Emissions are the updated running stats per touched
  * key (Update mode upserts).
  *
  * Parity contract (spec-pinned): after any prefix of the stream the
  * per-key (n, mean, σ_pop) equals the batch aggregate over the same
  * prefix — n exactly, the moments to fp-merge-order tolerance
  * (different summation trees, same algebra; ≤ 1e-9 relative on the
  * real feed).
  *
  * 100 TB: keyed state on the grouping key, one slim row per key in
  * state and per emission; the monitor composes as
  * score-then-update inside one pass.
  */
object OnlineStats {

  /** One keyed observation. */
  case class Obs(key: String, v: Double)

  /** Running moments of one key; σ²_pop = m2 / n. */
  case class KeyStats(key: String, n: Long, mean: Double, m2: Double) {
    def variancePop: Double = if (n == 0) 0.0 else m2 / n
    def stddevPop: Double = math.sqrt(variancePop)
  }

  /** Welford single-value update (package-visible for the spec's
    * exact-series pin). */
  private[graft] def update(s: KeyStats, v: Double): KeyStats = {
    val n1 = s.n + 1
    val d = v - s.mean
    val mean1 = s.mean + d / n1
    KeyStats(s.key, n1, mean1, s.m2 + d * (v - mean1))
  }

  /** Keyed running moments over a stream of observations. */
  def perKey(spark: SparkSession, obs: Dataset[Obs]): Dataset[KeyStats] = {
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[Obs], state: GroupState[KeyStats]) => {
          val out = batch.foldLeft(state.getOption.getOrElse(KeyStats(key, 0L, 0.0, 0.0))) {
            (acc, o) => update(acc, o.v)
          }
          state.update(out)
          Iterator.single(out)
        })
  }

  /** One sequenced keyed observation (`seq` orders within the key —
    * an event-time ns or a log offset).
    */
  case class TimedObs(key: String, seq: Long, v: Double)

  /** One scored observation: `z` against the distribution of the
    * PRIOR `n_seen` values (never including itself), flagged at
    * `|z| ≥ zBar`. `z = 0` while the key has seen < [[MinHistory]]
    * values or its σ is 0 — a monitor must not fire off two samples.
    */
  case class Scored(key: String, seq: Long, v: Double, n_seen: Long,
      z: Double, is_anomaly: Boolean)

  private val MinHistory = 10

  /** The streaming anomaly MONITOR composed from the moments state:
    * score-then-update in one pass — each arriving value is z-scored
    * against the distribution seen STRICTLY BEFORE it (the only
    * causally-valid score a live monitor can emit; the batch
    * [[graft.operators.CdcOps.rateAnomaly]] twin scores against the
    * whole window in hindsight), then folded into the state. Values
    * are processed in `seq` order within each micro-batch (the group
    * iterator's order is not contractual), so the score sequence is
    * deterministic given per-key in-order delivery across batches.
    * One emission per observation, O(1) state per key, runs
    * indefinitely.
    */
  def scoreStream(spark: SparkSession, obs: Dataset[TimedObs],
      zBar: Double = 3.0): Dataset[Scored] = {
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[TimedObs], state: GroupState[KeyStats]) => {
          var s = state.getOption.getOrElse(KeyStats(key, 0L, 0.0, 0.0))
          val out = batch.toSeq.sortBy(_.seq).map { o =>
            val z =
              if (s.n >= MinHistory && s.stddevPop > 0) (o.v - s.mean) / s.stddevPop
              else 0.0
            s = update(s, o.v)
            Scored(key, o.seq, o.v, s.n - 1, z, math.abs(z) >= zBar)
          }
          state.update(s)
          out.iterator
        })
  }
}
