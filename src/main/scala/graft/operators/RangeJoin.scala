package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join — the range join Spark has no
  * native physical strategy for: a raw `p.t BETWEEN i.lo AND i.hi`
  * join condition plans as a broadcast-nested-loop (or worse, a
  * cartesian product), which is exactly the plan a 100 TB corpus
  * cannot run. Instead each interval explodes into the fixed-width
  * buckets it overlaps, each point carries its single bucket,
  * candidates come from a plain keyed equi-join on the bucket (plus
  * any caller equi-keys), and containment is verified exactly on the
  * survivors.
  *
  * Cost model: an interval of length L contributes ⌈L/width⌉ + 1
  * index rows, a point exactly one — with `width` on the order of the
  * typical interval length the index is O(|input|) and the join is a
  * narrow keyed shuffle that AQE can balance and skew-split like any
  * other equi-join. `width` is the fanout/selectivity dial, never a
  * correctness one (any width yields identical results; the spec
  * proves it).
  */
object RangeJoin {

  private val BucketCol = "_bkt"

  /** Inner-joins `points` to every `intervals` row whose CLOSED span
    * `[loCol, hiCol]` contains `pointCol`, optionally also matching on
    * `keys` equi-columns present on both sides. All three bound
    * columns must be integral (cast timestamps to epoch units first);
    * other column names must not collide across the two frames.
    * Intervals with `hi < lo` are treated as empty.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Long, keys: Seq[String] = Nil): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(!points.columns.contains(BucketCol) && !intervals.columns.contains(BucketCol),
      s"inputs must not carry a $BucketCol column")
    val ib = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn(BucketCol, explode(expr(s"sequence($loCol DIV $width, $hiCol DIV $width)")))
    val pb = points.withColumn(BucketCol, expr(s"$pointCol DIV $width"))
    pb.join(ib, keys :+ BucketCol, "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(BucketCol)
  }

  /** Inner-joins every `left` interval `[lLo, lHi]` to every `right`
    * interval `[rLo, rHi]` that OVERLAPS it (closed spans, shared
    * points count), optionally also matching `keys` equi-columns —
    * the interval-interval sibling of [[pointInInterval]], same
    * discipline: both sides explode into covered buckets, candidates
    * come from the keyed bucket equi-join, overlap is verified
    * exactly. A candidate pair collides in EVERY bucket both spans
    * cover, so each pair is deduplicated by an ownership rule: it is
    * emitted only from the bucket containing the overlap's START
    * (`greatest(lLo, rLo)`), which both sides are guaranteed to
    * cover — exactly-once without a distinct over the pair blowup.
    * Inverted (empty) intervals on either side match nothing.
    *
    * `bucketPairBudget` is the DEGRADE dial the hot-bucket pre-flight
    * ([[overlapSelfPreflight]]) exists to inform: pair volume per
    * bucket is nL·nR, so at 100 TB one flash-event bucket can hold
    * more candidate work than the rest of the corpus combined — AQE
    * skew-split parallelizes it, but no amount of parallelism makes a
    * 10¹² -pair bucket affordable. With a budget set, any (keys,
    * bucket) whose candidate bound nL·nR exceeds it is excluded from
    * the index on BOTH sides: overlaps whose START falls in an
    * over-budget bucket are not emitted (a deterministic, documented
    * recall cut), overlaps owned by within-budget buckets are
    * untouched, and total candidate volume is bounded by
    * budget × n_buckets. The hot set is found by two per-bucket
    * count aggregations (linear, pre-pair) and is tiny by
    * construction (each hot bucket represents ≥ budget avoided
    * candidates), so it broadcasts. `None` (default) = exact join.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      width: Long, keys: Seq[String] = Nil,
      bucketPairBudget: Option[Long] = None): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(!left.columns.contains(BucketCol) && !right.columns.contains(BucketCol),
      s"inputs must not carry a $BucketCol column")
    val lb = left.filter(col(lLo) <= col(lHi))
      .withColumn(BucketCol, explode(expr(s"sequence($lLo DIV $width, $lHi DIV $width)")))
    val rb = right.filter(col(rLo) <= col(rHi))
      .withColumn(BucketCol, explode(expr(s"sequence($rLo DIV $width, $rHi DIV $width)")))
    val bk = keys :+ BucketCol
    val (lbKept, rbKept) = bucketPairBudget match {
      case None => (lb, rb)
      case Some(budget) =>
        require(budget > 0, s"bucket pair budget must be positive, got $budget")
        val nl = lb.groupBy(bk.map(col): _*).agg(count(lit(1)).as("_nl"))
        val nr = rb.groupBy(bk.map(col): _*).agg(count(lit(1)).as("_nr"))
        val hot = nl.join(nr, bk)
          .filter(col("_nl") * col("_nr") > budget)
          .select(bk.map(col): _*)
        (lb.join(broadcast(hot), bk, "left_anti"),
          rb.join(broadcast(hot), bk, "left_anti"))
    }
    lbKept.join(rbKept, bk, "inner")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col(BucketCol) === expr(s"greatest($lLo, $rLo) DIV $width"))
      .drop(BucketCol)
  }

  /** Per-bucket pre-flight for a SELF [[intervalOverlap]] — the
    * interval-join member of the go/no-go telemetry family
    * (q_skew_profile before the salted join, q_lsh_bucket_stats
    * before the minhash pair join): pair volume in an interval
    * self-join is QUADRATIC in per-bucket concurrency, so at 100 TB
    * one hot bucket (a flash event packing n intervals into one
    * second) is the realistic failure. Emits, per bucket, the
    * interval count and the EXACT C(n, 2) candidate-pair bound that
    * bucket contributes to the self-join BEFORE overlap verification
    * and ownership dedup — one explode pass and one tiny aggregation,
    * never touching pairs, so the degrade decision (cap, sample, or
    * salt the hot bucket) is data-driven BEFORE the join is paid for.
    * Output is bounded by the covered time range / width, never by
    * pair volume.
    */
  def overlapSelfPreflight(intervals: DataFrame, loCol: String,
      hiCol: String, width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    intervals.filter(col(loCol) <= col(hiCol))
      .select(explode(expr(s"sequence($loCol DIV $width, $hiCol DIV $width)")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_intervals"))
      .select(col("bucket"), col("n_intervals"),
        expr("n_intervals * (n_intervals - 1) DIV 2").as("pair_bound"))
  }
}
