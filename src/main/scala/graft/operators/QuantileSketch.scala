package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic mergeable quantile sketch — the 100 TB replacement
  * for exact `percentile` (which buffers every value per group): a
  * fixed-bin equi-width histogram over the per-key [min, max] range,
  * with rank interpolation inside the selected bin. No reference
  * counterpart (the reference has no aggregation engine); the design
  * is the classic two-pass equi-width summary.
  *
  * Why not t-digest/KLL: those are engine-internal sketches whose
  * merge order changes the result, so they can never be hash-checked
  * against an external oracle. This histogram is ORDER-FREE — counts
  * are integers, bin assignment is a pure function of (value, lo, hi)
  * — so shards merge by `sum(cnt)` in any order and any grouping
  * (the property [[merge]]'s spec proves), and DuckDB reproduces the
  * estimate bit for bit. Accuracy is (hi−lo)/bins in VALUE terms per
  * bin, the right trade for monitoring-style percentiles.
  *
  * 100 TB shape: pass 1 is a per-key scalar min/max/count; pass 2 a
  * keyed (key, bin) count capped at `Bins` rows per key; the cum-sum
  * window runs over ≤ `Bins` rows per key — bounded by construction,
  * never by data.
  */
object QuantileSketch {

  /** Bin count — 256 gives ~0.4 % of the value range per bin. */
  val Bins = 256

  /** Pass 1: per-key value range and row count — (key, lo, hi, n). */
  def keyRange(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(value)).cast("double").as("lo"),
        max(col(value)).cast("double").as("hi"),
        count(col(value)).as("n"))

  /** Bin index of `v` in `bins` equi-width bins over [lo, hi]:
    * degenerate ranges collapse to bin 0, out-of-range values clamp to
    * the edge bins (relevant when a caller bins shard data against a
    * global range that another shard widened).
    */
  def binOf(v: Column, lo: Column, hi: Column, bins: Int = Bins): Column =
    when(hi === lo, lit(0L))
      .otherwise(least(greatest(
        floor((v - lo) / ((hi - lo) / lit(bins.toDouble))), lit(0.0)),
        lit((bins - 1).toDouble)).cast("long"))

  /** Pass 2: the sketch itself — (key, bin, cnt) against the supplied
    * range table (broadcast-sized: one row per key).
    */
  def histogram(df: DataFrame, key: String, value: String,
      range: DataFrame, bins: Int = Bins): DataFrame =
    df.filter(col(value).isNotNull)
      .join(broadcast(range.select(col(key), col("lo"), col("hi"))), key)
      .select(col(key), binOf(col(value).cast("double"), col("lo"), col("hi"), bins).as("bin"))
      .groupBy(col(key), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Shard merge: histograms built against the SAME range table
    * combine by integer count addition — order- and grouping-free.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(a.columns.dropRight(1).map(col).toSeq: _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** DuckDB mirror of the sketch arithmetic as a CTE chain
    * (rng → bn → h → c → qs → sel), shared by every sketch-backed
    * oracle so the bin formula, clamping, rank selection and NULL
    * discipline cannot drift between hand-maintained copies. Callers
    * prepend `WITH v$sfx AS (<rows carrying $key and a DOUBLE column
    * v>)` — `v$sfx` MUST already exclude NULL values, mirroring
    * [[keyRange]]/[[histogram]]'s non-null counting — and join
    * `sel$sfx` (key, q, est). `est` is the raw interpolated estimate;
    * callers round at their own output/decision boundary. `sfx`
    * disambiguates CTE names when one oracle sketches twice (the
    * robust-outliers oracle sketches the values, then the deviations).
    */
  def sqlSketchCtes(key: String, qsSql: String, bins: Int = Bins,
      sfx: String = ""): String =
    s"""rng$sfx AS (
       |  SELECT $key, min(v) lo, max(v) hi, count(*) n FROM v$sfx GROUP BY 1
       |), bn$sfx AS (
       |  SELECT v$sfx.$key,
       |         CASE WHEN hi = lo THEN 0
       |              ELSE CAST(least(greatest(floor((v - lo) / ((hi - lo) / $bins.0)), 0),
       |                        ${bins - 1}) AS BIGINT) END bin
       |  FROM v$sfx JOIN rng$sfx USING ($key)
       |), h$sfx AS (
       |  SELECT $key, bin, count(*) cnt FROM bn$sfx GROUP BY 1, 2
       |), c$sfx AS (
       |  SELECT $key, bin, cnt,
       |         sum(cnt) OVER (PARTITION BY $key ORDER BY bin) cum
       |  FROM h$sfx
       |), qs$sfx AS (
       |  SELECT unnest([$qsSql]) q
       |), sel$sfx AS (
       |  SELECT c$sfx.$key, q,
       |         lo + (hi - lo) / $bins.0 * (bin + (q * n - (cum - cnt)) / cnt) est
       |  FROM c$sfx CROSS JOIN qs$sfx JOIN rng$sfx USING ($key)
       |  WHERE cum - cnt < q * n AND cum >= q * n
       |)""".stripMargin

  /** Quantile estimates from a sketch: for each key and each q, the
    * bin holding rank q·n, linearly interpolated by rank inside it —
    * (key, q, est). The cum-sum window is per key over ≤ `bins` rows.
    */
  def estimates(hist: DataFrame, range: DataFrame, qs: Seq[Double],
      bins: Int = Bins): DataFrame = {
    val key = hist.columns.head
    val w = Window.partitionBy(col(key)).orderBy(col("bin"))
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("q", explode(array(qs.map(q => lit(q)): _*)))
      .join(broadcast(range), key)
      .withColumn("target", col("q") * col("n"))
      .filter(col("cum") - col("cnt") < col("target") && col("cum") >= col("target"))
      .select(col(key), col("q"),
        (col("lo") + (col("hi") - col("lo")) / lit(bins.toDouble) *
          (col("bin") + (col("target") - (col("cum") - col("cnt"))) / col("cnt"))).as("est"))
  }
}
