package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key salting for skewed equi-joins — the manual remedy when one
  * join key carries a disproportionate share of the fact side and a
  * single reducer partition becomes the straggler. The fact side gets
  * a random-but-deterministic salt in [0, S); the (small) build side
  * is replicated S times; the join key becomes (key, salt), spreading
  * the hot key over S partitions. Results are identical to the plain
  * join — the salt is internal and dropped.
  *
  * AQE's skew-join splitting usually makes this unnecessary for
  * sort-merge joins; salting remains the tool when AQE can't help
  * (e.g. skewed aggregations feeding a join, or forced shuffle-hash
  * paths). Deterministic salt (hash of a row-unique column, not
  * rand()) keeps reruns and retries reproducible.
  */
object Salting {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `buckets` ways.
    * `saltBy` must be a row-unique (or near-unique) fact column so
    * the hot key's rows spread evenly and deterministically.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "need at least one salt bucket")
    // collision-proof internal column: a user frame already carrying
    // `_salt` must not be silently overwritten (that would corrupt its
    // data AND the join), so probe for a free name instead
    val salt = Iterator.from(0).map(i => if (i == 0) "_salt" else s"_salt$i")
      .find(n => !fact.columns.contains(n) && !dim.columns.contains(n)).get
    val saltedFact = fact.withColumn(salt, pmod(hash(saltBy), lit(buckets)))
    val saltedDim = dim.withColumn(salt,
      explode(array((0 until buckets).map(lit(_)): _*)))
    saltedFact.join(saltedDim, Seq(key, salt)).drop(salt)
  }
}
