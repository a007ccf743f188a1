package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-dup candidate generation — the
  * streaming twin of the candidate stage of
  * [[graft.operators.DedupOps.dedupMinhash]]: same 3-token shingles,
  * same md5-string minhash "permutations", same band keys, so a band
  * bucket here is bit-for-bit the batch pipeline's bucket (the mirror
  * is spec-pinned against the Column implementation).
  *
  * State discipline for an unbounded ingest: each band bucket keeps
  * ONE record — the bucket's first-arrival OWNER — and every later
  * member pairs with the owner (a star, not a clique). The star spans
  * the same connected components as the batch pair clique (every
  * member is connected through the owner), which is what downstream
  * dup-clustering consumes; the price is pair-level completeness, the
  * reward is state and output LINEAR in bucket membership instead of
  * quadratic — a boilerplate bucket hit by a million pages costs a
  * million emissions, not half a trillion. Exact-measure verification
  * stays downstream exactly as in the batch pipeline (LSH prunes,
  * never invents).
  */
object NearDupStream {

  // the batch pipeline's own tuning — referenced, not duplicated, so
  // retuning DedupOps retunes this mirror with it
  private[graft] def ShingleK: Int = graft.operators.DedupOps.ShingleK
  private[graft] def Bands: Int = graft.operators.DedupOps.Bands
  private[graft] def Rows: Int = graft.operators.DedupOps.Rows

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One doc's membership in one band bucket. */
  case class BandMember(band_key: String, doc_id: Long)
  /** Keyed state: the bucket's first-arrival owner. */
  case class Owner(band_key: String, owner_id: Long)
  /** Emitted candidate: `doc_id` collided with the bucket owner. */
  case class Cand(band_key: String, owner_id: Long, doc_id: Long)

  private def md5hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val bytes = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** JVM-side mirror of the [[graft.functions.Hashing]] md5-string
    * minhash band keys (identical input strings ⇒ identical hex), so
    * these buckets ARE the batch pipeline's buckets. Tokenization uses
    * `split(" ", -1)`: Spark's `split` keeps trailing empty tokens and
    * Scala's default `split` drops them — the mirror must keep them or
    * any text with a trailing space buckets differently from batch.
    * Docs with no [[ShingleK]]-token shingle produce no membership,
    * matching the batch `size(sh) > 0` filter. One reused digest per
    * call, table-driven hex — this runs per document on the ingest hot
    * path (Bands×Rows digests per shingle).
    */
  private[graft] def bandKeys(text: String): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sh = text.split(" ", -1).sliding(ShingleK)
      .filter(_.length == ShingleK).map(_.mkString(" ")).toSet
    if (sh.isEmpty) Seq.empty
    else (0 until Bands).map { b =>
      val parts = (0 until Rows).map(r =>
        sh.map(s => md5hex(md, s"${b * Rows + r}:" + s)).min)
      md5hex(md, parts.mkString("|"))
    }.distinct
  }

  /** The streaming candidate generator: one keyed-state record per
    * band bucket, candidates emitted against the bucket owner. Within
    * a trigger batch arrivals are ordered by doc_id, so the owner of a
    * fresh bucket is the batch's lowest doc_id (deterministic under
    * replay of the same batches).
    */
  def candidates(spark: SparkSession, docs: Dataset[CdcStream.Doc]): Dataset[Cand] = {
    import spark.implicits._
    docs.flatMap(d => bandKeys(d.text).map(k => BandMember(k, d.doc_id)))
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[BandMember], state: GroupState[Owner]) => {
          val arrivals = batch.map(_.doc_id).toSeq.distinct.sorted
          state.getOption match {
            case Some(o) =>
              arrivals.filter(_ != o.owner_id).map(d => Cand(key, o.owner_id, d)).iterator
            case None =>
              val owner = arrivals.head
              state.update(Owner(key, owner))
              arrivals.drop(1).map(d => Cand(key, owner, d)).iterator
          }
        })
  }
}
