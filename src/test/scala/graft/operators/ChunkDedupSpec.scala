package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[DedupOps.chunkDedupFrame]] (content-defined chunking dedup)
  * against an independent driver-side reference implementation, plus
  * the structural edge cases the zip/pad/explode plumbing must get
  * right: docs shorter than the window, docs of EXACTLY the window
  * length, a boundary at position 0, boundary re-synchronization
  * across distinct prefixes, and invariance to input partitioning
  * (the property that makes the shared-count aggregation
  * shard-mergeable on a real cluster).
  */
class ChunkDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = DedupOps.ChunkK
  private val Div = DedupOps.ChunkDiv

  // ---- driver-side reference (mirrors Hashing.hex32 / md5 chunking) ----

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hex32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def isBoundary(window: Seq[String]): Boolean =
    hex32(window.mkString(" ")) % Div == 0

  /** Expected (n_chunks, n_shared, shared_frac) per doc_id. */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    val chunked: Seq[(Long, Seq[String])] = docs.map { case (id, text) =>
      // limit -1: Spark's split KEEPS trailing empty tokens, Scala's
      // default drops them — the reference must tokenize identically
      val toks = text.split(" ", -1).toSeq
      val flags = toks.indices.map(p =>
        if (p + K <= toks.length && isBoundary(toks.slice(p, p + K))) 1L else 0L)
      val chunkIds = flags.scanLeft(0L)(_ + _).tail // inclusive running sum
      val hashes = toks.zip(chunkIds).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, tf) => md5hex(tf.map(_._1).mkString(" ")) }
      (id, hashes)
    }
    val sharedHashes = chunked.flatMap { case (id, hs) => hs.distinct.map(h => (h, id)) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    chunked.map { case (id, hs) =>
      val n = hs.size.toLong
      val s = hs.count(sharedHashes.contains).toLong
      id -> ((n, s, BigDecimal(s.toDouble / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], parts: Int = 4): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text").repartition(parts)
    DedupOps.chunkDedupFrame(df)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  // Deterministic vocab + corpus.
  private val vocab = (0 until 50).map(i => s"t$i")
  private def randDoc(rng: scala.util.Random, len: Int): String =
    Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  /** First window of K vocab tokens whose hash is ≡ 0 (mod Div). */
  private lazy val boundaryWindow: Seq[String] = {
    val rng = new scala.util.Random(7)
    Iterator.continually(Seq.fill(K)(vocab(rng.nextInt(vocab.size))))
      .find(isBoundary).get
  }

  test("matches the driver-side reference on a random mixed-length corpus") {
    val rng = new scala.util.Random(42)
    // lengths deliberately straddle the window size: 1..K-1, K, K+1, long
    val lens = Seq(1, 2, K - 1, K, K + 1, K + 2) ++ Seq.fill(34)(5 + rng.nextInt(26))
    val docs = lens.zipWithIndex.map { case (l, i) => (i.toLong, randDoc(rng, l)) }
    assert(run(docs) === reference(docs))
  }

  test("doc shorter than the chunk window is a single unshared chunk") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma"))
    val out = run(docs)
    assert(out === reference(docs))
    assert(out(1L) === ((1L, 0L, 0.0)))
    assert(out(2L) === ((1L, 0L, 0.0)))
  }

  test("trailing and double spaces produce empty tokens, handled identically to Spark's split") {
    val rng = new scala.util.Random(31)
    val docs = Seq(
      (1L, randDoc(rng, 9) + " "),          // trailing empty token
      (2L, randDoc(rng, 4) + "  " + randDoc(rng, 4)), // interior empty token
      (3L, randDoc(rng, 9) + " "))
    assert(run(docs) === reference(docs))
  }

  test("doc of exactly K tokens aligns the single window with the zero padding") {
    // exactly one hash window; padded flag array must come out |toks| long
    val rng = new scala.util.Random(3)
    val docs = (0 until 8).map(i => (i.toLong, randDoc(rng, K)))
    assert(run(docs) === reference(docs))
  }

  test("doc with no boundary hit anywhere stays one chunk") {
    // grow a doc token-by-token, rejecting any token that creates a boundary
    val rng = new scala.util.Random(11)
    val toks = scala.collection.mutable.ArrayBuffer[String]()
    while (toks.length < 20) {
      val cand = vocab(rng.nextInt(vocab.size))
      toks += cand
      if (toks.length >= K && isBoundary(toks.takeRight(K).toSeq)) toks.remove(toks.length - 1)
    }
    val docs = Seq((1L, toks.mkString(" ")))
    val out = run(docs)
    assert(out === reference(docs))
    assert(out(1L)._1 === 1L)
  }

  test("boundary at position 0 still yields a well-formed single leading chunk") {
    // doc STARTS on a boundary window; running-sum chunk ids then start
    // at 1 with no chunk 0 — n_chunks must count groups, not max id
    val rng = new scala.util.Random(13)
    val toks = scala.collection.mutable.ArrayBuffer[String](boundaryWindow: _*)
    while (toks.length < 15) {
      val cand = vocab(rng.nextInt(vocab.size))
      toks += cand
      if (isBoundary(toks.takeRight(K).toSeq)) toks.remove(toks.length - 1)
    }
    assert(isBoundary(toks.take(K).toSeq))
    val docs = Seq((1L, toks.mkString(" ")))
    val out = run(docs)
    assert(out === reference(docs))
    assert(out(1L)._1 === 1L) // only the boundary-opened chunk exists
  }

  test("a shared section behind a boundary is detected across docs with distinct prefixes") {
    val rng = new scala.util.Random(17)
    val tail = Seq.fill(10)(vocab(rng.nextInt(vocab.size)))
    val shared = (boundaryWindow ++ tail).mkString(" ")
    val docs = Seq(
      (1L, s"${randDoc(rng, 8)} $shared"),
      (2L, s"${randDoc(rng, 12)} $shared"))
    val out = run(docs)
    assert(out === reference(docs))
    // the boundary re-sync guarantees the embedded section chunks
    // identically in both docs regardless of prefix offset
    assert(out(1L)._2 >= 1L)
    assert(out(2L)._2 >= 1L)
  }

  test("result is invariant to input partitioning (shard-mergeable aggregation)") {
    val rng = new scala.util.Random(23)
    val docs = (0 until 24).map(i => (i.toLong, randDoc(rng, 3 + rng.nextInt(25))))
    assert(run(docs, parts = 1) === run(docs, parts = 7))
  }
}
