package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Blob
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media table wrap + partition-batched feature extraction") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val media = Blob.asMediaTable(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq === Seq("id", "blob", "mediaType"))

    val feats = Blob.extractFeatures(spark, media).collect()
    assert(feats.length === docs.count())
    // blob is ascii text: byte stats must be in printable range, size = n_chars
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.foreach { f =>
      assert(f.nBytes.toLong === chars(f.id))
      assert(f.byteMin >= 32 && f.byteMax < 127)
      assert(f.byteMean >= f.byteMin && f.byteMean <= f.byteMax)
    }
  }

  test("blob stats reconcile with a driver-side recomputation per source") {
    val stats = graft.operators.MultimodalOps.blobStats(spark, TestSpark.Sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(stats.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val bytes = rows.map(_._2.getBytes("UTF-8").length.toLong)
      val (n, total, mx, distinct, dups) = stats(src)
      assert(n === rows.length.toLong, s"$src n_blobs")
      assert(total === bytes.sum, s"$src total_bytes")
      assert(mx === bytes.max, s"$src max_bytes")
      assert(distinct === rows.map(_._2).distinct.length.toLong, s"$src n_distinct")
      assert(dups === n - distinct, s"$src n_dup_blobs")
    }
  }

  test("frame sampling: stride honored, ordinals dense over sampled frames, tail frame partial") {
    import spark.implicits._
    val media = Seq(
      (1L, ("a" * 130).getBytes("UTF-8"), "application/octet-stream"), // 3 frames of 64: idx 0,1,2
      (2L, "xy".getBytes("UTF-8"), "application/octet-stream")) // one tiny frame
      .toDF("id", "blob", "mediaType")
    val frames = Blob.sampleFrames(spark, media, frameBytes = 64, stride = 2).collect()
    val d1 = frames.filter(_.id == 1L).sortBy(_.frame_idx)
    assert(d1.map(_.frame_idx).toSeq === Seq(0L, 2L)) // stride 2 keeps 0 and 2
    assert(d1.head.n_bytes === 64L)
    assert(d1.last.n_bytes === 2L) // 130 = 64 + 64 + 2 — partial tail kept
    assert(d1.forall(_.byte_mean === 'a'.toInt.toDouble))
    val d2 = frames.filter(_.id == 2L)
    assert(d2.map(f => (f.frame_idx, f.n_bytes)).toSeq === Seq((0L, 2L)))
  }
}
