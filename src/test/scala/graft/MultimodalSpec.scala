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
