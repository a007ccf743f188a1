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
}
