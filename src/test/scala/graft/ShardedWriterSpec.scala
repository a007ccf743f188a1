package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ShardedWriter

/** The packed-corpus write path: one parquet file per (lang, shard)
  * directory — the layout a training job addresses shard-by-shard —
  * and a lossless round trip back to the full corpus.
  */
class ShardedWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sharded write lands one file per shard directory and round-trips losslessly") {
    import spark.implicits._
    val sf = TestSpark.Sf
    val out = java.nio.file.Files.createTempDirectory("shards").toString

    val packed = ShardedWriter.writeShards(spark, sf, out)
    val assignment = packed.select($"doc_id", $"lang", $"shard")
      .as[(Long, String, Long)].collect().toSet
    assert(assignment.nonEmpty)

    // one data file per (lang, shard) leaf — no small-files fanout
    val leaves = new java.io.File(out).listFiles().filter(_.isDirectory).flatMap(
      _.listFiles().filter(_.isDirectory))
    assert(leaves.nonEmpty)
    leaves.foreach { dir =>
      val dataFiles = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(dataFiles.length === 1, s"${dir.getName}: expected exactly one file")
    }

    // round trip: every document comes back, in the shard it was assigned
    val back = spark.read.parquet(out)
      .select($"doc_id", $"lang", $"shard".cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(back === assignment)
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(back.size.toLong === nDocs)
  }
}
