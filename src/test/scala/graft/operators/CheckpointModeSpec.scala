package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DedupOps.connectedComponents]] truncates per-round lineage with
  * RELIABLE `checkpoint` when the session has a checkpoint dir (the
  * cluster deployment: a localCheckpoint lineage dies with a lost
  * executor mid-iteration) and `localCheckpoint` otherwise (local
  * iteration). The labels must not depend on the mode — this spec
  * runs the same graph through both and demands bit-identical output,
  * and proves the checkpoint dir actually received RDD state.
  */
class CheckpointModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelsOf(): Map[Long, Long] = {
    import spark.implicits._
    // chain forcing several pointer-doubling rounds + a separate clique
    val chain = (0L until 50L).map(i => (i, i + 1))
    val clique = Seq((900L, 901L), (901L, 902L), (900L, 902L))
    DedupOps.connectedComponents((chain ++ clique).toDF("d1", "d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("reliable-checkpoint mode converges to the same labels as local mode") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "expected no checkpoint dir at test start")
    val local = labelsOf()
    val dir = Files.createTempDirectory("graft-cc-ckpt").toFile
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val reliable = labelsOf()
      assert(reliable === local)
      // the mode switch actually happened: reliable checkpoints wrote state
      val wrote = Files.walk(dir.toPath).filter(Files.isRegularFile(_)).count()
      assert(wrote > 0, "no files under the checkpoint dir — reliable mode never engaged")
    } finally {
      sc.setCheckpointDir(null) // Option(null) => None: cleanly unsets
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
    assert(sc.getCheckpointDir.isEmpty)
  }
}
