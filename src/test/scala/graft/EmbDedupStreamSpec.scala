package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EmbDedupStream

/** [[EmbDedupStream.bandKeys]] claims bit-for-bit equality with the
  * batch Column pipeline's (band, sig) keys — the property that makes
  * a streaming bucket THE batch bucket. Pinned here over the real
  * sf0.001 embedding corpus at both the floor width and an adaptive
  * width, exactly as [[NearDupStreamSpec]] pins the MinHash mirror.
  */
class EmbDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("JVM band keys equal the batch HyperplaneSigsExpr keys, bits = 6 and 9") {
    import graft.plans.VectorExpressions
    import spark.implicits._
    val e = sources.Tables.embeddings(spark, TestSpark.Sf)
      .select($"vec_id", $"embedding")
    for (bits <- Seq(6, 9)) {
      val batchKeys = e.select(col("vec_id"),
          posexplode(VectorExpressions.hyperplaneSigsNative(
            col("embedding"), EmbDedupStream.Bands, bits, EmbDedupStream.Dim))
            .as(Seq("band", "sig")))
        .select(col("vec_id"), concat_ws(":", col("band"), col("sig")).as("k"))
        .as[(Long, String)].collect().toSet
      val streamKeys = e.as[(Long, Array[Float])].collect().flatMap {
        case (id, emb) => EmbDedupStream.bandKeys(emb, bits).map(k => (id, k))
      }.toSet
      assert(streamKeys === batchKeys, s"band-key mirror diverges at bits=$bits")
    }
  }

  test("band keys reject a wrong-width vector loudly") {
    val ex = intercept[IllegalArgumentException] {
      EmbDedupStream.bandKeys(Array.fill(7)(0.1f), 6)
    }
    assert(ex.getMessage.contains("embedding length"))
  }
}
