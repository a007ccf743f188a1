package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IvfAssignStream

/** Pins the streaming IVF assignment (ingest-time index maintenance)
  * against the batch assignment pipeline BIT-FOR-BIT: same trained
  * anchors (the collected bounded artifact), same widened dot / norm
  * arithmetic, same round-6 portable pin, same lowest-cell ties —
  * across micro-batch boundaries; plus the occupancy telemetry ≡ the
  * batch cell histogram.
  */
class IvfAssignStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def anchorsDF = operators.AnnOps.trainedAnchors(spark, sf)

  private def anchorArtifact: Array[(Long, Array[Double])] = {
    import spark.implicits._
    anchorsDF.select($"cell".cast("long"), $"c").as[(Long, Array[Double])].collect()
  }

  /** The batch truth: the exact annIvfWith portable-mode assignment
    * stage (broadcast anchors, widened dot / norm rounded 6, argmax
    * via min(struct(-ccos, cell))).
    */
  private def batchAssigned: Map[Long, (Long, Double)] = {
    import graft.plans.VectorExpressions
    import spark.implicits._
    sources.Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .withColumn("nrm", VectorExpressions.normNative($"embedding"))
      .crossJoin(broadcast(anchorsDF))
      .withColumn("ccos",
        round(VectorExpressions.widenedDotNative($"embedding", $"c") / $"nrm", 6))
      .groupBy($"vec_id")
      .agg(min(struct(negate($"ccos").as("nc"), $"cell".as("cell"))).as("best"))
      .select($"vec_id", $"best.cell".cast("long"), negate($"best.nc").as("ccos"))
      .as[(Long, Long, Double)].collect()
      .map { case (v, c, s) => v -> (c, s) }.toMap
  }

  test("stream assignment equals the batch pipeline bit for bit across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id".cast("long"), $"embedding")
      .as[IvfAssignStream.Vec].collect().toSeq.sortBy(_.vec_id)
    val expected = batchAssigned
    assert(expected.nonEmpty)

    val input = MemoryStream[IvfAssignStream.Vec]
    val q = IvfAssignStream.assigned(input.toDS(), anchorArtifact)
      .writeStream.format("memory").queryName("ivf_assign_stream")
      .outputMode(OutputMode.Append).start()
    vecs.grouped(math.max(vecs.size / 3, 1)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("ivf_assign_stream")
      .select($"vec_id", $"cell", $"ccos").as[(Long, Long, Double)].collect()
      .map { case (v, c, s) => v -> (c, s) }.toMap
    assert(got.size === expected.size)
    assert(got === expected, "stream assignment diverged from the batch pipeline")
  }

  test("occupancy telemetry equals the batch cell histogram") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id".cast("long"), $"embedding")
      .as[IvfAssignStream.Vec].collect().toSeq
    val expected = batchAssigned.values.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }

    val input = MemoryStream[IvfAssignStream.Vec]
    val q = IvfAssignStream.occupancy(IvfAssignStream.assigned(input.toDS(), anchorArtifact))
      .writeStream.format("memory").queryName("ivf_occupancy")
      .outputMode(OutputMode.Complete).start()
    vecs.grouped(math.max(vecs.size / 2, 1)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("ivf_occupancy")
      .select($"cell", $"n_vectors").as[(Long, Long)].collect().toMap
    assert(got === expected, "cumulative occupancy diverged from the batch histogram")
  }
}
