package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.{EmbDedupStream, UpsertSink}

/** The WHOLE streaming embedding near-dup connector, composed:
  * vectors landing as files → EmbDedupStream.candidates (owner-star
  * sign-LSH state) → foreachBatch(DedupOps.verifyEmbPairs — the batch
  * pipeline's OWN exact-cosine verify) → UpsertSink pair store. The
  * embedding twin of [[NearDupConnectorE2ESpec]], proving across a
  * mid-stream restart (owner state from the checkpoint):
  *
  *  - VERIFIED stream pairs never leave the batch dedupEmbeddingFrame
  *    pair set, and carry identical cosine values (shared verify);
  *  - the near-dup CLUSTERS agree: components of the verified star
  *    equal components of the batch pair set — the owner-star
  *    contract downstream dup-clustering consumes.
  *
  * Runs on a synthetic corpus with PLANTED cos≈0.9 partners (the
  * make_sfN.py discipline): the shipped small-SF corpora have almost
  * no qualifying pairs, and an E2E over one pair would prove little.
  */
class EmbNearDupConnectorE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val NBase = 200
  private val NPlanted = 40
  private val CosT = 0.9

  /** Deterministic corpus: random unit-ish base vectors, partner
    * `u = cos·v̂ + sin·ŵ` for the first [[NPlanted]] bases.
    */
  private def corpus(): Seq[(Long, Array[Float])] = {
    val dim = EmbDedupStream.Dim
    val rnd = new scala.util.Random(4242L)
    val bases = (0 until NBase).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    val s = math.sqrt(1.0 - CosT * CosT)
    val partners = (0 until NPlanted).map { j =>
      val v = bases(j)._2
      val vn = math.sqrt(v.map(x => x * x).sum)
      val vhat = v.map(_ / vn)
      val w0 = Array.fill(dim)(rnd.nextGaussian())
      val d = w0.zip(vhat).map { case (a, b) => a * b }.sum
      val w = w0.zip(vhat).map { case (a, b) => a - d * b }
      val wn = math.sqrt(w.map(x => x * x).sum)
      val u = vhat.zip(w).map { case (a, b) => CosT * a + s * b / wn }
      ((NBase + j).toLong, u)
    }
    (bases ++ partners).map { case (id, arr) => (id, arr.map(_.toFloat)) }
  }

  /** Union-find components over a pair set, labeled by min member. */
  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("file vectors → candidates → shared exact verify → pair store equals batch embedding dedup, across a restart") {
    import spark.implicits._
    val all = corpus()
    val embDf: DataFrame = all.toDF("vec_id", "embedding")
    // batch truth at the width the deployment would pick for this
    // corpus size (the adaptive rule, decided up front for a stream)
    val bits = graft.functions.Vectors.adaptiveBitsSqlSafe(
      all.size.toLong, DedupOps.EmbBits, DedupOps.EmbBucketTarget)
    val batch = DedupOps.dedupEmbeddingFrame(
        embDf.withColumn("nrm", graft.plans.VectorExpressions.normNative(col("embedding"))),
        bits)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.size >= NPlanted / 2,
      s"batch found only ${batch.size} pairs — planted structure missing?")

    val tmp = Files.createTempDirectory("embdedup_e2e").toFile
    val feed = new java.io.File(tmp, "feed"); feed.mkdirs()
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val store = new java.io.File(tmp, "store").getAbsolutePath

    def applyVerified(cands: DataFrame, batchId: Long): Unit = {
      val verified = DedupOps.verifyEmbPairs(
          cands.select(
            least($"owner_id", $"vec_id").as("v1"),
            greatest($"owner_id", $"vec_id").as("v2")).distinct(),
          embDf)
        .withColumn("user_id", $"v1" * 1000000L + $"v2") // pair key
        .withColumn("last_ts_ns", lit(batchId))
        .withColumn("last_event_id", lit(batchId))
        .withColumn("deleted", lit(false))
      UpsertSink.applyBatch(spark, store)(verified, batchId)
    }

    def startQuery() = {
      val vecs = spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .parquet(feed.getAbsolutePath).as[EmbDedupStream.Vec]
      EmbDedupStream.candidates(spark, vecs, bits)
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[EmbDedupStream.Cand], id: Long) =>
          applyVerified(ds.toDF(), id)
        }
        .start()
    }

    // two arrivals with a full stream restart between them — planted
    // pairs straddle the split (bases land in h1, partners in h2), so
    // their buckets' owner state MUST survive via the checkpoint
    val (h1, h2) = all.sortBy(_._1).splitAt(all.size / 2)
    h1.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(feed.getAbsolutePath)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    h2.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(feed.getAbsolutePath)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val streamed = UpsertSink.read(spark, store).get
      .select($"v1", $"v2", $"cos").as[(Long, Long, Double)].collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"stream invented pairs: ${streamed -- batch}")
    val sc = components(streamed.toSeq.map(p => (p._1, p._2)))
    val bc = components(batch.toSeq.map(p => (p._1, p._2)))
    assert(sc === bc, "stream components diverge from batch components")
  }
}
