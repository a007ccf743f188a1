package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.J — multimodal binary-column pipeline (query surface).
  *
  * The testdata carries no media blobs, so the blob here is the
  * document body as `binary`; the *plumbing* — binary column + typed
  * metadata struct + per-blob feature extraction — is exactly the
  * shape a real image/audio column takes. The real decoder lives in
  * graft.multimodal.Blob and is stubbed (no media libs in this
  * environment); everything around it is real and tested.
  */
object MultimodalOps {

  /** Byte-level feature extraction over the blob column: size, content
    * signature, sampled byte values (a stand-in for frame sampling).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("blob"),
        col("source"))
      .select(
        col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        substring(md5(col("blob")), 1, 8).as("sig8"),
        ascii(substring(col("blob").cast("string"), 1, 1)).as("first_byte"),
        ascii(expr("substring(cast(blob as string), (length(blob) + 1) DIV 2, 1)")).as("mid_byte"),
        ascii(expr("substring(cast(blob as string), length(blob), 1)")).as("last_byte"),
        col("source"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> (multimodalFeatures _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  length(text) AS n_bytes,
        |  substr(md5(text), 1, 8) AS sig8,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  ascii(substr(text, (length(text) + 1) // 2, 1)) AS mid_byte,
        |  ascii(substr(text, length(text), 1)) AS last_byte,
        |  source
        |FROM documents ORDER BY doc_id""".stripMargin)
}
