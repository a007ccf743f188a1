package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Physical shard layout — the write side of
  * [[graft.operators.CorpusOps.packShards]]: the curated corpus lands
  * partitioned by (lang, shard) so a training job addresses one
  * directory per fixed-token-budget shard and language filters become
  * partition pruning instead of scans.
  *
  * The repartition ON the partition columns is the load-bearing line:
  * `partitionBy` writes one file per (task × partition value), so an
  * unpartitioned-in-memory frame fans every task out over every shard
  * directory — the classic many-small-files failure at 100 TB (10⁵
  * tasks × 10⁴ shards = 10⁹ files). Shuffling to one partition per
  * (lang, shard) first yields exactly one parquet file per shard
  * directory; at cluster scale the same exchange also bounds memory:
  * each write task holds one shard, not the whole cross product.
  */
object ShardedWriter {

  /** Pack `documents` under `sfDir` and write them sharded to `outPath`.
    * Returns the shard assignment that was written (doc_id → lang/shard).
    */
  def writeShards(spark: SparkSession, sfDir: String, outPath: String): DataFrame = {
    val packed = CorpusOps.packShards(spark, sfDir)
    Tables.documents(spark, sfDir)
      .join(packed.select(col("doc_id"), col("est_tokens"), col("shard")), "doc_id")
      .repartition(col("lang"), col("shard"))
      .write
      .partitionBy("lang", "shard")
      .mode(SaveMode.Overwrite)
      .parquet(outPath)
    packed
  }
}
