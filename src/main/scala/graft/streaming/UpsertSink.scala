package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.F lib — the SINK side of the CDC connector story: an
  * exactly-once upsert/delete serving store driven by
  * `writeStream.foreachBatch`, completing source (CdcEnvelope) →
  * compactor (CdcStream.compactState) → serving store.
  *
  * Structured Streaming's foreachBatch is at-least-once: after a crash
  * the last micro-batch REPLAYS with the same `batchId`. Exactly-once
  * therefore has to come from the sink, and here it is idempotence:
  *
  *   - each applied batch writes a full snapshot directory
  *     `v<batchId>` and then a commit marker `_commits/<batchId>`;
  *   - a replayed batchId whose marker exists is SKIPPED;
  *   - a crash between data write and marker leaves an uncommitted
  *     `v<batchId>` that the replay simply overwrites —
  *     readers only ever see committed versions.
  *
  * This is the classic snapshot-versioning commit protocol (what table
  * formats like the Delta/Iceberg logs generalize), built from nothing
  * but parquet + an atomic marker file.
  *
  * 100 TB: the merge is ONE keyed left_anti join of the current
  * snapshot against the batch's touched keys plus a union of the
  * batch's upserts — O(|store| scan + |batch|) per refresh with no
  * wide shuffle (both sides can be bucketed by the entity key), and
  * the store rewrite can be partition-pruned to touched partitions
  * when the snapshot is laid out by key range. Tombstones apply as
  * row REMOVAL, so the store tracks the live key set.
  */
object UpsertSink {

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitPath(storeDir: String, batchId: Long) =
    new Path(s"$storeDir/_commits/$batchId")

  /** Batch ids with a commit marker, ascending. */
  def committedBatches(spark: SparkSession, storeDir: String): Seq[Long] = {
    val fs = fileSystem(spark, storeDir)
    val dir = new Path(s"$storeDir/_commits")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName.toLong).sorted.toSeq
  }

  /** The latest committed snapshot, or None before the first commit. */
  def read(spark: SparkSession, storeDir: String): Option[DataFrame] =
    committedBatches(spark, storeDir).lastOption
      .map(id => spark.read.parquet(s"$storeDir/v$id"))

  /** Applies one compacted micro-batch (CdcStream.Compacted rows: one
    * row per touched key, `deleted = true` tombstones) to the store.
    * Idempotent per batchId — safe under foreachBatch replay. Pass
    * partially applied: `sink.writeStream.foreachBatch(
    * UpsertSink.applyBatch(spark, storeDir) _)`.
    */
  def applyBatch(spark: SparkSession, storeDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val fs = fileSystem(spark, storeDir)
    val marker = commitPath(storeDir, batchId)
    if (fs.exists(marker)) return // replayed batch: already applied
    // defensive in-batch compaction — compactState emits one row per
    // key per batch, but the sink must not corrupt the store if fed a
    // raw multi-row feed
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("last_ts_ns").desc, col("last_event_id").desc)
    val b = batch
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      .localCheckpoint() // pin: the store rewrite below must not re-pull the stream batch
    val next = read(spark, storeDir) match {
      case Some(prev) =>
        val carried = prev.join(b.select("user_id"), Seq("user_id"), "left_anti")
        carried.unionByName(b.filter(!col("deleted")).select(prev.columns.map(col): _*))
      case None => b.filter(!col("deleted")).drop("deleted")
    }
    next.write.mode("overwrite").parquet(s"$storeDir/v$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close() // marker AFTER data = the commit point
  }

  /** [[applyBatch]] generalized to an arbitrary key-column set — the
    * two-table snapshot store ([[TxnSnapshotStream]]) is keyed on
    * (user_id, child line) rather than user_id alone. Same snapshot-
    * versioned commit protocol, same idempotent replay; the caller's
    * stateful operator must emit AT MOST ONE row per key per batch
    * (flatMapGroupsWithState does by construction), so no defensive
    * in-batch window is applied. Key columns must be non-null (a NULL
    * key would silently survive the anti-join — encode absent key
    * parts, e.g. `coalesce(child_type, '∅')`).
    */
  def applyKeyedBatch(spark: SparkSession, storeDir: String, keys: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    val fs = fileSystem(spark, storeDir)
    val marker = commitPath(storeDir, batchId)
    if (fs.exists(marker)) return // replayed batch: already applied
    val b = batch.localCheckpoint() // pin: the rewrite must not re-pull the stream batch
    val next = read(spark, storeDir) match {
      case Some(prev) =>
        val carried = prev.join(b.select(keys.map(col): _*), keys, "left_anti")
        carried.unionByName(b.filter(!col("deleted")).select(prev.columns.map(col): _*))
      case None => b.filter(!col("deleted")).drop("deleted")
    }
    next.write.mode("overwrite").parquet(s"$storeDir/v$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close() // marker AFTER data = the commit point
  }

  /** Drops all but the newest `keep` committed snapshot versions (and
    * any uncommitted leftovers older than the newest committed one).
    */
  def vacuum(spark: SparkSession, storeDir: String, keep: Int = 2): Unit = {
    val fs = fileSystem(spark, storeDir)
    val committed = committedBatches(spark, storeDir)
    val drop = committed.dropRight(keep).toSet
    committed.lastOption.foreach { newest =>
      fs.listStatus(new Path(storeDir)).map(_.getPath)
        .filter(p => p.getName.startsWith("v") &&
          p.getName.drop(1).forall(_.isDigit))
        .foreach { p =>
          val id = p.getName.drop(1).toLong
          val uncommittedStale = !committed.contains(id) && id < newest
          if (drop.contains(id) || uncommittedStale) {
            fs.delete(p, true)
            fs.delete(commitPath(storeDir, id), false)
          }
        }
    }
  }
}
