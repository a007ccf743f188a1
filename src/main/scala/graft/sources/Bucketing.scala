package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the deployment-side answer to the biggest
  * shuffle in the star joins (SCALE.md §E): co-bucketing two fact
  * tables on their join key lets the sort-merge join read both sides
  * pre-partitioned and pre-sorted, with NO exchange at query time.
  * On a 100 TB deployment this is a one-time layout cost paid at
  * ingest; every subsequent orderkey join is shuffle-free.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True iff the physical plan of `df` contains a shuffle exchange
    * (broadcast exchanges don't count — they are the cheap side).
    */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString()
      .linesIterator.exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
