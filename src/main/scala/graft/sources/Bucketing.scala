package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

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
    * Walks the plan tree by node type instead of string-matching —
    * a `ReusedExchange` over a broadcast would contain "Exchange" as
    * text but is classified here by the exchange it reuses, and AQE
    * wrapper nodes (whose `children` is empty) are descended explicitly.
    */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    def walk(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike => true
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
