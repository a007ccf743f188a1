package graft

import org.apache.spark.sql.{Column, DataFrame}

package object operators {

  /** Hash-repartition with the session's configured shuffle width
    * PINNED (explicit numPartitions). A plain `repartition(col)` is an
    * AQE-coalescible exchange: a small keyed table collapses to one
    * partition, which serializes every downstream stage that hangs off
    * it without another shuffle — exactly what happens when the
    * planner turns the downstream joins into broadcasts. The explicit
    * width keeps the shared projection parallel while still letting
    * every consumer reuse the one exchange.
    */
  private[operators] def repartByKey(df: DataFrame, c: Column, more: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, (c +: more): _*)
}
