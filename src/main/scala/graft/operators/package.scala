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

  /** CONDITIONAL parallelism barrier for payload-carrying scans
    * (r19): hash-repartition to the session shuffle width ONLY when
    * the frame's planned scan parallelism is below it. The bench
    * corpus is one parquet row group per table, so every query whose
    * heavy per-row work (codec walks, PII scrubbing, tokenization)
    * sits directly above the scan ran it on ONE core (guide §2.5's
    * unsplittable-input skew); on a production layout with enough
    * input splits this is a NO-OP — the payload bytes stay where they
    * were read and are never shuffled, which is the 100 TB contract
    * for blob/text tables (a pinned repartByKey would force a
    * corpus-wide payload shuffle there). Planning the frame to read
    * its partition count costs ~10 ms on the driver and no execution.
    */
  private[operators] def widen(df: DataFrame, c: Column, more: Column*): DataFrame = {
    val w = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= w) df
    else df.repartition(w, (c +: more): _*)
  }
}
