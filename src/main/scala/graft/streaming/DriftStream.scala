package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Streaming DRIFT MONITOR — `q_drift_psi` at ingest: the live
  * (feature, bin) histogram of ARRIVING documents maintained as a
  * Complete-mode streaming aggregation, compared at read time against
  * the STORED base-snapshot histogram. The monitoring loop every
  * production corpus pipeline runs continuously: is today's feed
  * still distributed like the corpus we trained on, per feature,
  * before the nightly snapshot bakes the new mix in?
  *
  * One shared projection and one shared readout with the batch pass
  * ([[CorpusOps.driftBins]] / [[CorpusOps.psiOf]]) — binning,
  * smoothing, the nano-unit decision and the 0.2 alert CANNOT drift
  * between the registered query and the monitor (the
  * contamPostingsOf discipline).
  *
  * State is the histogram itself: bounded by the fixed bin
  * inventories (≤ features × bins rows — the len/token/word-len
  * features have hard caps, lang/source are low-cardinality
  * dimensions), so the Complete-mode aggregation is a driver-sized
  * readout at any feed size; a checkpoint restart resumes the counts
  * (the funnel/OnlineStats pattern).
  */
object DriftStream {

  /** The live histogram of a STREAMING documents frame (doc_id, text,
    * lang, source, n_chars): one count per (feature, bin),
    * Complete-mode. Column name matches [[readout]]'s delta side.
    */
  def histogram(docs: DataFrame): DataFrame =
    CorpusOps.driftBins(
        docs.filter(col("doc_id").isNotNull && col("text").isNotNull))
      .groupBy("feature", "bin")
      .agg(count(lit(1)).as("n_d"))

  /** Build the STORED base histogram from a batch snapshot — the
    * artifact the monitor compares against (column name = the base
    * side of [[CorpusOps.psiOf]]).
    */
  def baseHistogram(docs: DataFrame): DataFrame =
    CorpusOps.driftBins(
        docs.filter(col("doc_id").isNotNull && col("text").isNotNull))
      .groupBy("feature", "bin")
      .agg(count(lit(1)).as("n_b"))

  /** The serving readout: PSI per feature between the stored base
    * histogram and the latest live histogram snapshot — the EXACT
    * batch formula ([[CorpusOps.psiOf]]), alert included.
    */
  def readout(baseHist: DataFrame, liveHist: DataFrame): DataFrame =
    CorpusOps.psiOf(baseHist, liveHist)
}
