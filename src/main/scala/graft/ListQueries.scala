package graft

/** Prints the registered query names, one per line — tooling hook for
  * the bench gate (tools/precommit.sh): a query that reaches the
  * registry without a per-query bench entry is how round 12 shipped a
  * 615 s plan nobody had ever timed.
  */
object ListQueries {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
