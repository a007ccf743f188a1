package graft

import org.scalatest.funsuite.AnyFunSuite

/** Red-team of the correctness harness itself: every oracle claim in
  * this repo flows through the dump-and-compare gate
  * (graft.Verify → tools/check.py → DuckDB), so a checker bug that
  * silently reports green would make the whole suite meaningless.
  * tools/negative_control.sh proves the checker can say NO: a clean
  * q1_agg dump must pass, and a perturbed value cell, a dropped row,
  * and a renamed column must each be caught. (An off-by-one
  * semantic variant — e.g. a df-cap of N+1 — reduces to the
  * perturbed-value case: it changes output cells, which is exactly
  * what the [HASH] compare is shown here to detect.)
  *
  * The script needs the driver-side python/duckdb toolchain; where
  * that is absent the spec cancels (assume) rather than fails — the
  * control is about THIS environment's gate.
  */
class NegativeControlSpec extends AnyFunSuite {

  private def run(cmd: Seq[String]): (Int, String) = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    // decode leniently (String replaces malformed sequences): the
    // tool output can carry stray non-UTF8 bytes (e.g. a parquet
    // fragment echoed into an error line), and a strict Source.mkString
    // would fail the spec on the decode instead of the assertion
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  test("the oracle checker rejects corrupted dumps and accepts the clean one") {
    val (pyOk, _) = run(Seq("python3", "-c", "import duckdb, pyarrow"))
    assume(pyOk == 0, "driver-side python/duckdb toolchain not available")
    val (code, log) = run(Seq("bash", "tools/negative_control.sh"))
    assert(code === 0, s"negative control failed:\n$log")
    assert(log.contains("caught: perturbed-value"), log)
    assert(log.contains("caught: dropped-row"), log)
    assert(log.contains("caught: renamed-column"), log)
    assert(log.contains("NEGATIVE-CONTROL: PASS"), log)
  }
}
