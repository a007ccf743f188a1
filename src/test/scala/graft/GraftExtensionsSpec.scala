package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions install without error") {
    // a full with-extensions session can't coexist with the shared test
    // session in one JVM; exercise the injection wiring directly
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
