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

  test("SQL builder expressions evaluate identically to the native compute kernels") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.TextExpressions

    val s = "the quick brown fox jumps over the lazy dog again " * 3
    val textLit = Literal(UTF8String.fromString(s))

    val winnowViaSql = GraftExtensions
      .winnowExpr(Seq(textLit, Literal(24), Literal(8)))
      .eval(null).asInstanceOf[ArrayData]
    val winnowDirect =
      TextExpressions.winnowFingerprintsCompute(UTF8String.fromString(s), 24, 8)
    assert(winnowViaSql.numElements() === winnowDirect.numElements())
    assert((0 until winnowViaSql.numElements()).forall(i =>
      winnowViaSql.getUTF8String(i) == winnowDirect.getUTF8String(i)))
    assert(winnowViaSql.numElements() > 0)

    val entropyViaSql = TextExpressions.CharEntropyExpr(textLit).eval(null)
    assert(entropyViaSql === TextExpressions.charEntropyCompute(UTF8String.fromString(s)))
    val distinctViaSql = TextExpressions.CharDistinctExpr(textLit).eval(null)
    assert(distinctViaSql === TextExpressions.charDistinctCompute(UTF8String.fromString(s)))

    // literal-argument guards fail loudly, not silently
    intercept[IllegalArgumentException](
      GraftExtensions.winnowExpr(Seq(textLit, Literal(24))))
  }
}
