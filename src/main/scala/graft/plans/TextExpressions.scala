package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for text chunking.
  *
  * Why not the array-expression formulation (shifted-slice shingles →
  * md5 boundary flags → position zip → slice-per-chunk): that tree is
  * enormous — nested `zip_with`/`transform` lambdas with duplicated
  * md5 subtrees — and while its RUNTIME was tamed (SCALE.md documents
  * the two CollapseProject traps), its PLAN cost was not: analysis +
  * janino compilation of the generated projection measured ~5 s per
  * fresh session at sf0.1, against ~2 s of actual compute. The
  * full-registry bench pays that every pass (the 100-entry codegen
  * cache cannot hold 108 queries), and so does any real user's first
  * run. This expression evaluates the whole chunk pipeline as ONE
  * node — a tight JVM loop per row — and its generated code is a
  * single static call, so plan cost is negligible and eval is faster
  * than the interpreted higher-order lambdas it replaces.
  *
  * Semantics are bit-identical to the array formulation (and to the
  * DuckDB oracle SQL in DedupOps): a chunk boundary falls at token
  * position p (0-based, p ≥ 1) when the k-token window starting at p
  * has `hex32(md5(window)) % div == 0`, where windows are joined with
  * single spaces and hex32 is the first 8 md5 hex chars as an
  * unsigned int; chunk values are the md5 hex of the space-joined
  * token slices between consecutive boundaries.
  */
object TextExpressions {

  /** md5 hex (lowercase) of a string's UTF-8 bytes. */
  private def md5hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Static entry point referenced from generated code. */
  def chunkHashesCompute(toks: ArrayData, k: Int, div: Int): ArrayData = {
    val n = toks.numElements()
    val t = new Array[String](n)
    var i = 0
    while (i < n) { t(i) = toks.getUTF8String(i).toString; i += 1 }
    val md = MessageDigest.getInstance("MD5")
    val ns = math.max(n - (k - 1), 0)
    // boundary starts: position 0 always, plus every flagged window start
    val starts = new java.util.ArrayList[Int]
    starts.add(0)
    i = 1
    while (i < ns) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(t(j))
        j += 1
      }
      val hex = md5hex(md, sb.toString)
      val h32 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      if (h32 % div == 0) starts.add(i)
      i += 1
    }
    val m = starts.size
    val out = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      val s = starts.get(i)
      val e = if (i + 1 < m) starts.get(i + 1) else n
      val sb = new java.lang.StringBuilder
      var j = s
      while (j < e) {
        if (j > s) sb.append(' ')
        sb.append(t(j))
        j += 1
      }
      out(i) = UTF8String.fromString(md5hex(md, sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunk hashes of a token array — see object doc.
    * Input must be `array<string>` with non-null elements (a `split`
    * output); output is `array<string>` of chunk md5 hex values, one
    * per chunk, preserving document order and intra-doc repeats.
    */
  case class ChunkHashesExpr(child: Expression, k: Int, div: Int)
      extends UnaryExpression {
    require(k >= 1 && div >= 1, s"chunk_hashes: k and div must be >= 1, got k=$k div=$div")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"chunk_hashes expects array<string>, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      chunkHashesCompute(a.asInstanceOf[ArrayData], k, div)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.chunkHashesCompute($a, $k, $div);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def chunkHashesNative(toks: Column, k: Int, div: Int): Column =
    ColumnBridge.column(ChunkHashesExpr(ColumnBridge.expression(toks), k, div))
}
