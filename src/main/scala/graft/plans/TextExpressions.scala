package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
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

  /** Lowercase hex of a 16-byte digest. */
  private def hexOf(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** md5 hex (lowercase) of a string's UTF-8 bytes. */
  private def md5hex(md: MessageDigest, s: String): String =
    hexOf(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def tokenAt(toks: ArrayData, i: Int, who: String): String = {
    val u = toks.getUTF8String(i)
    if (u == null) throw new IllegalArgumentException(
      s"$who: null token at index $i — input must be a split() output (non-null elements)")
    u.toString
  }

  /** Static entry point referenced from generated code. */
  def chunkHashesCompute(toks: ArrayData, k: Int, div: Int): ArrayData = {
    val n = toks.numElements()
    val t = new Array[String](n)
    var i = 0
    while (i < n) { t(i) = tokenAt(toks, i, "chunk_hashes"); i += 1 }
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

  /** Static entry point referenced from generated code. */
  def shinglesCompute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val ns = math.max(n - (k - 1), 0)
    val out = new Array[AnyRef](ns)
    var i = 0
    while (i < ns) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(tokenAt(toks, j, "shingles"))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Contiguous k-token windows joined by single spaces — the native
    * form of the k-shifted-slice `zip_with` reduction the functions
    * layer used to build (functions/Hashing.shingles). Same output;
    * the k-deep lambda tree (duplicated per consumer, paid in
    * analysis + janino time on every fresh plan) becomes one node.
    */
  case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, s"shingles: k must be >= 1, got $k")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"shingles expects array<string>, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      shinglesCompute(a.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.shinglesCompute($a, $k);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def shinglesNative(toks: Column, k: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(toks), k))

  /** Static entry point referenced from generated code. Returns null
    * for an empty shingle array (the `array_min` convention).
    */
  def minhashCompute(shingles: ArrayData, prefix: UTF8String): AnyRef = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    val pre = prefix.toString
    var best: String = null
    var i = 0
    while (i < n) {
      val h = md5hex(md, pre + tokenAt(shingles, i, "minhash"))
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    UTF8String.fromString(best)
  }

  /** Minimum md5 hex over `prefix ‖ shingle` — one native node in
    * place of `array_min(transform(arr, s => md5(concat(...))))`,
    * whose per-seed lambda trees dominate plan-compile time when a
    * signature matrix needs bands × rows of them. Lexicographic min
    * over lowercase hex strings, null on an empty array — exactly the
    * `array_min` convention the HOF form had.
    */
  case class MinHashExpr(child: Expression, prefix: UTF8String)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"minhash expects array<string>, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      minhashCompute(a.asInstanceOf[ArrayData], prefix)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pre = ctx.addReferenceObj("prefix", prefix)
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
        |  graft.plans.TextExpressions.minhashCompute($a, $pre);
        |${ev.isNull} = ${ev.value} == null;
        |""".stripMargin)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhashNative(shingleArr: Column, prefix: String): Column =
    ColumnBridge.column(MinHashExpr(
      ColumnBridge.expression(shingleArr), UTF8String.fromString(prefix)))

  /** Static entry point referenced from generated code.
    *
    * Winnowing fingerprint selection (Schleimer et al. 2003) over a
    * document string: md5 hex of every char k-gram, sliding
    * window-min of width w (lexicographic, ≡ `array_min` over hex),
    * distinct mins in first-occurrence order (≡ `array_distinct`).
    * Char positions are Spark `substr` positions (code points via
    * UTF-8 sequence starts) and each gram is hashed as the UTF-8
    * bytes of the substring — bit-identical to
    * `md5(substr(text, i, k) cast binary)` and to DuckDB's
    * `md5(substring(text, i, k))`.
    *
    * One pass per doc with a monotonic-deque ring buffer: O(len)
    * amortized time, O(w) live window state, no L-element gram array
    * materialized — the HOF formulation this replaces built an
    * L-element array of 32-char hex strings and then L window slices
    * per doc, outside whole-stage codegen (615 s of the r12 bench).
    */
  def winnowFingerprintsCompute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nb = bytes.length
    // char start offsets (UTF-8 sequence starts) — Spark substr units
    var nChars = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    val offs = new Array[Int](nChars + 1)
    i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(nChars) = nb
    val ng = nChars - k + 1
    val out = new java.util.LinkedHashSet[String]
    if (ng >= w) {
      val md = MessageDigest.getInstance("MD5")
      // monotonic deque (increasing hex values) in a w+1 ring buffer
      val cap = w + 1
      val qIdx = new Array[Int](cap)
      val qVal = new Array[String](cap)
      var head = 0
      var tail = 0 // absolute counters; ring slot = x % cap
      var g = 0
      while (g < ng) {
        md.reset()
        md.update(bytes, offs(g), offs(g + k) - offs(g))
        val hx = hexOf(md.digest())
        while (tail > head && qVal((tail - 1) % cap).compareTo(hx) >= 0) tail -= 1
        qIdx(tail % cap) = g
        qVal(tail % cap) = hx
        tail += 1
        if (qIdx(head % cap) <= g - w) head += 1
        if (g >= w - 1) out.add(qVal(head % cap))
        g += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    var j = 0
    val it = out.iterator()
    while (it.hasNext) {
      arr(j) = UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(arr)
  }

  /** Distinct winnowing fingerprints of a document string — see
    * [[winnowFingerprintsCompute]]. Empty array when the text has
    * fewer than k + w − 1 chars (no full hash window exists).
    */
  case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k >= 1 && w >= 1, s"winnow_fingerprints: k and w must be >= 1, got k=$k w=$w")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"winnow_fingerprints expects string, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      winnowFingerprintsCompute(a.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.winnowFingerprintsCompute($a, $k, $w);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def winnowFingerprintsNative(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintsExpr(ColumnBridge.expression(text), k, w))

  /** Generator form of [[WinnowFingerprintsExpr]]: streams the
    * distinct fingerprints of one document as rows, one output column
    * `s` (non-nullable).
    *
    * Why a Generator and not `explode(array-expr)`: exploding an
    * expensive array expression triggers `InferFiltersFromGenerate`,
    * whose `size(e) > 0 ∧ isnotnull(e)` guard is pushed below the
    * projection by predicate pushdown with `e` substituted — the
    * fingerprint loop then runs up to 3× per row (twice in the
    * Filter, once in the Project) in the scan stage. The rule matches
    * only `ExplodeBase`/`Inline`, so a custom generator keeps the
    * one-evaluation contract structurally, and no per-doc array is
    * materialized at all.
    */
  case class WinnowPostingsGen(child: Expression, k: Int, w: Int)
      extends UnaryExpression with Generator with CodegenFallback {
    require(k >= 1 && w >= 1, s"winnow_postings: k and w must be >= 1, got k=$k w=$w")

    override def elementSchema: StructType =
      StructType(StructField("s", StringType, nullable = false) :: Nil)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"winnow_postings expects string, got $other")
    }

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val t = child.eval(input)
      if (t == null) Nil
      else {
        val fps = winnowFingerprintsCompute(t.asInstanceOf[UTF8String], k, w)
        val n = fps.numElements()
        val out = new Array[InternalRow](n)
        var i = 0
        while (i < n) {
          out(i) = InternalRow(fps.getUTF8String(i))
          i += 1
        }
        out
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def winnowPostingsNative(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowPostingsGen(ColumnBridge.expression(text), k, w))

  /** Static entry point referenced from generated/eval code: DISTINCT
    * k-token shingles of a token array, first-occurrence order.
    */
  def shinglePostingsCompute(toks: ArrayData, k: Int): java.util.LinkedHashSet[String] = {
    val n = toks.numElements()
    val ns = math.max(n - (k - 1), 0)
    val out = new java.util.LinkedHashSet[String]
    var i = 0
    while (i < ns) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(tokenAt(toks, j, "shingle_postings"))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out
  }

  /** Generator form of `explode(array_distinct(shingles(toks, k)))`:
    * streams the distinct k-token shingles of one document as rows
    * (one non-nullable string column `s`). Same rationale as
    * [[WinnowPostingsGen]]: a pipeline that only consumes shingle
    * POSTINGS (explode → aggregate/join) pays the array
    * materialization for nothing, and `InferFiltersFromGenerate`'s
    * `size/isnotnull` guards re-evaluate the shingle transform inside
    * the scan-stage Filter after predicate-pushdown substitution; the
    * custom generator sidesteps both (the inference rule matches only
    * ExplodeBase/Inline). A doc with fewer than k tokens emits no
    * rows — exactly the rows `size(sh) > 0` kept.
    */
  case class ShinglePostingsGen(child: Expression, k: Int)
      extends UnaryExpression with Generator with CodegenFallback {
    require(k >= 1, s"shingle_postings: k must be >= 1, got $k")

    override def elementSchema: StructType =
      StructType(StructField("s", StringType, nullable = false) :: Nil)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"shingle_postings expects array<string>, got $other")
    }

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val t = child.eval(input)
      if (t == null) Nil
      else {
        val set = shinglePostingsCompute(t.asInstanceOf[ArrayData], k)
        val out = new Array[InternalRow](set.size)
        val it = set.iterator()
        var i = 0
        while (it.hasNext) {
          out(i) = InternalRow(UTF8String.fromString(it.next()))
          i += 1
        }
        out
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def shinglePostingsNative(toks: Column, k: Int): Column =
    ColumnBridge.column(ShinglePostingsGen(ColumnBridge.expression(toks), k))

  /** Static entry point referenced from generated code: Shannon
    * entropy in bits per character over the CODE-POINT histogram of
    * one string (exact integer counts; entropy = log2(n) −
    * Σ c·log2(c) / n). The histogram fits a tiny map (alphabet-sized,
    * not text-sized), so the whole statistic is one pass per row —
    * no per-char explode, no shuffle. Empty input → 0.0.
    */
  def charEntropyCompute(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      m(cp.toLong) = m.getOrElse(cp.toLong, 0L) + 1L
      i += Character.charCount(cp)
      n += 1L
    }
    val ln2 = Math.log(2.0)
    var acc = 0.0
    m.foreachValue { c => acc += c.toDouble * (Math.log(c.toDouble) / ln2) }
    Math.log(n.toDouble) / ln2 - acc / n.toDouble
  }

  /** Static entry point referenced from generated code: distinct
    * code-point count of one string (same single histogram pass as
    * [[charEntropyCompute]]).
    */
  def charDistinctCompute(text: UTF8String): Long = {
    val s = text.toString
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      m(cp.toLong) = 1L
      i += Character.charCount(cp)
    }
    m.size.toLong
  }

  /** Per-row character-level Shannon entropy (double, bits/char) —
    * the gibberish/encoding-corruption quality signal. A single
    * codegen'd node whose generated code is one static call; the
    * array-free alternative to explode-per-char + two keyed
    * aggregations (which would put |chars| rows through a shuffle
    * for a per-row statistic).
    */
  case class CharEntropyExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"char_entropy expects string, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      charEntropyCompute(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.charEntropyCompute($a);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-row distinct code-point count — [[CharEntropyExpr]]'s
    * companion statistic, kept a SEPARATE expression (not one
    * struct-returning node) so each projected column is exactly one
    * evaluation site under the AuditEval one-evaluation contract.
    */
  case class CharDistinctExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"char_distinct expects string, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      charDistinctCompute(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.charDistinctCompute($a);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def charEntropyNative(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))

  def charDistinctNative(text: Column): Column =
    ColumnBridge.column(CharDistinctExpr(ColumnBridge.expression(text)))

  // ---- single-pass multi-pattern PII scrub ----

  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** Static entry point referenced from generated code: ONE
    * left-to-right walk of `text` over the ordered alternation
    * `(p1)|(p2)|...` — each match is replaced by the tag of the first
    * alternative matching at the leftmost position and counted per
    * kind. One string scan and ONE rebuilt string serve all kinds,
    * replacing k chained `regexp_replace` walks (k scans, k rebuilds)
    * plus k `regexp_extract_all` counting scans.
    *
    * Semantics vs the chained form (kind-priority: all of p1's
    * matches rewritten before p2 ever scans): identical whenever
    * matches of DISTINCT kinds never overlap in the input — the
    * decorated PII corpus by construction, and the practical scrub
    * case. On a cross-kind overlap the chain lets the higher-priority
    * kind win globally while this pass lets the leftmost win;
    * PiiScrubSpec pins both the equivalence class and the one
    * divergence boundary explicitly, and the registered oracle keeps
    * the CHAINED form, so a corpus ever reaching the boundary fails
    * the hash gate loudly instead of drifting.
    */
  def multiScrubCompute(text: UTF8String, pattern: String,
      tags: Array[String]): InternalRow = {
    val p = patternCache.computeIfAbsent(pattern,
      (k: String) => java.util.regex.Pattern.compile(k))
    val s = text.toString
    val counts = new Array[Long](tags.length)
    val m = p.matcher(s)
    if (!m.find())
      return new GenericInternalRow(Array[Any](text, new GenericArrayData(counts)))
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    var go = true
    while (go) {
      sb.append(s, last, m.start())
      var g = 1
      var hit = 0
      while (hit == 0 && g <= tags.length) {
        if (m.start(g) >= 0) hit = g
        g += 1
      }
      counts(hit - 1) += 1
      sb.append(tags(hit - 1))
      last = m.end()
      go = m.find()
    }
    sb.append(s, last, s.length)
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString),
      new GenericArrayData(counts)))
  }

  /** Single-pass multi-pattern scrub — see [[multiScrubCompute]].
    * `kinds` is the ordered (pattern, tag) priority list; patterns
    * must be group-free (the alternation groups ARE the kind
    * dispatch). Returns struct(redacted string, counts array<long>)
    * so ONE evaluation site feeds both the redaction and the per-kind
    * telemetry (multi-referenced and non-cheap, so CollapseProject
    * keeps it materialized — one walk per row).
    */
  case class MultiPatternScrubExpr(child: Expression, kinds: Seq[(String, String)])
      extends UnaryExpression {
    require(kinds.nonEmpty && kinds.forall(!_._1.contains("(")),
      "multi_scrub patterns must be group-free (alternation groups are the kind dispatch)")
    private val pattern = kinds.map(k => "(" + k._1 + ")").mkString("|")
    private val tags = kinds.map(_._2).toArray

    override def dataType: DataType = StructType(Seq(
      StructField("redacted", StringType, nullable = false),
      StructField("counts",
        ArrayType(org.apache.spark.sql.types.LongType, containsNull = false),
        nullable = false)))

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"multi_scrub expects string, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      multiScrubCompute(a.asInstanceOf[UTF8String], pattern, tags)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pat = ctx.addReferenceObj("scrubPattern", pattern)
      val tg = ctx.addReferenceObj("scrubTags", tags, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.multiScrubCompute($a, $pat, $tg);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def multiScrubNative(text: Column, kinds: Seq[(String, String)]): Column =
    ColumnBridge.column(MultiPatternScrubExpr(ColumnBridge.expression(text), kinds))

  // ---- integer LR sigmoid ----

  /** Static entry point referenced from generated code: the micro-unit
    * integer sigmoid (z from micro weights × micro features via one
    * floor division, clamp, table lookup + linear interpolation) as
    * ONE tight long-arithmetic call. Math.floorDiv ≡ the
    * pmod-then-divide construction the DuckDB oracle uses, and the
    * table is the SAME [[graft.operators.TextOps.SigTable]] constants
    * the oracle interpolates as literals — semantics pinned by the
    * QualityLrSpec integer replica and the LR oracles' hash gate.
    */
  def lrSigmoidCompute(x1m: Long, x2m: Long, x3m: Long,
      w: Array[Long], tab: Array[Long], step: Int): Long = {
    val half = (tab.length - 1) / 2
    val lo = -half.toLong * step
    val hi = half.toLong * step - 1
    val s = w(0) * 1000000L + w(1) * x1m + w(2) * x2m + w(3) * x3m
    val z = Math.floorDiv(s, 1000000L)
    val zc = if (z < lo) lo else if (z > hi) hi else z
    val off = zc - lo
    val idx = (off / step).toInt
    val frac = off % step
    tab(idx) + (tab(idx + 1) - tab(idx)) * frac / step
  }

  /** The integer sigmoid as one codegen'd node — the Column-tree
    * formulation (two element_at lookups on a 4097-literal array plus
    * three pmod/divide chains) measured ~25% slower across the
    * composed curation pipeline's multiple evaluation sites; this is
    * the ChunkHashesExpr discipline applied to the scorer: a single
    * static call, weights and table as reference objects.
    */
  case class LrSigmoidExpr(first: Expression, second: Expression, third: Expression,
      w: Array[Long], tab: Array[Long], step: Int)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    require(w.length == 4 && tab.length % 2 == 1 && step >= 1,
      "lr_sigmoid: need 4 weights, an odd-length table, step >= 1")
    override def dataType: DataType = org.apache.spark.sql.types.LongType

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == org.apache.spark.sql.types.LongType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"lr_sigmoid expects (long, long, long), got ${children.map(_.dataType)}")

    override def nullSafeEval(a: Any, b: Any, c: Any): Any =
      lrSigmoidCompute(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long],
        w, tab, step)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("lrW", w, "long[]")
      val tRef = ctx.addReferenceObj("lrTab", tab, "long[]")
      nullSafeCodeGen(ctx, ev, (a, b, c) =>
        s"${ev.value} = graft.plans.TextExpressions.lrSigmoidCompute($a, $b, $c, $wRef, $tRef, $step);")
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  def lrSigmoidNative(x1m: Column, x2m: Column, x3m: Column,
      w: Array[Long], tab: Array[Long], step: Int): Column =
    ColumnBridge.column(LrSigmoidExpr(ColumnBridge.expression(x1m),
      ColumnBridge.expression(x2m), ColumnBridge.expression(x3m), w, tab, step))

  /** Vector form of [[lrSigmoidCompute]] for the hashed-n-gram model:
    * z = (w(0)·1e6 + Σ_b w(b+1)·xs(b)) DIV 1e6, then the same clamped
    * table interpolation. Magnitude contract: |w| ≤ ~1e8 after
    * training and xs ≤ 1e6 micro, so each term ≤ 1e14 and the 129-term
    * sum ≤ ~1.3e16 ≪ 2^63 — exact in long arithmetic.
    */
  def lrSigmoidVecCompute(xs: ArrayData, w: Array[Long], tab: Array[Long],
      step: Int): Long = {
    val half = (tab.length - 1) / 2
    val lo = -half.toLong * step
    val hi = half.toLong * step - 1
    var s = w(0) * 1000000L
    var i = 0
    val n = xs.numElements()
    while (i < n) { s += w(i + 1) * xs.getLong(i); i += 1 }
    val z = Math.floorDiv(s, 1000000L)
    val zc = if (z < lo) lo else if (z > hi) hi else z
    val off = zc - lo
    val idx = (off / step).toInt
    val frac = off % step
    tab(idx) + (tab(idx + 1) - tab(idx)) * frac / step
  }

  /** [[LrSigmoidExpr]]'s dense-feature-array sibling — one codegen'd
    * node over an `array<long>` micro-unit feature column, weights
    * (bias +: per-bucket) and table as reference objects. Serves the
    * hashed-n-gram quality classifier's training loop (20 passes) and
    * scorer without any interpreted HOF lambda in the hot path.
    */
  case class LrSigmoidVecExpr(child: Expression, w: Array[Long],
      tab: Array[Long], step: Int) extends UnaryExpression {
    require(w.length >= 2 && tab.length % 2 == 1 && step >= 1,
      "lr_sigmoid_vec: need bias + at least one weight, an odd-length table, step >= 1")
    override def dataType: DataType = org.apache.spark.sql.types.LongType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lr_sigmoid_vec expects array<long>, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      lrSigmoidVecCompute(a.asInstanceOf[ArrayData], w, tab, step)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("lrVecW", w, "long[]")
      val tRef = ctx.addReferenceObj("lrVecTab", tab, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.TextExpressions.lrSigmoidVecCompute($a, $wRef, $tRef, $step);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def lrSigmoidVecNative(xs: Column, w: Array[Long], tab: Array[Long],
      step: Int): Column =
    ColumnBridge.column(LrSigmoidVecExpr(ColumnBridge.expression(xs), w, tab, step))

  /** Static entry point referenced from generated code. Null for an
    * empty token array (no features — mirrors the explode/inner-join
    * shape, which drops such a doc; a `split` output is never empty,
    * so the branch is defensive).
    */
  def ngramBucketMicrosCompute(toks: ArrayData, nb: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Long](nb)
    def bump(f: String): Unit = {
      val h32 = java.lang.Long.parseLong(md5hex(md, f).substring(0, 8), 16)
      counts((h32 % nb).toInt) += 1L
    }
    var prev: String = null
    var i = 0
    while (i < n) {
      val t = tokenAt(toks, i, "ngram_bucket_micros")
      bump(t)
      if (prev != null) bump(prev + " " + t)
      prev = t
      i += 1
    }
    val nf = 2L * n - 1L // unigrams + adjacent bigrams
    val out = new Array[Long](nb)
    i = 0
    while (i < nb) {
      // round-half-up of counts(i)·1e6 / nf in exact integer arithmetic
      // — identical to the rhuCol the aggregation pipeline applied
      out(i) = (counts(i) * 2000000L + nf) / (2L * nf)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** The hashed-n-gram feature histogram of one document as ONE node:
    * per token and per adjacent token bigram, the md5-hex32 % nb
    * bucket, counted into an nb-long histogram and normalized to
    * round-half-up micro-units of the feature total. Replaces the
    * explode → groupBy(doc, bucket) → groupBy(doc) map-rebuild
    * pipeline (two corpus shuffles plus a self-join of documents) the
    * n-gram classifier's feature build used — the md5 work per feature
    * is unchanged, but no feature row ever leaves its document's task.
    * Bit-identical to the aggregation form: bucket = first 8 md5 hex
    * chars as unsigned int mod nb (CorpusOps.bucket), value =
    * rhu(count·1e6, total-features), absent buckets 0.
    */
  case class NgramBucketMicrosExpr(child: Expression, nb: Int) extends UnaryExpression {
    require(nb >= 1, s"ngram_bucket_micros: nb must be >= 1, got $nb")
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_bucket_micros expects array<string>, got $other")
    }

    override def nullSafeEval(a: Any): Any =
      ngramBucketMicrosCompute(a.asInstanceOf[ArrayData], nb)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        |  graft.plans.TextExpressions.ngramBucketMicrosCompute($a, $nb);
        |${ev.isNull} = ${ev.value} == null;
        |""".stripMargin)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def ngramBucketMicrosNative(toks: Column, nb: Int): Column =
    ColumnBridge.column(NgramBucketMicrosExpr(ColumnBridge.expression(toks), nb))
}
