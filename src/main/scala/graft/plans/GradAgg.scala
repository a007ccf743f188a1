package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, LongType}

/** The full-batch LR gradient over a DENSE micro-unit feature array in
  * ONE aggregate: per row accumulate (d, d·xs(0), …, d·xs(dim−1)) into
  * a (dim+1)-slot exact-integer buffer. Replaces the (dim+1) separate
  * `sum(decimal)` expressions the n-gram trainer would otherwise plan
  * PER GD STEP — at dim = 128 × 20 steps that is 2 580 aggregate
  * expressions whose analysis + janino cost (~3 s/step measured at
  * sf0.1) dwarfs the actual compute on any corpus the step touches.
  * One TypedImperativeAggregate node keeps each step's plan constant-
  * sized; the update loop is a tight long-multiply per slot.
  *
  * Exactness contract (the q_quality_lr decimal(38,0) discipline):
  * |d| ≤ 1e6 and xs ≤ 1e6 micro ⇒ |d·x| ≤ 1e12 per row; partial sums
  * accumulate in LONG and spill into a BigInteger every
  * [[LrGradAgg.SpillEvery]] rows (4e6 · 1e12 = 4e18 < 2^63), so the
  * aggregate is exact at ANY corpus size and order-independent —
  * map-side combinable, shuffle carries one (dim+1)-decimal row per
  * partition.
  */
case class LrGradAgg(
    xs: Expression,
    d: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LrGradAgg.Buf] with BinaryLike[Expression] {

  require(dim >= 1, s"lr_grad requires dim >= 1, got $dim")

  override def left: Expression = xs
  override def right: Expression = d

  override def checkInputDataTypes(): TypeCheckResult = (xs.dataType, d.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lr_grad expects (array<long>, long), got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DecimalType(38, 0), containsNull = false)
  override def prettyName: String = "lr_grad_vec"

  override def createAggregationBuffer(): LrGradAgg.Buf = new LrGradAgg.Buf(dim)

  override def update(buf: LrGradAgg.Buf, input: InternalRow): LrGradAgg.Buf = {
    val xv = xs.eval(input)
    val dv = d.eval(input)
    if (xv != null && dv != null) {
      val arr = xv.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"lr_grad: feature array has ${arr.numElements()} elements, expected $dim")
      buf.add(arr, dv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: LrGradAgg.Buf, other: LrGradAgg.Buf): LrGradAgg.Buf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: LrGradAgg.Buf): Any = {
    val big = buf.folded
    new GenericArrayData(big.map { bi =>
      val dec = Decimal(scala.math.BigDecimal(new java.math.BigDecimal(bi)))
      require(dec.changePrecision(38, 0), s"lr_grad sum $bi exceeds decimal(38,0)")
      dec
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: LrGradAgg.Buf): Array[Byte] = {
    val big = buf.folded
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(big.length)
    big.foreach { bi =>
      val b = bi.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LrGradAgg.Buf = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new LrGradAgg.Buf(dim)
    var i = 0
    while (i < n) {
      val sz = in.getInt
      val b = new Array[Byte](sz)
      in.get(b)
      buf.big(i) = new BigInteger(b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LrGradAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LrGradAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LrGradAgg =
    copy(xs = l, d = r)
}

object LrGradAgg {

  /** Long partials spill into BigInteger this often: 4e6 rows ×
    * 1e12/row = 4e18 < Long.MaxValue. */
  private val SpillEvery = 4000000

  final class Buf(dim: Int) {
    private val lo = new Array[Long](dim + 1)
    val big: Array[BigInteger] = Array.fill(dim + 1)(BigInteger.ZERO)
    private var rows = 0

    def add(xs: ArrayData, d: Long): Unit = {
      lo(0) += d
      var b = 0
      while (b < dim) { lo(b + 1) += d * xs.getLong(b); b += 1 }
      rows += 1
      if (rows >= SpillEvery) spill()
    }

    private def spill(): Unit = {
      var i = 0
      while (i < lo.length) {
        if (lo(i) != 0L) { big(i) = big(i).add(BigInteger.valueOf(lo(i))); lo(i) = 0L }
        i += 1
      }
      rows = 0
    }

    def mergeFrom(other: Buf): Unit = {
      other.spill()
      var i = 0
      while (i < big.length) { big(i) = big(i).add(other.big(i)); i += 1 }
    }

    def folded: Array[BigInteger] = { spill(); big.clone() }
  }

  /** `gradVec(xs, d, dim)`: the (1+dim)-element exact gradient sum
    * [Σd, Σd·xs(0), …] as array<decimal(38,0)>. */
  def gradVec(xs: Column, d: Column, dim: Int): Column =
    ColumnBridge.column(LrGradAgg(ColumnBridge.expression(xs),
      ColumnBridge.expression(d), dim).toAggregateExpression())
}
