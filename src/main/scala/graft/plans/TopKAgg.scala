package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Mergeable bounded top-k: the aggregate that replaces the per-probe
  * `row_number` window in the kNN/ANN family (reference semantic:
  * locationUtils.ts:129-141 — k nearest per probe).
  *
  * WHY an aggregate and not a window: `Window.partitionBy(probe)` over
  * a scored corpus funnels ALL |corpus| × |probes| scored rows into
  * |probes| partitions for a full per-probe sort — a shuffle whose
  * per-partition size grows linearly with the corpus, un-splittable by
  * AQE. A TypedImperativeAggregate is map-side combinable: every input
  * partition keeps a ≤ k-element heap per probe, the shuffle carries
  * |partitions| × |probes| × k rows (constant in corpus size), and the
  * final merge is a k-way bounded merge. Executed plans show
  * ObjectHashAggregate(partial) → exchange → ObjectHashAggregate
  * instead of a |probes|-partition WindowExec.
  *
  * CONTRACT (bit-equality with the window form): `child` must be a
  * struct whose ASCENDING lexicographic field order is the window's
  * `orderBy` — callers embed a unique tie-break key (so the order is
  * total) and negate any descending numeric key, carrying the original
  * as a later payload field. `eval` returns the k smallest items
  * sorted ascending; `posexplode` over the result reproduces
  * `row_number` exactly.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] with UnaryLike[Expression] {

  require(k > 0, s"topK requires k > 0, got $k")

  private def itemType: StructType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if RowOrdering.isOrderable(s) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topK needs an orderable struct child, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_top_k"

  // Interpreted field-wise ordering over the struct: the heap holds k
  // rows per group, so comparison cost is never the bottleneck —
  // the scored stream itself stays in whole-stage codegen upstream.
  @transient private lazy val ord: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(itemType.map(_.dataType))
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(itemType)

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k, ord)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      // compare BEFORE copying: rejected rows (the overwhelming
      // majority once the heap warms) never allocate
      if (buf.accepts(r)) buf.insert(proj.apply(r).copy())
    }
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val r = it.next()
      if (buf.accepts(r)) buf.insert(r)
    }
    buf
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val arr = buf.heap.toArray(new Array[InternalRow](buf.heap.size))
    java.util.Arrays.sort(arr, ord)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val u = it.next().asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new TopKAgg.Buf(k, ord)
    var i = 0
    while (i < n) {
      val sz = in.getInt
      val rowBytes = new Array[Byte](sz)
      in.get(rowBytes)
      val row = new UnsafeRow(itemType.length)
      row.pointTo(rowBytes, sz)
      if (buf.accepts(row)) buf.insert(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** Bounded max-heap of the k SMALLEST rows seen (head = current
    * worst survivor, via the reversed ordering). Rows handed to
    * [[insert]] must be owned by the buffer (self-contained UnsafeRows
    * or copies).
    */
  final class Buf(val k: Int, ord: Ordering[InternalRow]) {
    val heap = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)

    def accepts(r: InternalRow): Boolean =
      heap.size < k || ord.lt(r, heap.peek())

    def insert(r: InternalRow): Unit = {
      if (heap.size < k) heap.add(r)
      else if (ord.lt(r, heap.peek())) { heap.poll(); heap.add(r) }
    }
  }

  /** `topK(item, k)`: the k smallest `item` structs in ascending
    * lexicographic field order, as a sorted array. See [[TopKAgg]] for
    * the ordering contract.
    */
  def topK(item: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}
