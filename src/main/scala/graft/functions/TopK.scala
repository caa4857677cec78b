package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  * O(k) memory regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  // min-heap on "goodness" so the worst kept element is at the root
  private[functions] val heap =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
      // reverse of (score desc, id asc): head = worst kept
      Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) })

  private def worseThanHead(s: Double, id: Long): Boolean = {
    val (hs, hid) = heap.head
    s < hs || (s == hs && id > hid)
  }

  def add(s: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((s, id))
    else if (!worseThanHead(s, id)) { heap.dequeue(); heap.enqueue((s, id)) }
  }

  /** Best-first (score desc, id asc). */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, id) => (-s, id) }
}

/** Aggregate `graft_topk(score, id, k)` → `array<struct<score,id>>`
  * sorted best-first.
  *
  * The scale story for top-k similarity search: with partial
  * aggregation, each map task forwards at most k (score, id) pairs per
  * group instead of its whole score set — a window/row_number plan
  * shuffles and sorts |corpus|×|queries| rows, this shuffles
  * |maptasks|×k. Deterministic under any partitioning (merge order
  * cannot change the k best with total-order tie-breaking).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val items = buf.sorted
    val bb = ByteBuffer.allocate(4 + items.length * 16)
    bb.putInt(items.length)
    items.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    (0 until n).foreach(_ => buf.add(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

/** Bounded top-k buffer with STRING payloads: k best (score desc,
  * tag asc) pairs, O(k) memory.
  */
final class TopKStrBuffer(val k: Int) {
  private[functions] val heap =
    scala.collection.mutable.PriorityQueue.empty[(Double, String)](
      Ordering.by[(Double, String), (Double, String)] { case (s, t) => (-s, t) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String)))

  private def worseThanHead(s: Double, t: String): Boolean = {
    val (hs, ht) = heap.head
    s < hs || (s == hs && t > ht)
  }

  def add(s: Double, t: String): Unit = {
    if (heap.size < k) heap.enqueue((s, t))
    else if (!worseThanHead(s, t)) { heap.dequeue(); heap.enqueue((s, t)) }
  }

  def sorted: Array[(Double, String)] =
    heap.toArray.sortBy { case (s, t) => (-s, t) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
}

/** Aggregate `graft_topk_str(score, tag, k)` →
  * `array<struct<score,tag>>` best-first: heavy-hitters / top-terms
  * per group WITHOUT a per-group window sort. Same partial-agg scale
  * story as [[TopKByScore]] — each map task forwards ≤k pairs per
  * group, where a row_number window shuffles and sorts every row of
  * every group. Deterministic via total-order (score desc, tag asc)
  * tie-breaking.
  */
case class TopKStrings(
    score: Expression,
    tag: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk_str"
  override def children: Seq[Expression] = Seq(score, tag)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("tag", StringType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val t = tag.eval(input)
    if (s != null && t != null)
      buf.add(s.asInstanceOf[Double], t.toString)
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    other.heap.foreach { case (s, t) => buf.add(s, t) }
    buf
  }

  override def eval(buf: TopKStrBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, t) =>
      new GenericInternalRow(Array[Any](s, org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    })

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    val items = buf.sorted
    val enc = items.map { case (s, t) => (s, t.getBytes("UTF-8")) }
    val bb = ByteBuffer.allocate(4 + enc.map(12 + _._2.length).sum)
    bb.putInt(enc.length)
    enc.foreach { case (s, tb) => bb.putDouble(s); bb.putInt(tb.length); bb.put(tb) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    (0 until n).foreach { _ =>
      val s = bb.getDouble
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.add(s, new String(tb, "UTF-8"))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStrings =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStrings =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), tag = cs(1))
}
