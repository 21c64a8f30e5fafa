package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters sketch (Metwally/Agrawal/El Abbadi 2005)
  * as a native Spark aggregate — the ClickHouse `topK(k)(col)` analog,
  * the same approximate family as `uniq`/`quantile` the reference's
  * engine ships (its data-quality checks use `uniqExact`,
  * data_quality_check.py:460; topK is the frequency-domain sibling).
  *
  * `topk_items(col, k, capacity)` tracks at most `capacity` distinct
  * items per aggregation state; an untracked arrival evicts the
  * current minimum and inherits its count as error bound. Guarantees:
  * any item with true frequency > N/capacity is present, and counts
  * overestimate by at most the evicted minimum (`err`). With
  * `capacity >=` the number of distinct values the sketch is EXACT —
  * which is how the oracle checks it — while fixed memory per state is
  * what makes it usable where an exact groupBy-count would not fit
  * (the 100 TB regime: per-state memory is O(capacity), merge is
  * partial-aggregation-friendly, and the shuffle carries sketches,
  * not items).
  *
  * The buffer pairs the item map with a (count, item)-ordered TreeSet
  * so each eviction is O(log capacity). The original minBy formulation
  * scanned all `capacity` entries per eviction — fine while distincts
  * fit, but once the stream's distinct count exceeds capacity nearly
  * every arrival evicts, and the round-7 sf1 checkpoint measured the
  * resulting O(rows × capacity) at 30× the sf0.1 wall for 10× rows.
  * The TreeSet evicts the same (min count, min item) entry, so the
  * published sketch is bit-identical.
  *
  * Output: `array<struct<item string, cnt long, err long>>`, top k by
  * (cnt desc, item asc) — a deterministic total order.
  */
case class TopKItems(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKItems.Buffer] {

  require(k >= 1 && capacity >= k, s"need capacity >= k >= 1: k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKItems.Buffer = new TopKItems.Buffer

  private def offer(buf: TopKItems.Buffer, item: UTF8String, cnt: Long, err: Long): Unit =
    buf.map.get(item) match {
      case Some((c, e)) =>
        buf.order.remove((c, item))
        buf.map.update(item, (c + cnt, e + err))
        buf.order.add((c + cnt, item))
      case None if buf.map.size < capacity =>
        buf.map.update(item, (cnt, err))
        buf.order.add((cnt, item))
      case None =>
        // evict the minimum-(count, item) entry; the newcomer inherits
        // its count as both baseline and error bound (classic
        // space-saving step) — TreeSet head IS the old minBy choice
        val min = buf.order.head
        val (mCnt, mItem) = (min._1, min._2)
        buf.order.remove(min)
        buf.map.remove(mItem)
        buf.map.update(item, (mCnt + cnt, mCnt + err))
        buf.order.add((mCnt + cnt, item))
    }

  override def update(buf: TopKItems.Buffer, input: InternalRow): TopKItems.Buffer = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].clone(), 1L, 0L)
    buf
  }

  override def merge(buf: TopKItems.Buffer, other: TopKItems.Buffer): TopKItems.Buffer = {
    other.map.foreach { case (item, (c, e)) => offer(buf, item, c, e) }
    buf
  }

  override def eval(buf: TopKItems.Buffer): Any = {
    val top = buf.map.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        new GenericInternalRow(Array[Any](item, c, e))
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: TopKItems.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.map.size)
    buf.map.foreach { case (item, (c, e)) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
      out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKItems.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKItems.Buffer
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = UTF8String.fromBytes(b)
      val c = in.readLong()
      val e = in.readLong()
      buf.map.update(item, (c, e))
      buf.order.add((c, item))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKItems =
    copy(child = newChildren.head)
}

object TopKItems {

  private implicit val entryOrdering: Ordering[(Long, UTF8String)] =
    new Ordering[(Long, UTF8String)] {
      override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  /** Space-saving state: item -> (count, err) plus the same entries
    * ordered by (count, item) so the eviction victim is an O(log n)
    * head lookup instead of a full scan.
    */
  final class Buffer {
    val map: mutable.HashMap[UTF8String, (Long, Long)] = mutable.HashMap.empty
    val order: mutable.TreeSet[(Long, UTF8String)] = mutable.TreeSet.empty
  }

  /** `topk_items(col, k, capacity)` as a Column aggregate. */
  def topk_items(col: Column, k: Int, capacity: Int): Column =
    GraftBridge.column(
      TopKItems(GraftBridge.expression(col), k, capacity).toAggregateExpression())
}
