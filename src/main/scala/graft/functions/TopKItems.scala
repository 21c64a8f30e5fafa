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
  * Output: `array<struct<item string, cnt long, err long>>`, top k by
  * (cnt desc, item asc) — a deterministic total order.
  */
case class TopKItems(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[UTF8String, (Long, Long)]] {

  require(k >= 1 && capacity >= k, s"need capacity >= k >= 1: k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, (Long, Long)] =
    mutable.HashMap.empty

  private def offer(
      buf: mutable.HashMap[UTF8String, (Long, Long)],
      item: UTF8String, cnt: Long, err: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + cnt, e + err))
      case None if buf.size < capacity => buf.update(item, (cnt, err))
      case None =>
        // evict the minimum-count item; the newcomer inherits its count
        // as both baseline and error bound (classic space-saving step)
        val (mItem, (mCnt, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
        buf.remove(mItem)
        buf.update(item, (mCnt + cnt, mCnt + err))
    }

  override def update(
      buf: mutable.HashMap[UTF8String, (Long, Long)],
      input: InternalRow): mutable.HashMap[UTF8String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].clone(), 1L, 0L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, (Long, Long)],
      other: mutable.HashMap[UTF8String, (Long, Long)]): mutable.HashMap[UTF8String, (Long, Long)] = {
    other.foreach { case (item, (c, e)) => offer(buf, item, c, e) }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        new GenericInternalRow(Array[Any](item, c, e))
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, (c, e)) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
      out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), (in.readLong(), in.readLong()))
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
  /** `topk_items(col, k, capacity)` as a Column aggregate. */
  def topk_items(col: Column, k: Int, capacity: Int): Column =
    GraftBridge.column(
      TopKItems(GraftBridge.expression(col), k, capacity).toAggregateExpression())
}
