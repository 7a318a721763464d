package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitter sketch aggregate:
  * `space_saving(item, capacity)` keeps at most `capacity` (item,
  * estimated-count, over-count-error) entries per group at BOUNDED
  * memory, whatever the item cardinality (Metwally, Agrawal, El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", 2005).
  *
  * Guarantees (per the published analysis, preserved under the
  * min-inheriting SSMerge — see [[SpaceSavingExpr.Buffer.mergeFrom]] —
  * in the mergeable-summaries family of Agarwal et al.): every item
  * with true frequency > N / capacity is IN the sketch, and each entry's
  * true count lies in [cnt − err, cnt]. The CANDIDATE SET is therefore a
  * provable superset of the heavy hitters — but the estimated counts and
  * the marginal (non-heavy) entries depend on encounter order, which is
  * why this aggregate is a FIRST PASS only: the heavy-hitters pipeline
  * ([[graft.operators.TextAnalysis.heavyHitters]]) recounts the
  * candidates EXACTLY in a second pass, making the final top-k
  * deterministic and oracle-checkable. An entry with `err = 0` was never
  * evicted, so its `cnt` is already exact (a whole-sketch `err = 0`
  * means no eviction happened and the sketch IS the exact histogram).
  *
  * Eviction replaces the entry with the minimum `cnt` (ties: the
  * lexicographically largest item — a fixed rule, so a given input
  * ORDER is reproducible even though different orders may keep
  * different marginal entries). Eviction scans the map linearly — O(cap)
  * per eviction; the classic constant-time Stream-Summary linked
  * structure is an optimization this two-pass design doesn't need
  * (evictions only happen once the map is full, and capacity is small
  * by construction).
  *
  * Returns `array<struct<item string, cnt bigint, err bigint>>` sorted
  * cnt desc, ties item asc.
  */
case class SpaceSavingExpr(itemExpr: Expression, capExpr: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingExpr.Buffer] {

  private lazy val cap: Int = capExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"space_saving capacity must be a literal int, got $other")
  }

  override def children: Seq[Expression] = Seq(itemExpr, capExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"space_saving item must be STRING, got ${itemExpr.dataType.simpleString}")
    else if (!capExpr.foldable || !Seq(IntegerType, LongType).contains(capExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"space_saving capacity must be an integral literal, got ${capExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingExpr.Buffer =
    new SpaceSavingExpr.Buffer(cap)

  override def update(buf: SpaceSavingExpr.Buffer, input: InternalRow): SpaceSavingExpr.Buffer = {
    val v = itemExpr.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: SpaceSavingExpr.Buffer, b: SpaceSavingExpr.Buffer): SpaceSavingExpr.Buffer = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: SpaceSavingExpr.Buffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (item, cnt, err) =>
      InternalRow(UTF8String.fromString(item), cnt, err)
    }.toArray[Any])

  override def serialize(buf: SpaceSavingExpr.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.entries.size * 48)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (item, e) =>
      out.writeUTF(item); out.writeLong(e.cnt); out.writeLong(e.err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingExpr.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SpaceSavingExpr.Buffer(cap)
    var i = 0
    while (i < n) {
      buf.entries.put(in.readUTF(), new SpaceSavingExpr.Entry(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingExpr =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingExpr =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), capExpr = newChildren(1))
}

object SpaceSavingExpr {

  final class Entry(var cnt: Long, var err: Long)

  final class Buffer(val cap: Int) {
    val entries: mutable.HashMap[String, Entry] = mutable.HashMap.empty

    /** One observation of `item` — increment, insert, or evict-replace. */
    def offer(item: String): Unit = entries.get(item) match {
      case Some(e) => e.cnt += 1
      case None =>
        if (entries.size < cap) entries.put(item, new Entry(1L, 0L))
        else {
          val (victim, ve) = minEntry()
          entries.remove(victim)
          // the newcomer inherits the victim's count as its upper bound;
          // err records how much of cnt may be inherited over-count
          entries.put(item, new Entry(ve.cnt + 1L, ve.cnt))
        }
    }

    /** Space-saving sketch merge (the SSMerge construction): an item
      * ABSENT from one side may still have occurred in that side's stream
      * and been evicted — its count absorbed up to that sketch's MINIMUM
      * — so absence contributes (min, min) to (cnt, err), not (0, 0);
      * items present on both sides sum. A sketch that never filled has
      * min 0 (absence there really means zero occurrences, so merging
      * never-filled sketches stays exact). The combined map is then
      * trimmed back to the top-`cap` by (cnt desc, item asc). This
      * preserves both per-entry bounds — true ≤ cnt and cnt − err ≤ true
      * — and the freq > N/cap containment over the union
      * (CurationPropertySpec checks all three on random zipf streams).
      */
    def mergeFrom(other: Buffer): Unit = {
      def floorOf(b: Buffer): Long =
        if (b.entries.size >= b.cap) b.entries.valuesIterator.map(_.cnt).min else 0L
      val minThis = floorOf(this)
      val minOther = floorOf(other)
      entries.foreach { case (item, e) =>
        other.entries.get(item) match {
          case Some(oe) => e.cnt += oe.cnt; e.err += oe.err
          case None     => e.cnt += minOther; e.err += minOther
        }
      }
      other.entries.foreach { case (item, oe) =>
        if (!entries.contains(item))
          entries.put(item, new Entry(oe.cnt + minThis, oe.err + minThis))
      }
      if (entries.size > cap) {
        val keep = entries.toSeq
          .sortBy { case (item, e) => (-e.cnt, item) }
          .take(cap)
        entries.clear()
        keep.foreach { case (item, e) => entries.put(item, e) }
      }
    }

    private def minEntry(): (String, Entry) = {
      var best: (String, Entry) = null
      entries.foreach { case kv @ (item, e) =>
        if (best == null || e.cnt < best._2.cnt ||
          (e.cnt == best._2.cnt && item > best._1)) best = kv
      }
      best
    }

    def sortedEntries: Seq[(String, Long, Long)] =
      entries.toSeq.map { case (item, e) => (item, e.cnt, e.err) }
        .sortBy { case (item, cnt, _) => (-cnt, item) }
  }

  /** Column-API form: `spaceSaving(col("item"), capacity)`. */
  def apply(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingExpr(
        GraftColumnBridge.expression(item),
        org.apache.spark.sql.catalyst.expressions.Literal(capacity))
        .toAggregateExpression())
}
