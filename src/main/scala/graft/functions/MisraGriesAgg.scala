package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a TypedImperativeAggregate
  * (SURVEY §2.G) — the frequent-items sketch next to the engine's HLL
  * (B13) and Greenwald-Khanna (B34) built-ins, implemented as custom
  * mergeable aggregation state because Spark ships no frequent-items
  * aggregate.
  *
  * Classic streaming summary (Misra & Gries 1982) with the mergeable
  * formulation of Agarwal et al., PODS'12 ("Mergeable Summaries"):
  * at most k−1 counters; an update on a full summary decrements every
  * counter instead of inserting; a merge adds counterpart counters,
  * then subtracts the k-th largest count from all and drops the
  * non-positive. The shuffle therefore carries ≤ k−1 (item, count)
  * pairs + one total per group per partition — never the raw stream —
  * and the final summary obeys, REGARDLESS of partitioning or merge
  * order:
  *
  *   - every item with true count > n/k is present, and
  *   - each estimate is an underestimate by at most n/k:
  *     true − n/k ≤ est ≤ true.
  *
  * The CONTENTS within those bounds do depend on merge order, so
  * queries built on this are rows+spec (the spec asserts the bounds
  * against exact counts), exactly like the engine's other sketches.
  *
  * Buffer: (n, map item → count). Output: array<struct<item string,
  * est long, n long>> sorted (est desc, item asc) for deterministic
  * presentation of whatever summary the run produced.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buf] {

  require(k >= 2, s"misra_gries needs k >= 2, got $k")

  // declared input contract: update() reads UTF8String, so a
  // non-string key (e.g. SQL misra_gries(user_id, 8) on a BIGINT)
  // must fail at ANALYSIS with a clear message, not as a per-task
  // ClassCastException (AbstractDataType is private[sql] in Spark 4,
  // so the check lives here instead of an inputTypes declaration)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a STRING key column; got ${child.dataType.sql} " +
        "— cast the key explicitly")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MisraGriesAgg.Buf =
    new MisraGriesAgg.Buf(0L, mutable.HashMap.empty)

  override def update(buf: MisraGriesAgg.Buf, row: InternalRow): MisraGriesAgg.Buf = {
    val v = child.eval(row)
    if (v == null) return buf
    MisraGriesAgg.updateItem(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(a: MisraGriesAgg.Buf, b: MisraGriesAgg.Buf): MisraGriesAgg.Buf = {
    MisraGriesAgg.mergeInto(a, b, k)
    a
  }

  override def eval(buf: MisraGriesAgg.Buf): Any = {
    val rows = buf.m.toArray.sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c, buf.n) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MisraGriesAgg.Buf): Array[Byte] = {
    val items = buf.m.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 8 + 4 + items.length * 12 + bytes.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), ib) =>
      bb.putInt(ib.length); bb.put(ib); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val cnt = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < cnt) {
      val len = bb.getInt
      val ib = new Array[Byte](len)
      bb.get(ib)
      m(new String(ib, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    new MisraGriesAgg.Buf(n, m)
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = cs.head)
}

object MisraGriesAgg {
  /** Mutable summary state: processed count + item counters (≤ k−1). */
  final class Buf(var n: Long, val m: mutable.HashMap[String, Long])

  /** One stream update (Misra & Gries 1982). Pure summary logic — the
    * aggregate delegates here; the property spec drives it directly.
    */
  private[graft] def updateItem(buf: Buf, item: String, k: Int): Unit = {
    buf.n += 1L
    buf.m.get(item) match {
      case Some(c) => buf.m(item) = c + 1L
      case None =>
        if (buf.m.size < k - 1) buf.m(item) = 1L
        else {
          // decrement-all step; k is small (counters fit in cache)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.m.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.m(key) = c - 1L
          }
          dead.foreach(buf.m.remove)
        }
    }
  }

  /** Merge summary `b` into `a` (Agarwal et al. PODS'12): add counters,
    * then subtract the k-th largest count and drop the non-positive.
    */
  private[graft] def mergeInto(a: Buf, b: Buf, k: Int): Unit = {
    if (b.m.isEmpty && b.n == 0L) return
    a.n += b.n
    b.m.foreach { case (key, c) => a.m(key) = a.m.getOrElse(key, 0L) + c }
    if (a.m.size > k - 1) {
      val kth = a.m.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.m.foreach { case (key, c) =>
        if (c - kth <= 0L) dead += key else a.m(key) = c - kth
      }
      dead.foreach(a.m.remove)
    }
  }

  /** Column API: Misra–Gries summary of a string column at width k. */
  def misra_gries(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      MisraGriesAgg(org.apache.spark.sql.GraftColumnShim.expression(c), k)
        .toAggregateExpression())
}
