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

/** Bottom-k order statistic as a TypedImperativeAggregate (SURVEY
  * §2.G) — the KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et
  * al. SIGMOD'07) next to the engine's MG (B36), HLL (B13) and GK
  * (B34) summaries: per group, the k smallest (key, tag) pairs under
  * plain lexicographic (key, tag) order.
  *
  * Fed a uniform HASH as the key it is simultaneously
  *   - a DETERMINISTIC uniform sample of the group's distinct keys
  *     (the "hash-priority sample" every distributed engine uses for
  *     repeatable sampling — same data, same k ⇒ same rows, however
  *     the input was partitioned), and
  *   - a distinct-count estimator: with R = the k-th smallest hash
  *     mapped to (0,1], E[distinct] ≈ (k−1)/R (the KMV estimator).
  *
  * Unlike MG/HLL/GK the result is an EXACT order statistic — merge
  * order cannot change which k pairs are smallest — so queries on it
  * hash-oracle directly against a rank-k window in DuckDB; only the
  * shuffle shape differs (O(k) state with map-side combine vs the
  * oracle's full sort).
  *
  * Buffer: a sorted set capped at k (insert, then evict the largest).
  * Update is O(log k); the shuffle carries ≤ k pairs per partition per
  * group. Output: array<struct<key string, tag long>> sorted ascending.
  *
  * Set semantics: duplicate (key, tag) pairs collapse in the buffer,
  * so the result is the bottom-k of the DISTINCT pair set — which is
  * the point: feeding raw (hash(id), id) rows yields the distinct-id
  * sample with NO pre-distinct shuffle (the duplicates self-collapse
  * map-side inside O(k) state).
  */
case class BottomKAgg(
    keyExpr: Expression,
    tagExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKAgg.Buf] {

  require(k >= 1, s"bottom_k needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType == StringType && tagExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k requires (STRING key, BIGINT tag); got " +
        s"(${keyExpr.dataType.sql}, ${tagExpr.dataType.sql}) — cast explicitly")

  override def children: Seq[Expression] = Seq(keyExpr, tagExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): BottomKAgg.Buf =
    BottomKAgg.emptyBuf()

  override def update(buf: BottomKAgg.Buf, row: InternalRow): BottomKAgg.Buf = {
    val kv = keyExpr.eval(row)
    val tv = tagExpr.eval(row)
    if (kv != null && tv != null)
      // getBytes may alias engine-owned memory — insertView compares
      // the borrowed view and copies only when the pair is retained
      BottomKAgg.insertView(buf, kv.asInstanceOf[UTF8String].getBytes,
        tv.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: BottomKAgg.Buf, b: BottomKAgg.Buf): BottomKAgg.Buf = {
    b.s.foreach { case (key, tag) => BottomKAgg.insertBytes(a, key, tag, k) }
    a
  }

  override def eval(buf: BottomKAgg.Buf): Any = {
    val rows = buf.s.toArray.map { case (key, tag) =>
      InternalRow(UTF8String.fromBytes(key), tag) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: BottomKAgg.Buf): Array[Byte] = {
    val items = buf.s.toArray
    val size = 4 + items.length * 12 + items.map(_._1.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.foreach { case (kb, tag) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(tag)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getInt
    val buf = BottomKAgg.emptyBuf()
    var i = 0
    while (i < cnt) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.s += ((kb, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BottomKAgg =
    copy(keyExpr = cs.head, tagExpr = cs(1))
}

object BottomKAgg {
  /** Key order = Spark's string order (unsigned UTF-8 byte
    * comparison, what UTF8String.compareTo does), NOT Java's UTF-16
    * char order — they disagree above the BMP (e.g. U+E000 sorts
    * before U+10000 in UTF-8 bytes but after it by UTF-16 chars), and
    * the SQL-registered aggregate must agree with the engine's own
    * ORDER BY. Keys live in the buffer as the UTF-8 bytes themselves
    * (encoded ONCE on entry), so every comparison is a raw byte
    * compare with zero allocation — this ordering runs once per input
    * row of a corpus-scale aggregate.
    */
  private[graft] val pairOrdering: Ordering[(Array[Byte], Long)] =
    new Ordering[(Array[Byte], Long)] {
      def compare(a: (Array[Byte], Long), b: (Array[Byte], Long)): Int = {
        val (x, y) = (a._1, b._1)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        if (x.length != y.length) x.length - y.length
        else java.lang.Long.compare(a._2, b._2)
      }
    }

  /** Mutable state: the current ≤ k smallest (key-bytes, tag) pairs. */
  final class Buf(val s: mutable.TreeSet[(Array[Byte], Long)]) {
    /** Decoded view for specs/driver-side consumers. */
    def pairs: Seq[(String, Long)] =
      s.toSeq.map { case (kb, t) => (new String(kb, StandardCharsets.UTF_8), t) }
  }

  private[graft] def emptyBuf(): Buf =
    new Buf(mutable.TreeSet.empty[(Array[Byte], Long)](pairOrdering))

  /** Insert one pair, evicting the largest when over k. Pure state
    * logic — the aggregate delegates here. The caller must OWN `key`
    * (the buffer retains it); for engine-borrowed byte views use
    * insertView, which copies only on actual insert.
    */
  private[graft] def insertBytes(buf: Buf, key: Array[Byte], tag: Long,
      k: Int): Unit = {
    val pair = (key, tag)
    if (buf.s.size < k) buf.s += pair
    else if (pairOrdering.lt(pair, buf.s.last)) {
      buf.s += pair
      if (buf.s.size > k) buf.s -= buf.s.last
    }
  }

  /** Insert from a byte VIEW the buffer may not retain
    * (UTF8String.getBytes can return the string's backing array when
    * the string exactly spans it — engine-owned, reused memory). The
    * view is only COMPARED here; a defensive copy is made iff the pair
    * actually enters the TreeSet, so the steady-state reject path
    * stays allocation-free.
    */
  private[graft] def insertView(buf: Buf, view: Array[Byte], tag: Long,
      k: Int): Unit = {
    if (buf.s.size < k)
      buf.s += ((java.util.Arrays.copyOf(view, view.length), tag))
    else if (pairOrdering.lt((view, tag), buf.s.last)) {
      buf.s += ((java.util.Arrays.copyOf(view, view.length), tag))
      if (buf.s.size > k) buf.s -= buf.s.last
    }
  }

  /** String-keyed convenience (specs, driver-side use): encodes once
    * then delegates.
    */
  private[graft] def insert(buf: Buf, key: String, tag: Long, k: Int): Unit =
    insertBytes(buf, key.getBytes(StandardCharsets.UTF_8), tag, k)

  /** Column API: the k smallest (key, tag) pairs per group. */
  def bottom_k(key: Column, tag: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      BottomKAgg(org.apache.spark.sql.GraftColumnShim.expression(key),
        org.apache.spark.sql.GraftColumnShim.expression(tag), k)
        .toAggregateExpression())
}
