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
      BottomKAgg.insert(buf, kv.asInstanceOf[UTF8String].toString,
        tv.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: BottomKAgg.Buf, b: BottomKAgg.Buf): BottomKAgg.Buf = {
    b.s.foreach { case (key, tag) => BottomKAgg.insert(a, key, tag, k) }
    a
  }

  override def eval(buf: BottomKAgg.Buf): Any = {
    val rows = buf.s.toArray.map { case (key, tag) =>
      InternalRow(UTF8String.fromString(key), tag) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: BottomKAgg.Buf): Array[Byte] = {
    val items = buf.s.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + items.length * 12 + bytes.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, tag), kb) =>
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
      buf.s += ((new String(kb, StandardCharsets.UTF_8), bb.getLong))
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
  /** Key order = Spark's string order (UTF8String.compareTo: unsigned
    * UTF-8 byte comparison), NOT Java's UTF-16 char order — they
    * disagree above the BMP (e.g. U+E000 sorts before U+10000 in
    * UTF-8 bytes but after it by UTF-16 chars), and the SQL-registered
    * aggregate must agree with the engine's own ORDER BY.
    */
  private[graft] val pairOrdering: Ordering[(String, Long)] =
    new Ordering[(String, Long)] {
      def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = UTF8String.fromString(a._1).compareTo(UTF8String.fromString(b._1))
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  /** Mutable state: the current ≤ k smallest (key, tag) pairs. */
  final class Buf(val s: mutable.TreeSet[(String, Long)])

  private[graft] def emptyBuf(): Buf =
    new Buf(mutable.TreeSet.empty[(String, Long)](pairOrdering))

  /** Insert one pair, evicting the largest when over k. Pure state
    * logic — the aggregate delegates here; the property spec drives it
    * directly.
    */
  private[graft] def insert(buf: Buf, key: String, tag: Long, k: Int): Unit = {
    val pair = (key, tag)
    if (buf.s.size < k) buf.s += pair
    else if (pairOrdering.lt(pair, buf.s.last)) {
      buf.s += pair
      if (buf.s.size > k) buf.s -= buf.s.last
    }
  }

  /** Column API: the k smallest (key, tag) pairs per group. */
  def bottom_k(key: Column, tag: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      BottomKAgg(org.apache.spark.sql.GraftColumnShim.expression(key),
        org.apache.spark.sql.GraftColumnShim.expression(tag), k)
        .toAggregateExpression())
}
