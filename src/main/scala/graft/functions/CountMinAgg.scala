package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch as a TypedImperativeAggregate (SURVEY §2.G) — the
  * point-frequency sketch completing the shelf next to Misra–Gries
  * (frequent items), HLL (distinct), GK (quantiles) and bottom-k
  * (order statistic): MG answers "which keys are heavy"; Count-Min
  * answers "how often did THIS key occur" for any key, in O(d·w)
  * space (Cormode & Muthukrishnan 2005).
  *
  * depth×width counter matrix; each update increments one counter per
  * row at h_d(key) = mix64(key + d·FNV64prime) mod width (the
  * HashImpl.minhash seeding idiom: full-avalanche splitmix64 under
  * distinct per-row offsets). Merge = elementwise sum — the state is a
  * LINEAR function of the input multiset, so the final counters are
  * INDEPENDENT of partitioning and merge order (stronger than MG's
  * bounded-but-order-dependent contents): a Count-Min query surface
  * can carry a full hash oracle, with the estimate replayed engine-side
  * (B51). Guarantees per estimate: est ≥ true (never under), and
  * est ≤ true + excess with P[excess > 2n/w] < (1/2)^depth per the
  * standard Markov argument.
  *
  * Output: the flattened counter array (row d at [d·w, (d+1)·w));
  * estimates are a relational projection over it (element_at + least),
  * not a driver-side walk.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"count_min depth in [1,16], got $depth")
  require(width >= 2 && (width & (width - 1)) == 0,
    s"count_min width must be a power of two, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min requires a BIGINT key column; got ${child.dataType.sql} " +
        "— cast the key explicitly")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v == null) return buf
    CountMinAgg.updateKey(buf, v.asInstanceOf[Long], depth, width)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinAgg =
    copy(child = cs.head)
}

object CountMinAgg {
  /** Per-depth hash offset — FNV-64 prime: distinct full-avalanche
    * hash per row via mix64(key + d·prime), the minhash seeding idiom.
    * Quoted by the B51 oracle's SQL replay; keep in sync.
    */
  val DepthOffset = 1099511628211L

  /** Row-d bucket of a key — pure function, replayed by the oracle. */
  @inline def bucket(key: Long, d: Int, width: Int): Int =
    (HashImpl.mix64(key + d * DepthOffset) & (width - 1)).toInt

  /** One stream update. Pure sketch logic — the aggregate delegates
    * here; the property spec drives it directly.
    */
  private[graft] def updateKey(buf: Array[Long], key: Long, depth: Int,
      width: Int): Unit = {
    var d = 0
    while (d < depth) {
      buf(d * width + bucket(key, d, width)) += 1L
      d += 1
    }
  }

  /** Column API: Count-Min counters of a BIGINT column. */
  def count_min(c: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      CountMinAgg(org.apache.spark.sql.GraftColumnShim.expression(c),
        depth, width).toAggregateExpression())
}
