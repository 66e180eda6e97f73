package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a float-vector column as a
  * TypedImperativeAggregate (SURVEY §2.G): the centroid-computation
  * primitive behind IVF/k-means, executed with Spark's standard partial
  * → merge → final aggregation so the shuffle carries one (sums, count)
  * buffer per group per partition — never the vectors themselves.
  *
  * Buffer layout: [count, sum_0 … sum_{d-1}] as doubles; dimensionality
  * is taken from the first row (vectors in a column share it).
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](d + 1) else buf
    require(b.length == d + 1,
      s"vector_avg: ragged dimensions in one group (${b.length - 1} vs $d)")
    b(0) += 1.0
    var i = 0
    while (i < d) { b(i + 1) += arr.getFloat(i).toDouble; i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"vector_avg: ragged dimensions across partitions (${a.length - 1} vs ${b.length - 1})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0.0) return null
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / buf(0); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): VectorAvgAgg =
    copy(child = cs.head)
}

object VectorAvgAgg {
  /** Column API: element-wise mean of an array<float> column. */
  def vector_avg(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      VectorAvgAgg(org.apache.spark.sql.GraftColumnShim.expression(c))
        .toAggregateExpression())
}
