package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** One-pass MinHash signature aggregate (SURVEY §4.3's conditional custom
  * aggregate): for a group of shingle hashes x, computes
  * `sig[i] = min over x of (a_i·x + b_i) mod p` for `numHashes` universal
  * hash functions in a single mutable long[] buffer — replacing a
  * numHashes-column `min()` aggregate (one buffer update per row instead
  * of numHashes generated agg expressions; partial aggregation and merge
  * work as usual, so the shuffle carries 8·numHashes bytes per doc).
  *
  * Hash params derive from a fixed seed so signatures are deterministic
  * across runs and partitionings.
  */
case class MinHashAgg(child: Expression, numHashes: Int, prime: Long,
                      seed: Long,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val params: Array[(Long, Long)] =
    MinHashAgg.hashParams(numHashes, prime, seed)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = (x * params(i)._1 + params(i)._2) % prime
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** The (a, b) universal-hash family for a given seed — THE single
    * derivation shared by the aggregate, the streaming per-row banding
    * projection, and generated oracle SQL (which embeds these as
    * literals). One draw order; change it and every maintained signature
    * table breaks.
    */
  def hashParams(numHashes: Int, prime: Long, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)(
      (math.abs(rnd.nextLong() % (prime - 1)) + 1, math.abs(rnd.nextLong() % prime)))
  }

  /** Column API: aggregate a LongType shingle-hash column into the
    * signature array.
    */
  def minhash(hashes: Column, numHashes: Int, prime: Long, seed: Long): Column =
    GraftExpressionBridge.column(
      MinHashAgg(GraftExpressionBridge.expression(hashes), numHashes, prime, seed)
        .toAggregateExpression())
}
