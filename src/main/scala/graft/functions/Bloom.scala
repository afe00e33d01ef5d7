package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bloom-filter kernel shared by the aggregate (build) and the probe
  * expression: `k` bit positions per key from double hashing
  * (Kirsch & Mitzenmacher 2006 — two splitmix64-derived hashes span the
  * whole family), `floorMod` keeps positions in range for any hash sign.
  * Deterministic in the key alone, so the filter bits are identical under
  * ANY partitioning or merge order (OR is commutative) — specs can assert
  * the array bit-for-bit.
  */
object Bloom {

  def wordsFor(bits: Int): Int = (bits + 63) >>> 6

  def add(words: Array[Long], key: Long, bits: Int, k: Int): Unit = {
    val h1 = SrpCodes.mix64(key)
    val h2 = SrpCodes.mix64(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, bits.toLong).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def mightContain(words: ArrayData, key: Long, bits: Int, k: Int): Boolean = {
    if (words.numElements() != wordsFor(bits))
      throw new IllegalArgumentException(
        s"graft_bloom_contains: filter has ${words.numElements()} words but " +
          s"bits=$bits needs ${wordsFor(bits)} — filter and probe disagree on bits")
    val h1 = SrpCodes.mix64(key)
    val h2 = SrpCodes.mix64(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, bits.toLong).toInt
      if ((words.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter build as a mergeable aggregate: per group (typically one
  * global group), a fixed `bits`-wide bit array absorbing the long-hashed
  * keys. The buffer is O(bits) regardless of input size, updates run under
  * map-side partial aggregation, and merges OR the words — the mergeable-
  * summary shape that builds a filter over billions of keys with one
  * narrow exchange of `bits/8` bytes per partition.
  */
case class BloomSketch(
    child: Expression,
    bits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 64, "graft_bloom_agg: bits must be >= 64")
  require(numHashes >= 1 && numHashes <= 16, "graft_bloom_agg: numHashes must be in [1,16]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long (pre-hashed) column, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Bloom.wordsFor(bits))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buffer, v.asInstanceOf[Long], bits, numHashes)
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
}

/** Probe: true iff `left` (a long-hashed key) MIGHT be in the filter
  * `right` built by [[BloomSketch]] with the same (bits, numHashes) —
  * false is definite absence. Codegen'd static call, so the probe stays
  * inside whole-stage codegen as a scan-speed pre-filter.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             bits: Int, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long, array<long>), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(key: Any, words: Any): Any =
    Bloom.mightContain(words.asInstanceOf[ArrayData], key.asInstanceOf[Long],
      bits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (key, words) =>
      s"graft.functions.Bloom.mightContain($words, $key, $bits, $numHashes)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
