package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed Bloom-filter build as a native aggregate: each input row
  * carries the pre-computed bucket positions of one item (an
  * `array<bigint>` of k hash values in `[0, m)`), the per-partition state
  * is the fixed `m`-bit set, and merge is a word-wise OR — associative,
  * commutative, and CONSTANT-SIZED regardless of item count. That
  * constant size is the whole point at 100 TB: an incremental-dedup gate
  * against a billions-of-items prior corpus exchanges `m/8` bytes per
  * partition (128 KiB at m = 2^20) where a distinct-key set would
  * exchange 8 bytes PER ITEM, and the finished filter broadcasts to the
  * new batch instead of joining it (reference anchor: the consumer-group
  * offset dedup in openmsistream's download path is the same
  * "have I seen this key" shape, `download_data_file.py:76-156`, done
  * there with an in-memory dict per consumer).
  *
  * Bucket hashing happens OUTSIDE the aggregate (md5-prefix arithmetic on
  * codegen'd builtins) so the exact bit positions are replayable by the
  * DuckDB oracle: "bit h is set" ⟺ "some prior item hashed to h", which
  * the oracle states as k IN-subqueries over the same bucket formulas —
  * the membership verdicts are EXACTLY equal, not approximately.
  *
  * Result: `array<bigint>` of `m/64` words, little-endian bit order
  * (bit h ⇒ word `h / 64`, mask `1 << (h % 64)`); test membership with
  * `element_at(bits, int(h/64)+1) & shiftleft(1L, int(h%64)) <> 0`.
  */
final class BloomBitsBuffer(val words: Array[Long]) {
  def set(h: Long): Unit = {
    val idx = (h >>> 6).toInt
    words(idx) |= (1L << (h & 63).toInt)
  }
}

case class BloomBits(
    child: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBitsBuffer] with UnaryLike[Expression] {
  require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits expects array<bigint> bucket positions, got $other")
  }

  override def createAggregationBuffer(): BloomBitsBuffer =
    new BloomBitsBuffer(new Array[Long](mBits / 64))

  override def update(buf: BloomBitsBuffer, input: InternalRow): BloomBitsBuffer = {
    val hs = child.eval(input)
    if (hs != null) {
      val arr = hs.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          if (h < 0 || h >= mBits) throw new IllegalArgumentException(
            s"bloom_bits bucket $h outside [0, $mBits)")
          buf.set(h)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: BloomBitsBuffer, other: BloomBitsBuffer): BloomBitsBuffer = {
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf
  }

  override def eval(buf: BloomBitsBuffer): Any =
    new GenericArrayData(buf.words.map(w => w: Any))

  override def serialize(buf: BloomBitsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.words.length)
    buf.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBitsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    new BloomBitsBuffer(words)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)

  override def prettyName: String = "bloom_bits"
}

object BloomBits {
  /** Aggregate the k bucket positions per row into an m-bit Bloom set. */
  def bloomBits(buckets: Column, mBits: Int): Column =
    GraftColumnShim.column(
      BloomBits(GraftColumnShim.expression(buckets), mBits).toAggregateExpression())
}
