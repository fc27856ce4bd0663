package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: at most `k` (key, a, b) triples, kept sorted
  * best-first by (key DESC, a ASC, b ASC). Flat long arrays + insertion
  * sort — k is small (single digits) so a shift beats any heap, and the
  * O(1) "worst entry already beats the candidate" rejection makes the warm
  * path a single comparison per row.
  */
final class TopKRowsBuffer(val k: Int) {
  val keys = new Array[Long](k)
  val as = new Array[Long](k)
  val bs = new Array[Long](k)
  var n = 0

  /** < 0 iff entry `i` orders strictly before (is better than) the candidate. */
  private def cmp(i: Int, key: Long, a: Long, b: Long): Int = {
    if (keys(i) != key) { if (keys(i) > key) -1 else 1 }
    else if (as(i) != a) { if (as(i) < a) -1 else 1 }
    else if (bs(i) != b) { if (bs(i) < b) -1 else 1 }
    else 0
  }

  def insert(key: Long, a: Long, b: Long): Unit = {
    if (n == k && cmp(n - 1, key, a, b) <= 0) return // warm fast path
    var pos = if (n < k) n else n - 1 // full buffer: worst entry falls off
    while (pos > 0 && cmp(pos - 1, key, a, b) > 0) {
      keys(pos) = keys(pos - 1); as(pos) = as(pos - 1); bs(pos) = bs(pos - 1)
      pos -= 1
    }
    keys(pos) = key; as(pos) = a; bs(pos) = b
    if (n < k) n += 1
  }
}

/** Native per-group top-k aggregate over `InternalRow` — the execution-layer
  * fix for the typed-Aggregator form, whose per-row tuple Encoder round trip
  * dominated runtime. As a [[TypedImperativeAggregate]] it runs inside
  * ObjectHashAggregateExec: input rows are consumed directly (no
  * serialization per row), state is O(k) per (group, partition), partial
  * merge is associative — so a hot group's million rows reduce to k entries
  * before the exchange. Returns `array<struct<key,a,b>>` best-first by
  * (key DESC, a ASC, b ASC).
  */
case class TopKRows(
    keyExpr: Expression,
    aExpr: Expression,
    bExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] with TernaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def first: Expression = keyExpr
  override def second: Expression = aExpr
  override def third: Expression = bExpr

  // The eval path casts straight to Long — reject non-bigint children at
  // analysis time rather than ClassCastException at execution time.
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq("key" -> keyExpr, "a" -> aExpr, "b" -> bExpr)
      .filter(_._2.dataType != LongType)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_rows expects bigint children, got " +
        bad.map { case (n, e) => s"$n: ${e.dataType.simpleString}" }.mkString(", "))
  }

  override def createAggregationBuffer(): TopKRowsBuffer = new TopKRowsBuffer(k)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val kv = keyExpr.eval(input)
    val av = aExpr.eval(input)
    val bv = bExpr.eval(input)
    if (kv != null && av != null && bv != null)
      buf.insert(kv.asInstanceOf[Long], av.asInstanceOf[Long], bv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.keys(i), other.as(i), other.bs(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKRowsBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.keys(i), buf.as(i), buf.bs(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.keys(i)).putLong(buf.as(i)).putLong(buf.bs(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKRowsBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.keys(i) = bb.getLong(); buf.as(i) = bb.getLong(); buf.bs(i) = bb.getLong()
      i += 1
    }
    buf.n = n
    buf
  }

  override def dataType: DataType = TopKRows.resultType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKRows =
    copy(keyExpr = newFirst, aExpr = newSecond, bExpr = newThird)

  override def prettyName: String = "topk_rows"
}

object TopKRows {
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)

  /** Top-k rows per group by (key DESC, a ASC, b ASC), as a Column.
    * Children are cast to bigint here so int/short columns work at the
    * call site; a non-castable type still fails cleanly at analysis via
    * [[TopKRows.checkInputDataTypes]]. */
  def topkRows(key: Column, a: Column, b: Column, k: Int): Column =
    GraftColumnShim.column(TopKRows(
      GraftColumnShim.expression(key.cast("bigint")),
      GraftColumnShim.expression(a.cast("bigint")),
      GraftColumnShim.expression(b.cast("bigint")), k).toAggregateExpression())
}
