package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash content-defined chunk boundaries (the FastCDC family;
  * the O(1)-per-byte upgrade of x51's md5-per-position boundary rule —
  * reference chunking is fixed-size, upload_data_file.py:230-304; CDC is
  * the dedup-friendly extension).
  *
  * Definition (shared with the DuckDB oracle): GEAR[c] = first 48 bits of
  * md5 of the single-character string; h_0 = 0; h_i = (h_{i-1} << 1) +
  * GEAR[c_i] wrapping mod 2^64; position i (1-based) is a boundary iff
  * (h_i & (2^maskBits - 1)) == 0. Because the shift discards a byte's
  * influence on bit b after b+1 steps, the masked value depends on only the
  * trailing maskBits characters — boundaries are purely content-local,
  * which is exactly what makes the chunking insertion/deletion-stable. The
  * oracle computes the same masked value as a maskBits-term window sum mod
  * 2^maskBits (the two are equal: mod distributes over the sum and all
  * older terms vanish mod 2^maskBits).
  */
case class GearBoundaries(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gear_boundaries expects (string, int maskBits), got $other")
    }
  override def nullSafeEval(text: Any, mb: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    val mask = (1L << mb.asInstanceOf[Int]) - 1
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h << 1) + GearBoundaries.gear(s.charAt(i))
      if ((h & mask) == 0L) out.add(i + 1)
      i += 1
    }
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k).intValue(); k += 1 }
    new GenericArrayData(arr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one opaque call keeps the surrounding operators in one
    // WholeStageCodegen span (same pattern as pack_chunk)
    val self = ctx.addReferenceObj("gearBounds", this, classOf[GearBoundaries].getName)
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($t, $m);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GearBoundaries =
    copy(left = newLeft, right = newRight)
}

object GearBoundaries {
  /** GEAR[c] = first 6 bytes of md5(single-char string), as a long.
    * Latin-1 range precomputed; anything above falls back to the same
    * computation on demand (the fixtures are ASCII). */
  private val table: Array[Long] = Array.tabulate(256)(c => compute(c.toChar))
  private def compute(c: Char): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(String.valueOf(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
  def gear(c: Char): Long = if (c < 256) table(c) else compute(c)
}

object GearFunctions {
  def gearBoundaries(text: Column, maskBits: Int): Column =
    GraftColumnShim.column(GearBoundaries(
      GraftColumnShim.expression(text), Literal(maskBits)))
}
