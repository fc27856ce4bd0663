package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense float-vector math (the embedding
  * column ops behind q26/x04/x12/x13). The `aggregate(zip_with(...))`
  * higher-order-function formulation materializes an intermediate
  * array<double> and boxes every element per pair — on an O(pairs) near-dup
  * scan that allocation dominates. These emit a tight primitive loop over
  * the two `ArrayData` (no intermediate array, no boxing) and stay inside
  * WholeStageCodegen.
  *
  * Accumulation is sequential left-to-right in double, identical to the
  * HOF formulation, so results are bit-for-bit unchanged. Vectors are
  * assumed dense (no null elements) — the reference's embedding model
  * (SURVEY §2.12) guarantees that; unequal lengths dot over the shorter.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got $other")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a dense float vector; same accumulation order as
  * `sqrt(aggregate(transform(a, x*x), 0.0, +))`. */
case class FloatVecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float>, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): FloatVecNorm =
    copy(child = newChild)
}

/** argmin‖v − cᵢ‖² over a DRIVER-COLLECTED centroid model (k·dim floats —
  * kilobytes for any sane codebook), returning the winning centroid id
  * with the (dist², cid) tie-break. The higher-order-function fold this
  * replaces (`aggregate` over a broadcast centroid array of
  * `aggregate(zip_with(...))`) allocates an intermediate array per
  * (row, centroid); at k=782 centroids × 200k vectors the SCALE.md study
  * measured that allocation wall at ~9 minutes, where this tight
  * primitive loop is pure FMA work. Distances accumulate left-to-right in
  * double, dimension order — bit-identical to the fold, so swapping the
  * implementation cannot move a hash gate. Ships to executors as a
  * reference object inside whole-stage codegen (the same "small model as
  * expression state" pattern as the media parsers). */
case class NearestCentroid(child: Expression,
    cids: Array[Long], cvs: Array[Array[Float]]) extends UnaryExpression {
  require(cids.length == cvs.length && cids.nonEmpty, "empty centroid model")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var best = Double.MaxValue
    var bestCid = Long.MaxValue
    var c = 0
    while (c < cvs.length) {
      val cv = cvs(c)
      val m = math.min(n, cv.length)
      var s = 0.0
      var i = 0
      while (i < m) {
        val d = a.getFloat(i).toDouble - cv(i).toDouble
        s += d * d
        i += 1
      }
      if (s < best || (s == best && cids(c) < bestCid)) {
        best = s; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (Long) $self.nullSafeEval($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

object VectorFunctions {
  /** DataFrame-side constructors. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnShim.column(FloatVecDot(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
  def vecNorm(a: Column): Column =
    GraftColumnShim.column(FloatVecNorm(GraftColumnShim.expression(a)))
  def nearestCentroid(v: Column, cids: Array[Long],
      cvs: Array[Array[Float]]): Column =
    GraftColumnShim.column(NearestCentroid(
      GraftColumnShim.expression(v), cids, cvs))
}
