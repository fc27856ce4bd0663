package graft.functions

import scala.util.control.NonFatal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Zstandard (RFC 8878) member decode over the `zstd-jni` binding
  * Spark itself ships (it is Spark's own shuffle/event-log codec — a
  * public dependency already on every executor classpath, so unlike
  * bzip2/LZMA there is nothing to build from scratch). Modern crawl
  * and corpus distributions increasingly ship `.zst`/`.warc.zst`/
  * `.tar.zst`; this wires them into the same member chain as
  * .gz/.bz2.
  *
  * Decode semantics mirror [[Bzip2.decode]]: null on anything broken
  * (bad magic, truncated frame, checksum), multi-FRAME concatenations
  * decode whole (the streaming reader continues into following
  * frames, like multistream bzip2), and output is bounded at 256 MiB
  * — the per-row zip-bomb guard; an over-bound inflate null-routes
  * like corruption. */
object Zstandard {

  /** RFC 8878 §3.1.1 frame magic, little-endian on the wire. */
  private def hasMagic(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 0x28.toByte && b(1) == 0xB5.toByte &&
      b(2) == 0x2F.toByte && b(3) == 0xFD.toByte

  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || !hasMagic(b)) return null
    try {
      val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n > 0) {
          out.write(buf, 0, n)
          if (out.size() > (1 << 28)) return null // bound hostile streams
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch { case NonFatal(_) => null }
  }

  /** Fixture-side encoder (one frame, default level, content checksum
    * on so flip arms actually trip). */
  def encode(b: Array[Byte]): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setChecksum(true)
      ctx.compress(b)
    } finally ctx.close()
  }
}

/** `zstd_bytes(binary)` → decompressed bytes; null when the payload is
  * not zstd or any frame fails (see [[Zstandard.decode]]). */
case class ZstdBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zstd_bytes expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any =
    Zstandard.decode(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zstdBytes", this, classOf[ZstdBytes].getName)
    val r = ctx.freshName("zs")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (byte[]) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ZstdBytes =
    copy(child = newChild)

  override def prettyName: String = "zstd_bytes"
}

object ZstdBytes {
  def zstdBytes(media: Column): Column =
    GraftColumnShim.column(ZstdBytes(GraftColumnShim.expression(media)))
}
