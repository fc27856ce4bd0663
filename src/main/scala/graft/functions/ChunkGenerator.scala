package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{ChunkCodec, Chunker}

/** The chunker (T1) as a native Catalyst [[CollectionGenerator]] — the SQL
  * surface promised in SURVEY §2.9 ("one row → many rows, like explode"):
  * `chunk_binary(content, chunk_size)` emits one row per chunk with offsets
  * and the per-chunk sha512, streaming through the generator without
  * buffering the whole plan row set.
  *
  * Registered by [[ChunkFunctions.register]] / [[GraftExtensions]]; usable
  * as `SELECT doc_id, c.* FROM docs LATERAL VIEW chunk_binary(content, 64) c`.
  */
case class ChunkBinary(content: Expression, size: Expression)
    extends CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(content, size)
  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_i", IntegerType, nullable = false),
    StructField("n_total_chunks", IntegerType, nullable = false),
    StructField("chunk_offset", LongType, nullable = false),
    StructField("chunk_hash", BinaryType, nullable = false),
    StructField("chunk_data", BinaryType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (content.dataType, size.dataType) match {
      case (BinaryType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_binary expects (BINARY, INT), got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = content.eval(input).asInstanceOf[Array[Byte]]
    val chunkSize = size.eval(input).asInstanceOf[Int]
    if (bytes == null || bytes.isEmpty) Nil // empty content → zero chunks, like Chunker.chunk
    else {
      require(Chunker.isPowerOfTwo(chunkSize), s"chunk size $chunkSize not a power of two")
      val n = (bytes.length + chunkSize - 1) / chunkSize
      (0 until n).iterator.map { i =>
        val off = i.toLong * chunkSize
        val data = java.util.Arrays.copyOfRange(bytes, off.toInt,
          math.min(bytes.length, off.toInt + chunkSize))
        InternalRow(i + 1, n, off, ChunkCodec.sha512(data), data)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkBinary =
    copy(content = newChildren(0), size = newChildren(1))
}
