package graft.sources

import java.io.File
import java.util


import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 streaming source that re-emits MODIFIED files — the
  * semantic Spark's built-in file source lacks (it keys its seen-log by
  * path, so an overwritten file is never re-read), and the reason the
  * reference runs a watchdog with "kick back when busy" re-emission
  * (openmsistream data_file_io/actor/data_file_upload_directory.py:29-208,
  * entity/upload_directory_event_handler.py:22-183).
  *
  * Offsets carry the directory fingerprint (path → (mtime, size)); a
  * microbatch emits every file whose fingerprint changed since the previous
  * offset — new OR modified — after a debounce (`lagMs`: a file whose mtime
  * is within the lag of "now" is withheld until it has been static, the
  * reference's `watchdog_lag_time`). Deletions just drop out of the state.
  *
  * Scale posture: listing is driver-side (one stat pass per microbatch —
  * same as Spark's own file source); payload READS are executor-side, one
  * partition per changed file. The offset grows with the live file count;
  * for a directory beyond offset-log comfort the same diff-state moves to
  * the state store keyed by path prefix. Usage:
  * `spark.readStream.format(classOf[ModifiedFileProvider].getName)
  *   .option("path", dir).option("lagMs", "3000").load()`.
  */
class ModifiedFileProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "modified-files"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ModifiedFileTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val raw = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))
    // Accept file: URIs like the built-in file sources do (a bare
    // `new File("file:///x")` would silently match nothing).
    val path =
      if (raw.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(raw)).toString
      else raw
    val lagMs = Option(properties.get("lagms")).orElse(
      Option(properties.get("lagMs"))).map(_.toLong).getOrElse(0L)
    val maxFiles = Option(properties.get("maxfilespertrigger")).orElse(
      Option(properties.get("maxFilesPerTrigger"))).map(_.toInt).getOrElse(0)
    val maxBytes = Option(properties.get("maxbytespertrigger")).orElse(
      Option(properties.get("maxBytesPerTrigger"))).map(_.toLong).getOrElse(0L)
    new ModifiedFileTable(path, lagMs, maxFiles, maxBytes)
  }
}

object ModifiedFileTable {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("mtime_ms", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))
}

class ModifiedFileTable(path: String, lagMs: Long, maxFilesPerTrigger: Int = 0,
    maxBytesPerTrigger: Long = 0L) extends Table with SupportsRead {
  override def name(): String = s"modified_files($path)"
  override def schema(): StructType = ModifiedFileTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ModifiedFileTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ModifiedFileStream(path, lagMs, maxFilesPerTrigger, maxBytesPerTrigger)
      }
    }
}

/** Offset = the directory fingerprint at a point in time. JSON shape:
  * {"files":{"<path>":[mtime_ms,size],...}} — stable, order-independent. */
case class DirStateOffset(files: Map[String, (Long, Long)]) extends Offset {
  override def json(): String = {
    val m = new util.TreeMap[String, Array[Long]]() // sorted → stable json
    files.foreach { case (p, (mt, sz)) => m.put(p, Array(mt, sz)) }
    val root = new util.HashMap[String, Object]()
    root.put("files", m)
    DirStateOffset.mapper.writeValueAsString(root)
  }
}
object DirStateOffset {
  private[sources] val mapper = new ObjectMapper()
  def fromJson(json: String): DirStateOffset = {
    val node = mapper.readTree(json).get("files")
    val b = Map.newBuilder[String, (Long, Long)]
    val names = node.fieldNames()
    while (names.hasNext) {
      val k = names.next()
      val v = node.get(k)
      b += k -> (v.get(0).asLong(), v.get(1).asLong())
    }
    DirStateOffset(b.result())
  }
}

class ModifiedFileStream(root: String, lagMs: Long, maxFilesPerBatch: Int = 0,
    maxBytesPerBatch: Long = 0L)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private var availableNowPin: Option[DirStateOffset] = None

  private def scanDir(): DirStateOffset = {
    val cutoff = System.currentTimeMillis() - lagMs
    val b = Map.newBuilder[String, (Long, Long)]
    def walk(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
      else if (f.isFile && f.lastModified() <= cutoff) // debounce: static only
        b += f.getAbsolutePath -> (f.lastModified(), f.length())
    }
    walk(new File(root))
    DirStateOffset(b.result())
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowPin = Some(scanDir())

  override def initialOffset(): Offset = DirStateOffset(Map.empty)
  override def latestOffset(): Offset = availableNowPin.getOrElse(scanDir())

  /** Admission control (the reference's bounded upload queue — file count
    * via the producer queue depth, bytes via
    * DEFAULT_MAX_UPLOAD_QUEUE_MEGABYTES=500, utilities/config.py:35,
    * data_file_upload_directory.py:182-183): with `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` set, each microbatch admits changed files in
    * deterministic path order until either cap trips (always at least one
    * file, so an oversized file still makes progress). Deletions always
    * apply immediately (they emit no rows); a modified-but-deferred file
    * keeps its OLD fingerprint in the end offset and a new-but-deferred
    * file stays absent, so both remain pending and are picked up by later
    * batches until the target state is drained. */
  override def getDefaultReadLimit: ReadLimit = (maxFilesPerBatch, maxBytesPerBatch) match {
    case (f, b) if f > 0 && b > 0 =>
      ReadLimit.compositeLimit(Array(ReadLimit.maxFiles(f), ReadLimit.maxBytes(b)))
    case (f, _) if f > 0 => ReadLimit.maxFiles(f)
    case (_, b) if b > 0 => ReadLimit.maxBytes(b)
    case _ => ReadLimit.allAvailable()
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    def caps(l: ReadLimit): (Int, Long) = l match {
      case mf: ReadMaxFiles => (mf.maxFiles(), Long.MaxValue)
      case mb: ReadMaxBytes => (Int.MaxValue, mb.maxBytes())
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.map(caps).foldLeft((Int.MaxValue, Long.MaxValue)) {
          case ((f1, b1), (f2, b2)) => (math.min(f1, f2), math.min(b1, b2))
        }
      case _ => (Int.MaxValue, Long.MaxValue)
    }
    val (maxFiles, maxBytes) = caps(limit)
    admit(start.asInstanceOf[DirStateOffset],
      latestOffset().asInstanceOf[DirStateOffset], maxFiles, maxBytes)
  }

  /** Pure admission step — exposed for tests. */
  def admit(start: DirStateOffset, target: DirStateOffset,
      maxFiles: Int, maxBytes: Long = Long.MaxValue): DirStateOffset = {
    if (maxFiles == Int.MaxValue && maxBytes == Long.MaxValue) return target
    val before = start.files
    // oldest modification first (path as tiebreak) — the reference queue's
    // FIFO-by-arrival: a file churning every few seconds keeps getting a
    // NEWER mtime, so it can never indefinitely starve a once-modified
    // file behind it (pure path order could)
    val changed = target.files.toSeq
      .filter { case (p, fp) => !before.get(p).contains(fp) }
      .sortBy { case (p, (mt, _)) => (mt, p) }
    val admitted = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var bytes = 0L
    var stop = false
    for ((p, fp @ (_, sz)) <- changed if !stop) {
      // ≥1 file always admits so an oversized file still makes progress
      if (admitted.size < maxFiles && (admitted.isEmpty || bytes + sz <= maxBytes)) {
        admitted(p) = fp; bytes += sz
      } else stop = true
    }
    DirStateOffset(target.files.flatMap { case (p, fp) =>
      if (admitted.contains(p)) Some(p -> fp)
      else before.get(p) match {
        case Some(old) => Some(p -> old) // unchanged, or modified-but-deferred
        case None => None                // new-but-deferred
      }
    })
  }
  override def deserializeOffset(json: String): Offset = DirStateOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val before = start.asInstanceOf[DirStateOffset].files
    val after = end.asInstanceOf[DirStateOffset].files
    // new OR modified: fingerprint differs from the previous offset
    after.collect {
      case (p, fp @ (mt, _)) if !before.get(p).contains(fp) =>
        ModifiedFilePartition(p, mt): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val part = partition.asInstanceOf[ModifiedFilePartition]
        new PartitionReader[InternalRow] {
          // The read happens in next() so a file deleted between the
          // latestOffset() scan and batch execution yields zero rows
          // instead of poisoning the batch forever (the end offset is
          // already in the offset log, so a throwing reader would be
          // replayed against the missing file on every restart). If the
          // file reappears, the next microbatch's fingerprint diff
          // re-emits it — at-least-once, same as the reference watchdog.
          private var row: InternalRow = _
          private var done = false
          override def next(): Boolean = {
            if (done) return false
            done = true
            try {
              val bytes = java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(part.path))
              row = new GenericInternalRow(Array[Any](
                UTF8String.fromString(part.path), part.mtimeMs, bytes))
              true
            } catch {
              case _: java.nio.file.NoSuchFileException |
                   _: java.io.FileNotFoundException => false
            }
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
}

case class ModifiedFilePartition(path: String, mtimeMs: Long) extends InputPartition
