package graft.core

/** File reassembly with generation policy (G1/G2) as a pure, deterministic
  * state machine `(State, Chunk) => (State, Code)` — the heart of the engine
  * (reference download_data_file.py:76-272 semantics; SURVEY.md §2.4, §7.3).
  *
  * Codes mirror the reference (data_file_io/config.py:9-13):
  * 2 in-progress, 3 complete+verified, 10 duplicate/stale dropped,
  * 11 new generation adopted, -1 whole-file hash mismatch.
  *
  * Generation policy on a chunk whose `file_hash` differs from the tracked
  * generation (download_data_file.py:160-272):
  *  - higher `n_total_chunks` ⇒ newer generation: discard partial state,
  *    adopt (code 11);
  *  - lower `n` ⇒ stale: drop chunk (code 10);
  *  - equal `n` ⇒ newer mtime wins (a missing mtime loses to a present one);
  *    equal/absent mtimes fall through to an unsigned-lexicographic
  *    `file_hash` tiebreak (engine addition over the reference's
  *    arrival-order incumbent-wins, which is not associative);
  *  - same hash but different `n` ⇒ corruption ⇒ error.
  * Duplicate offsets of the same generation short-circuit (code 10). The
  * outcome is order-independent: generations are totally ordered by
  * (n, mtime, hash) via `cmpGeneration`, so the same maximal generation
  * wins under any interleaving and states merge associatively — which is
  * what lets the batch Aggregator run map-side partials.
  */
object Assembly {

  object Code {
    val InProgress = 2
    val Complete = 3
    val Duplicate = 10
    val NewGeneration = 11
    val HashMismatch = -1
    /** Engine addition (not in the reference): wire-derived rel_filepath
      * failed [[SafePaths]] validation; the row is dead-lettered unwritten. */
    val UnsafePath = -2
  }

  /** Per-file assembly state. `buffered` maps write offset → payload.
    * Scale note (SURVEY §7.3 #2): payloads live in the state here; the
    * 100 TB path spills payloads and keeps only an offsets bitmap — the
    * policy logic is unchanged. */
  final case class State(
      fileHash: Array[Byte],
      nTotal: Int,
      mtime: Option[Double],
      buffered: Map[Long, Array[Byte]]) {
    def sameGeneration(c: FileChunk): Boolean =
      java.util.Arrays.equals(fileHash, c.fileHash)
    def complete: Boolean = buffered.size == nTotal
  }

  final class AssemblyCorruption(msg: String) extends RuntimeException(msg)

  private def adopt(c: FileChunk): State =
    State(c.fileHash, c.nTotalChunks, c.fileMtime, Map(c.chunkOffsetWrite -> c.data))

  /** Generation decision, shared by the buffered and disk-mode assemblers. */
  sealed trait Decision
  case object SameGeneration extends Decision
  case object AdoptNew extends Decision
  case object DropStale extends Decision

  /** Total order on generations: `(n_total, mtime, file_hash)` with a missing
    * mtime sorting below any present one and an unsigned-lexicographic hash
    * comparison as the final tiebreak. The hash tiebreak is what makes the
    * equal-n/equal-mtime case deterministic under ANY merge interleaving —
    * without it the survivor would depend on Spark's partial-merge order
    * (the reference's incumbent-wins is arrival-order dependent; we trade
    * that for associativity, which map-side partial aggregation requires). */
  private def cmpGeneration(
      n1: Int, m1: Option[Double], h1: Array[Byte],
      n2: Int, m2: Option[Double], h2: Array[Byte]): Int = {
    val nc = Integer.compare(n1, n2)
    if (nc != 0) nc
    else {
      val mc = (m1, m2) match {
        case (Some(a), Some(b)) => java.lang.Double.compare(a, b)
        case (None, Some(_)) => -1
        case (Some(_), None) => 1
        case (None, None) => 0
      }
      if (mc != 0) mc else java.util.Arrays.compareUnsigned(h1, h2)
    }
  }

  def decide(curHash: Array[Byte], curN: Int, curMtime: Option[Double],
      c: FileChunk): Decision =
    if (java.util.Arrays.equals(curHash, c.fileHash)) {
      if (c.nTotalChunks != curN)
        throw new AssemblyCorruption(
          s"same hash, different n_total (${c.nTotalChunks} vs $curN) for ${c.relFilepath}")
      SameGeneration
    } else if (cmpGeneration(c.nTotalChunks, c.fileMtime, c.fileHash,
      curN, curMtime, curHash) > 0) AdoptNew
    else DropStale

  /** Pure transition. Returns the new state and the reference's code. */
  def step(state: Option[State], c: FileChunk): (State, Int) = state match {
    case None => (adopt(c), Code.InProgress)
    case Some(s) => decide(s.fileHash, s.nTotal, s.mtime, c) match {
      case SameGeneration =>
        if (s.buffered.contains(c.chunkOffsetWrite)) (s, Code.Duplicate)
        else (s.copy(buffered = s.buffered + (c.chunkOffsetWrite -> c.data)), Code.InProgress)
      case AdoptNew => (adopt(c), Code.NewGeneration)
      case DropStale => (s, Code.Duplicate)
    }
  }

  /** Merge two partial states for the same file (order-independent partial
    * aggregation). The newer generation wins; equal generations union their
    * offset maps. */
  def merge(a: State, b: State): State =
    if (java.util.Arrays.equals(a.fileHash, b.fileHash)) {
      if (a.nTotal != b.nTotal)
        throw new AssemblyCorruption(s"same hash, different n_total (${a.nTotal} vs ${b.nTotal})")
      a.copy(buffered = a.buffered ++ b.buffered)
    } else if (cmpGeneration(a.nTotal, a.mtime, a.fileHash,
      b.nTotal, b.mtime, b.fileHash) >= 0) a
    else b // total order (incl. hash tiebreak): same winner as decide()

  /** Completion check: all offsets present AND `sha512(whole) == file_hash`
    * (the reference verifies the reconstructed content, not just counts —
    * download_data_file.py:149-156). Returns code 3 with the file, or -1. */
  def finish(relFilepath: String, filename: String, s: State): (Int, Option[CompletedFile]) = {
    if (!s.complete) (Code.InProgress, None)
    else {
      val ordered = s.buffered.toSeq.sortBy(_._1)
      val size = ordered.map(_._2.length.toLong).sum
      val out = new java.io.ByteArrayOutputStream(size.toInt)
      ordered.foreach { case (_, d) => out.write(d, 0, d.length) }
      val whole = out.toByteArray
      if (java.util.Arrays.equals(ChunkCodec.sha512(whole), s.fileHash))
        (Code.Complete,
          Some(CompletedFile(relFilepath, filename, s.nTotal, size, s.fileHash, s.mtime, whole)))
      else (Code.HashMismatch, None)
    }
  }
}
