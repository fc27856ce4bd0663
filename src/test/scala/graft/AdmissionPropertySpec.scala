package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DirStateOffset, ModifiedFileStream}

/** Properties of the pure admission step ([[ModifiedFileStream.admit]]) over
  * seeded-random directory states: whatever the caps, a capped batch must
  * admit only real changes, apply deletions immediately, defer the rest
  * without corrupting their pending state, always make progress, and drain
  * to the target in finitely many batches. */
class AdmissionPropertySpec extends AnyFunSuite {

  private val stream = new ModifiedFileStream("/unused", 0L)

  private def randState(rnd: scala.util.Random): Map[String, (Long, Long)] =
    (1 to 12).filter(_ => rnd.nextBoolean()).map { i =>
      s"/d/f$i" -> (1L + rnd.nextInt(50), rnd.nextInt(200).toLong)
    }.toMap

  test("admission invariants hold for random states and caps") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val before = randState(rnd)
      val target = randState(rnd)
      val maxFiles = 1 + rnd.nextInt(4)
      val maxBytes = 1L + rnd.nextInt(300)
      val end = stream.admit(
        DirStateOffset(before), DirStateOffset(target), maxFiles, maxBytes).files
      // 1. never invents files: end keys ⊆ target keys
      assert(end.keySet.subsetOf(target.keySet))
      // 2. deletions apply immediately: a key absent from target is absent
      assert((before.keySet -- target.keySet).forall(!end.contains(_)))
      // 3. each key is either at its target fingerprint (admitted or
      //    unchanged) or still at its old one (deferred) — never corrupted
      end.foreach { case (p, fp) =>
        assert(fp == target(p) || before.get(p).contains(fp),
          s"corrupted fingerprint for $p: $fp")
      }
      // 4. the admitted count respects the file cap
      val admitted = end.filter { case (p, fp) =>
        target.get(p).contains(fp) && !before.get(p).contains(fp) }
      assert(admitted.size <= maxFiles)
      // 5. byte cap: admitted bytes fit, or exactly one oversized file
      val bytes = admitted.values.map(_._2).sum
      assert(bytes <= maxBytes || admitted.size == 1,
        s"byte budget exceeded: $bytes > $maxBytes with ${admitted.size} files")
      // 6. progress: if anything changed, something admits
      val changed = target.exists { case (p, fp) => !before.get(p).contains(fp) }
      if (changed) assert(admitted.nonEmpty, "capped batch made no progress")
    }
  }

  test("repeated capped batches always drain to the target state") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val before = randState(rnd)
      val target = randState(rnd)
      val maxFiles = 1 + rnd.nextInt(3)
      val maxBytes = 1L + rnd.nextInt(150)
      var cur = DirStateOffset(before)
      val tgt = DirStateOffset(target)
      var steps = 0
      while (cur.files != target && steps < 50) {
        cur = stream.admit(cur, tgt, maxFiles, maxBytes)
        steps += 1
      }
      assert(cur.files == target, s"did not drain after $steps batches")
    }
  }
}
