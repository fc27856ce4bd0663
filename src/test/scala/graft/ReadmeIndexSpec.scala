package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** README's query index is maintained by hand against the DQ registry;
  * this pins the two together so a new gate cannot land without its
  * index entry (or a stale total survive a round): the headline count
  * must equal `SparkEntry.queries.size` and every registered query
  * name must appear in the index, backticked. */
class ReadmeIndexSpec extends AnyFunSuite {

  test("README query index carries every registered query and the " +
      "exact total") {
    val readme = new String(
      Files.readAllBytes(Paths.get("README.md")), "UTF-8")
    val names = SparkEntry.queries.keySet
    val m = "## Query index \\((\\d+) gated queries".r
      .findFirstMatchIn(readme)
    assert(m.isDefined, "README lost its query-index heading")
    assert(m.get.group(1).toInt == names.size,
      s"README says ${m.get.group(1)} gated queries, registry has " +
        s"${names.size}")
    val missing = names.filterNot(n => readme.contains(s"`$n`"))
    assert(missing.isEmpty, s"index entries missing: $missing")
  }
}
