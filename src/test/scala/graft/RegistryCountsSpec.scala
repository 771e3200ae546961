package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md's §2.4 prose counts drifted twice in round 9 (372 vs 376
  * in adjacent paragraphs). This spec makes the doc/code agreement
  * mechanical: the canonical counts line in SURVEY.md must equal the
  * actual SparkEntry registry sizes, so adding a query without
  * updating the doc (or vice versa) fails the suite.
  */
class RegistryCountsSpec extends AnyFunSuite {

  test("SURVEY.md's canonical counts line equals the registry") {
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val re =
      ("Registry counts \\(machine-checked by RegistryCountsSpec\\): " +
        "(\\d+) queries, (\\d+) oracled, (\\d+) spec-only, " +
        "bench covers (\\d+)").r
    val m = re.findFirstMatchIn(survey).getOrElse(
      fail("SURVEY.md lost its canonical 'Registry counts' line"))
    val (nq, no, ns, nb) =
      (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt, m.group(4).toInt)
    assert(nq == SparkEntry.queries.size,
      s"SURVEY says $nq queries, registry has ${SparkEntry.queries.size}")
    assert(no == SparkEntry.oracleSql.size,
      s"SURVEY says $no oracled, oracleSql has ${SparkEntry.oracleSql.size}")
    assert(ns == SparkEntry.queries.size - SparkEntry.oracleSql.size,
      s"SURVEY says $ns spec-only, actual is " +
        s"${SparkEntry.queries.size - SparkEntry.oracleSql.size}")
    assert(nb == SparkEntry.benchQueries.size,
      s"SURVEY says bench covers $nb, benchQueries has " +
        s"${SparkEntry.benchQueries.size}")
  }

  test("registry structural invariants") {
    // every oracle row points at a registered query
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries entry: $orphans")
    // the bench covers the whole registry, each exactly once
    assert(SparkEntry.benchQueries.sorted == SparkEntry.queries.keys.toSeq.sorted,
      "benchQueries must cover every registry entry exactly once")
    // headline subset stays valid (subtotal comparisons vs BASELINE.md)
    val missing = SparkEntry.headlineQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headlineQueries not in registry: $missing")
  }
}
