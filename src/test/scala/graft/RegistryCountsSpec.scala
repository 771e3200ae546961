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

  /** Round-11 verdict: §2.4 lagged the registry by 6 operator NAMES
    * while the counts line stayed green — counts can't see which rows
    * are missing. This makes name coverage mechanical too: every
    * registry key must appear in SURVEY.md, where the prose may use
    * the three established shorthands — a parenthesized optional
    * suffix inside one backtick pair (`dedup_containment(_sketch)`),
    * a trailing (+`_minhash`)-style suffix after a backticked base,
    * and the `sql_q1..q22_verbatim` range.
    */
  test("every registry query name appears in SURVEY.md §2.4 prose") {
    val whole = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    // slice to the §2.4 section: a backticked mention elsewhere in the
    // document (round changelog, §1 tables) must NOT satisfy coverage —
    // the registry table is the contract this test keeps synced
    val start = whole.indexOf("### 2.4")
    val end = whole.indexOf("\n## 3", start)
    assert(start >= 0 && end > start, "SURVEY.md lost its §2.4 section")
    val survey = whole.substring(start, end)
    val names = scala.collection.mutable.Set.empty[String]
    for (m <- "`([a-z0-9_().+]+)`".r.findAllMatchIn(survey)) {
      val tok = m.group(1)
      "^([a-z0-9_]+)\\((_[a-z0-9_]+)\\)$".r.findFirstMatchIn(tok) match {
        case Some(p) => names += p.group(1); names += p.group(1) + p.group(2)
        case None => names += tok
      }
    }
    for (m <- "`([a-z0-9_]+)`\\s*\\(\\+`(_[a-z0-9_]+)`\\)".r
        .findAllMatchIn(survey))
      names += m.group(1) + m.group(2)
    for (m <- "([a-z0-9_]*q)(\\d+)\\.\\.q(\\d+)(_[a-z0-9_]+)".r
        .findAllMatchIn(survey);
        i <- m.group(2).toInt to m.group(3).toInt)
      names += s"${m.group(1).stripSuffix("q")}q$i${m.group(4)}"
    val missing = SparkEntry.queries.keySet.filterNot(names)
    assert(missing.isEmpty,
      s"registry queries with no SURVEY.md mention: ${missing.toSeq.sorted}")
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
