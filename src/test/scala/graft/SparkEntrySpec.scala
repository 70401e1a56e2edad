package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration invariants for the driver contract: every catalog
  * query must be value-level oracle-gated (no silent rows-only
  * downgrades), every oracle must gate a real query (no dead gates),
  * and names must be well-formed q_* keys. Pure map checks — no Spark
  * session. */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle a query " +
    "(catalog == gate, no silent downgrades or dead gates)") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(queries -- oracles == Set.empty[String],
      "queries without oracle SQL (rows-only downgrade)")
    assert(oracles -- queries == Set.empty[String],
      "oracle SQL keyed to no query (dead gate)")
  }

  test("README's catalog count matches the registered catalog " +
    "(ADVICE r6: doc counts must not drift from the manifest)") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    val text = try readme.mkString finally readme.close()
    val m = "All (\\d+) catalog queries".r.findFirstMatchIn(text)
    assert(m.isDefined, "README no longer states the catalog count")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)} but the catalog registers " +
        s"${SparkEntry.queries.size} — update README.md")
  }

  test("catalog keys are well-formed and non-empty") {
    assert(SparkEntry.queries.nonEmpty)
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q_[a-z0-9_]+"))
    assert(bad == Set.empty[String], s"malformed query names: $bad")
    val emptySql = SparkEntry.oracleSql.collect {
      case (k, v) if v.trim.isEmpty => k
    }
    assert(emptySql.isEmpty, s"empty oracle SQL: $emptySql")
  }
}
