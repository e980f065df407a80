package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract's invariants so a future edit can't silently
  * break the correctness gate.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("query names are filesystem- and JSON-safe") {
    SparkEntry.queries.keys.foreach { name =>
      assert(name.matches("[a-z0-9_]+"), s"unsafe query name: $name")
    }
  }

  test("the battery is substantial and mostly oracled") {
    assert(SparkEntry.queries.size >= 80)
    assert(SparkEntry.oracleSql.size >= 70)
  }

  test("oracle SQL uses bare table names, never file paths") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.contains("read_parquet") && !sql.contains("/root/"),
        s"$name: oracle must reference driver-registered views, not files")
    }
  }
}
