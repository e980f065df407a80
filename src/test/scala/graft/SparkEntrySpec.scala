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

  test("the battery is substantial and fully oracled") {
    assert(SparkEntry.queries.size >= 80)
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size,
      s"unoracled queries: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
  }

  test("file-based oracles only reference committed golden fixtures that exist") {
    // Golden-parquet oracles (read_parquet) are allowed ONLY against
    // committed files under fixtures/ — absolute paths, so the driver's
    // DuckDB resolves them regardless of cwd; existence checked here so a
    // renamed/forgotten fixture fails the suite, not the round's gate.
    val pathRe = "read_parquet\\('([^']+)'\\)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      val paths = pathRe.findAllMatchIn(sql).map(_.group(1)).toSeq
      assert(!sql.contains("/root/") || paths.nonEmpty,
        s"$name: absolute path outside a read_parquet golden reference")
      paths.foreach { p =>
        assert(p.startsWith("/root/repo/fixtures/"),
          s"$name: golden path must live in committed fixtures/, got $p")
        assert(new java.io.File(p).isFile, s"$name: missing golden fixture $p")
      }
    }
  }
}
