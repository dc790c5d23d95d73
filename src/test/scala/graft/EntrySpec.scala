package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing maps themselves. These exist because
  * of a real failure mode: a `private val fooSql` defined AFTER the `oracle`
  * map that references it is still null when the map is built at object init
  * — Scala initializes vals in declaration order — and the driver's JSON dump
  * then NPEs, zeroing the whole round's correctness. A spec-time walk of the
  * maps turns that silent init-order hazard into a red test. */
class EntrySpec extends AnyFunSuite {

  test("every oracleSql value is a non-empty SQL string (no init-order nulls)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql != null, s"$name: oracle SQL is null — val defined after the map?")
      assert(sql.trim.nonEmpty, s"$name: oracle SQL is empty")
      assert(sql.toUpperCase.contains("SELECT"), s"$name: not SQL: $sql")
    }
  }

  test("every oracleSql key has a queries entry; query names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle SQL without a query impl: $orphans")
    qs.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $n"))
  }

  test("queries without an oracle are the known dynamic-oracle set") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // The only queries allowed to lack an oracle in a FRESH JVM are the
    // frozen-model trainers (ExtQueries.dynamicOracleNames): their replay
    // SQL is built from artifacts the query run itself trains, so it is
    // absent until the query executes — but Verify dumps oracle_sql.json
    // AFTER running every query, so the driver always receives them.
    // Depending on suite order, some trainers may already have run in this
    // JVM (populating OracleAux), so `noOracle` is a SUBSET of the dynamic
    // set, not necessarily equal to it. Anything newly added to the dynamic
    // set must be a deliberate trained-artifact replay — extend
    // dynamicOracleNames in the same commit that adds the query.
    val allowed = ExtQueries.dynamicOracleNames
    assert((noOracle -- allowed).isEmpty,
      s"queries recorded rows-only (no oracle) — intended? ${noOracle -- allowed}")
    val orphanDynamic = allowed -- SparkEntry.queries.keySet
    assert(orphanDynamic.isEmpty,
      s"dynamicOracleNames without a query impl: $orphanDynamic")
  }
}
