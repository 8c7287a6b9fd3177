package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity guards on the driver-contract registry itself. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  test("every bench query is registered, every oracle belongs to a query") {
    assert(Queries.benchNames.toSet.subsetOf(Queries.queries.keySet))
    assert(Queries.oracleSql.keySet.subsetOf(Queries.queries.keySet))
  }

  test("the r1 continuity subset stays inside the widened bench set") {
    assert(Bench.R1Set.subsetOf(Queries.benchNames.toSet),
      s"missing from bench: ${Bench.R1Set -- Queries.benchNames.toSet}")
  }

  test("SparkEntry surfaces the registry verbatim") {
    assert(SparkEntry.queries.keySet == Queries.queries.keySet)
    assert(SparkEntry.oracleSql == Queries.oracleSql)
  }

  test("every registered query is oracle-checked — zero rows-only entries") {
    // No exemptions (r16): the former rows-only artifact_catalog now
    // registers its deterministic checked face (fixed artifact set,
    // fingerprint-rule + cardinality oracle — VERDICT r15 #8); the
    // host-dependent byte-size listing moved to a spec-only debug view.
    val rowsOnly = Queries.queries.keySet -- Queries.oracleSql.keySet --
      Queries.all.filter(_.oracleFn.isDefined).map(_.name).toSet
    // The five formerly rows-only queries (uuid/RNG/HLL/KLL) now register
    // their hash-checked bound verdicts under the same names (round-7
    // verdict task 5), and the trained-IVF queries carry DERIVED oracles
    // (centroid literals, materialized at verify time — see
    // Queries.derivedOracleSql). Anything appearing here is a missing
    // oracle.
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("no query has both a static and a derived oracle") {
    assert(Queries.all.forall(q => q.oracle.isEmpty || q.oracleFn.isEmpty))
  }
}
