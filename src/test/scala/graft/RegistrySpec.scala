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

  test("SparkEntry surfaces the registry verbatim") {
    assert(SparkEntry.queries.keySet == Queries.queries.keySet)
    assert(SparkEntry.oracleSql == Queries.oracleSql)
  }

  test("rows-only queries are the documented exceptions, not silent gaps") {
    val rowsOnly = Queries.queries.keySet -- Queries.oracleSql.keySet --
      Queries.all.filter(_.oracleFn.isDefined).map(_.name).toSet
    // uuid/RNG queries can't have cross-engine oracles; HLL sketches differ
    // per engine; KLL estimates are property-tested against an ε bound
    // instead. The trained-IVF queries carry DERIVED oracles (centroid
    // literals, materialized at verify time — see Queries.derivedOracleSql)
    // so they no longer count as rows-only. Anything else appearing here is
    // a missing oracle.
    assert(rowsOnly == Set("c11_uuid_wagers", "f_sample_bernoulli",
      "text_vocab_approx", "sketch_kll_quantiles", "sketch_kll_by_group"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("no query has both a static and a derived oracle") {
    assert(Queries.all.forall(q => q.oracle.isEmpty || q.oracleFn.isEmpty))
  }
}
