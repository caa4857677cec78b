package graft

/** Smoke-level contract checks over the full §2 registry at sf0.001:
  * every query runs, returns rows, and respects the driver contract
  * (unique names, oracle keys ⊆ query keys). Value-level correctness
  * is the DuckDB oracle gate (graft.Verify + tools/oracle_check.py).
  */
class QueriesSpec extends SparkSpec {

  test("registry names are unique and oracles reference real queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.fn(spark, sf())
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }
}
