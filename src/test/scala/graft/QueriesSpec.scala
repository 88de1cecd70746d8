package graft

/** Smoke: every registered query runs at sf0.001 and yields rows; every
  * oracle key matches a query key; entry() is non-empty. */
class QueriesSpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qk)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val n = fn(spark, TinySf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
