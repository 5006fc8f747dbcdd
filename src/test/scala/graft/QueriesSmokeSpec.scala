package graft

/** Every registered query must run end-to-end at sf0.001 and the flagship
  * entry must return rows (the driver's t1 smoke contract). */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-backed query has matching column sets declared") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      fn(spark, sf).count() // just exercise the plan end-to-end
    }
  }
}
