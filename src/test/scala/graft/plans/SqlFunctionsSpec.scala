package graft.plans

import graft.SparkSpec

class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    Functions.register(spark)
    Seq(("ab", Seq(1L, 5L, 9L), Seq(5L, 9L, 11L), "g1"))
      .toDF("s", "a", "b", "g").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT poly_hash(s) AS ph, sorted_intersect_count(a, b) AS ic FROM t""")
      .as[(Long, Long)].head()
    assert(row._1 == (7L * 31 + 'a') * 31 + 'b')
    assert(row._2 == 2L)
    val sketch = spark.sql(
      """SELECT g, minhash_sketch(a, 4) AS sig FROM t GROUP BY g""")
      .select("sig").as[Seq[Long]].head()
    val expect = (0 until 4).map { i =>
      Seq(1L, 5L, 9L).map(x =>
        (graft.operators.Dedup.aCoef(i) * x + graft.operators.Dedup.bCoef(i)) % graft.operators.Dedup.P).min
    }
    assert(sketch == expect)
  }
}
