package graft.plans

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of graft's native expressions, so
  * `spark.sql(...)` users get the same operators as the DataFrame API:
  *
  * {{{
  * graft.plans.Functions.register(spark)
  * spark.sql("SELECT poly_hash(text), sorted_intersect_count(a, b) FROM t")
  * spark.sql("SELECT src, minhash_sketch(xs, 8) FROM t GROUP BY src")
  * }}}
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash",
      exprs => PolyHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      exprs => SortedLongIntersectCount(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      exprs => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"shingle_hashes(text, n): n must be a literal, got $other")
        }
        ShingleHashes(exprs.head, n)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_sig(xs, k): k must be a literal, got $other")
        }
        MinHashSig(exprs.head, k)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("token_ngram_hashes",
      exprs => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"token_ngram_hashes(toks, n): n must be a literal, got $other")
        }
        TokenNgramHashes(exprs.head, n)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sketch",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_sketch(xs, k): k must be a literal, got $other")
        }
        MinHashSketchAgg(exprs.head, k).toAggregateExpression()
      }, "scala_udf")
  }
}
