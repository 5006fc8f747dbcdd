package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: deterministic stratified subsampling to per-stratum
  * target keep rates — the source-reweighting step (CCNet quality
  * buckets, SlimPajama/Pile source proportions, DoReMi domain weights)
  * an LLM training-data pipeline runs between filtering and
  * tokenization.
  *
  * The keep decision is key-derived — u = [[Triplets.hashUnit]] of
  * (seed, id) compared against the stratum's rate — so it is
  * independent of partitioning, shuffle order and retries, and any
  * engine can replay it token-for-token (the q97 oracle does). Two
  * properties matter operationally at 100 TB:
  *
  *  - MONOTONE: raising one stratum's rate keeps a strict superset of
  *    the previous sample (u per document never changes), so mixture
  *    iteration re-selects documents stably instead of redrawing the
  *    whole corpus;
  *  - STATELESS: the decision is a projection — no shuffle, no join,
  *    no persisted sampling state; the rate lookup is a when-chain
  *    over the config-sized rates list.
  */
object Mixing {

  /** Per-row keep decisions: adds `keep_rate` (the stratum's target)
    * and `kept` (1 iff the key-derived uniform falls under it).
    * `rates` is ordered (first match wins) so the compiled when-chain
    * is deterministic; strata not listed fall back to `defaultRate`. */
  def sampleDecisions(df: DataFrame, idCol: String, stratumCol: String,
      rates: Seq[(String, Double)], defaultRate: Double,
      seed: Long): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((k, r), acc) => when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.withColumn("keep_rate", rate)
      .withColumn("kept",
        (Triplets.hashUnit(seed, col(idCol)) < col("keep_rate")).cast("long"))
  }

  /** The mixed corpus itself: rows whose decision is keep. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Seq[(String, Double)], defaultRate: Double, seed: Long): DataFrame =
    sampleDecisions(df, idCol, stratumCol, rates, defaultRate, seed)
      .where(col("kept") === 1L).drop("keep_rate", "kept")

  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Spirakis (2006) priority scheme: each row draws the
    * key-derived uniform u and competes with priority u^(1/w); the k
    * highest priorities per stratum are exactly a weight-proportional
    * without-replacement sample. One pass, no sampling state, and the
    * per-stratum top-k is the same rank machinery any groupBy-window
    * pays — at 100 TB this is THE way to draw a weighted subsample
    * without a driver-side reservoir.
    *
    * Determinism: u is [[Triplets.hashUnit]] (engine-exact integer
    * arithmetic); the ranking priority is rounded to 12 dp so the
    * cross-engine order is defined by identical decimals (pow is libm —
    * 1-ulp disagreement near rank boundaries would otherwise flip an
    * order the hash-compare can see), with the id as the tiebreak
    * within equal rounded priorities.
    *
    * Weights must be strictly positive; non-positive weights reject at
    * runtime (a silent 0-weight row would otherwise win every sample
    * with u^(1/0) = u^inf semantics differing across engines). */
  def weightedSample(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = col(weightCol).cast("double")
    // the positivity check lives INSIDE the ranking expression so column
    // pruning can never eliminate it
    val pr = when(w > 0.0,
      round(pow(Triplets.hashUnit(seed, col(idCol)), lit(1.0) / w), 12))
      .otherwise(raise_error(concat(
        lit(s"weightedSample: non-positive weight for $idCol="),
        col(idCol).cast("string"))))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col("priority_r12").desc, col(idCol))
    df.withColumn("priority_r12", pr)
      .withColumn("rk", row_number().over(rank).cast("long"))
      .where(col("rk") <= k)
  }
}
