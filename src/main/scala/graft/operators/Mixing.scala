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
}
