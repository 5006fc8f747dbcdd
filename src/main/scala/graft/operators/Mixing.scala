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

  /** Temperature-based language/stratum rebalancing — the multilingual
    * corpus-sampling recipe of mBERT/XLM-R/mT5 (Conneau & Lample 2019
    * §3.1; Xue et al. 2021 §3.2): draw from stratum `l` with probability
    * q_l ∝ n_l^alpha so low-resource strata are up-weighted relative to
    * their natural share. alpha is FIXED at 0.5 (= sqrt) here because
    * sqrt is a correctly-rounded IEEE-754 operation every engine computes
    * bit-identically, while pow(x, 0.3) is libm territory — a 1-ulp
    * disagreement at a floor() boundary would flip a target count between
    * engines. The mixing ratio is rounded to 6 dp before the target
    * multiply for the same reason (the Σ sqrt(n_l) reduction is
    * order-dependent in its last ulp).
    *
    * Selection is EXACT per stratum: the n_target docs with the smallest
    * key-derived hash win (deterministic, partitioning/retry independent —
    * same contract as [[sampleDecisions]]). The rank is computed TWO-PHASE:
    * rows are range-bucketed on the hash, ranked within (stratum, bucket),
    * and offset by the cumulative counts of lower buckets — so no stratum
    * ever funnels through a single rank partition. At 100 TB with English
    * at >40% of the corpus, a naive `Window.partitionBy(lang)` row_number
    * puts 40 TB through one task; the bucketed rank keeps every window
    * partition at ~1/nBuckets of the stratum and the offset table is
    * strata × nBuckets rows (broadcast).
    *
    * Output: one row per input doc — (doc_id, lang, rnk, selected 0/1,
    * n_target) — so downstream mixing can either filter `selected = 1`
    * or inspect the rank margins. */
  /** Deterministic per-epoch global shuffle + shard assignment — the
    * pretraining dataloader's "reshuffle every epoch" step, made
    * partitioning/retry-independent: each (epoch, doc) draws the
    * key-derived uniform u = hashUnit(seed, epoch, id), shard =
    * floor(u·nShards), and the within-shard position ranks by (u, id).
    * No RNG state anywhere — re-running any task reproduces its rows,
    * and epoch e+1 is a fresh permutation because the epoch rides
    * INSIDE the hash.
    *
    * Scale shape: one explode (nEpochs×) + per-(epoch, shard) windows —
    * shards are the dataloader workers, so the rank partitions match
    * the physical consumers (~corpus/nShards rows each; raise nShards
    * with the worker count, never a global sort).
    *
    * Output: (epoch, doc_id, shard, pos), pos 1-based within shard. */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
      nEpochs: Int, seed: Long = 77L): DataFrame = {
    require(nShards >= 1 && nEpochs >= 1, s"bad nShards=$nShards nEpochs=$nEpochs")
    val base = df.select(col(idCol).as("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(nEpochs - 1L))))
    val withU = base.withColumn("u",
      Triplets.hashUnit(seed, col("epoch"), col("doc_id")))
      .withColumn("shard", floor(col("u") * nShards).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy(col("u"), col("doc_id"))
    withU.select(col("epoch"), col("doc_id"), col("shard"),
      row_number().over(w).cast("long").as("pos"))
  }

  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      sampleFrac: Double, nBuckets: Int = 64): DataFrame = {
    require(sampleFrac > 0.0 && sampleFrac <= 1.0, s"sampleFrac in (0,1], got $sampleFrac")
    val W = org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("doc_id"), col(stratumCol).as("lang"))
    val counts = base.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).cast("long").as("n_total"),
      sum(sqrt(col("n_docs").cast("double"))).as("w_tot"))
    // n_target_l = floor(S * round(sqrt(n_l)/Σsqrt, 6) + 0.5), S = floor(N·frac)
    val targets = counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        floor(floor(col("n_total").cast("double") * lit(sampleFrac))
          * round(sqrt(col("n_docs").cast("double")) / col("w_tot"), 6)
          + lit(0.5)).cast("long").as("n_target"))
    // two-phase rank on h = (id · Knuth) mod p: range-bucket, local rank,
    // cumulative bucket offsets (strata × nBuckets rows — broadcast back)
    val hashMod = 1000003L
    val bucketWidth = hashMod / nBuckets + 1
    val hashed = base
      // reduce BEFORE the Knuth multiply: (id mod m)·K stays < 2.7e15, so
      // the hash never overflows int64 for any doc_id (doc_id·K wraps
      // negative past ~3.47e9 in non-ANSI Spark while DuckDB raises —
      // a silent engine divergence at 100 TB id ranges); mathematically
      // identical to (id·K) mod m for all in-range ids.
      .withColumn("h", (pmod(col("doc_id"), lit(hashMod)) * lit(2654435761L)) % lit(hashMod))
      .withColumn("bkt", (col("h") / lit(bucketWidth)).cast("long"))
    val offsets = hashed.groupBy("lang", "bkt").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(
        sum(col("bn")).over(W.partitionBy("lang").orderBy("bkt")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("lang", "bkt", "off")
    val wLocal = W.partitionBy("lang", "bkt").orderBy(col("h"), col("doc_id"))
    hashed.withColumn("lrnk", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("lang", "bkt"))
      .join(broadcast(targets.select("lang", "n_target")), "lang")
      .select(col("doc_id"), col("lang"),
        (col("off") + col("lrnk")).cast("long").as("rnk"),
        when(col("off") + col("lrnk") <= col("n_target"), 1L).otherwise(0L)
          .as("selected"),
        col("n_target"))
  }
}
