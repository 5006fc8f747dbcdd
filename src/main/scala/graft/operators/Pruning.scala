package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prototype-distance data pruning (Sorscher et al. 2022, "Beyond
  * neural scaling laws"): rank every embedding by its distance to its
  * cluster prototype and keep the HARDEST keepNum/keepDen fraction per
  * cluster — the published recipe for pruning abundant-data corpora
  * (easy, prototypical examples carry the least marginal signal when
  * data is plentiful). The dataset-curation sibling of SemDeDup
  * (`Similarity.semDedup`), sharing its cell machinery.
  *
  * The prototype index is EXPLICIT (the production shape: centroids come
  * from a `KMeansLloyd.fit` — q151 — persisted and passed in); cell
  * assignment is the q73/q96 per-row argmin with the (d2, cell)
  * tie-break, so everything is engine-exact.
  *
  * Scale shape (100 TB): assignment is a shuffle-free projection; the
  * per-cell hardness rank is TWO-PHASE (the q138 pattern) — rows are
  * range-bucketed on the micro-scaled distance, ranked within
  * (cell, bucket), and offset by cumulative bucket counts — so a
  * dominant cluster never funnels through one window task. The offset
  * and target tables are cells × buckets rows (broadcast). The bucket
  * key is a monotone function of the sort key and ties share a bucket,
  * so the two-phase rank equals the single-window rank by construction
  * (spec-pinned across nBuckets).
  */
object Pruning {

  /** Keep the hardest keepNum/keepDen of each cell (ceil rounding, so a
    * non-empty cell always keeps >= 1 row when keepNum > 0).
    * Output: (vec_id, cell, d_u, rnk, kept, n_keep) — rnk 1 = hardest. */
  def protoPrune(df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]], keepNum: Int = 7, keepDen: Int = 10,
      nBuckets: Int = 64): DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      s"keep fraction $keepNum/$keepDen out of range")
    val asg = df.select(col(idCol).as("vec_id"),
      Similarity.cellArgmin(col(vecCol), cents).as("best"))
      .select(col("vec_id"), col("best.cell").cast("long").as("cell"),
        round(col("best.d2") * 1e6).cast("long").as("d_u"))
    // per-cell keep target: ceil(n * keepNum / keepDen) in integer math
    val targets = asg.groupBy("cell").agg(count(lit(1)).as("n_docs"))
      .select(col("cell"),
        expr(s"(n_docs * $keepNum + ${keepDen - 1}) div $keepDen")
          .cast("long").as("n_keep"))
    // per-cell bucket width from the cell's max distance (cells-sized agg)
    val widths = asg.groupBy("cell").agg(max(col("d_u")).as("max_u"))
      .select(col("cell"), expr(s"max_u div $nBuckets + 1").as("w"))
    val bucketed = asg.join(broadcast(widths), "cell")
      .withColumn("bkt", expr("d_u div w"))
    val offsets = bucketed.groupBy("cell", "bkt").agg(count(lit(1)).as("bn"))
      // rank order is d_u DESC, so higher buckets precede lower ones
      .withColumn("off", coalesce(
        sum(col("bn")).over(Window.partitionBy("cell").orderBy(col("bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("cell", "bkt", "off")
    val wLocal = Window.partitionBy("cell", "bkt")
      .orderBy(col("d_u").desc, col("vec_id"))
    bucketed.withColumn("lrnk", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("cell", "bkt"))
      .join(broadcast(targets), "cell")
      .select(col("vec_id"), col("cell"), col("d_u"),
        (col("off") + col("lrnk")).cast("long").as("rnk"),
        when(col("off") + col("lrnk") <= col("n_keep"), 1L).otherwise(0L)
          .as("kept"),
        col("n_keep"))
  }
}
