package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-column vertical-profile operators (SURVEY §2.4 G2-G5, §2.5 W3/W4).
  *
  * Reference: convml_data/sources/era5/base.py:77-124 (layer means over
  * model-level slices, TPW vertical integral Σ q·dp / g),
  * sources/era5/scalars.py:31-129 (per-column LCL peak finding),
  * sources/era5/utils.py:31-154 (hydrostatic bottom-up recurrence over
  * 137 levels with an a/b coefficient table).
  *
  * Spark shapes:
  *  - layer mean / vertical integral: plain filter + window-lag + hash agg
  *    (fully codegen'd, one shuffle on the column key);
  *  - genuine recurrences (hydrostatic integration, peak finding): sorted
  *    per-group array scan via `groupByKey.mapGroups` on the typed API —
  *    the columns are short (O(levels)), groups are many, parallelism
  *    comes from the column key; coefficient tables ride along as
  *    broadcast-sized Scala arrays.
  */
object Profiles {

  /** G2: mean of `v` over an inclusive level slice, per column key. */
  def layerMean(df: DataFrame, keyCols: Seq[String], levelCol: String,
      vCol: String, levelLo: Int, levelHi: Int): DataFrame =
    df.where(col(levelCol).between(levelLo, levelHi))
      .groupBy(keyCols.map(col): _*)
      .agg(avg(col(vCol)).as(s"${vCol}_layer_mean"), count(lit(1)).as("n_levels"))

  /** G3/W3: vertical integral Σ v·Δlevel with a lead-difference dp,
    * per column key (era5/base.py:119-124, scaled by 1/g by the caller). */
  def verticalIntegral(df: DataFrame, keyCols: Seq[String], levelCol: String,
      vCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(levelCol))
    df.withColumn("__dp", lead(col(levelCol), 1).over(w) - col(levelCol))
      .where(col("__dp").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(vCol) * col("__dp")).as(s"${vCol}_integral"))
  }

  final case class LevelRow(key: String, level: Int, v: Double)
  final case class ColumnScalar(key: String, value: Double, peak_level: Int, n_levels: Int)

  /** G4-analog: per-column peak finding on the sorted profile — returns
    * the level maximizing the discrete curvature (2v_i - v_{i-1} - v_{i+1})
    * and the column mean above that peak, via a typed mapGroups scan. */
  def columnPeakReduce(ds: Dataset[LevelRow]): Dataset[ColumnScalar] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key).mapGroups { (k, rows) =>
      val sorted = rows.toArray.sortBy(_.level)
      val n = sorted.length
      if (n < 3) ColumnScalar(k, if (n == 0) Double.NaN else sorted.map(_.v).sum / n, -1, n)
      else {
        var best = 1; var bestCurv = Double.NegativeInfinity
        var i = 1
        while (i < n - 1) {
          val curv = 2 * sorted(i).v - sorted(i - 1).v - sorted(i + 1).v
          if (curv > bestCurv) { bestCurv = curv; best = i }
          i += 1
        }
        val above = sorted.take(best + 1).map(_.v)
        ColumnScalar(k, above.sum / above.length, sorted(best).level, n)
      }
    }
  }

  /** W4-analog: bottom-up hydrostatic-style recurrence per column:
    * z_{k} = z_{k+1} + coef(level_k) * v_k  (levels descend top-down, the
    * scan runs bottom-up like era5/utils.py:31-154). Returns one row per
    * (key, level) with the accumulated value — a recurrence a window sum
    * cannot express when coef depends on the running state; here kept
    * affine for testability but structured as the general scan. */
  def bottomUpRecurrence(ds: Dataset[LevelRow], coef: Int => Double): Dataset[(String, Int, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key).flatMapGroups { (k, rows) =>
      val sorted = rows.toArray.sortBy(-_.level) // bottom (max level) first
      var acc = 0.0
      sorted.iterator.map { r =>
        acc = acc + coef(r.level) * r.v
        (k, r.level, acc)
      }
    }
  }
}
