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

  /** G4, the real physics: per-column lifting-condensation-level height
    * by Bolton (1980), matching era5/scalars.py:31-129 step for step:
    *
    *   1. drop levels with rh <= 0 (ln undefined);
    *   2. T_lcl = 1/((1/(T-55)) - ln(rh)/2840) + 55   [Bolton eq. 22]
    *   3. z_lcl = alt - cp_d * (T_lcl - T) / g        [dry-adiabatic lift]
    *   4. layer_method "first_delta_temp_minimum": interior local maxima
    *      of (T_lcl - T) over the level ordering (scipy find_peaks
    *      semantics: strictly greater than both neighbors; endpoints are
    *      never peaks), take the minimum peak altitude, keep levels with
    *      alt <= it. Columns with no interior peak yield no row (the
    *      reference's NaN column).
    *   5. layer sampling: half_minmax (reference default), mean, exact
    *      median, plus layer_std (population std, numpy default) and the
    *      layer level count.
    *
    * All window+agg Catalyst — one shuffle on the column key, no UDF.
    * Deviation: plateau peaks (exactly-equal neighbors) are excluded
    * where scipy keeps the plateau midpoint — measure-zero on physical
    * data. Cross-engine note: half_minmax/median derive from exact picks
    * (min/max/middle), so they oracle-hash after 6-dp rounding; mean and
    * std are FP-sum order-dependent and stay spec-only. */
  def boltonZlcl(df: DataFrame, keyCols: Seq[String], levelCol: String,
      tCol: String, rhCol: String, altCol: String,
      cpd: Double = 1004.0, g: Double = 9.80665): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(levelCol))
    val wAll = Window.partitionBy(keys: _*)
    df.where(col(rhCol) > 0.0)
      .withColumn("__tlcl",
        lit(1.0) / (lit(1.0) / (col(tCol) - 55.0) - log(col(rhCol)) / 2840.0) + 55.0)
      .withColumn("__delta", col("__tlcl") - col(tCol))
      .withColumn("__zlcl", col(altCol) - lit(cpd) * col("__delta") / lit(g))
      .withColumn("__peak_alt",
        when(col("__delta") > lag(col("__delta"), 1).over(w)
          && col("__delta") > lead(col("__delta"), 1).over(w), col(altCol)))
      .withColumn("__min_peak_alt", min(col("__peak_alt")).over(wAll))
      .where(col(altCol) <= col("__min_peak_alt"))
      .groupBy(keys: _*)
      .agg(
        (lit(0.5) * (min(col("__zlcl")) + max(col("__zlcl")))).as("z_lcl_half_minmax"),
        median(col("__zlcl")).as("z_lcl_median"),
        avg(col("__zlcl")).as("z_lcl_mean"),
        stddev_pop(col("__zlcl")).as("z_lcl_layer_std"),
        count(lit(1)).as("n_layer_levels"))
  }

  /** G5: per-column interpolation of value columns to a target pressure,
    * linear in ln(p) — the extraction that feeds LTS/EIS in the reference
    * (era5/scalars.py:15-28: θ/T/z at 700 and 1000 hPa through
    * eurec4a-environment's level interpolation).
    *
    * One window pass finds the unique bracketing level pair
    * (p_k <= P < p_{k+1}; profiles are monotone in p over the level
    * ordering), then v(P) = v_lo + (v_hi - v_lo)·(lnP - ln p_lo)/(ln p_hi
    * - ln p_lo). Catalyst-only (window lead + arithmetic): one shuffle on
    * the column key, codegen'd, no UDF. A column whose profile does not
    * bracket P yields no row (the reference's NaN column). */
  def interpolateToPressure(df: DataFrame, keyCols: Seq[String], levelCol: String,
      pCol: String, valueCols: Seq[String], targetP: Double, suffix: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(levelCol))
    val withLead = valueCols.foldLeft(df.withColumn("__p_hi", lead(col(pCol), 1).over(w))) {
      (acc, v) => acc.withColumn(s"__${v}_hi", lead(col(v), 1).over(w))
    }
    val frac = (log(lit(targetP)) - log(col(pCol))) / (log(col("__p_hi")) - log(col(pCol)))
    withLead
      .where(col(pCol) <= targetP && col("__p_hi") > targetP)
      .select(keyCols.map(col) ++ valueCols.map(v =>
        (col(v) + (col(s"__${v}_hi") - col(v)) * frac).as(s"$v$suffix")): _*)
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
