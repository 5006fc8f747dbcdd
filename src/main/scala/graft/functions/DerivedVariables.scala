package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C10: derived-variable registry with DAG resolution.
  *
  * Reference: convml_data/sources/__init__.py:136-157
  * (`_find_source_variables_set`: expand a target variable through the
  * DERIVED_VARIABLES registry to base inputs, max depth 10, shared inputs
  * dedup'd) and the per-source registries era5/base.py:127-151.
  *
  * This is query *compilation*: resolution happens at the driver and emits
  * a single composed Column expression tree, so Catalyst sees plain math
  * (CSE, codegen, pushdown all apply) — never a chain of materialized
  * intermediates.
  */
object DerivedVariables {

  final case class Derived(deps: Seq[String], build: Map[String, Column] => Column)

  final class Registry(derived: Map[String, Derived]) {

    /** Base variables a target ultimately needs. Expansion stops at any
      * var in `available` — a var the source already provides is used
      * directly even if a derived recipe exists (mirrors the reference's
      * "expand only what the source lacks", sources/__init__.py:136-157).
      */
    def sourceVariables(target: String, available: Set[String] = Set.empty,
        maxDepth: Int = 10): Set[String] = {
      def go(v: String, depth: Int): Set[String] = {
        require(depth <= maxDepth, s"derived-variable DAG deeper than $maxDepth at '$v'")
        if (available(v)) Set(v)
        else derived.get(v) match {
          case None => Set(v)
          case Some(dv) => dv.deps.toSet.flatMap((d: String) => go(d, depth + 1))
        }
      }
      go(target, 0)
    }

    /** Resolve a target to one Column expression over base-var columns.
      * Provided base columns take precedence over derived recipes (so a
      * source that materializes `p` directly is not forced through
      * `exp(lnsp)`) — including for the target itself, matching
      * [[sourceVariables]], which stops at the target when available. */
    def resolve(target: String, base: Map[String, Column], maxDepth: Int = 10): Column = {
      def go(v: String, depth: Int): Column = {
        require(depth <= maxDepth, s"derived-variable DAG deeper than $maxDepth at '$v'")
        base.get(v) match {
          case Some(c) => c
          case _ => derived.get(v) match {
            case None => base.getOrElse(v,
              throw new IllegalArgumentException(s"base variable '$v' not provided"))
            case Some(dv) => dv.build(dv.deps.map(d => d -> go(d, depth + 1)).toMap)
          }
        }
      }
      go(target, 0)
    }
  }

  /** ERA5-style physics registry (era5/base.py:28-66,119-124 formulas). */
  def era5Registry(): Registry = new Registry(Map(
    // umag = sqrt(u^2 + v^2)  (era5/base.py:28-33)
    "umag" -> Derived(Seq("u", "v"), m => sqrt(m("u") * m("u") + m("v") * m("v"))),
    // p = exp(lnsp)  (era5/base.py:40)
    "p" -> Derived(Seq("lnsp"), m => exp(m("lnsp"))),
    // height z/g  (era5/utils.py:112)
    "height" -> Derived(Seq("z"), m => m("z") / 9.80665),
    // wind speed ratio: depends on a derived var (2-level DAG)
    "umag_norm" -> Derived(Seq("umag", "umag_ref"), m => m("umag") / m("umag_ref")),
    // potential temperature θ = T (p0/p)^(R/cp)  (era5/base.py:63-66 via metpy)
    "theta" -> Derived(Seq("t", "p"), m =>
      m("t") * pow(lit(100000.0) / m("p"), 0.2857142857142857)),
    // G5: lower-tropospheric stability LTS = θ700 - θ1000
    // (era5/scalars.py:15-28 via eurec4a-environment)
    "lts" -> Derived(Seq("theta700", "theta1000"), m => m("theta700") - m("theta1000")),
    // G5: estimated inversion strength (Wood & Bretherton 2006 eq. 4):
    // EIS = LTS - Γ850 * (z700 - lcl). z700/lcl come from the profile
    // extraction (Profiles.interpolateToPressure / boltonZlcl); Γ850 is
    // derived below unless the source provides it directly.
    "eis" -> Derived(Seq("lts", "gamma850", "z700", "lcl"), m =>
      m("lts") - m("gamma850") * (m("z700") - m("lcl"))),
    // G5: Γ850 — moist-adiabatic lapse rate at 850 hPa (Wood & Bretherton
    // 2006 eq. 5), evaluated at the 1000/700 hPa mean temperature with
    // Bolton (1980) saturation vapour pressure. Constants: g=9.80665,
    // cp_d=1004, Lv=2.5e6, R_d=287.04, R_v=461.5, eps=0.622.
    "t850" -> Derived(Seq("t700", "t1000"), m => lit(0.5) * (m("t700") + m("t1000"))),
    "es850" -> Derived(Seq("t850"), m =>
      lit(611.2) * exp(lit(17.67) * (m("t850") - 273.15) / (m("t850") - 29.65))),
    "qs850" -> Derived(Seq("es850"), m =>
      lit(0.622) * m("es850") / (lit(85000.0) - lit(0.378) * m("es850"))),
    "gamma850" -> Derived(Seq("qs850", "t850"), m =>
      lit(9.80665 / 1004.0) * (lit(1.0) -
        (lit(1.0) + lit(2500000.0) * m("qs850") / (lit(287.04) * m("t850"))) /
        (lit(1.0) + lit(2500000.0) * lit(2500000.0) * m("qs850")
          / (lit(1004.0) * lit(461.5) * m("t850") * m("t850"))))),
    // C6: cloud radiative effect = clear-sky minus all-sky flux
    // (ceres_syn1deg_modis/extract.py:71-89)
    "sw_cre" -> Derived(Seq("sw_clear", "sw_all"), m => m("sw_clear") - m("sw_all")),
    "lw_cre" -> Derived(Seq("lw_clear", "lw_all"), m => m("lw_clear") - m("lw_all")),
    "net_cre" -> Derived(Seq("sw_cre", "lw_cre"), m => m("sw_cre") + m("lw_cre")),
    // C6: reflected SW from albedo x insolation (ceres_geo/sw_flux.py:62-80)
    "sw_up" -> Derived(Seq("albedo", "sw_down"), m => m("albedo") * m("sw_down")),
    "toa_net" -> Derived(Seq("sw_down", "sw_up", "olr"), m =>
      m("sw_down") - m("sw_up") - m("olr"))))
}
