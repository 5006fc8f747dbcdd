package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The dataset-configuration model — the reference's `meta.yaml` semantics
  * as typed config (convml_data/__init__.py:60-207; example
  * tests/example/meta.yaml, schema documented in FIXTURES.md §1).
  *
  * Parsed from JSON (the reference itself offers `db_type: json` "for
  * speed"; a YAML front-end is a trivial pre-step outside this library).
  * The config is pure driver-side data: it parameterizes query plans
  * (time filters become predicates, the domain becomes projection
  * constants, sampling becomes Triplets/Tiler arguments) — it never ships
  * to executors.
  */
final case class TimeConfig(
    t_start: Option[String],
    t_end: Option[String],
    N_days: Option[Int],
    intervals: List[(String, String)],
    filters: Map[String, String])

final case class SamplingConfig(
    resolution: Double,
    tile_N: Int,
    N_triplets: Map[String, Int],
    neigh_dist_scaling: Double)

final case class AuxProductConfig(
    source: String,
    product: String,
    scene_mapping_strategy: String, // single_scene_per_aux_time | all_scenes_within_dt_aux
    dt_aux_seconds: Option[Long])

final case class DataSourceConfig(
    source: String,
    product: String,
    time: TimeConfig,
    domain: Domain,
    sampling: SamplingConfig,
    aux_products: Map[String, AuxProductConfig]) {

  /** Tile size in meters (tile_N pixels at `resolution` m/px,
    * convml_data/__init__.py:121-123). */
  def tileSizeM: Double = sampling.tile_N * sampling.resolution
}

object DataSourceConfig {
  private implicit val formats: Formats = DefaultFormats

  val ValidStrategies = Set("single_scene_per_aux_time", "all_scenes_within_dt_aux")

  def fromJson(json: String): DataSourceConfig = {
    val j = JsonMethods.parse(json)
    val time = TimeConfig(
      (j \ "time" \ "t_start").extractOpt[String],
      (j \ "time" \ "t_end").extractOpt[String],
      (j \ "time" \ "N_days").extractOpt[Int],
      (j \ "time" \ "intervals") match {
        case JArray(xs) => xs.map(x =>
          ((x \ "t_start").extract[String], (x \ "t_end").extract[String]))
        case _ => Nil
      },
      (j \ "time" \ "filters") match {
        case JObject(fs) => fs.map { case (k, v) => k -> v.values.toString }.toMap
        case _ => Map.empty
      })
    require(time.t_start.isDefined || time.intervals.nonEmpty,
      "time config needs t_start or intervals (convml_data/__init__.py:149-166)")
    val domain = Domain(
      (j \ "domain" \ "central_latitude").extract[Double],
      (j \ "domain" \ "central_longitude").extract[Double],
      (j \ "domain" \ "l_zonal").extract[Double],
      (j \ "domain" \ "l_meridional").extract[Double])
    val sampling = SamplingConfig(
      (j \ "sampling" \ "resolution").extract[Double],
      (j \ "sampling" \ "tile_N").extractOpt[Int].getOrElse(256),
      (j \ "sampling" \ "N_triplets") match {
        case JInt(n) => Map("train" -> n.toInt) // int shorthand (FIXTURES §1)
        case JObject(fs) => fs.map { case (k, v) => k -> v.extract[Int] }.toMap
        case _ => Map.empty
      },
      (j \ "sampling" \ "neigh_dist_scaling").extractOpt[Double].getOrElse(0.1))
    val aux = (j \ "aux_products") match {
      case JObject(fs) => fs.map { case (name, v) =>
        val strategy = (v \ "scene_mapping_strategy").extractOpt[String]
          .getOrElse("single_scene_per_aux_time")
        require(ValidStrategies(strategy), s"unknown scene_mapping_strategy '$strategy'")
        name -> AuxProductConfig(
          (v \ "source").extract[String],
          (v \ "product").extract[String],
          strategy,
          (v \ "dt_aux_seconds").extractOpt[Long])
      }.toMap
      case _ => Map.empty[String, AuxProductConfig]
    }
    DataSourceConfig(
      (j \ "source").extract[String],
      (j \ "product").extract[String],
      time, domain, sampling, aux)
  }

  /** Compile the config's time section into a Column predicate
    * (F1 intervals ∨-joined; F2 datetime-attribute filters ∧-joined;
    * F3 zenith filter) — config -> plan, the C10-style compilation. */
  def timePredicate(cfg: DataSourceConfig, ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val intervals =
      (cfg.time.t_start, cfg.time.t_end) match {
        case (Some(a), Some(b)) => List((a, b))
        case _ => Nil
      }
    val ivs = intervals ++ cfg.time.intervals
    val f1 = ivs.map { case (a, b) => ts >= lit(a).cast("timestamp") && ts < lit(b).cast("timestamp") }
      .reduceOption(_ || _).getOrElse(lit(true))
    cfg.time.filters.foldLeft(f1) {
      case (acc, ("minutes", v)) =>
        acc && minute(ts).isin(v.split("\\|").map(_.trim.toInt).toSeq: _*)
      case (acc, ("hours", v)) =>
        acc && hour(ts).isin(v.split("\\|").map(_.trim.toInt).toSeq: _*)
      case (acc, ("N_hours_from_zenith", v)) =>
        acc && graft.functions.Solar.withinHoursOfZenith(ts, lit(cfg.domain.centralLon), v.toDouble)
      case (_, (k, _)) => throw new IllegalArgumentException(s"unknown time filter '$k'")
    }
  }
}
