package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M4: the user-defined product-function registry, and C11: the filter
  * mini-DSL.
  *
  * Reference: convml_data/sources/user_functions.py:5-40 +
  * sources/__init__.py:349-376 (functions loaded by name, called with
  * `da_<input>` kwargs, attrs validated) and
  * pipeline/embeddings/aux_fields/data_filters.py:23-85
  * (`"prop__op=value,..."` with lt/gt/eq/lte/gte/isnan/percentile ops).
  *
  * Spark shape: user functions are *named Column expression builders* —
  * registered Scala functions over input columns, validated at
  * registration — so they stay inside Catalyst (codegen, pushdown) instead
  * of becoming opaque UDFs. The filter DSL parses at the driver into
  * Column predicates (query compilation, SURVEY §2.7 C10/C11).
  */
object UserFunctions {

  /** A registered product function: named inputs -> output column, with
    * declared metadata (the reference's units/long_name validation). */
  final case class ProductFunction(
      name: String,
      inputs: Seq[String],
      units: String,
      longName: String,
      build: Map[String, Column] => Column)

  final class Registry {
    private var fns = Map.empty[String, ProductFunction]

    def register(fn: ProductFunction): Unit = {
      require(fn.units.nonEmpty && fn.longName.nonEmpty,
        s"user function ${fn.name} must declare units and long_name " +
          "(sources/user_functions.py:24-34 validation)")
      require(fn.inputs.nonEmpty, s"user function ${fn.name} needs inputs")
      fns += fn.name -> fn
    }

    def apply(name: String, inputs: Map[String, Column]): Column = {
      val fn = fns.getOrElse(name, throw new IllegalArgumentException(
        s"unknown user function '$name'; registered: ${fns.keys.toSeq.sorted.mkString(", ")}"))
      val missing = fn.inputs.filterNot(inputs.contains)
      require(missing.isEmpty, s"user function '$name' missing inputs: ${missing.mkString(", ")}")
      fn.build(inputs)
    }

    def names: Seq[String] = fns.keys.toSeq.sorted
  }

  /** Default registry mirroring tests/example/user_functions.py. */
  def exampleRegistry(): Registry = {
    val r = new Registry
    // cloud_mask_ch13bt: brightness-temperature threshold -> bool mask
    r.register(ProductFunction("cloud_mask", Seq("bt_13"), "1", "cloud mask",
      ins => ins("bt_13") < 290.0))
    // ir_shallow_clouds: 3-channel normalize + invert composite (scalar form)
    r.register(ProductFunction("ir_shallow_clouds", Seq("bt_11", "bt_14", "bt_15"),
      "1", "IR shallow clouds composite",
      ins => (lit(1.0) - (ins("bt_11") - 270.0) / 30.0)
        + (lit(1.0) - (ins("bt_14") - 270.0) / 30.0)
        + (lit(1.0) - (ins("bt_15") - 270.0) / 30.0)))
    r
  }

  /** C11 filter DSL: parse `"prop__op=value,prop__op=value"` into a list
    * of predicates. Percentile ops return a (prop, p) spec the caller
    * resolves via RankStats (they need an aggregation pass first). */
  sealed trait ParsedFilter
  final case class SimplePredicate(prop: String, build: Column => Column) extends ParsedFilter
  final case class PercentileFilter(prop: String, p: Double, keepUpper: Boolean) extends ParsedFilter

  def parseFilterDsl(spec: String): Seq[ParsedFilter] =
    spec.split(",").toSeq.filter(_.nonEmpty).map { term =>
      val Array(lhs, value) = term.split("=", 2)
      val (prop, op) = lhs.split("__", 2) match {
        case Array(p, o) => (p, o)
        case _ => throw new IllegalArgumentException(s"bad filter term '$term'")
      }
      op match {
        case "lt" => SimplePredicate(prop, _ < value.toDouble)
        case "lte" => SimplePredicate(prop, _ <= value.toDouble)
        case "gt" => SimplePredicate(prop, _ > value.toDouble)
        case "gte" => SimplePredicate(prop, _ >= value.toDouble)
        case "eq" => SimplePredicate(prop, _ === value.toDouble)
        case "isnan" =>
          if (value.toBoolean) SimplePredicate(prop, c => isnan(c))
          else SimplePredicate(prop, c => !isnan(c))
        case "upper_percentile" => PercentileFilter(prop, value.toDouble / 100.0, keepUpper = true)
        case "lower_percentile" => PercentileFilter(prop, value.toDouble / 100.0, keepUpper = false)
        case other => throw new IllegalArgumentException(s"unknown filter op '$other'")
      }
    }

  /** Apply the simple (non-percentile) predicates of a DSL spec. */
  def applySimpleFilters(df: DataFrame, spec: String): DataFrame =
    parseFilterDsl(spec).foldLeft(df) {
      case (d, SimplePredicate(prop, build)) => d.where(build(col(prop)))
      case (d, _: PercentileFilter) => d
    }
}
