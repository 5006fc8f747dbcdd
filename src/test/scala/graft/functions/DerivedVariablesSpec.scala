package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DerivedVariablesSpec extends SparkSpec {
  import spark.implicits._

  private val reg = DerivedVariables.era5Registry()

  test("DAG resolution expands through multi-level derived variables") {
    // net_cre -> sw_cre + lw_cre -> 4 base fluxes
    assert(reg.sourceVariables("net_cre") ==
      Set("sw_clear", "sw_all", "lw_clear", "lw_all"))
    // umag_norm goes through the derived umag on one branch
    assert(reg.sourceVariables("umag_norm") == Set("u", "v", "umag_ref"))
    // base vars resolve to themselves
    assert(reg.sourceVariables("t") == Set("t"))
  }

  test("resolved expressions compute the physics") {
    val df = Seq((3.0, 4.0, 300.0, 85000.0, 0.3, 1000.0, 240.0))
      .toDF("u", "v", "t", "p", "albedo", "sw_down", "olr")
    val out = df.select(
      reg.resolve("umag", Map("u" -> col("u"), "v" -> col("v"))).as("umag"),
      reg.resolve("theta", Map("t" -> col("t"), "p" -> col("p"))).as("theta"),
      reg.resolve("toa_net", Map("albedo" -> col("albedo"), "sw_down" -> col("sw_down"),
        "olr" -> col("olr"))).as("toa_net"))
      .as[(Double, Double, Double)].head()
    assert(out._1 == 5.0)
    assert(math.abs(out._2 - 300.0 * math.pow(100000.0 / 85000.0, 0.2857142857142857)) < 1e-9)
    assert(out._3 == 1000.0 - 0.3 * 1000.0 - 240.0)
  }

  test("missing base variable and cycle depth are rejected") {
    intercept[IllegalArgumentException](
      Seq(1).toDF("x").select(reg.resolve("umag", Map("u" -> col("x")))))
  }
}
