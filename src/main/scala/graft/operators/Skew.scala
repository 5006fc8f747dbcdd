package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins for hot keys.
  *
  * AQE's skew-join split handles most sort-merge skew at runtime; salting
  * is the explicit fallback for pathological keys (a single key holding a
  * double-digit share of rows, e.g. one giant scene or one viral doc
  * bucket). The fat side gets a deterministic salt derived from row
  * content (never `rand()` — must survive retries/repartitioning); the
  * thin side is exploded across all salt values.
  */
object Skew {

  /** Inner equi-join on `key` with `nSalts`-way salting. Result equals the
    * unsalted join; the shuffle distributes each hot key over nSalts
    * partitions. `leftDiscriminator` must vary within a key (any
    * high-cardinality column) so rows spread across salts. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftDiscriminator: Column, nSalts: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(leftDiscriminator), lit(nSalts)))
    val r = right.withColumn("__salt", explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
