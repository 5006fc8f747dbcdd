package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout clustering over `lineitem`: per-z-bucket key-range
  * statistics — exactly the file-level min/max stats a clustered write
  * would give the scan pruner on both dimensions. */
object LayoutQueries {

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sqlBacked(
      "q118_zorder_stats",
      s"""SELECT z_bucket, CAST(count(*) AS BIGINT) AS n,
         |  min(a) AS a_min, max(a) AS a_max,
         |  min(b) AS b_min, max(b) AS b_max
         |FROM (
         |  SELECT ${Layout.zValueSql("a", "b", 12)} >> 16 AS z_bucket, a, b
         |  FROM (
         |    SELECT l_partkey % 4096 AS a, l_orderkey % 4096 AS b
         |    FROM lineitem))
         |GROUP BY z_bucket""".stripMargin) { (s, d) =>
      val src = Tables.lineitem(s, d)
        .select((col("l_partkey") % 4096).as("a"),
          (col("l_orderkey") % 4096).as("b"))
      src
        .withColumn("z_bucket",
          shiftright(Layout.zValue(col("a"), col("b"), 12), 16))
        .groupBy("z_bucket")
        .agg(count(lit(1)).as("n"),
          min("a").as("a_min"), max("a").as("a_max"),
          min("b").as("b_min"), max("b").as("b_max"))
    },

    // ---- Hilbert-curve layout stats -------------------------------------
    // The q118 shape with the Hilbert index as the clustering key: the
    // oracle replays the iterative quadrant-rotation loop as a generated
    // CTE chain (one projection per bit — inlining would grow the SQL
    // ~4x per bit), buckets the index and reports per-bucket key-range
    // stats. HilbertLayoutSpec separately proves the curve's adjacency
    // property (consecutive indexes are grid neighbors) — the locality
    // the clustered write buys over Morton.
    QueryDef.sqlBacked(
      "q142_hilbert_stats",
      s"""WITH src AS (
         |  SELECT l_partkey % 256 AS a, l_orderkey % 256 AS b FROM lineitem),
         |${Layout.hilbertCtesSql("src", 8)}
         |SELECT CAST(d >> 6 AS BIGINT) AS h_bucket, CAST(count(*) AS BIGINT) AS n,
         |  min(a) AS a_min, max(a) AS a_max,
         |  min(b) AS b_min, max(b) AS b_max
         |FROM h8
         |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 256).as("a"),
          (col("l_orderkey") % 256).as("b"))
        .withColumn("h_bucket",
          shiftright(Layout.hilbertValue(col("a"), col("b"), 8), 6))
        .groupBy("h_bucket")
        .agg(count(lit(1)).as("n"),
          min("a").as("a_min"), max("a").as("a_max"),
          min("b").as("b_min"), max("b").as("b_max"))
    })
}
