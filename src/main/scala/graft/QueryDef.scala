package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator-query: a Spark implementation over the testdata
  * tables plus (where SQL-expressible) an equivalent DuckDB oracle.
  *
  * Invariants the driver's hash-compare imposes (see builder contract):
  *  - column names identical between the Spark result and the oracle;
  *  - every value bit-stable across engines. Floating-point discipline:
  *    sums/averages of fractional doubles are emitted as exact scaled
  *    integers (`round(x*100)` per-row -> BIGINT sums), percentiles use
  *    the nearest-rank (exact element) definition, and any double that
  *    *is* emitted comes either straight from parquet or from an
  *    expression written token-identically in both dialects.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlBacked(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** No DuckDB-expressible oracle — driver records a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
