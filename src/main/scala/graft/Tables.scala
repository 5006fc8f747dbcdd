package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All queries take the sf directory as a parameter so the same code runs
  * at sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench) — and, on a real
  * cluster, against partitioned 100 TB tables (the reads are plain parquet
  * scans, so Catalyst pushes filters/pruning into the scan).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects; read nanos as long and truncate to micros below —
    // the same truncation DuckDB applies, so oracle parity is preserved.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    // Normalize ts to TimestampType regardless of how the parquet writer
    // encoded it, so downstream event-time code (unix_micros, watermarks,
    // Row.getTimestamp) sees one type:
    //  - TIMESTAMP(NANOS) + nanosAsLong → LongType nanos → truncate to micros
    //    (the same truncation DuckDB applies, so oracle parity holds)
    //  - plain timestamp[us] (DuckDB/pandas-written) → TIMESTAMP_NTZ → cast;
    //    the session TZ is pinned UTC everywhere, so the instant is preserved
    //  - TIMESTAMP (already instant-typed) → pass through
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
