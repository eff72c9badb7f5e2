package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table load recipes (SURVEY.md §1.2).
  *
  * The only non-trivial load is `events`: its `ts` column is parquet
  * TIMESTAMP(NANOS), which Spark 4.x refuses outright
  * ([PARQUET_TYPE_ILLEGAL]). We read it as a raw long
  * (`spark.sql.legacy.parquet.nanosAsLong=true`) and truncate ns→µs with
  * INTEGER division — `ts div 1000` — matching DuckDB's internal µs
  * truncation exactly. (A double-based `col/1000` would lose precision:
  * 2024 epochs are ~1.7e18 ns, beyond double's 2^53 integer range, and
  * round-trips off by ±1µs for a noticeable fraction of rows.)
  */
object Tables {
  /** Runtime confs every session needs before the first `events` read. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Driver fixture sets store ts as TIMESTAMP(NANOS) → read as raw
    // ns longs (nanosAsLong) and µs-truncate; the locally generated
    // sf1 set already stores TIMESTAMP(µs) (Spark can't write nanos),
    // which reads as a timestamp directly — same values either way.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Session-scoped fixture row counts — the stand-in for catalog
    * statistics (a real deployment reads these from the metastore, not
    * by re-scanning). Used by the size-gated broadcast sites to derive
    * their estRows: a parquet count() is metadata-cheap but still a
    * job, and every gated operator re-paying it per invocation is pure
    * overhead. Keyed by (session, sfDir, table) so a fresh session
    * never reuses a stopped session's state. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), Long]
  def rowCount(s: SparkSession, sf: String, name: String): Long =
    countCache.computeIfAbsent((s, sf, name), _ => table(s, sf, name).count())

  def lineitem(s: SparkSession, sf: String): DataFrame = table(s, sf, "lineitem")
  def orders(s: SparkSession, sf: String): DataFrame   = table(s, sf, "orders")
  def customer(s: SparkSession, sf: String): DataFrame = table(s, sf, "customer")
  def supplier(s: SparkSession, sf: String): DataFrame = table(s, sf, "supplier")
  def part(s: SparkSession, sf: String): DataFrame     = table(s, sf, "part")
  def nation(s: SparkSession, sf: String): DataFrame   = table(s, sf, "nation")
  def region(s: SparkSession, sf: String): DataFrame   = table(s, sf, "region")
  def events(s: SparkSession, sf: String): DataFrame   = table(s, sf, "events")
  def documents(s: SparkSession, sf: String): DataFrame  = table(s, sf, "documents")
  def embeddings(s: SparkSession, sf: String): DataFrame = table(s, sf, "embeddings")
}
