package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Diag2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = graft.ops.Multimodal.qMultimodalPhash(spark, sf)
      .select(col("doc_id"), col("hash_lo"), col("hash_hi"))
    println("== identical full-hash multiplicities (top) ==")
    h.groupBy("hash_lo", "hash_hi").count().orderBy(desc("count")).limit(8).show()
    println("== docs total / distinct hashes ==")
    h.agg(count(lit(1)), countDistinct(col("hash_lo"), col("hash_hi"))).show()
    spark.stop()
  }
}
