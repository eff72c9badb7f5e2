package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc diagnostics main (test tree — never ships). */
object Diag {
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
    h.select(col("doc_id"),
        explode(array(
          struct(lit(0).as("b"), (col("hash_lo") % 65536L).as("v")),
          struct(lit(1).as("b"), expr("(hash_lo div 65536) % 65536").as("v")),
          struct(lit(2).as("b"), (col("hash_hi") % 65536L).as("v")),
          struct(lit(3).as("b"), expr("(hash_hi div 65536) % 65536").as("v"))))
          .as("band"))
      .select(col("band.b").as("b"), col("band.v").as("v"))
      .groupBy("b", "v").count()
      .orderBy(desc("count")).limit(12).show()
    spark.stop()
  }
}
