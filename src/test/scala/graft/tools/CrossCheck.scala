package graft.tools

import org.apache.spark.sql.SparkSession

/** Cross-algorithm consistency check (diagnostic, src/test):
  * `q_dedup_cluster` (pointer-jump label propagation) and
  * `q_graph_cc_star` (large-star/small-star) implement the same
  * component-min labeling contract with disjoint algorithms — at any
  * scale their outputs must be row-identical. Used for the round-5 sf1
  * scale-proof, where the DuckDB oracle's quadratic pair CTE is too
  * slow to replay but two independent distributed algorithms agreeing
  * exactly is equivalent evidence.
  *
  * Usage: CrossCheck [sfDir] */
object CrossCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val a = graft.ops.TextDedup.qDedupCluster(spark, sfDir)
    val b = graft.ops.TextDedup.qGraphCcStar(spark, sfDir)
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    val n = a.count()
    println(s"[crosscheck] rows=$n onlyInCluster=$onlyA onlyInCcStar=$onlyB " +
      (if (onlyA == 0 && onlyB == 0) "MATCH" else "MISMATCH"))
    spark.stop()
  }
}
