package graft.tools
import org.apache.spark.sql.SparkSession
object TriDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.checkpoint.compress", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    args.foreach { sf =>
      val pairs = graft.ops.TextDedup.nearDupPairs(spark, sf).select(col("a_id"), col("b_id"))
      val deg = pairs.select(col("a_id").as("v")).unionAll(pairs.select(col("b_id").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val r = deg.agg(sum(expr("d * d")), sum(col("d")) / 2).head
      println(s"[wedge] $sf sumDeg2=${r.getLong(0)} pairs=${r.getDouble(1).toLong}")
    }
    spark.stop()
  }
}
