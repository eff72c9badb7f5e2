package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StatsDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.checkpoint.compress", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/tmp/graft_sf1")
    import graft.ops.Util
    val d = graft.Tables.documents(spark, sf)
      .withColumn("tk", split(col("text"), " "))
      .where(size(col("tk")) >= 8)
    val grams0 = d
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "w")))
      .select(col("doc_id"), md5(concat_ws(" ", col("w"))).as("gram"))
      .distinct()
    val ck = Util.serCheckpoint(grams0, 32L * graft.Tables.rowCount(spark, sf, "documents"))
    println("[stats] analyzed: " + ck.queryExecution.analyzed.getClass.getSimpleName)
    println("[stats] sizeInBytes = " + ck.queryExecution.analyzed.stats.sizeInBytes)
    println("[stats] optimized sizeInBytes = " + ck.queryExecution.optimizedPlan.stats.sizeInBytes)
    spark.stop()
  }
}
