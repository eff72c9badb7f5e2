package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SemDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- args) {
      val exact = graft.ops.Vectors.qDedupEmbed(spark, sf)
      val victims = exact.select(col("b_id").as("vec_id")).distinct()
      val drops = graft.ops.Vectors.aDedupSemantic(spark, sf)
      val nV = victims.count(); val nD = drops.count()
      val prec = drops.select(col("kept_for").as("a_id"), col("vec_id").as("b_id"))
        .except(exact.select("a_id","b_id")).count()
      val rec = victims.intersect(drops.select("vec_id")).count().toDouble / math.max(nV,1)
      println(s"[semdiag] $sf victims=$nV drops=$nD notExactPairs=$prec recall=$rec")
    }
  }
}
