package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.sources.TelemetryStore

/** DSv2 write-path protocol proofs (round 8): the store table's
  * SupportsWrite/BatchWrite is exercised directly — truncate-overwrite
  * vs append commit kinds, atomic publish, round-trip content — and
  * the executed plans are pinned to the V2 write nodes
  * (OverwriteByExpressionExec / AppendDataExec), i.e. the writes go
  * through the V2 protocol, not a V1 fallback. */
class DsvWriteSpec extends SparkSpec {

  private val fmt = "graft.sources.TelemetrySource"
  private val ddl = "okey BIGINT, status STRING, price DOUBLE"

  private def writeRows(key: String, mode: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("okey", "status", "price")
      .repartition(3) // >1 partition: the commit assembles MULTIPLE task messages
      .write.format(fmt).option("store", key).option("ddl", ddl)
      .mode(mode).save()
  }

  private def readBack(key: String): Set[(Long, String, Double)] =
    spark.read.format(fmt).option("store", key).option("ddl", ddl).load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("V2 write: overwrite truncates, append accumulates, content round-trips") {
    val key = s"spec_store_${System.nanoTime()}"
    writeRows(key, "overwrite", Seq((1L, "A", 1.5), (2L, "B", 2.5)))
    assert(TelemetryStore.lastCommit.get(key) == "truncate+append")
    assert(readBack(key) == Set((1L, "A", 1.5), (2L, "B", 2.5)))

    writeRows(key, "append", Seq((3L, "C", 3.5)))
    assert(TelemetryStore.lastCommit.get(key) == "append")
    assert(readBack(key) == Set((1L, "A", 1.5), (2L, "B", 2.5), (3L, "C", 3.5)))

    // a second overwrite REPLACES everything — the MERGE-publish swap
    writeRows(key, "overwrite", Seq((9L, "Z", 9.0)))
    assert(readBack(key) == Set((9L, "Z", 9.0)))
    TelemetryStore.tables.remove(key)
  }

  test("V2 write: nulls survive the round-trip") {
    val key = s"spec_store_null_${System.nanoTime()}"
    import spark.implicits._
    Seq((1L, Option.empty[String], Option.empty[java.lang.Double]),
        (2L, Some("ok"), Some(java.lang.Double.valueOf(4.0))))
      .toDF("okey", "status", "price")
      .write.format(fmt).option("store", key).option("ddl", ddl)
      .mode("overwrite").save()
    val got = spark.read.format(fmt).option("store", key).option("ddl", ddl)
      .load().collect().map(r =>
        (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set((1L, None, None), (2L, Some("ok"), Some(4.0))))
    TelemetryStore.tables.remove(key)
  }

  test("V2 write plans pin OverwriteByExpressionExec / AppendDataExec") {
    @volatile var plans = List.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans ::= qe.executedPlan.toString
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val key = s"spec_store_plan_${System.nanoTime()}"
      writeRows(key, "overwrite", Seq((1L, "A", 1.0)))
      writeRows(key, "append", Seq((2L, "B", 2.0)))
      TelemetryStore.tables.remove(key)
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
             !(plans.exists(_.contains("OverwriteByExpression")) &&
               plans.exists(_.contains("AppendData"))))
        Thread.sleep(50)
      assert(plans.exists(_.contains("OverwriteByExpression")),
             s"no V2 overwrite node in:\n${plans.mkString("\n---\n")}")
      assert(plans.exists(_.contains("AppendData")),
             s"no V2 append node in:\n${plans.mkString("\n---\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q_source_dsv2_write matches a directly-computed merge ∪ delta") {
    // independent recomputation in DataFrame code (the DuckDB oracle is
    // the cross-engine check; this is the in-suite content check)
    import org.apache.spark.sql.functions._
    val got = ops.Relational.qSourceDsv2Write(spark, sf).collect()
    val base = Tables.orders(spark, sf)
    val updates = base.where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("u_key"), lit("X").as("u_status"),
              (col("o_totalprice") * lit(1.1)).as("u_price"))
    val merged = base.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
      .select(coalesce(col("u_status"), col("o_orderstatus")).as("status"),
              coalesce(col("u_price"), col("o_totalprice")).as("price"))
    val delta = base.where(col("o_orderkey") % 89 === 0)
      .select(lit("L").as("status"), col("o_totalprice").as("price"))
    val want = merged.unionAll(delta)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"), ops.Util.dsum(col("price")).as("total_price"))
      .orderBy("status").collect()
    assert(got.toSeq == want.toSeq,
           s"round-trip mismatch:\n got ${got.mkString(",")}\nwant ${want.mkString(",")}")
  }
}
