package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}

/** Scratch probe (round 12): does transformWithState under
  * TimeMode.ProcessingTime complete a batch at all in this Spark
  * build? Isolates TTL vs time-mode as the hang trigger seen in the
  * lineDedup TTL spec. Usage: TtlProbe [ttl|nottl] */
object TtlProbe {
  case class FS(docId: Long, lineId: Long)
  private class P(useTtl: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, Long), (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.{Encoders => E}
    @transient private var v: org.apache.spark.sql.streaming.ValueState[FS] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      v = getHandle.getValueState[FS]("v", E.product[FS],
        if (useTtl) TTLConfig(java.time.Duration.ofHours(1)) else TTLConfig.NONE)
    override def handleInputRows(key: (Long, Long), rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
      val prev = if (v.exists()) v.get() else FS(0L, 0L)
      val n = FS(prev.docId + rows.size, prev.lineId)
      v.update(n)
      Iterator.single((key._1, n.docId))
    }
  }

  def main(args: Array[String]): Unit = {
    val useTtl = args.headOption.forall(_ == "ttl")
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.checkpoint.compress", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    if (useTtl) s.conf.set("graft.stream.lineDedup.ttlMs", "3600000")
    val in = MemoryStream[(Long, String)](s)
    val out = graft.stream.StreamOps.lineDedupIndex(in.toDF().toDF("doc_id", "text"))
    val q = out.toDF().writeStream.format("memory").queryName("probe")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    in.addData((1L, "accept all cookies to continue reading this site"),
               (2L, "accept all cookies to continue reading this site"))
    val deadline = System.currentTimeMillis() + 60000
    var done = false
    while (!done && System.currentTimeMillis() < deadline) {
      if (q.exception.isDefined) { println(s"[probe] FAILED: ${q.exception.get.getMessage.take(500)}"); done = true }
      else if (s.sql("select count(*) from probe").head().getLong(0) >= 1) {
        println(s"[probe] ttl=$useTtl batch COMMITTED, rows=" +
          s.sql("select count(*) from probe").head().getLong(0)); done = true
      } else Thread.sleep(500)
    }
    if (!done) println(s"[probe] ttl=$useTtl HUNG (60s, no commit)")
    q.stop(); s.stop()
  }
}
