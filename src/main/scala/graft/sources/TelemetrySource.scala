package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** A from-scratch DataSource V2 connector (SURVEY §2.1 / the §7.4
  * extension-point matrix's last row): a deterministic telemetry
  * GENERATOR table — `series` × `samples` rows of
  * `(series_id, sample_idx, ts_us, value)` with
  * `value = ((series_id·131 + idx·7) mod 10000) / 100.0` and 1-minute
  * sample spacing — exposing the two optimizations that make a real
  * connector (ClickHouse, a metrics API, an object-store format)
  * worth writing over a generic JDBC bridge:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `series_id` narrow the generated series range AT
  *    THE SOURCE — the analogue of a TSDB pushing a series selector
  *    into its index; pushed filters disappear from the Spark plan.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes ONLY requested columns — the columnar-scan
  *    contract.
  *  - **Aggregate pushdown** ([[SupportsPushDownAggregates]]):
  *    ungrouped COUNT(*)/MIN/MAX over the closed-form columns
  *    (`series_id`, `sample_idx`, `ts_us`) COMPLETE-push to the
  *    source, which answers from range arithmetic — zero rows
  *    generated, the analogue of a warehouse answering MIN/MAX from
  *    zone-map metadata. `value` min/max (no closed form) and grouped
  *    aggregates are DECLINED, so Spark computes them from the raw
  *    scan — the decline path is part of the contract.
  *  - **Columnar batch reads**: the batch-path reader fills 4096-row
  *    [[ColumnarBatch]]es of on-heap vectors instead of one
  *    [[InternalRow]] per sample, so the scan enters WholeStageCodegen
  *    through the same vectorized path as parquet — the 100 TB scan
  *    shape. (The micro-batch streaming path stays row-based:
  *    triggers poll small sample ranges.)
  *
  * Partition planning splits the (post-pushdown) series range across
  * `partitions` input splits, so a cluster reads the source in
  * parallel with no skew. The generator is pure integer math, so the
  * DuckDB oracle reproduces it exactly with `generate_series` — a
  * custom SOURCE graded by the same hash gate as every operator
  * (`q_source_dsv2`). PlanShapeSpec pins pushdown + pruning via the
  * scan description. */
class TelemetrySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    // store tables declare their schema as a DDL option (the CREATE
    // TABLE a real warehouse target would have); the generator table
    // has the fixed telemetry schema
    if (options.containsKey("ddl")) StructType.fromDDL(options.get("ddl"))
    else TelemetrySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    if (properties.containsKey("store"))
      new TelemetryStoreTable(properties.get("store"), schema)
    else
      new TelemetryTable(
        properties.getOrDefault("series", "64").toLong,
        properties.getOrDefault("samples", "100").toLong,
        properties.getOrDefault("partitions", "8").toInt)
}

object TelemetrySource {
  val schema: StructType = StructType(Seq(
    StructField("series_id", LongType, nullable = false),
    StructField("sample_idx", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
  val T0: Long = 1704067200000000L // 2024-01-01 00:00 UTC, µs
  val StepUs: Long = 60000000L     // 1-minute samples
  def value(sid: Long, idx: Long): Double =
    ((sid * 131L + idx * 7L) % 10000L) / 100.0
}

private[sources] class TelemetryTable(nSeries: Long, nSamples: Long,
                                      nPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"telemetry($nSeries x $nSamples)"
  override def schema(): StructType = TelemetrySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TelemetryScanBuilder(nSeries, nSamples, nPartitions,
      options.getLong("samplesPerTrigger", 10L))
}

private[sources] class TelemetryScanBuilder(nSeries: Long, nSamples: Long,
                                            nPartitions: Int,
                                            samplesPerTrigger: Long = 10L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var lo: Long = 0L
  private var hi: Long = nSeries - 1
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = TelemetrySource.schema
  private var pushedAgg: Option[Aggregation] = None
  private var pushedLimit: Option[Int] = None

  // Limit pushdown — PARTIALLY pushed: each partition reader stops
  // generating after `limit` rows (so a LIMIT 10 against a trillion-row
  // range generates ≤ 10·partitions rows, not the range), and Spark
  // keeps its own global LIMIT on top for the exact cut. */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("series_id", _: Long) => true
      case GreaterThanOrEqual("series_id", _: Long) => true
      case LessThanOrEqual("series_id", _: Long) => true
      case GreaterThan("series_id", _: Long) => true
      case LessThan("series_id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v)
      case GreaterThan(_, v: Long) => lo = math.max(lo, v + 1)
      case LessThan(_, v: Long) => hi = math.min(hi, v - 1)
      case _ =>
    }
    accepted = ours
    rest // Spark keeps evaluating only these
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Aggregate pushdown: only what the generator can answer in CLOSED
  // FORM over the (post-filter-pushdown) [lo, hi] × [0, nSamples)
  // range. `value`'s min/max has no closed form — declined, Spark
  // falls back to aggregating the raw scan.
  private val closedForm = Set("series_id", "sample_idx", "ts_us")
  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
      case _ => None
    }
  private def canPush(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => colOf(m.column).exists(closedForm)
        case m: Max => colOf(m.column).exists(closedForm)
        case _ => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPush(agg)) return false
    pushedAgg = Some(agg)
    true
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new TelemetryAggScan(lo, hi, nSamples, agg, colOf)
    case None =>
      new TelemetryScan(lo, hi, nSamples, nPartitions, required, samplesPerTrigger,
                        pushedLimit)
  }
}

/** The pushed-aggregate scan: ONE row computed from range arithmetic —
  * no sample is ever generated. Complete pushdown, so Spark consumes
  * these values directly (no partial re-aggregation above). */
private[sources] class TelemetryAggScan(
    lo: Long, hi: Long, nSamples: Long, agg: Aggregation,
    colOf: org.apache.spark.sql.connector.expressions.Expression => Option[String])
    extends Scan with Batch {
  import TelemetrySource.{StepUs, T0}
  private val nRows: Long = math.max(0L, hi - lo + 1L) * math.max(0L, nSamples)
  private def bound(c: String, isMin: Boolean): Any =
    if (nRows == 0L) null
    else c match {
      case "series_id" => if (isMin) lo else hi
      case "sample_idx" => if (isMin) 0L else nSamples - 1L
      case "ts_us" => if (isMin) T0 else T0 + (nSamples - 1L) * StepUs
    }
  private val (fields, values) = agg.aggregateExpressions.zipWithIndex.map {
    case (_: CountStar, i) =>
      (StructField(s"count_star_$i", LongType, nullable = false), nRows: Any)
    case (m: Min, i) =>
      (StructField(s"min_${colOf(m.column).get}_$i", LongType), bound(colOf(m.column).get, isMin = true))
    case (m: Max, i) =>
      (StructField(s"max_${colOf(m.column).get}_$i", LongType), bound(colOf(m.column).get, isMin = false))
    case (other, _) =>
      throw new IllegalStateException(s"unpushable aggregate $other survived canPush")
  }.unzip
  override def readSchema(): StructType = StructType(fields)
  override def description(): String =
    s"TelemetryScan[series=$lo..$hi, PushedAggregates: [${agg.aggregateExpressions.mkString(", ")}]]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(TelemetryRange(0, 0, 0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val row = values
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = {
            val out = new GenericInternalRow(row.length)
            var i = 0
            while (i < row.length) { out.update(i, row(i)); i += 1 }
            out
          }
          override def close(): Unit = ()
        }
    }
  }
}

private[sources] class TelemetryScan(lo: Long, hi: Long, nSamples: Long,
                                     nPartitions: Int, required: StructType,
                                     samplesPerTrigger: Long,
                                     limit: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"TelemetryScan[series=$lo..$hi, cols=${required.fieldNames.mkString(",")}" +
      limit.map(l => s", limit=$l").getOrElse("") + "]"
  override def toBatch: Batch = this

  private def seriesSplits(idxFrom: Long, idxTo: Long): Array[InputPartition] = {
    if (hi < lo || idxTo <= idxFrom) return Array.empty
    val n = hi - lo + 1
    val parts = math.min(nPartitions.toLong, n).toInt
    (0 until parts).map { p =>
      // contiguous series ranges, sizes differing by at most 1
      val start = lo + p * n / parts
      val end = lo + (p + 1) * n / parts - 1
      TelemetryRange(start, end, idxFrom, idxTo): InputPartition
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    seriesSplits(0L, nSamples)

  // Batch reads are COLUMNAR (4096-row on-heap vectors feeding
  // WholeStageCodegen's vectorized input path, like parquet).
  override def createReaderFactory(): PartitionReaderFactory =
    new TelemetryReaderFactory(required, columnar = true,
                               perPartitionCap = limit.map(_.toLong))

  /** The streaming face of the same connector — the collector-poll
    * model the telemetry genre is built on: the OFFSET is the global
    * sample index, each trigger "polls" up to `samplesPerTrigger` new
    * samples per series, and a restart replays exactly the
    * [start, end) offset range it checkpointed — offset-range
    * exactly-once, like a Kafka source, with zero external state. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
      import org.apache.spark.sql.connector.read.streaming.Offset
      private def off(i: Long): Offset = SampleOffset(i)
      override def initialOffset(): Offset = off(0L)
      // Each POLL produces samplesPerTrigger new samples (up to the
      // cap) — latestOffset itself advances, like a broker gaining
      // records between polls. It must NOT key off commit(): the
      // engine checks availability BEFORE committing the previous
      // batch, so commit-based advancement deadlocks after batch 1.
      @volatile private var polled: Long = 0L
      override def latestOffset(): Offset = {
        polled = math.min(polled + samplesPerTrigger, nSamples)
        off(polled)
      }
      override def commit(end: Offset): Unit = ()
      // Restart recovery: the engine replays the offset log through
      // deserializeOffset before asking for new offsets — the poll
      // high-water mark must be restored from it, or latestOffset()
      // would regress below the checkpointed committed offset and
      // re-plan (duplicate) ranges already emitted before the crash.
      override def deserializeOffset(json: String): Offset = {
        val i = json.toLong
        polled = math.max(polled, i)
        off(i)
      }
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val endIdx = end.asInstanceOf[SampleOffset].idx
        polled = math.max(polled, endIdx) // belt-and-braces vs restart replay
        seriesSplits(start.asInstanceOf[SampleOffset].idx, endIdx)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new TelemetryReaderFactory(required, columnar = false)
      override def stop(): Unit = ()
    }
}

private[sources] case class SampleOffset(idx: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = idx.toString
}

private[sources] case class TelemetryRange(from: Long, to: Long,
                                           idxFrom: Long, idxTo: Long)
    extends InputPartition

private[sources] class TelemetryReaderFactory(required: StructType,
                                              columnar: Boolean,
                                              perPartitionCap: Option[Long] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[TelemetryRange]
    new TelemetryReader(r.from, r.to, r.idxFrom, r.idxTo, required, perPartitionCap)
  }
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val r = partition.asInstanceOf[TelemetryRange]
    new TelemetryColumnarReader(r.from, r.to, r.idxFrom, r.idxTo, required,
                                perPartitionCap)
  }
}

/** Vectorized batch reader: fills pruned on-heap column vectors 4096
  * samples at a time — same per-(sid, idx) closed forms as the row
  * reader, amortizing per-row iterator overhead and letting the
  * downstream stage consume vectors (the parquet scan shape). */
private[sources] class TelemetryColumnarReader(from: Long, to: Long,
                                               idxFrom: Long, idxTo: Long,
                                               required: StructType,
                                               cap: Option[Long] = None)
    extends PartitionReader[ColumnarBatch] {
  private var emitted = 0L
  private val capacity = 4096
  private val vectors = OnHeapColumnVector.allocateColumns(capacity, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
  // per-column writers bound once, by ordinal
  private val writers: Array[(Int, Long, Long) => Unit] =
    required.fieldNames.zipWithIndex.map { case (name, ord) =>
      val vec = vectors(ord)
      name match {
        case "series_id" => (row: Int, sid: Long, _: Long) => vec.putLong(row, sid)
        case "sample_idx" => (row: Int, _: Long, idx: Long) => vec.putLong(row, idx)
        case "ts_us" => (row: Int, _: Long, idx: Long) =>
          vec.putLong(row, TelemetrySource.T0 + idx * TelemetrySource.StepUs)
        case "value" => (row: Int, sid: Long, idx: Long) =>
          vec.putDouble(row, TelemetrySource.value(sid, idx))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
  private var sid = from
  private var idx = idxFrom
  private var exhausted = to < from || idxTo <= idxFrom
  override def next(): Boolean = {
    if (exhausted) return false
    vectors.foreach(_.reset())
    var n = 0
    while (n < capacity && !exhausted) {
      if (cap.exists(emitted >= _)) { exhausted = true } // pushed LIMIT
      else {
        var c = 0
        while (c < writers.length) { writers(c)(n, sid, idx); c += 1 }
        n += 1
        emitted += 1
        idx += 1
        if (idx >= idxTo) { idx = idxFrom; sid += 1; if (sid > to) exhausted = true }
      }
    }
    batch.setNumRows(n)
    n > 0
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = batch.close()
}

private[sources] class TelemetryReader(from: Long, to: Long,
                                       idxFrom: Long, idxTo: Long,
                                       required: StructType,
                                       cap: Option[Long] = None)
    extends PartitionReader[InternalRow] {
  private var emitted = 0L
  // materialize ONLY the pruned columns, by ordinal plan built once
  private val getters: Array[(Long, Long) => Any] = required.fieldNames.map {
    case "series_id" => (sid: Long, _: Long) => sid
    case "sample_idx" => (_: Long, idx: Long) => idx
    case "ts_us" => (_: Long, idx: Long) =>
      TelemetrySource.T0 + idx * TelemetrySource.StepUs
    case "value" => (sid: Long, idx: Long) => TelemetrySource.value(sid, idx)
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }
  private var sid = from
  private var idx = idxFrom - 1
  override def next(): Boolean = {
    if (cap.exists(emitted >= _)) return false // pushed LIMIT: stop generating
    emitted += 1
    idx += 1
    if (idx >= idxTo) { idx = idxFrom; sid += 1 }
    sid <= to && idxTo > idxFrom
  }
  override def get(): InternalRow = {
    val row = new GenericInternalRow(getters.length)
    var i = 0
    while (i < getters.length) { row.update(i, getters(i)(sid, idx)); i += 1 }
    row
  }
  override def close(): Unit = ()
}

/** JVM-wide backing store for [[TelemetryStoreTable]] — the write-path
  * half of the connector (round-8; the read half covered the full
  * pushdown matrix but nothing wrote through V2). The store stands in
  * for the warehouse TARGET TABLE (the ClickHouse/Postgres table the
  * telemetry genre upserts into): rows live in driver memory, published
  * ATOMICALLY by `BatchWrite.commit` from the per-task commit messages,
  * exactly like Spark's own in-memory catalog tables — a deployment
  * swaps the row buffer for a warehouse batch INSERT and keeps every
  * protocol class unchanged.
  *
  * Cluster posture: task-side [[StoreDataWriter]]s buffer their
  * partition's rows and ship them INSIDE the WriterCommitMessage (the
  * V2 contract's data channel for commit metadata); only the driver
  * touches the store, so the path is correct under real executor JVMs
  * — ClusterProof runs it under `local-cluster`. That bounds a single
  * write to driver memory, which is the DECLARED envelope: upsert
  * targets are dimension-sized snapshots (orders-scale), not the fact
  * stream — fact-sized output goes through the file/JDBC sinks.
  * Values are stored JVM-serializable (String, not UTF8String) so the
  * read path's InputPartitions ship slices to executors verbatim. */
object TelemetryStore {
  /** store key → (schema, committed rows). Rows hold external values
    * (String/Long/Double/...); readers convert to catalyst on emit. */
  val tables = new java.util.concurrent.ConcurrentHashMap[
    String, (StructType, Vector[Array[Any]])]
  /** store key → last commit kind ("truncate+append" | "append") —
    * the protocol-path pin PlanShapeSpec asserts alongside the plan
    * node. */
  val lastCommit = new java.util.concurrent.ConcurrentHashMap[String, String]
  def rows(key: String): Vector[Array[Any]] =
    Option(tables.get(key)).map(_._2).getOrElse(Vector.empty)
}

/** FILE-BACKED store backend (round-9 verdict ask #7): the same V2
  * interfaces — and therefore the same MERGE/overwrite/append plan
  * shapes — with data in FILES instead of driver memory, lifting the
  * in-memory store's declared dimension-sized envelope:
  *
  *  - task writers STREAM rows to `<root>/<key>/data/part-*.bin`
  *    (length-tagged binary rows, lz4-free but buffered; written to a
  *    `.tmp` name, renamed on task commit) — rows never visit the
  *    driver, so a write is bounded by executor+disk, not driver heap;
  *  - commit messages carry only (fileName, rowCount) — O(tasks), the
  *    Iceberg/Delta commit-channel shape;
  *  - the driver publishes ATOMICALLY via a manifest-pointer swap:
  *    `manifest-<v>` lists the live files, `VERSION` is rename-swapped
  *    to point at it (the q_sink_timetravel discipline). Truncate =
  *    manifest of only the new files (old files deleted best-effort
  *    AFTER publish); append = previous live + new.
  *  - readers plan ONE InputPartition per live file and stream-decode —
  *    scan parallelism scales with file count, not driver state.
  *
  * `root` must be visible to all executors (same-host tmpfs here;
  * shared storage on a real cluster — the checkpointDir assumption).
  * Concurrent committed writes to the SAME table SERIALIZE through the
  * per-dir publish lock (JVM monitor + OS file lock), so two appends
  * compose — both file sets land in the surviving manifest, matching
  * the memory store's compute(), which also loses no append. */
object FileStore {
  import java.io._

  def tableDir(root: String, key: String) = new File(root, key)
  private def versionFile(dir: File) = new File(dir, "VERSION")

  def schemaOf(dir: File): Option[StructType] = {
    val f = new File(dir, "schema.ddl")
    if (!f.isFile) None
    else Some(StructType.fromDDL(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
  }

  def writeSchema(dir: File, schema: StructType): Unit = {
    dir.mkdirs(); new File(dir, "data").mkdirs()
    java.nio.file.Files.write(new File(dir, "schema.ddl").toPath,
      schema.toDDL.getBytes("UTF-8")): Unit
  }

  def currentVersion(dir: File): Long = {
    val vf = versionFile(dir)
    if (!vf.isFile) 0L
    else new String(java.nio.file.Files.readAllBytes(vf.toPath), "UTF-8").trim.toLong
  }

  def liveFiles(dir: File): Vector[String] = {
    val v = currentVersion(dir)
    if (v == 0L) Vector.empty
    else {
      val mf = new File(dir, s"manifest-$v")
      if (!mf.isFile) Vector.empty
      else new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty).toVector
    }
  }

  /** Per-table-dir publish locks: publish is a read-modify-write over
    * (VERSION, manifest), so two concurrent committed APPENDs that both
    * read version v would each write manifest v+1 and the loser's
    * committed files silently vanish from the surviving manifest
    * (round-10 ADVICE — the memory store's compute() loses NO append,
    * so "last-publish-wins parity" understated the hazard). A JVM lock
    * serializes same-process writers; an OS file lock on
    * `publish.lock` serializes cross-JVM writers (this driver-side
    * commit path runs once per table write — contention is nil, the
    * lock is pure correctness). */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  /** Atomic publish: write manifest v+1, rename-swap VERSION — with the
    * version re-read INSIDE the lock, so concurrent appends compose
    * instead of overwriting each other. Returns the files the new
    * manifest DROPPED (caller deletes best-effort). */
  def publish(dir: File, files: Vector[String], truncate: Boolean): Vector[String] =
    publishLocks.computeIfAbsent(dir.getAbsolutePath, _ => new Object)
      .synchronized {
        val ch = java.nio.channels.FileChannel.open(
          new File(dir, "publish.lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val osLock = ch.lock()
          try {
            val prev = liveFiles(dir)
            val next = if (truncate) files else prev ++ files
            val v = currentVersion(dir) + 1
            java.nio.file.Files.write(new File(dir, s"manifest-$v").toPath,
              next.mkString("\n").getBytes("UTF-8"))
            val tmp = new File(dir, s"VERSION.tmp$v")
            java.nio.file.Files.write(tmp.toPath, v.toString.getBytes("UTF-8"))
            java.nio.file.Files.move(tmp.toPath, versionFile(dir).toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            if (truncate) prev.filterNot(next.contains) else Vector.empty
          } finally osLock.release()
        } finally ch.close()
      }

  // ---- row codec: 0x01 row-marker, per-field null byte + value ----
  def writeRow(out: DataOutputStream, schema: StructType, vals: Array[Any]): Unit = {
    out.writeByte(1)
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      if (v == null) out.writeByte(0)
      else {
        out.writeByte(1)
        schema.fields(i).dataType match {
          case LongType    => out.writeLong(v.asInstanceOf[Long])
          case IntegerType => out.writeInt(v.asInstanceOf[Int])
          case DoubleType  => out.writeDouble(v.asInstanceOf[Double])
          case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
          case StringType  =>
            val b = v.asInstanceOf[String].getBytes("UTF-8")
            out.writeInt(b.length); out.write(b)
          case other => throw new IllegalArgumentException(
            s"telemetry_store: unsupported column type $other")
        }
      }
      i += 1
    }
  }

  /** Reads the next row into a fresh array; null at end-of-stream. */
  def readRow(in: DataInputStream, schema: StructType): Array[Any] = {
    if (in.readByte() == 0) return null
    val out = new Array[Any](schema.fields.length)
    var i = 0
    while (i < out.length) {
      if (in.readByte() != 0) out(i) = schema.fields(i).dataType match {
        case LongType    => in.readLong()
        case IntegerType => in.readInt()
        case DoubleType  => in.readDouble()
        case BooleanType => in.readBoolean()
        case StringType  =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          new String(b, "UTF-8")
        case other => throw new IllegalArgumentException(
          s"telemetry_store: unsupported column type $other")
      }
      i += 1
    }
    out
  }
}

private[sources] class TelemetryStoreTable(key: String, schema0: StructType,
                                           fileRoot: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.write._
  override def name(): String = s"telemetry_store($key)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema0
      override def pruneColumns(r: StructType): Unit = required = r
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def description(): String =
          s"TelemetryStoreScan[$key, cols=${required.fieldNames.mkString(",")}" +
            fileRoot.map(_ => ", file-backed").getOrElse("") + "]"
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          // ordinals of the pruned columns in the stored row layout;
          // the `_shard` METADATA column (row-level-operation group id,
          // MergeableStoreTable) is not stored — ordinal -1 emits the
          // constant 0: the unpartitioned store is one group
          val ords = required.fieldNames.map(f =>
            if (f == "_shard") -1 else schema0.fieldIndex(f))
          fileRoot match {
            case Some(root) =>
              // file-backed: one partition per live data file — scan
              // parallelism scales with the table, not driver state
              val dir = FileStore.tableDir(root, key)
              val files = FileStore.liveFiles(dir)
              if (files.isEmpty) Array(StoreSlice(Array.empty, ords))
              else files.map(f => FileSlice(
                new java.io.File(new java.io.File(dir, "data"), f).getAbsolutePath,
                schema0, ords): InputPartition).toArray
            case None =>
              val all = TelemetryStore.rows(key)
              if (all.isEmpty) Array(StoreSlice(Array.empty, ords))
              else {
                val nSplits = math.min(8, all.size)
                val per = (all.size + nSplits - 1) / nSplits
                all.grouped(per).map(sl => StoreSlice(sl.toArray, ords): InputPartition).toArray
              }
          }
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            private def project(src: Array[Any], ordinals: Array[Int]): InternalRow = {
              val out = new GenericInternalRow(ordinals.length)
              var c = 0
              while (c < ordinals.length) {
                val ord = ordinals(c)
                out.update(c,
                  if (ord < 0) 0 // _shard metadata column: single group
                  else src(ord) match {
                    case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
                    case v => v
                  })
                c += 1
              }
              out
            }
            override def createReader(p: InputPartition): PartitionReader[InternalRow] =
              p match {
                case slice: StoreSlice =>
                  new PartitionReader[InternalRow] {
                    private var i = -1
                    override def next(): Boolean = { i += 1; i < slice.rows.length }
                    override def get(): InternalRow = project(slice.rows(i), slice.ordinals)
                    override def close(): Unit = ()
                  }
                case fs: FileSlice =>
                  new PartitionReader[InternalRow] {
                    private val in = new java.io.DataInputStream(
                      new java.io.BufferedInputStream(
                        new java.io.FileInputStream(fs.path), 1 << 16))
                    private var row: Array[Any] = _
                    override def next(): Boolean = {
                      row = FileStore.readRow(in, fs.rowSchema); row != null
                    }
                    override def get(): InternalRow = project(row, fs.ordinals)
                    override def close(): Unit = in.close()
                  }
              }
          }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwrite {
      private var truncateFirst = false
      // mode("overwrite") arrives as OverwriteByExpression(AlwaysTrue)
      // → the TRUNCATE+APPEND publish (the MERGE-result swap); any
      // narrower filter is not supported by this target
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        require(filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue),
          s"telemetry_store supports only full-overwrite, got ${filters.mkString(",")}")
        truncateFirst = true
        this
      }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new StoreBatchWrite(key, info.schema(), truncateFirst, fileRoot)
      }
    }
}

/** One committed V2 write: tasks buffer + ship rows in commit messages
  * (memory mode) or stream rows to data files and ship only file names
  * (file mode); the driver publishes atomically (all-or-nothing per
  * write — abort drops everything, the exactly-once half of the
  * contract; the commit coordinator guarantees one committed attempt
  * per partition). */
private[sources] class StoreBatchWrite(key: String, schema: StructType,
                                       truncateFirst: Boolean,
                                       fileRoot: Option[String] = None)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StoreWriterFactory(schema,
      fileRoot.map(r => new java.io.File(FileStore.tableDir(r, key), "data").getAbsolutePath))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.iterator
      .map(_.asInstanceOf[StoreCommit])
      .toVector
      .sortBy(_.partitionId) // deterministic publish order
    fileRoot match {
      case Some(root) =>
        val dir = FileStore.tableDir(root, key)
        // rowCount gates the manifest: an empty task's part file adds a
        // zero-row InputPartition to every future scan — skip it (and
        // delete the empty file immediately; nothing can be reading a
        // file that was never published)
        val (live, empty) = commits.partition(_.rowCount > 0)
        empty.flatMap(_.file).foreach(f =>
          new java.io.File(new java.io.File(dir, "data"), f).delete(): Unit)
        val dropped = FileStore.publish(dir, live.flatMap(_.file), truncateFirst)
        // dropped files left the manifest atomically; physical delete
        // is genuinely DEFERRED (Iceberg expired-snapshot semantics): a
        // reader that planned against the old manifest opens file names
        // at EXECUTE time, so deleting here would turn the plan/open
        // race into FileNotFoundException. Drops are recorded in a
        // timestamped sidecar and reaped on a later publish once aged
        // past any plausible open slice (10 min; a slice streams for
        // seconds).
        val dataDir = new java.io.File(dir, "data")
        if (dropped.nonEmpty)
          java.nio.file.Files.write(
            new java.io.File(dir, s"dropped-${System.currentTimeMillis()}").toPath,
            dropped.mkString("\n").getBytes("UTF-8")): Unit
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("dropped-")).foreach { sc =>
            val ts = try sc.getName.stripPrefix("dropped-").toLong
                     catch { case _: NumberFormatException => Long.MaxValue }
            if (System.currentTimeMillis() - ts > 10L * 60 * 1000) {
              new String(java.nio.file.Files.readAllBytes(sc.toPath), "UTF-8")
                .split("\n").filter(_.nonEmpty)
                .foreach(f => new java.io.File(dataDir, f).delete(): Unit)
              sc.delete(): Unit
            }
          }
      case None =>
        val incoming = commits.flatMap(_.rows)
        TelemetryStore.tables.compute(key, (_, prev) => {
          val kept =
            if (truncateFirst || prev == null) Vector.empty else prev._2
          (schema, kept ++ incoming)
        })
    }
    TelemetryStore.lastCommit.put(key,
      if (truncateFirst) "truncate+append" else "append")
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // file mode: drop the (renamed-but-unpublished) task outputs
    fileRoot.foreach { root =>
      val data = new java.io.File(FileStore.tableDir(root, key), "data")
      messages.iterator.filter(_ != null).map(_.asInstanceOf[StoreCommit])
        .flatMap(_.file)
        .foreach(f => new java.io.File(data, f).delete(): Unit)
    }
}

private[sources] case class StoreSlice(rows: Array[Array[Any]],
                                       ordinals: Array[Int])
    extends InputPartition

private[sources] case class FileSlice(path: String, rowSchema: StructType,
                                      ordinals: Array[Int])
    extends InputPartition

private[sources] case class StoreCommit(partitionId: Int,
                                        rows: Vector[Array[Any]],
                                        file: Option[String] = None,
                                        rowCount: Long = 0L)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class StoreWriterFactory(schema: StructType,
                                          fileDir: Option[String] = None)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  import org.apache.spark.sql.connector.write.DataWriter
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // file mode: stream rows straight to the task's data file —
      // nothing row-sized is ever buffered or shipped to the driver
      private val fileName = fileDir.map(_ =>
        s"part-$partitionId-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.bin")
      private val tmpFile = fileDir.zip(fileName).map { case (d, n) =>
        new java.io.File(d, n + ".tmp") }
      private val out = tmpFile.map { f =>
        f.getParentFile.mkdirs()
        new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
      }
      private var nRows = 0L
      private val buf = Vector.newBuilder[Array[Any]]
      // external-value extractors bound once per column
      private val gets: Array[InternalRow => Any] =
        schema.fields.zipWithIndex.map { case (f, i) =>
          val get: InternalRow => Any = f.dataType match {
            case LongType    => r => r.getLong(i)
            case IntegerType => r => r.getInt(i)
            case DoubleType  => r => r.getDouble(i)
            case BooleanType => r => r.getBoolean(i)
            case StringType  => r => r.getUTF8String(i).toString
            case other => throw new IllegalArgumentException(
              s"telemetry_store: unsupported column type $other")
          }
          (r: InternalRow) => if (r.isNullAt(i)) null else get(r)
        }
      override def write(r: InternalRow): Unit = {
        val row = new Array[Any](gets.length)
        var c = 0
        while (c < gets.length) { row(c) = gets(c)(r); c += 1 }
        out match {
          case Some(o) => FileStore.writeRow(o, schema, row); nRows += 1
          case None    => buf += row
        }
      }
      // metadata+data variant (DataWriter's two-arg default throws):
      // row-level-operation writes arrive here when the operation
      // declared metadata attributes — the store has no physical
      // metadata, so only the data row lands
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        out.foreach { o => o.writeByte(0); o.close() } // end-of-rows marker
        tmpFile.zip(fileName).foreach { case (t, n) =>
          java.nio.file.Files.move(t.toPath,
            new java.io.File(t.getParentFile, n).toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        StoreCommit(partitionId, buf.result(), fileName, nRows)
      }
      override def abort(): Unit = {
        out.foreach(_.close())
        tmpFile.foreach(_.delete(): Unit)
      }
      override def close(): Unit = ()
    }
}
