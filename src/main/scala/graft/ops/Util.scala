package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY.md §7.3).
  *
  * The correctness gate hash-compares our parquet output against DuckDB
  * running the same SQL. Double summation is order-dependent, so every
  * money/metric sum goes through DECIMAL(18,4):
  *   - the per-row double expression is deterministic IEEE math
  *     (identical on both engines),
  *   - the double→decimal cast rounds to 4 decimals (no representable
  *     double sits exactly on a 1e-4 tie, so HALF_UP vs HALF_EVEN can't
  *     diverge),
  *   - decimal addition is exact and order/partition-independent,
  *   - the final decimal→double cast is deterministic.
  * Averages are sum_decimal→double divided by count (one IEEE division),
  * never a streaming double `avg`.
  */
object Util {
  val D: DecimalType = DecimalType(18, 4)

  /** RELIABLE eager checkpoint for DATA-SIZED shared/loop frames (the
    * iterative graph/dedup/ANN family) — the round-9 hardening of what
    * was a serialized `localCheckpoint`.
    *
    * Why reliable, not local: `localCheckpoint` truncates lineage to
    * blocks PINNED TO EXECUTOR LIVENESS — lose one executor and every
    * frame with a block there dies with
    * `CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND` (loud, never wrong, but on a
    * real cluster executor churn is the norm; the round-9 ClusterProof
    * heavy runs showed exactly this). `Dataset.checkpoint()` writes the
    * frame to the checkpoint DIRECTORY instead — on a cluster that is
    * HDFS/object storage (set `graft.checkpointDir`), here a pid-keyed
    * tmpfs dir — so executor loss degrades to re-reading files, not to
    * query death. Lineage truncation (the reason these loops checkpoint
    * at all: the per-round plan would otherwise double) and the
    * preserved output partitioning (LogicalRDD keeps the physical
    * plan's partitioning, so pre-hashed loop frames don't re-shuffle)
    * are identical to the local form.
    *
    * Cost shape: the eager materialization is one job; Spark then
    * writes the checkpoint files in a SECOND job — `persist` first so
    * that write job reads the just-built serialized blocks instead of
    * recomputing the (possibly expensive — the banded pair graph)
    * subtree, then unpersist once the files exist. Files are
    * lz4-compressed when the session sets `spark.checkpoint.compress`
    * (our mains/specs do). Storage: frames live as compact files
    * (tmpfs here), not executor storage memory — strictly better for
    * the bounded-heap sf100 rung than serialized blocks.
    *
    * Hygiene: the pid-keyed root is swept of dead-pid leftovers at
    * first use and removed by a JVM shutdown hook; iterative loops
    * additionally [[dropCheckpoint]] each round's provably-dead
    * predecessor so standing files stay O(1) frames per loop. */
  def serCheckpoint(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(df.sparkSession.conf.getOption("graft.checkpointDir")
        .getOrElse(checkpointRoot))
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val out = try df.checkpoint()
              finally { df.unpersist(blocking = false); () }
    // block-cache the checkpointed RDD itself (NOT Dataset.persist —
    // the columnar InMemoryRelation roundtrip plus its AQE cache stage
    // measured ~2× on every consumer of the shared artifacts):
    // consumers' `Scan ExistingRDD` then reads memory-speed serialized
    // blocks exactly like the localCheckpoint it replaced, and
    // eviction/executor loss degrades to re-reading the checkpoint
    // FILES — the RDD's recompute path — not to query death.
    out.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // HONEST STATS from the materialized files: checkpoint copies
        // the pre-checkpoint plan's estimate, which for the postings /
        // pair frames runs orders of magnitude LOW and made the planner
        // broadcast a 40M-row frame into every consumer join (sf1
        // executor OOM; an outage at 100 TB). lz4 on-disk bytes × 4 ≈
        // decoded size — erring high only withholds a broadcast hint
        // our ops issue explicitly (gatedBroadcast) anyway.
        lr.rdd.getCheckpointFile.map { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val onDisk = path.getFileSystem(sc.hadoopConfiguration)
            .getContentSummary(path).getLength
          org.apache.spark.sql.graftbridge.Bridge.withStats(out, BigInt(onDisk) * 4)
        }.getOrElse(out)
      case _ => out
    }
  }

  /** Size-gated checkpoint for PER-QUERY data-sized frames (loop rounds,
    * wedge/arc/hit frames): reliable [[serCheckpoint]] once the frame is
    * big enough (`graft.checkpoint.reliableMinRows`, default 4M rows)
    * that the file write amortizes against the compute it protects —
    * the sf100 regime, where losing a multi-minute loop to one executor
    * death is the real risk; BELOW the gate, a serialized
    * `localCheckpoint` — same lineage truncation, zero file I/O, one
    * job — because a fixture-scale frame is trivially recomputable: an
    * executor loss there costs ONE query retry, not the session (the
    * session-cached artifacts stay reliable unconditionally, so
    * retries always find their shared inputs intact). Measured: the
    * everything-reliable sweep cost 3-6× on the per-round loops at
    * sf0.1 (bfs 2.3→14.9 s) for durability no 40k-row frame needs. */
  def serCheckpoint(df: DataFrame, estRows: Long): DataFrame = {
    val gate = df.sparkSession.conf.getOption("graft.checkpoint.reliableMinRows")
      .map(_.toLong).getOrElse(4000000L)
    if (estRows >= gate) serCheckpoint(df)
    else {
      val out = df.localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      // the same honest-stats rule as the reliable branch: checkpoint
      // inherits the PRE-checkpoint estimate, which under-reads the
      // postings/pair frames by orders of magnitude and turned a
      // 2.4M-row gram frame into a ~250 MB auto-BROADCAST (the real
      // root of the "8-gram agg" executor OOMs blamed on contention in
      // round 9). The materialized blocks are the truth: serialized
      // bytes × 2 ≈ decoded size; estRows × 64 B as the fallback.
      out.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          val info = df.sparkSession.sparkContext.getRDDStorageInfo
            .find(_.id == lr.rdd.id)
          val bytes = info.map(i => BigInt(i.memSize + i.diskSize) * 2)
            .filter(_ > 0)
            .getOrElse(BigInt(math.max(estRows, 1L)) * 64)
          org.apache.spark.sql.graftbridge.Bridge.withStats(out, bytes)
        case _ => out
      }
    }
  }

  /** Method-chain sugar so `.serCheckpoint(...)` reads like the
    * `.localCheckpoint(...)` it replaced (31 op-layer sites). */
  implicit class RichCheckpoint(private val df: DataFrame) extends AnyVal {
    def serCheckpoint(): DataFrame = Util.serCheckpoint(df)
    def serCheckpoint(estRows: Long): DataFrame = Util.serCheckpoint(df, estRows)
  }

  /** Delete the checkpoint files behind a [[serCheckpoint]] result.
    * ONLY for provably-dead loop frames — the frame being REPLACED in
    * an iterative loop once its successor is materialized (successors
    * are file-backed, so they never re-read the predecessor). Never
    * call on a frame a returned (lazy) plan still reads, or on the
    * shared (session, sfDir)-keyed caches. Scoped to the exact frame —
    * this replaces the round-8 session-global persistent-RDD diffing
    * that could unpersist a concurrent query's blocks (round-9 ADVICE).
    * No-op when `df` is not a checkpoint root. */
  def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        // both branches: free the serialized blocks; reliable frames
        // additionally lose their (now-dead) checkpoint files
        lr.rdd.unpersist(blocking = false)
        lr.rdd.getCheckpointFile.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(path, true): Unit
        }
      case _ => ()
    }

  /** Pid-keyed reliable-checkpoint root (tmpfs-backed where the box
    * has one — same placement rationale as [[scratchRoot]]); clusters
    * override with `graft.checkpointDir` → shared storage. */
  lazy val checkpointRoot: String = {
    val parent = new java.io.File(scratchRoot).getParentFile
    sweepDeadPidDirs(parent, "graft_ckpt")
    val dir = new java.io.File(parent,
      s"graft_ckpt_p${ProcessHandle.current().pid()}_0")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursive(dir)))
    dir.getAbsolutePath
  }

  /** Order-independent exact sum of a double expression, output as double.
    *
    * `scale` must be ≥ the true decimal scale of the expression (fixture
    * money columns are 2-decimal; an n-factor product of 2-decimal values
    * has true scale 2n). When the cast scale ≥ true scale, the double
    * being cast sits ~1e-16·|x| from an exact grid point — far inside the
    * half-step — so Spark's shortest-string HALF_UP and DuckDB's
    * binary-value rounding recover the *same* grid value. A scale below
    * the true scale creates genuine ties that the two engines break
    * differently (observed on a 3-factor product at scale 4). */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic average: exact decimal sum → double, / count. */
  def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double") / count(lit(1))

  /** Shared histogram bucketing for q_agg_histogram and
    * q_ts_histogram_quantile (the quantile reader interpolates INSIDE
    * these buckets, so the two ops must never drift apart): floor the
    * double (exact on both engines), then pure integer div/clamp —
    * bucket edges can never straddle engines. Oracle mirror:
    * `least(CAST(floor(value) AS BIGINT) // 50, 9)`. */
  def bucket50(colName: String): Column =
    least(org.apache.spark.sql.functions.expr(
      s"CAST(floor($colName) AS BIGINT) div 50"), lit(9L))

  /** Morton (Z-order) interleave of two non-negative long columns'
    * low `bits` bits — x occupies even bit positions, y odd. Pure
    * bitwise/arithmetic ops (stays in whole-stage codegen). Sorting a
    * layout by this key co-clusters BOTH dimensions, so per-file
    * min/max stats prune range predicates on either column — the
    * multi-dimensional data-layout move single-column sorting can't
    * make (see q_sink_zorder + the pruning property test). CALLER
    * CONTRACT: inputs must already sit in the 2^bits domain —
    * normalize (min/max-scale or rank) first, as qSinkZorder does;
    * larger values alias modulo 2^bits and that dimension silently
    * stops co-clustering. */
  def morton(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
      (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Size-gated broadcast for the loop-carried frames of the iterative
    * graph family (q_dedup_cluster, q_graph_pagerank,
    * q_graph_triangles). These frames are O(|V|)/O(|E|), not dimension
    * tables: an unconditional `broadcast()` hint hard-pins a plan that
    * at 100× node counts OOMs the driver assembling the broadcast.
    * Broadcasting them IS 30-45% faster at fixture scale (measured,
    * round 3), so the hint stays — but only while the frame's estimated
    * size (`estRows` × `bytesPerRow`) is under
    * `graft.loop.broadcastThreshold` bytes (default 8 MiB ≈ Spark's own
    * equi-join runs un-hinted, i.e. as a co-partitioned shuffle join —
    * semantics identical, plan scale-safe. PlanShapeSpec pins both
    * branches (hinted under the gate; no BroadcastExchange above it). */
  def gatedBroadcast(s: SparkSession, df: DataFrame, estRows: Long,
                     bytesPerRow: Int = 48,
                     thresholdBytes: Option[Long] = None): DataFrame = {
    // thresholdBytes overrides the loop-frame default for sites whose
    // build side is a flat lookup table rather than a loop frame (the
    // editdist prefix rejoin, the triangle closing filter): those
    // tolerate a larger broadcast because exactly ONE such join is
    // live at a time. The two regimes get SEPARATE conf keys
    // (round-10 ADVICE — one shared key meant a user raising the
    // loop-frame gate to tune label frames silently LOWERED the
    // one-live-join sites from their declared 128-256 MiB budgets,
    // flipping the closing-edge semi join into the sort-merge
    // wedge-stream cliff): `graft.loop.broadcastThreshold` gates only
    // the default-budget loop frames; `graft.join.siteBroadcastThreshold`
    // gates only the sites that declare their own budget. Forced-path
    // tests that want EVERY broadcast closed set both to 0.
    val thr = thresholdBytes match {
      case Some(site) => s.conf.getOption("graft.join.siteBroadcastThreshold")
        .map(_.toLong).getOrElse(site)
      case None => s.conf.getOption("graft.loop.broadcastThreshold")
        .map(_.toLong).getOrElse(8L << 20)
    }
    if (estRows * bytesPerRow <= thr) broadcast(df) else df
  }

  /** Exact hub-salted wedge self-join — the skew guard for the graph
    * family's distance-2 enumerations (q_graph_2hop, q_graph_linkpred).
    *
    * A wedge join `adj(m,u) ⋈ adj(m,w)` keyed on the mid-vertex emits
    * deg(m)² rows per mid-vertex AND lands every one of a hub's rows on
    * ONE reducer (the key is m) — on a power-law graph a degree-10⁶ hub
    * makes 10¹² rows in a single task ("the curse of the last reducer",
    * Suri & Vassilvitskii WWW'11). The enumeration itself is inherent
    * (distance-2 readouts need all wedges); the single-reducer pile-up
    * is not. For mid-vertices with degree > `cap`, the left leg salts
    * by `hash(endpoint) % buckets` and the right leg replicates into
    * all `buckets` salts, so the join key becomes (m, salt) and the
    * hub's deg² work spreads over `buckets` reducers; each (u,w) pair
    * still joins exactly once (at salt hash(u)%buckets), so the output
    * multiset is IDENTICAL to the unsalted join — results stay
    * hash-exact, only the shuffle layout changes. Non-hub rows carry
    * salt 0 and are not replicated: the guard costs nothing when no
    * hub exists (the fixture near-dup graph), and `buckets`× right-leg
    * replication only on hub adjacency when one does.
    *
    * `adj` must have columns (m, e): mid-vertex and endpoint. Returns
    * (m, u, w) = every ordered endpoint pair per mid-vertex; callers
    * apply their own u<w / u≠w / closing filters downstream, exactly
    * as with the plain self-join. `cap` defaults to √(2|adj|) (hub ⇔
    * degree above the Σdeg²-balancing point), floor 64 so tiny graphs
    * never salt. */
  def hubSaltedWedges(s: SparkSession, adj: DataFrame, nAdj: Long,
                      buckets: Int = 8, cap0: Long = 0L): DataFrame = {
    val cap = if (cap0 > 0) cap0
              else math.max(64L, math.ceil(math.sqrt(2.0 * math.max(nAdj, 1L))).toLong)
    val hubs = adj.groupBy(col("m")).agg(count(lit(1)).as("_dm"))
      .where(col("_dm") > cap)
      .select(col("m"), lit(1).as("_hub"))
    // ≤ nAdj/cap rows by construction — always broadcastable relative
    // to the adjacency it came from, but gate anyway (loop-frame rule)
    def withHub(df: DataFrame): DataFrame =
      df.join(gatedBroadcast(s, hubs, nAdj / math.max(cap, 1L) + 1L),
              Seq("m"), "left")
    // Explicit REPARTITION_BY_NUM on both legs (round 14): AQE's
    // input-size coalescing sees only the small adjacency exchanges and
    // collapsed the wedge join to ~5 tasks at sf0.1 (event-log stage
    // evidence: the 31M-row deg² blow-up ran on 5 of 32 cores, 4.9 s of
    // q_graph_linkpred's 7.1 s) — it cannot know the join output is
    // deg(m)² per mid-vertex. Same rationale as the banded-join
    // exchanges in TextDedup; width follows the session conf.
    val wedgeParts =
      2 * s.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val left = withHub(adj)
      .withColumn("_wsalt",
        when(col("_hub").isNotNull, pmod(hash(col("e")), lit(buckets)))
          .otherwise(lit(0)))
      .select(col("m"), col("e").as("u"), col("_wsalt"))
      .repartition(wedgeParts, col("m"), col("_wsalt"))
    val right = withHub(adj)
      .withColumn("_salts",
        when(col("_hub").isNotNull,
             sequence(lit(0), lit(buckets - 1)))
          .otherwise(array(lit(0))))
      .select(col("m"), col("e").as("w"), explode(col("_salts")).as("_wsalt"))
      .repartition(wedgeParts, col("m"), col("_wsalt"))
    left.join(right, Seq("m", "_wsalt"))
      .select(col("m"), col("u"), col("w"))
  }

  /** Scratch root for the sink-op round-trips (write + read-back inside
    * one query). On tmpfs (/dev/shm) when the host has one: the three
    * chronic bench-gate flags (q_source_binaryfile, q_sink_zorder —
    * both rewrite their dirs every run) tracked the BOX's page-cache /
    * ext4 journal state, not the query, and two rounds of "probably
    * environment" is two too many. tmpfs removes the disk from the
    * measurement entirely; semantics are unchanged (the committer
    * protocol, partition layout, and footer reads are identical on any
    * POSIX fs). Overridable via GRAFT_SCRATCH for an explicit-disk
    * run; falls back to /tmp when no tmpfs exists. */
  lazy val scratchRoot: String = {
    val shm = new java.io.File("/dev/shm")
    sys.env.getOrElse("GRAFT_SCRATCH",
      if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_sink"
      else "/tmp/graft_sink")
  }
  def sinkDir(sub: String): String = s"$scratchRoot/$sub"

  /** Per-sf scratch dir: a fixed shared path lets two JVMs running at
    * DIFFERENT scale factors (a sweep + the test suite) interleave
    * overwrite-writes and read each other's half-written layouts — the
    * exact race the round-7 sf1 sweep hit on docs_evolving. Same
    * suffix discipline as qScanDpp / the qSinkTimetravel fix. */
  def sinkDir(sub: String, sf: String): String =
    s"$scratchRoot/${sub}_" + sf.replaceAll("[^a-zA-Z0-9.]", "_")

  /** Drop session-keyed cache entries whose SparkSession has stopped —
    * the shared eviction rule for every (SparkSession, sfDir)-keyed
    * derive-once cache (token counts, pair graph, PQ model, …).
    * Without it a stopped session's DataFrames are retained for the
    * process lifetime; ClusterProof deliberately runs two sessions per
    * JVM and hit exactly that (round-7 ADVICE). Called at each cache
    * accessor: eviction cost is O(entries), entries are O(sessions ×
    * sfs) — single digits. */
  def purged[V](m: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V])
      : java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V] = {
    m.keySet.removeIf(k => k._1.sparkContext.isStopped)
    m
  }

  /** Sweep scratch dirs named `<prefix>_p<pid>_*` whose owning JVM is
    * gone (no /proc/<pid> on this Linux-only box), plus legacy
    * random-suffix `<prefix>*` dirs from the pre-pid naming. Keeps the
    * RAM-backed (/dev/shm) scratch bounded across bench/verify sweeps
    * — the round-7 ADVICE leak — without racing live concurrent JVMs,
    * which always own a dir keyed by their (live) pid. */
  def sweepDeadPidDirs(root: java.io.File, prefix: String): Unit = {
    val pidPat = (java.util.regex.Pattern.quote(prefix) + "_p(\\d+)_.*").r
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .foreach { d =>
        val dead = d.getName match {
          case pidPat(pid) => !new java.io.File(s"/proc/$pid").exists()
          // Legacy random-suffix dirs carry no pid, so liveness is
          // unknowable — age-gate them (round-8 ADVICE): a concurrent
          // JVM built from an older revision may be mid-query in a
          // fresh one, but nothing legitimately holds scratch for
          // hours.
          case _ => System.currentTimeMillis() - d.lastModified() > 3L * 3600 * 1000
        }
        if (dead) deleteRecursive(d)
      }
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursive)
    f.delete(): Unit
  }

  /** Deterministic hex bucket of an id — the shared basis for every
    * hash-sampling / split / generation-membership op (q_sample_hash,
    * q_sample_split, q_pipeline_curate, q_scan_merge_schema,
    * q_text_contamination). One definition so a threshold tune can
    * never silently diverge between a standalone op and a composite
    * that claims to reuse it. */
  def md5Bucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1)

  /** The 12/2/2 train/val/test assignment (buckets ≤ b / ≤ d / rest). */
  def trainValTest(id: Column): Column =
    when(md5Bucket(id) <= "b", "train")
      .when(md5Bucket(id) <= "d", "val")
      .otherwise("test")

  /** Exact integer floor-division of two non-negative LONG columns —
    * spelled (a − a mod b)/b so the IEEE division is always exact (the
    * numerator is divisible by b and quotients stay < 2^53): keeps the
    * ALL-INTEGER ops off `expr` strings when the operands are computed
    * columns rather than named fields. Callers guarantee b > 0. */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** NTILE(k) bucket from an exact 1-based global rank over n rows —
    * the ANSI rule (bucket size ⌊n/k⌋, the first n mod k buckets take
    * one extra): closed-form and map-side, so the decile/quintile ops
    * need a RANK (see [[rankedByRange]]) but never an ordered ntile
    * window over the data-sized frame. Matches Spark's and DuckDB's
    * NTILE bit-for-bit: with cut = (⌊n/k⌋+1)·(n mod k) ranks ≤ cut sit
    * in the big buckets, the rest in the small ones. */
  def ntileFromRank(r: Column, n: Column, k: Int): Column = {
    val kk = lit(k.toLong)
    val base = idiv(n, kk)
    val rem = pmod(n, kk)
    val cut = (base + lit(1L)) * rem
    when(r <= cut, idiv(r + base, base + lit(1L)))
      .otherwise(rem + idiv(r - cut + base - lit(1L), greatest(base, lit(1L))))
  }

  /** Exact 1-based GLOBAL rank (+ optional inclusive running sums of
    * LONG columns) over a total order — the scale-safe replacement for
    * an unpartitioned `Window.orderBy(keys)` row_number / running sum,
    * which Spark executes as ONE task holding the entire frame (the
    * "WindowExec: No Partition Defined" warning). Correct-but-deadly
    * once the frame is data-sized: per-user / per-doc frames are
    * billions of rows in the LLM-pipeline genre this engine claims.
    *
    * Shape — the two-level prefix sum (q_pipeline_pack's trick) on a
    * SAMPLED range partitioning, so skewed, tie-heavy sort keys still
    * balance (a value-arithmetic bucket would put every x=1 user in
    * one bucket; RangePartitioner boundaries include the tiebreak
    * key):
    *   1. range-repartition on the sort keys and PIN the partitioning
    *      with [[serCheckpoint]] — boundaries are re-sampled per
    *      action, so without the pin the offsets job and the rank pass
    *      could disagree on pid membership (estRows picks reliable vs
    *      local checkpoint exactly like the graph loops);
    *   2. per-pid (count, Σ sum-col) — ≤ spark.sql.shuffle.partitions
    *      rows, CONSTANT-size, the one annotated driver collect — folds
    *      to exclusive pid offsets (pid order == key order under range
    *      partitioning);
    *   3. offsets broadcast back onto partition-LOCAL row_number /
    *      cumsum windows: global rank = pid offset + local rank,
    *      identical to the global window's output for any TOTAL order
    *      (callers append the table PK as tiebreak, exactly as the
    *      windows they replace did; keys must be name-based `col(..)`
    *      refs so they re-resolve after the checkpoint).
    *
    * Cost: one range shuffle + the checkpoint materialization + a
    * constant collect — vs a single task sorting the full frame. */
  def rankedByRange(df: DataFrame, keys: Seq[Column], rankCol: String,
                    estRows: Long,
                    sums: Seq[(String, String)] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val s = df.sparkSession
    val p = s.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val ranged = serCheckpoint(
      df.repartitionByRange(p, keys: _*)
        .withColumn("__pid", spark_partition_id()),
      estRows)
    val aggs = count(lit(1)).as("__cnt") +:
      sums.map { case (c, _) => sum(col(c)).as(s"__sum_$c") }
    // ≤ p rows by construction — constant-size driver collect
    val perPid = ranged.groupBy(col("__pid"))
      .agg(aggs.head, aggs.drop(1): _*)
      .collect()
      .sortBy(_.getInt(0))
    var off = 0L
    val sumOffs = Array.fill(sums.length)(0L)
    val offRows = perPid.map { r =>
      // Seq[Any], NOT Seq(...): bare Seq(Int, Long) unifies to
      // Seq[Long] and silently widens the pid — breaking the
      // IntegerType field under the LocalRelation
      val out = org.apache.spark.sql.Row.fromSeq(
        Seq[Any](r.getInt(0), off) ++ sumOffs.toSeq)
      off += r.getLong(1)
      sums.indices.foreach(i => sumOffs(i) += r.getLong(2 + i))
      out
    }
    val schema = StructType(
      StructField("__pid", IntegerType) :: StructField("__off", LongType) ::
      sums.toList.map { case (c, _) => StructField(s"__soff_$c", LongType) })
    val offDf = s.createDataFrame(
      java.util.Arrays.asList(offRows: _*), schema)
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRank = ranged.join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") + row_number().over(w))
    sums.foldLeft(withRank) { case (d, (c, out)) =>
        d.withColumn(out, col(s"__soff_$c") + sum(col(c)).over(cum)) }
      .drop("__pid" +: "__off" +: sums.map { case (c, _) => s"__soff_$c" }: _*)
  }

  /** Gopher-style integer quality rules (word-count band, mean word
    * length via `10·Σlen vs bounds·wc`, distinct-token ratio) — ONE
    * definition shared by q_text_gopher and q_pipeline_curate, on
    * LOWERCASED tokens (q_text_gopher's contract; Σlen = n_chars −
    * (wc − 1) is case-invariant but the distinct count is not).
    * Returns (wordcount rule, word-length rule, repetition rule). */
  def gopherRules(text: Column, nChars: Column): (Column, Column, Column) = {
    val tk = split(lower(text), " ")
    val wc = size(tk)
    val sumLen = nChars - wc + 1
    val dk = size(array_distinct(tk))
    (wc.between(20, 90),
     sumLen * 10 >= wc * 38 && sumLen * 10 <= wc * 46,
     dk * 10 >= wc * 5)
  }
}
