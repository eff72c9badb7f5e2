package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-surface operators (SURVEY.md §2.11 round-3 extensions): the same
  * engine consumed through `spark.sql` — subquery decorrelation and
  * recursive CTEs are Catalyst capabilities a DataFrame chain never
  * exercises, and a user of the reference engine writes exactly these
  * shapes.
  *
  * Scale notes: Catalyst rewrites the uncorrelated scalar subquery to a
  * broadcast single-row side and DECORRELATES the correlated one into an
  * aggregate + join (no per-row re-execution — the naive nested-loop
  * interpretation would be O(n·groups)). The recursive CTE runs as
  * UnionLoop, one distributed batch per iteration, same loop shape as
  * `q_dedup_cluster`'s propagation.
  */
object SqlSurface {

  /** Uncorrelated scalar subquery: rows above the global mean, counted
    * per flag. The threshold is the exact decimal-sum average (§7.3(2))
    * so both engines compare against bit-identical doubles. */
  def qSqlScalarSubquery(s: SparkSession, sf: String): DataFrame = {
    Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT l_returnflag, COUNT(*) AS n_above
      FROM lineitem
      WHERE l_quantity > (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                                 / COUNT(*) FROM lineitem)
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** Correlated scalar subquery: customers above their own nation's
    * average balance — Catalyst decorrelates to one aggregate + join. */
  def qSqlCorrelated(s: SparkSession, sf: String): DataFrame = {
    Tables.customer(s, sf).createOrReplaceTempView("customer")
    s.sql("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey""")
  }

  /** Recursive CTE (Spark 4 UnionLoop): a recursive key spine from the
    * nation table's key range, joined back to the dimension — the
    * hierarchy/series recursion shape. Iterations are distributed
    * batches; depth is bounded by the anchor's MAX, far below
    * `spark.sql.cteRecursionLevelLimit`. */
  def qSqlRecursive(s: SparkSession, sf: String): DataFrame = {
    Tables.nation(s, sf).createOrReplaceTempView("nation")
    // Round 13 (§1.2 step 1 — don't recompute what a pass already knows):
    // written as `WHERE k < (SELECT MAX(n_nationkey) FROM nation)`, the
    // scalar subquery is re-planned and re-executed by EVERY UnionLoop
    // iteration — 25 extra aggregate jobs for one constant (measured
    // 6.0 s → 0.4 s warm at sf0.1, 14×). Hoist it once (constant-size
    // 1-row collect, the annotated house pattern) and bind through the
    // named-parameter surface; the recursion itself — the capability
    // this key declares — still runs every iteration as a distributed
    // batch, and the result set is identical.
    val maxK = Tables.nation(s, sf)
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("n_nationkey")))
      .head().getInt(0)
    s.sql("""
      WITH RECURSIVE nk(k) AS (
        SELECT CAST(MIN(n_nationkey) AS INT) FROM nation
        UNION ALL
        SELECT k + 1 FROM nk WHERE k < :maxk
      )
      SELECT nk.k, n.n_name
      FROM nk JOIN nation n ON n.n_nationkey = nk.k
      ORDER BY nk.k""", Map("maxk" -> maxK))
  }

  /** SQL hint surface — `/*+ BROADCAST(...) */` is how a SQL-only user
    * steers the join strategy (the DataFrame caller uses
    * `broadcast()`, `q_join_broadcast`). Plan-pinned to
    * BroadcastHashJoin in PlanShapeSpec: a hint the optimizer silently
    * dropped would be indistinguishable from one it honored. */
  def qSqlBroadcastHint(s: SparkSession, sf: String): DataFrame = {
    Tables.customer(s, sf).createOrReplaceTempView("customer")
    Tables.nation(s, sf).createOrReplaceTempView("nation")
    s.sql("""
      SELECT /*+ BROADCAST(n) */ n.n_name, COUNT(*) AS n_cust,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name ORDER BY n.n_name""")
  }

  /** Parameterized SQL (Spark 4 named-parameter binding) — the
    * injection-safe way a service layer templates user input into
    * queries: values bind as literals through the analyzer, never by
    * string concatenation. The oracle states the same query with the
    * values inlined — binding must be semantically invisible. */
  def qSqlParameterized(s: SparkSession, sf: String): DataFrame = {
    Tables.orders(s, sf).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_price
         FROM orders
         WHERE o_orderstatus = :status AND o_totalprice > :floor
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      Map("status" -> "O", "floor" -> 50000))
  }

  /** EXISTS / NOT EXISTS predicates — the SQL spelling of semi/anti
    * joins (`q_join_semi`/`q_join_anti` reach the same plans through
    * the DataFrame API): customers with an urgent order, and customers
    * with no orders at all, counted per nation. Catalyst rewrites both
    * subqueries to one semi and one anti join — no per-row
    * re-execution. */
  def qSqlExists(s: SparkSession, sf: String): DataFrame = {
    Tables.customer(s, sf).createOrReplaceTempView("customer")
    Tables.orders(s, sf).createOrReplaceTempView("orders")
    s.sql("""
      SELECT c_nationkey,
             COUNT(*) AS n_cust,
             COUNT(CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT') THEN 1 END) AS n_urgent,
             COUNT(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders o2
               WHERE o2.o_custkey = c.c_custkey) THEN 1 END) AS n_orderless
      FROM customer c
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
  }

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    * "top-2 orders per customer" idiom. Catalyst decorrelates the
    * lateral limit into a window (rank ≤ 2) over one partitioned pass,
    * NOT a per-customer re-execution — the same plan `q_topk_per_group`
    * builds explicitly, reached from the SQL surface. Tie-broken on
    * (o_totalprice DESC, o_orderkey) so the cut is deterministic. */
  def qSqlLateral(s: SparkSession, sf: String): DataFrame = {
    Tables.customer(s, sf).createOrReplaceTempView("customer")
    Tables.orders(s, sf).createOrReplaceTempView("orders")
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
      ORDER BY c.c_custkey, o.o_orderkey""")
  }

  /** `GROUP BY ALL` — the modern analytics-SQL convenience (every
    * non-aggregate select item becomes a grouping key; both engines
    * support it natively) resolving to the exact two-key hash
    * aggregate `q_agg_groupby` builds explicitly. The point of the
    * test: the resolver sugar must not change the plan — same
    * partial+final hash agg, same exchange. */
  def qSqlGroupbyAll(s: SparkSession, sf: String): DataFrame = {
    Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ALL
      ORDER BY l_returnflag, l_linestatus""")
  }

  /** `MERGE INTO` — the warehouse-upsert SQL statement itself (round-8
    * verdict missing #1; the MERGE *semantics* were already graded via
    * `q_upsert_snapshot` / `q_source_dsv2_write`, but Spark only PLANS
    * the statement against a table resolved through a V2 catalog whose
    * table supports row-level operations). The in-tree
    * [[graft.sources.GraftCatalog]] supplies both: the target is
    * created in the catalog, seeded with the orders snapshot through
    * the V2 append path, then ONE SQL MERGE applies an update batch
    * (every 97th order escalates — WHEN MATCHED) and an insert batch
    * (negative-keyed rows — WHEN NOT MATCHED). Catalyst rewrites to
    * the group-based plan: a full-outer MergeRows over the target scan
    * + source, published as ReplaceData through the store's
    * truncate+append commit (PlanShapeSpec pins both nodes).
    *
    * The oracle restates the statement as the full-outer-coalesce twin
    * — any row the MERGE plan loses, duplicates or mis-publishes
    * breaks the hash. At 100 TB the same statement against a real
    * lakehouse target plans the identical MergeRows shape with
    * per-file groups instead of the whole table. */
  def qSqlMergeInto(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    // per-(JVM, sf) target name: concurrent verify/bench/test JVMs
    // share nothing (the q_source_dsv2_write discipline)
    val tbl = s"merge_tgt_p${ProcessHandle.current().pid()}_" +
      sf.replaceAll("[^a-zA-Z0-9]", "_")
    val ident = s"graft.store.$tbl"
    s.sql(s"DROP TABLE IF EXISTS $ident")
    s.sql(s"CREATE TABLE $ident (okey BIGINT, status STRING, price DOUBLE)")
    val base = Tables.orders(s, sf)
    base.select(col("o_orderkey").as("okey"),
                col("o_orderstatus").as("status"),
                col("o_totalprice").as("price"))
      .writeTo(ident).append()
    base.where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("u_key"), lit("X").as("u_status"),
              (col("o_totalprice") * lit(1.1)).as("u_price"))
      .unionByName(
        // insert batch: keys strictly negative (orderkeys are ≥ 0, so
        // -k - 1 can never match a target row OR the update batch's
        // key 0) — WHEN NOT MATCHED fires for every one
        base.where(col("o_orderkey") % 103 === 0)
          .select((-col("o_orderkey") - 1).as("u_key"), lit("N").as("u_status"),
                  col("o_totalprice").as("u_price")))
      .createOrReplaceTempView("merge_updates")
    s.sql(s"""
      MERGE INTO $ident t
      USING merge_updates u
      ON t.okey = u.u_key
      WHEN MATCHED THEN UPDATE SET status = u.u_status, price = u.u_price
      WHEN NOT MATCHED THEN INSERT (okey, status, price)
        VALUES (u.u_key, u.u_status, u.u_price)""")
    s.sql(s"""
      SELECT status, COUNT(*) AS n_rows,
             CAST(SUM(CAST(price AS DECIMAL(28,4))) AS DOUBLE) AS total_price
      FROM $ident GROUP BY status ORDER BY status""")
  }

  /** `MERGE INTO` against the FILE-BACKED store (round-9 verdict ask
    * #7): the identical statement, catalog interfaces and
    * MergeRows + ReplaceData plan as [[qSqlMergeInto]], but the catalog
    * is registered with a `path` so the target table is the
    * [[graft.sources.FileStore]] backend — task writers STREAM the
    * post-merge image to data files and the commit channel carries only
    * file names, lifting the in-memory store's declared
    * driver-memory envelope: a merge target is now bounded by
    * executors + storage, the lakehouse posture (demonstrated at sf1 —
    * 1.5M-row target — in BASELINE.md round 10). Readers plan one
    * partition per live data file; publish is an atomic
    * manifest-pointer swap (the q_sink_timetravel discipline).
    * Oracle: the same full-outer-coalesce twin — the backend must not
    * change a single row. */
  def qSqlMergeFile(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.catalog.graftf", "graft.sources.GraftCatalog")
    // one shared root; concurrent verify/bench/test JVMs are isolated
    // by the pid-keyed TABLE name below, and a dead JVM's table is
    // re-created (DROP+CREATE) on the next run with the same pid
    s.conf.set("spark.sql.catalog.graftf.path", Util.sinkDir("storecat"))
    // dead JVMs leak their pid-keyed table dirs on tmpfs — sweep them
    // (the scratch-dir discipline; live pids are never touched)
    Util.sweepDeadPidDirs(new java.io.File(Util.sinkDir("storecat")), "store.mergef_tgt")
    val tbl = s"mergef_tgt_p${ProcessHandle.current().pid()}_" +
      sf.replaceAll("[^a-zA-Z0-9]", "_")
    val ident = s"graftf.store.$tbl"
    s.sql(s"DROP TABLE IF EXISTS $ident")
    s.sql(s"CREATE TABLE $ident (okey BIGINT, status STRING, price DOUBLE)")
    val base = Tables.orders(s, sf)
    base.select(col("o_orderkey").as("okey"),
                col("o_orderstatus").as("status"),
                col("o_totalprice").as("price"))
      .writeTo(ident).append()
    base.where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("u_key"), lit("X").as("u_status"),
              (col("o_totalprice") * lit(1.1)).as("u_price"))
      .unionByName(
        base.where(col("o_orderkey") % 103 === 0)
          .select((-col("o_orderkey") - 1).as("u_key"), lit("N").as("u_status"),
                  col("o_totalprice").as("u_price")))
      .createOrReplaceTempView("mergef_updates")
    s.sql(s"""
      MERGE INTO $ident t
      USING mergef_updates u
      ON t.okey = u.u_key
      WHEN MATCHED THEN UPDATE SET status = u.u_status, price = u.u_price
      WHEN NOT MATCHED THEN INSERT (okey, status, price)
        VALUES (u.u_key, u.u_status, u.u_price)""")
    s.sql(s"""
      SELECT status, COUNT(*) AS n_rows,
             CAST(SUM(CAST(price AS DECIMAL(28,4))) AS DOUBLE) AS total_price
      FROM $ident GROUP BY status ORDER BY status""")
  }

  /** SQL `UNPIVOT` clause — the wide→long resolver sugar
    * (`q_agg_unpivot` reaches the same Expand through the DataFrame
    * API): three measure columns melt to (metric, val) rows, then a
    * two-key hash aggregate with the decimal-exact sum. The Expand
    * triples the row count BEFORE the partial aggregate absorbs it
    * map-side — at scale the shuffle still carries only
    * |groups|×|metrics| rows. */
  def qSqlUnpivot(s: SparkSession, sf: String): DataFrame = {
    Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT l_returnflag, metric, COUNT(*) AS n,
             CAST(SUM(CAST(val AS DECIMAL(28,4))) AS DOUBLE) AS total
      FROM lineitem
      UNPIVOT (val FOR metric IN (
        l_quantity AS qty, l_extendedprice AS price, l_discount AS disc))
      GROUP BY l_returnflag, metric
      ORDER BY l_returnflag, metric""")
  }

  /** SQL named-`WINDOW` clause (round 10) — one window definition
    * shared by several window functions (`ROW_NUMBER` + `LAG` here),
    * resolved by the analyzer's WindowsSubstitution: the surface a SQL
    * user writes when a query layers functions over one ordering.
    * Plans to a SINGLE Window operator over one (l_orderkey) exchange —
    * naming the window is what lets the planner share the sort. The
    * per-order window results fold to a 3-row per-flag aggregate, so
    * output is constant at any scale; decimal-exact delta sum per
    * §7.3(2). */
  def qSqlNamedWindow(s: SparkSession, sf: String): DataFrame = {
    Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(delta AS DECIMAL(28,4))) AS DOUBLE) AS sum_delta,
        CAST(MAX(rn) AS BIGINT) AS max_lines
      FROM (
        SELECT l_returnflag,
          ROW_NUMBER() OVER w AS rn,
          l_quantity - LAG(l_quantity, 1, 0.0) OVER w AS delta
        FROM lineitem
        -- (orderkey, linenumber) is NOT unique in the fixture — the
        -- ordering must be TOTAL or LAG is engine-nondeterministic
        WINDOW w AS (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice))
      GROUP BY l_returnflag
      ORDER BY l_returnflag ASC NULLS FIRST""")
  }

  /** SQL pipe syntax (round 10) — Spark 4's `|>` operator chain
    * (SQL:2023-style composable query flow): FROM → WHERE → EXTEND →
    * AGGREGATE ... GROUP BY → ORDER BY, each stage consuming the
    * previous stage's output by position. Exercises the parser/analyzer
    * surface only: the plan Catalyst produces is IDENTICAL to the
    * equivalent nested SELECT (filter pushed to the scan, partial+final
    * hash agg, one exchange on the group key), so the at-scale posture
    * is exactly `q_agg_groupby`'s. Decimal-exact sum per §7.3(2). */
  def qSqlPipe(s: SparkSession, sf: String): DataFrame = {
    Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
    s.sql("""
      FROM lineitem
      |> WHERE l_quantity > 10
      |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
      |> AGGREGATE COUNT(*) AS n,
           CAST(SUM(CAST(disc_price AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc
         GROUP BY l_returnflag
      |> ORDER BY l_returnflag ASC NULLS FIRST""")
  }
}
