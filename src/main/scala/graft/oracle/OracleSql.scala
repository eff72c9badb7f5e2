package graft.oracle

/** DuckDB oracle SQL, one val per q_* key (SURVEY.md §2 / §7.3).
  *
  * Discipline shared with the Spark side:
  *  - money sums:   CAST(SUM(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)
  *  - averages:     decimal-sum→double / COUNT(*)
  *  - every query ends in a total ORDER BY over a provably unique key
  *    set with explicit NULLS FIRST/LAST (Spark and DuckDB defaults
  *    differ), and every computed column is aliased identically on both
  *    sides (the driver sorts columns by name before hashing).
  */
object OracleSql {

  val qAggGroupby: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
      .stripMargin.replaceAll("\\s+", " ").trim
}
