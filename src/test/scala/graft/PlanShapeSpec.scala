package graft

import graft.ops._

/** §5.2(5) physical-plan pins: the scale claims in the operator Scaladoc
  * are enforced here — a regression that silently flips a broadcast join
  * to a nested loop (or drops pushdown) fails the suite, not just the
  * benchmark. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_join_broadcast uses BroadcastHashJoin") {
    assert(plan(Joins.qJoinBroadcast(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("q_join_sortmerge pins SortMergeJoin") {
    assert(plan(Joins.qJoinSortmerge(spark, sf)).contains("SortMergeJoin"))
  }

  test("q_topk_global uses TakeOrderedAndProject (no global sort)") {
    assert(plan(Relational.qTopkGlobal(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("q_scan_pushdown pushes predicates into the parquet scan") {
    val p = plan(Relational.qScanPushdown(spark, sf))
    assert(p.contains("PushedFilters: [") && p.contains("LessThan"),
           s"no pushed filters in:\n$p")
  }

  test("q_scan_parquet prunes to the projected columns") {
    val p = plan(Relational.qScanParquet(spark, sf))
    assert(p.contains("ReadSchema") && !p.contains("l_shipdate"),
           "scan reads columns beyond the projection")
  }

  test("q_join_theta_range avoids nested-loop join (bucket equi-join)") {
    val p = plan(Joins.qJoinThetaRange(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"range join planned as nested loop:\n$p")
  }

  test("a_dedup_minhash is a banding equi-join, not all-pairs") {
    val p = plan(TextDedup.aDedupMinhash(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"LSH join planned as nested loop:\n$p")
  }

  test("q_agg_groupby is a two-phase hash aggregate") {
    val p = plan(Aggregates.qAggGroupby(spark, sf))
    assert(p.contains("HashAggregate"))
  }
}
