package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.qAggGroupby(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregations
    "q_agg_groupby" -> (Aggregates.qAggGroupby _),
    "q_agg_global" -> (Aggregates.qAggGlobal _),
    "q_agg_distinct" -> (Aggregates.qAggDistinct _),
    "q_agg_multidistinct" -> (Aggregates.qAggMultidistinct _),
    "q_agg_having" -> (Aggregates.qAggHaving _),
    "q_agg_stats" -> (Aggregates.qAggStats _),
    "q_agg_argmax" -> (Aggregates.qAggArgmax _),
    "q_agg_collect_sorted" -> (Aggregates.qAggCollectSorted _),
    "q_agg_rollup" -> (Aggregates.qAggRollup _),
    "q_agg_cube" -> (Aggregates.qAggCube _),
    "q_agg_grouping_sets" -> (Aggregates.qAggGroupingSets _),
    "a_agg_approx_distinct" -> (Aggregates.aAggApproxDistinct _),
    "a_agg_percentile_approx" -> (Aggregates.aAggPercentileApprox _),
    "q_agg_percentile_exact" -> (Aggregates.qAggPercentileExact _),
    // §2.5 windows
    "q_win_rownumber" -> (Windows.qWinRownumber _),
    "q_win_rank" -> (Windows.qWinRank _),
    "q_win_lag_delta" -> (Windows.qWinLagDelta _),
    "q_win_moving_avg" -> (Windows.qWinMovingAvg _),
    "q_win_range_frame" -> (Windows.qWinRangeFrame _),
    "q_win_ntile_cume" -> (Windows.qWinNtileCume _),
    "q_win_first_last" -> (Windows.qWinFirstLast _),
    // §2.1 scans / sources / sinks
    "q_scan_parquet" -> (Relational.qScanParquet _),
    "q_scan_pushdown" -> (Relational.qScanPushdown _),
    "q_scan_json_col" -> (Relational.qScanJsonCol _),
    "q_sink_parquet" -> (Relational.qSinkParquet _),
    // §2.2 projection / filter
    "q_project_expr" -> (Relational.qProjectExpr _),
    "q_filter_conj" -> (Relational.qFilterConj _),
    "q_filter_in" -> (Relational.qFilterIn _),
    "q_filter_like" -> (Relational.qFilterLike _),
    "q_filter_between" -> (Relational.qFilterBetween _),
    "q_filter_null_semantics" -> (Relational.qFilterNullSemantics _),
    // §2.3 joins
    "q_join_broadcast" -> (Joins.qJoinBroadcast _),
    "q_join_sortmerge" -> (Joins.qJoinSortmerge _),
    "q_join_left_outer" -> (Joins.qJoinLeftOuter _),
    "q_join_full_outer" -> (Joins.qJoinFullOuter _),
    "q_join_semi" -> (Joins.qJoinSemi _),
    "q_join_anti" -> (Joins.qJoinAnti _),
    "q_join_theta_range" -> (Joins.qJoinThetaRange _),
    "q_join_asof" -> (Joins.qJoinAsof _),
    "q_join_cross" -> (Joins.qJoinCross _),
    // §2.8 scalar functions
    "q_fn_string" -> (Scalars.qFnString _),
    "q_fn_date" -> (Scalars.qFnDate _),
    "q_fn_math" -> (Scalars.qFnMath _),
    "q_fn_conditional" -> (Scalars.qFnConditional _),
    "q_fn_cast" -> (Scalars.qFnCast _),
    "q_fn_array" -> (Scalars.qFnArray _),
    "q_fn_array_hof" -> (Scalars.qFnArrayHof _),
    "q_fn_map" -> (Scalars.qFnMap _),
    "q_fn_json" -> (Scalars.qFnJson _),
    // §2.9 time-series composites
    "q_ts_tumbling" -> (TimeSeries.qTsTumbling _),
    "q_ts_downsample_ohlc" -> (TimeSeries.qTsDownsampleOhlc _),
    "q_ts_rate" -> (TimeSeries.qTsRate _),
    "q_ts_gapfill" -> (TimeSeries.qTsGapfill _),
    "q_ts_sessionize" -> (TimeSeries.qTsSessionize _),
    "q_ts_retention" -> (TimeSeries.qTsRetention _),
    // §2.6 sort / top-k
    "q_sort_multi" -> (Relational.qSortMulti _),
    "q_topk_global" -> (Relational.qTopkGlobal _),
    "q_topk_per_group" -> (Relational.qTopkPerGroup _),
    // §2.7 set operations
    "q_union_all" -> (Relational.qUnionAll _),
    "q_union_distinct" -> (Relational.qUnionDistinct _),
    "q_intersect" -> (Relational.qIntersect _),
    "q_except" -> (Relational.qExcept _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_agg_groupby" -> OracleSql.qAggGroupby,
    "q_agg_global" -> OracleSql.qAggGlobal,
    "q_agg_distinct" -> OracleSql.qAggDistinct,
    "q_agg_multidistinct" -> OracleSql.qAggMultidistinct,
    "q_agg_having" -> OracleSql.qAggHaving,
    "q_agg_stats" -> OracleSql.qAggStats,
    "q_agg_argmax" -> OracleSql.qAggArgmax,
    "q_agg_collect_sorted" -> OracleSql.qAggCollectSorted,
    "q_agg_rollup" -> OracleSql.qAggRollup,
    "q_agg_cube" -> OracleSql.qAggCube,
    "q_agg_grouping_sets" -> OracleSql.qAggGroupingSets,
    "q_agg_percentile_exact" -> OracleSql.qAggPercentileExact,
    "q_win_rownumber" -> OracleSql.qWinRownumber,
    "q_win_rank" -> OracleSql.qWinRank,
    "q_win_lag_delta" -> OracleSql.qWinLagDelta,
    "q_win_moving_avg" -> OracleSql.qWinMovingAvg,
    "q_win_range_frame" -> OracleSql.qWinRangeFrame,
    "q_win_ntile_cume" -> OracleSql.qWinNtileCume,
    "q_win_first_last" -> OracleSql.qWinFirstLast,
    "q_scan_parquet" -> OracleSql.qScanParquet,
    "q_scan_pushdown" -> OracleSql.qScanPushdown,
    "q_scan_json_col" -> OracleSql.qScanJsonCol,
    "q_sink_parquet" -> OracleSql.qSinkParquet,
    "q_project_expr" -> OracleSql.qProjectExpr,
    "q_filter_conj" -> OracleSql.qFilterConj,
    "q_filter_in" -> OracleSql.qFilterIn,
    "q_filter_like" -> OracleSql.qFilterLike,
    "q_filter_between" -> OracleSql.qFilterBetween,
    "q_filter_null_semantics" -> OracleSql.qFilterNullSemantics,
    "q_join_broadcast" -> OracleSql.qJoinBroadcast,
    "q_join_sortmerge" -> OracleSql.qJoinSortmerge,
    "q_join_left_outer" -> OracleSql.qJoinLeftOuter,
    "q_join_full_outer" -> OracleSql.qJoinFullOuter,
    "q_join_semi" -> OracleSql.qJoinSemi,
    "q_join_anti" -> OracleSql.qJoinAnti,
    "q_join_theta_range" -> OracleSql.qJoinThetaRange,
    "q_join_asof" -> OracleSql.qJoinAsof,
    "q_join_cross" -> OracleSql.qJoinCross,
    "q_fn_string" -> OracleSql.qFnString,
    "q_fn_date" -> OracleSql.qFnDate,
    "q_fn_math" -> OracleSql.qFnMath,
    "q_fn_conditional" -> OracleSql.qFnConditional,
    "q_fn_cast" -> OracleSql.qFnCast,
    "q_fn_array" -> OracleSql.qFnArray,
    "q_fn_array_hof" -> OracleSql.qFnArrayHof,
    "q_fn_map" -> OracleSql.qFnMap,
    "q_fn_json" -> OracleSql.qFnJson,
    "q_ts_tumbling" -> OracleSql.qTsTumbling,
    "q_ts_downsample_ohlc" -> OracleSql.qTsDownsampleOhlc,
    "q_ts_rate" -> OracleSql.qTsRate,
    "q_ts_gapfill" -> OracleSql.qTsGapfill,
    "q_ts_sessionize" -> OracleSql.qTsSessionize,
    "q_ts_retention" -> OracleSql.qTsRetention,
    "q_sort_multi" -> OracleSql.qSortMulti,
    "q_topk_global" -> OracleSql.qTopkGlobal,
    "q_topk_per_group" -> OracleSql.qTopkPerGroup,
    "q_union_all" -> OracleSql.qUnionAll,
    "q_union_distinct" -> OracleSql.qUnionDistinct,
    "q_intersect" -> OracleSql.qIntersect,
    "q_except" -> OracleSql.qExcept,
  )
}
