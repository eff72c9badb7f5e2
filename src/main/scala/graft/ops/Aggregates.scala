package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Util._

/** SURVEY.md §2.4 — aggregation operators. */
object Aggregates {

  /** Flagship: TPC-H Q1-shaped pricing summary. Partial+final hash
    * aggregation over 2 low-cardinality keys — at 100TB this is a
    * map-side-combine-friendly plan with a tiny shuffle. */
  def qAggGroupby(s: SparkSession, sf: String): DataFrame = {
    val l = Tables.lineitem(s, sf)
    l.where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }
}
