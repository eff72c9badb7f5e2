package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Util._

/** SURVEY.md §2.5 — window functions.
  *
  * Scale notes (100 TB): each window is one shuffle on its partition key
  * followed by an in-partition sort; no cross-partition state. Frames
  * that sum doubles use decimal-cast sums so results are independent of
  * internal accumulation order (DuckDB's segment-tree sliding windows vs
  * Spark's running frames would otherwise diverge in the last ulps).
  */
object Windows {

  private def byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  /** First 3 orders per customer by date. */
  def qWinRownumber(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey", "rn")
  }

  /** rank/dense_rank over part prices per brand — rank value depends only
    * on the price, so ties are deterministic; output keyed by p_partkey. */
  def qWinRank(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"))
    Tables.part(s, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
              rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy("p_partkey")
  }

  /** Cumulative per-user running total — the inverse of q_win_lag_delta
    * (counter reconstruction from samples): unbounded-preceding window
    * sum on the decimal path, so the running value is exact at every
    * row on both engines. */
  def qWinCumsum(s: SparkSession, sf: String): DataFrame = {
    val w = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, sf)
      .select(col("event_id"), col("user_id"),
              sum(col("value").cast(D)).over(w).cast("double").as("running_total"))
      .orderBy("event_id")
  }

  /** percent_rank: (rank−1)/(n−1) from pure integers — deterministic
    * doubles on both engines; ties resolve by value so row order never
    * matters. Completes the ranking-function family (row_number / rank
    * / dense_rank / ntile / cume_dist elsewhere). */
  def qWinPercentRank(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"))
    Tables.part(s, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
              percent_rank().over(w).as("pr"))
      .orderBy("p_partkey")
  }

  /** Telemetry core: per-user counter delta (cumulative → per-interval). */
  def qWinLagDelta(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .select(col("event_id"), col("user_id"),
              (col("value") - lag(col("value"), 1).over(byUser)).as("delta"))
      .orderBy("event_id")

  /** Trailing 5-row moving average per user: exact decimal sum / count. */
  def qWinMovingAvg(s: SparkSession, sf: String): DataFrame = {
    val w = byUser.rowsBetween(-4, 0)
    Tables.events(s, sf)
      .select(col("event_id"), col("user_id"),
              (sum(col("value").cast(D)).over(w).cast("double") /
               count(lit(1)).over(w)).as("ma5"))
      .orderBy("event_id")
  }

  /** Trailing 1-hour RANGE frame on epoch seconds per user. */
  def qWinRangeFrame(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("epoch_s"))
      .rangeBetween(-3600, 0)
    Tables.events(s, sf)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"),
              sum(col("value").cast(D)).over(w).cast("double").as("trailing_sum"))
      .orderBy("event_id")
  }

  /** ntile(4) + cume_dist over order totals per priority class; the
    * (price, key) ordering is unique so peer groups are singletons and
    * both functions are deterministic. */
  def qWinNtileCume(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
              ntile(4).over(w).as("nt"), cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  /** first_value/last_value with an explicit full-partition frame. */
  def qWinFirstLast(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, sf)
      .select(col("o_orderkey"), col("o_custkey"),
              first(col("o_totalprice")).over(w).as("first_price"),
              last(col("o_totalprice")).over(w).as("last_price"))
      .orderBy("o_orderkey")
  }

  /** Gaps-and-islands: longest consecutive-active-day streak per user
    * (the retention/engagement "streak" metric). The classic trick:
    * within a user's DISTINCT active days, `day − (dense-rank in
    * days) · 1d` is constant exactly across consecutive runs — group
    * by that island key and take the max length. ALL-INTEGER (epoch
    * days), one (user) shuffle reused by the window and both aggs. */
  def qWinStreak(s: SparkSession, sf: String): DataFrame = {
    val days = Tables.events(s, sf)
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"))
      .distinct()
    val rk = row_number().over(
      Window.partitionBy(col("user_id")).orderBy(col("day")))
    days.withColumn("island", col("day") - rk)
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** SMA crossover detection per event_type — the golden-cross /
    * death-cross signal every monitoring dashboard (and every trading
    * chart) derives from two moving averages: count the transitions
    * where the fast SMA(5) crosses above (golden) or below (death) the
    * slow SMA(20). Hash-exact without a single division: SMA5 > SMA20
    * ⟺ 4·Σ₅ > Σ₂₀ by cross-multiplication on 1e-2 fixed-point
    * integer sums, so the flag — and therefore every counted crossing
    * — is pure BIGINT arithmetic. Both frames and the transition lag
    * share ONE (event_type) window shuffle; rows before the slow
    * frame fills (rn < 20) are excluded on both engines, and the lag
    * runs over that same filtered set. */
  def qWinSmaCrossover(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val filled = Tables.events(s, sf)
      .withColumn("xfp", floor(col("value") * lit(100) + lit(0.5)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("s5", sum(col("xfp")).over(w.rowsBetween(-4, 0)))
      .withColumn("s20", sum(col("xfp")).over(w.rowsBetween(-19, 0)))
      .where(col("rn") >= 20)
      .withColumn("above", (col("s5") * 4 > col("s20")).cast("long"))
    filled
      .withColumn("prev", lag(col("above"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("above") === 1 && col("prev") === 0, 1L)
             .otherwise(0L)).as("golden_crosses"),
           sum(when(col("above") === 0 && col("prev") === 1, 1L)
             .otherwise(0L)).as("death_crosses"))
      .orderBy("event_type")
  }

  /** Rolling 14-day Pearson correlation between the click and view
    * daily-count series — "do these two metrics move together, and
    * when did they decouple": the co-movement diagnostic behind every
    * "metric A broke away from metric B" alert. Exact-moment
    * discipline: the five frame moments (Σx, Σy, Σx², Σy², Σxy) are
    * BIGINT window sums of integer daily counts, r is ONE closed-form
    * double over exactly-known integers (n·Σxy−ΣxΣy over the √ of the
    * two variance terms, identical operation order both engines),
    * rounded at 6dp; zero-variance frames yield NULL via the same
    * guarded CASE on both sides. The series frame is days-sized, so
    * the single unpartitioned window runs on a constant-bounded frame
    * (types×days), not data-sized rows. */
  def qWinRollingCorr(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val x = daily.where(col("event_type") === "click")
      .select(col("day"), col("n").as("x"))
    val y = daily.where(col("event_type") === "view")
      .select(col("day"), col("n").as("y"))
    val wr = Window.orderBy(col("day"))
    val w = wr.rowsBetween(-13, 0)
    x.join(y, "day")
      .withColumn("rn", row_number().over(wr))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .where(col("rn") >= 14)
      .withColumn("corr14", expr(
        """CASE WHEN (14 * sxx - sx * sx) > 0 AND (14 * syy - sy * sy) > 0
                THEN round(CAST(14 * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(14 * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(14 * syy - sy * sy AS DOUBLE))), 6)
                ELSE NULL END"""))
      .select(col("day"), col("x"), col("y"), col("corr14"))
      .orderBy("day")
  }

  /** Bollinger-band breakout flags over the per-type daily metric-sum
    * series — "which days sit more than 2 rolling sigmas off their own
    * 14-day mean", the volatility-banded cousin of `q_win_moving_avg`.
    * ALL-INTEGER: daily x = Σ floor(value+0.5) (exact BIGINT), frame
    * moments S = Σx and Q = Σx² are BIGINT window sums, and the band
    * test |x − S/n| > 2·σ is cross-multiplied by n² into
    * (n·x − S)² > 4·(n·Q − S²) with both squares in 38-digit decimal
    * (BIGINT² would overflow at ~sf10 daily sums) — zero floats
    * anywhere. Per-type windows partition; the frame is the
    * calendar-bounded daily series, not data-sized rows. */
  def qWinBollinger(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(expr("CAST(floor(value + 0.5) AS BIGINT)")).as("x"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w = wr.rowsBetween(-13, 0)
    daily
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("q", sum(col("x") * col("x")).over(w))
      .where(col("rn") >= 14)
      .withColumn("breakout", expr(
        """CAST(n * x - s AS DECIMAL(38,0)) * (n * x - s)
           > 4 * (CAST(n AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s)"""))
      .select(col("event_type"), col("day"), col("x"),
              col("s"), col("q"), col("breakout"))
      .orderBy("event_type", "day")
  }

  /** Cutler's RSI (14-period, SMA variant) over the per-type daily
    * metric-sum series — the momentum oscillator flagging overbought
    * (>70) / oversold (<30) regimes; on telemetry it reads as "is this
    * metric in a sustained climb or slump relative to its own recent
    * churn". The SMA variant is chosen over Wilder's EWMA deliberately:
    * it is frame-expressible (two conditional window sums over the
    * lag-delta series), where the EWMA recursion would force a
    * sequential fold. ALL-INTEGER: daily x and its lag deltas are exact
    * BIGINTs, gain/loss are conditional BIGINT frame sums, and
    * RSI = 100·gain/(gain+loss) lands as a 1e4 fixed-point integer
    * `div` (flat frames — gain+loss=0 — pin to the 5000 midpoint, the
    * standard convention). Per-type windows partition; frames span the
    * calendar-bounded daily series. */
  def qWinRsi(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(expr("CAST(floor(value + 0.5) AS BIGINT)")).as("x"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wd = wr.rowsBetween(-13, 0)
    daily
      .withColumn("d", col("x") - lag(col("x"), 1).over(wr))
      .withColumn("rn", row_number().over(wr))
      .withColumn("gain",
        sum(when(col("d") > 0, col("d")).otherwise(lit(0L))).over(wd))
      .withColumn("loss",
        sum(when(col("d") < 0, -col("d")).otherwise(lit(0L))).over(wd))
      .where(col("rn") >= 15)
      .withColumn("rsi_fp",
        when(col("gain") + col("loss") > 0,
             expr("(10000 * gain) div (gain + loss)"))
          .otherwise(lit(5000L)))
      .select(col("event_type"), col("day"), col("x"),
              col("gain"), col("loss"), col("rsi_fp"))
      .orderBy("event_type", "day")
  }

  /** 14-day rolling OLS slope of the per-type daily series — the
    * local-trend readout ("how fast is this metric moving RIGHT NOW")
    * that complements the global fits (`q_ts_forecast_linreg` one
    * line; `q_ts_theil_sen` one robust slope): slope over the frame's
    * (day, x) points, every frame moment an exact integer window sum
    * (Σt·x in DECIMAL(38,0) — epoch-day × a 1e9-scale daily count
    * overflows BIGINT at ~sf100), one mirrored double division per
    * row rounded 6dp, NULL-pinned on a degenerate frame (all one
    * day — impossible here, but the guard mirrors cross-engine).
    * Per-type windows partition; frames span the calendar-bounded
    * daily series. */
  def qWinRollingSlope(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wf = wr.rowsBetween(-13, 0)
    daily
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wf))
      .withColumn("st", sum(col("day")).over(wf))
      .withColumn("sy", sum(col("x")).over(wf))
      .withColumn("stt", sum(col("day") * col("day")).over(wf))
      .withColumn("sty", sum(expr("CAST(day AS DECIMAL(38,0)) * x")).over(wf))
      .where(col("rn") >= 14)
      .withColumn("slope14", expr(
        """CASE WHEN n * stt - st * st > 0
                THEN round(CAST(n * sty - CAST(st AS DECIMAL(38,0)) * sy AS DOUBLE)
                     / CAST(n * stt - st * st AS DOUBLE), 6)
                ELSE NULL END"""))
      .select(col("event_type"), col("day"), col("x"), col("slope14"))
      .orderBy("event_type", "day")
  }

  /** Centered 21-row moving MEDIAN per user — the robust smoother a
    * spike-riddled series needs where the moving average chases
    * outliers. The frame is held to EXACTLY 21 rows (full-frame rows
    * only), so the count is odd and the median is the middle INPUT
    * value — no interpolation, no engine accumulation, hash-exact by
    * construction. Spark has no median window function: the frame's
    * values are collected, sorted, and indexed (`element_at(…, 11)`),
    * all inside one (user) window pass; DuckDB states `median()` over
    * the same frame directly. 21 values per row is constant memory —
    * the shape survives any series length. */
  def qWinMovingMedian(s: SparkSession, sf: String): DataFrame = {
    val frame = byUser.rowsBetween(-10, 10)
    val whole = Window.partitionBy("user_id")
    Tables.events(s, sf)
      .withColumn("med21",
        element_at(sort_array(collect_list(col("value")).over(frame)), 11))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("cnt", count(lit(1)).over(whole))
      .where(col("rn") >= 11 && col("rn") <= col("cnt") - 10)
      .select(col("event_id"), col("user_id"), col("med21"))
      .orderBy("event_id")
  }

  /** Maximum drawdown per user — the finance classic, equally at home
    * on any cumulative telemetry counter ("worst dip below the
    * high-water mark so far"): running decimal cumsum (exact at every
    * row, the `q_win_cumsum` path), running max of it, drawdown =
    * runmax − cum, max over the series — every intermediate is an
    * exact decimal, so the result is hash-exact with zero float
    * accumulation. One (user) shuffle serves all three windows. */
  def qWinDrawdown(s: SparkSession, sf: String): DataFrame = {
    val cumW = byUser.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, sf)
      .withColumn("cum", sum(col("value").cast(D)).over(cumW))
      .withColumn("runmax", max(col("cum")).over(cumW))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           max(col("runmax") - col("cum")).cast("double").as("max_drawdown"))
      .orderBy("user_id")
  }

  /** Leaderboard rank movement — each user's activity rank in the
    * final week vs the week before (the "who's rising" readout): two
    * (week)-partitioned dense ranks over weekly counts joined on user,
    * integer delta; ties broken inside the rank by (count desc, user)
    * so movement is total-order deterministic. */
  def qWinRankChange(s: SparkSession, sf: String): DataFrame = {
    val weekly = Tables.events(s, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("week"))
      .groupBy(col("user_id"), col("week")).agg(count(lit(1)).as("n"))
    val last2 = weekly.agg(max(col("week")).as("wmax"))
    val w = Window.partitionBy("week").orderBy(col("n").desc, col("user_id"))
    val ranked = weekly.crossJoin(broadcast(last2))
      .where(col("week") >= col("wmax") - 1)
      .withColumn("rnk", row_number().over(w))
    val cur = ranked.where(col("week") === col("wmax"))
      .select(col("user_id"), col("rnk").as("rank_now"), col("n").as("n_now"))
    val prev = ranked.where(col("week") === col("wmax") - 1)
      .select(col("user_id"), col("rnk").as("rank_prev"))
    cur.join(prev, Seq("user_id"), "inner")
      .withColumn("moved", col("rank_prev") - col("rank_now"))
      .orderBy("rank_now", "user_id")
  }

  /** Running DISTINCT count — "how many event types has this user
    * touched so far" (the feature-adoption curve). No engine has a
    * distinct-over-window aggregate that scales; the standard rewrite:
    * flag each (user, type)'s FIRST occurrence with one row_number
    * window, then a cumulative sum of flags — two window passes over
    * the SAME (user) partitioning, one shuffle total, ALL-INTEGER. */
  def qWinRunningDistinct(s: SparkSession, sf: String): DataFrame = {
    val firstOcc = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, sf)
      .withColumn("is_first",
        when(row_number().over(firstOcc) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("is_first")).over(cum))
      .select(col("event_id"), col("user_id"), col("n_types_seen"))
      .orderBy("event_id")
  }

  /** nth_value — "distance to the runner-up at every row" (the
    * price-gap-to-second reporting idiom). Full-frame `nth_value(…, 2)`
    * over (nation, balance DESC, custkey) — the custkey tiebreak makes
    * the picked row total-order deterministic; the gap is one IEEE
    * subtraction of two 2-decimal doubles (exact on both engines; a
    * 1-customer nation yields NULL on both). One (nation) window
    * shuffle serves row_number and nth_value together; the rn ≤ 3
    * filter keeps the graded output small. */
  def qWinNthValue(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), col("c_custkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
              row_number().over(w).as("rn"),
              nth_value(col("c_acctbal"), 2).over(full).as("second_bal"))
      .where(col("rn") <= 3)
      .withColumn("gap_to_second", col("c_acctbal") - col("second_bal"))
      .orderBy("c_nationkey", "rn")
  }

  /** Seasonal-naive forecast error (the MASE denominator/numerator
    * pair) per event-type daily series — the capacity-planning sanity
    * gate run BEFORE any model forecast ships: if "same as 7 days ago"
    * (seasonal-naive) beats "same as yesterday" (naive-1), the series
    * is weekly-seasonal and a non-seasonal forecaster is lying. Both
    * error sums are EXACT integers (daily counts, abs diffs of lags
    * over one (event_type, day) window pass); rows align on rn > 7 so
    * both lags are defined over the identical day set; the single
    * mirrored double division is rounded 6dp, NULL-pinned when the
    * naive-1 denominator is 0 (a constant series has no defined
    * ratio). mase < 1 reads "weekly seasonality dominates". */
  def qWinSeasonalNaiveError(s: SparkSession, sf: String): DataFrame = {
    val daily = Tables.events(s, sf)
      .groupBy(col("event_type"),
               expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("e1", abs(col("x") - lag(col("x"), 1).over(w)))
      .withColumn("e7", abs(col("x") - lag(col("x"), 7).over(w)))
      .where(col("rn") > 7)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
           sum(col("e1")).as("sae1"), sum(col("e7")).as("sae7"))
      .withColumn("mase", expr(
        """CASE WHEN sae1 > 0
           THEN round(CAST(sae7 AS DOUBLE) / CAST(sae1 AS DOUBLE), 6)
           ELSE NULL END"""))
      .orderBy("event_type")
  }
}
