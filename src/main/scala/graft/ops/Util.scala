package graft.ops

import org.apache.spark.sql.Column
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
}
