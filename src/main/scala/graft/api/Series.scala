package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Public library facade for time-series analytics over ARBITRARY
  * caller DataFrames, delegating to the paths behind the
  * oracle-checked `tm_holt` / `tm_seasonal` / `dq_mad_outliers`
  * queries. All three release exact integers (numerator/denominator
  * rationals, scaled percentiles) — no float accumulation anywhere.
  */
object Series {

  /** Holt double smoothing (α = β = ½, exact 10-lag matrix unrolling,
    * zero-init) at each key's LATEST observation: (key, l_num, b_num,
    * den, forecast_1) with level = l_num/den, one-step forecast =
    * (l_num + b_num)/den. `orderCols` must totally order each key's
    * series; `valueCol` must be integral. One window shuffle on the
    * series key, O(10) state per row. */
  def holt(series: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String): DataFrame =
    graft.operators.TimeSeries.holtOf(series, keyCol, orderCols,
      valueCol)

  /** Classical seasonal decomposition of a daily series: per day, the
    * centered `period`-row trend sum, the ×period integer detrended
    * value, the per-phase seasonal (num, den) pair and the exact
    * rational residual. `period` must be odd; `anchor` (a date
    * string) fixes phase 0. The input must be DAILY GRAIN — aggregate
    * first; the one unpartitioned window then runs over calendar-
    * scale rows only. */
  def seasonal(daily: DataFrame, period: Int = 7,
               anchor: String = "1970-01-05",
               dayCol: String = "day", valueCol: String = "x"): DataFrame =
    graft.operators.TimeSeries.seasonalOf(
      daily.select(col(dayCol).as("day"), col(valueCol).as("x")),
      period, anchor)

  /** Top-N days by |x − median| with the Iglewicz–Hoaglin modified
    * z-score flag (0.6745·dev > 3.5·MAD as a cross-multiplied integer
    * compare). Median/MAD are exact interpolated percentiles over the
    * daily grain. */
  def madOutliers(daily: DataFrame, topN: Int = 10,
                  dayCol: String = "day",
                  valueCol: String = "x"): DataFrame =
    graft.operators.DataQuality.madOutliersOf(
      daily.select(col(dayCol).as("day"), col(valueCol).as("x")), topN)
}
