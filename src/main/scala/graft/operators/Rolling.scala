package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window feature engineering over an event stream — the
  * classic "rolling 1d/7d/28d per-entity counters" pass that feeds
  * feature stores and per-user rate limits (the reference's daily-usage
  * rollup `app/logging_utils.py:113-160` is the 1-bucket special case;
  * this is its general range-frame form).
  *
  * Semantics: for every event row, `n_<name>` / `sum_<name>` aggregate
  * all events of the SAME key whose timestamp lies in
  * `[ts - spanUs, ts]` — exactly ANSI `RANGE BETWEEN spanUs PRECEDING
  * AND CURRENT ROW`, so simultaneous events (exact timestamp ties) are
  * frame peers and each sees the full tie group.
  *
  * Scale shape: ALL requested spans share one `partitionBy(key)
  * .orderBy(ts)` window, so Spark plans a SINGLE exchange on the key +
  * one sort, then evaluates every frame in the same Window operator —
  * adding a span adds zero shuffles. Per-key data is streamed in ts
  * order with a sliding frame bound (no per-row rescan). Hot keys are
  * bounded by per-key event counts, the same skew profile as any
  * keyed window; value sums must be pre-quantized to integers by the
  * caller for engine-portable determinism (double accumulation order
  * inside a frame is unspecified).
  */
object Rolling {

  /** Append trailing count + sum columns per `(name, spanUs)` window.
    *
    * @param events  input frame
    * @param keyCol  partitioning entity (user, item, ...)
    * @param tsCol   event time as epoch LONG (micros); must be integral
    *                so the range frame is exact
    * @param valCol  integral value column to sum (quantize first)
    * @param spansUs (suffix, span in the tsCol unit); each yields
    *                `n_<suffix>` and `sum_<suffix>`
    */
  def trailingAgg(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, spansUs: Seq[(String, Long)]): DataFrame = {
    require(spansUs.nonEmpty, "at least one trailing span required")
    spansUs.foreach { case (n, s) =>
      require(s > 0, s"span '$n' must be positive, got $s")
    }
    // collision guards, the trailingZFlags discipline: duplicate span
    // names (or input columns named like outputs) would be silently
    // overwritten by withColumn
    require(spansUs.map(_._1).distinct.size == spansUs.size,
      "span names must be distinct")
    val outNames = spansUs.flatMap { case (n, _) => Seq(s"n_$n", s"sum_$n") }
    events.columns.foreach(c =>
      require(!outNames.contains(c), s"input column '$c' collides with an output"))
    val ordered = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    spansUs.foldLeft(events) { case (df, (name, span)) =>
      val w = ordered.rangeBetween(-span, 0L)
      df.withColumn(s"n_$name", count(lit(1)).over(w))
        .withColumn(s"sum_$name", sum(col(valCol)).over(w))
    }
  }

  /** Trailing-window z-score outlier flags in EXACT integer
    * arithmetic — the monitoring pass over a per-key metric series
    * (daily counts, error rates): flag a point whose deviation from
    * its own trailing-window mean exceeds `zMills/1000` standard
    * deviations, WITHOUT computing mean, σ, or any float. With window
    * mean μ = s/m and population variance σ² = (m·q − s²)/m², the test
    * |x − μ| > z·σ multiplied through by m² becomes the squared
    * integer inequality
    *
    *   (m·x − s)² · 10⁶  >  zMills² · (m·q − s²)
    *
    * over the window count m, sum s and sum-of-squares q (both sides
    * DECIMAL(38,0) — products overflow int64 at real magnitudes), so
    * the flag is bit-identical across engines — no float-epsilon
    * boundary cases ever flip it. The frame EXCLUDES the current row
    * (`[tick − lookback, tick − 1]`): a spike never dilutes the
    * baseline it is judged against. Points with fewer than `minPoints`
    * baseline rows are never flagged (cold start).
    *
    * Scale shape: one exchange on the key, one sort, one Window — the
    * trailingAgg contract; the frame is a sliding bound, no per-row
    * rescan. */
  def trailingZFlags(df: DataFrame, keyCol: String, tickCol: String,
      valueCol: String, lookback: Long, minPoints: Int,
      zMills: Long): DataFrame = {
    require(lookback >= 1, s"lookback=$lookback < 1")
    require(minPoints >= 2, s"minPoints=$minPoints < 2 (variance needs 2)")
    require(zMills >= 0, s"zMills=$zMills < 0")
    val reserved = Seq("win_n", "win_sum", "anomalous", "__q")
    Seq(keyCol, tickCol, valueCol).foreach(c =>
      require(!reserved.contains(c), s"column '$c' is reserved"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tickCol))
      .rangeBetween(-lookback, -1L)
    val vD = col(valueCol).cast("decimal(38,0)")
    val out = df
      .withColumn("win_n", count(col(valueCol)).over(w))
      .withColumn("win_sum", coalesce(sum(col(valueCol)).over(w), lit(0L)))
      .withColumn("__q", coalesce(sum(vD * vD).over(w),
        lit(0L).cast("decimal(38,0)")))
    val nD = col("win_n").cast("decimal(38,0)")
    val sD = col("win_sum").cast("decimal(38,0)")
    val dev = nD * vD - sD
    out
      // coalesce(·, false): the flag must be a DEFINITE boolean. A NULL
      // valueCol row (dev = NULL), or a value so large the DECIMAL(38,0)
      // products overflow to NULL under non-ANSI arithmetic (|x| past
      // ~1e17 with lookback-scale sums), would otherwise make the row
      // vanish from BOTH where(anomalous) and where(!anomalous). Such
      // rows read "not anomalous" — the envelope where the exact test
      // is computable is |x| ≲ 1e17 at zMills ≤ ~10⁴, far past any
      // mills/cents-scaled metric this operator targets.
      .withColumn("anomalous",
        coalesce(
          col("win_n") >= minPoints &&
            dev * dev * lit(1000000L) >
              lit(zMills) * lit(zMills) * (nD * col("__q") - sD * sD),
          lit(false)))
      .drop("__q")
  }
}
