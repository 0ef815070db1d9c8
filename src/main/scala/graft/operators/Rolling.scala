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
    val ordered = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    spansUs.foldLeft(events) { case (df, (name, span)) =>
      val w = ordered.rangeBetween(-span, 0L)
      df.withColumn(s"n_$name", count(lit(1)).over(w))
        .withColumn(s"sum_$name", sum(col(valCol)).over(w))
    }
  }
}
