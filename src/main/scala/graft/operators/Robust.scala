package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust numeric feature preparation for large-scale pipelines. */
object Robust {

  /** Per-stratum winsorization (Tukey's trimming cousin; Dixon 1960):
    * clip `valueCol` into the exact [p(loNum/loDen), p(hiNum/hiDen)]
    * percentile band of its stratum and flag the values that needed
    * clipping — the standard outlier-robust feature-prep step before
    * scaling/aggregation.
    *
    * Percentile semantics are the engine-wide exact-selection contract
    * (q57/q81): rank ⌈p·n⌉ by integer arithmetic ((n·num + den−1) div
    * den), value = the smallest element whose cumulative count reaches
    * the rank — discrete, deterministic, identical in any engine; no
    * interpolation, no floats.
    *
    * Scale shape (the q57 histogram trick): the ordered window runs
    * over the per-stratum VALUE HISTOGRAM — rows bounded by strata ×
    * distinct values — never over the corpus; the bounds frame (one
    * row per stratum) broadcasts back onto the data. Null values pass
    * through unclipped and unflagged. Returns the input plus
    * `lo`, `hi`, `clipped`, `is_outlier`. */
  def winsorize(df: DataFrame, strataCol: String, valueCol: String,
      loNum: Int, loDen: Int, hiNum: Int, hiDen: Int): DataFrame = {
    require(loDen > 0 && hiDen > 0 &&
      loNum >= 0 && loNum <= loDen && hiNum >= 0 && hiNum <= hiDen,
      s"percentiles must be fractions in [0,1]: $loNum/$loDen, $hiNum/$hiDen")
    require(loNum.toLong * hiDen <= hiNum.toLong * loDen,
      s"lower bound $loNum/$loDen above upper $hiNum/$hiDen")
    val reserved = Seq("lo", "hi", "clipped", "is_outlier",
      "__cnt", "__cum", "__n", "__strata_b")
    // guard the WHOLE input schema, not just the named columns: a
    // pre-existing `clipped`/`is_outlier` (e.g. re-winsorizing a prior
    // pass's output) would be silently overwritten, and `lo`/`hi`
    // would die as AMBIGUOUS_REFERENCE after the bounds join
    df.columns.foreach(c =>
      require(!reserved.contains(c), s"input column '$c' is reserved by winsorize"))
    val h = df.where(col(valueCol).isNotNull)
      .groupBy(strataCol, valueCol).agg(count(lit(1)).as("__cnt"))
    val wc = Window.partitionBy(strataCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = h.withColumn("__cum", sum(col("__cnt")).over(wc))
      .withColumn("__n",
        sum(col("__cnt")).over(Window.partitionBy(strataCol)))
    def rk(num: Int, den: Int) =
      expr(s"CAST((__n * $num + ${den - 1}) DIV $den AS BIGINT)")
    val bounds = r.groupBy(strataCol).agg(
      min(when(col("__cum") >= rk(loNum, loDen), col(valueCol))).as("lo"),
      min(when(col("__cum") >= rk(hiNum, hiDen), col(valueCol))).as("hi"))
    // null-safe key match: a NULL stratum is a legal bin (the
    // budgetSelectKernel precedent) — a plain equi-join would leave its
    // rows without bounds, passing outliers through unclipped.
    df.join(
        broadcast(bounds.withColumnRenamed(strataCol, "__strata_b")),
        col(strataCol) <=> col("__strata_b"), "left")
      .drop("__strata_b")
      .withColumn("clipped",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("lo")), col("hi"))))
      .withColumn("is_outlier",
        col(valueCol).isNotNull &&
          (col(valueCol) < col("lo") || col(valueCol) > col("hi")))
  }
}
