package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unkeyed interval (range) join — "which probe rows fall inside which
  * intervals" (events × maintenance windows, readings × experiment
  * spans). Spark has no native range join: a raw
  * `ts BETWEEN start AND end` condition plans as a
  * BroadcastNestedLoopJoin (or a cartesian), which is fine only while
  * the interval side broadcasts — dead when both sides are large.
  *
  * The scale path BLOCKS on a coarse bucket of the join domain: each
  * interval explodes into the buckets it covers (bounded by
  * interval-length / bucketWidth + 1), each probe row maps to exactly
  * ONE bucket, and the join becomes a plain equi-shuffle on the bucket
  * key followed by the exact containment filter. Lossless — a
  * containment pair shares the probe's bucket (the interval covers the
  * probe's point, hence the probe's bucket); duplicate-free — the
  * probe has one bucket, so each (probe, interval) pair surfaces once.
  * This is the standard bin/overlap-join technique (Chawda et al.,
  * "Processing Interval Joins On Map-Reduce", EDBT 2014; Databricks'
  * range-join bin optimization).
  */
object RangeJoin {

  /** Inner interval-containment join: probe rows paired with every
    * interval where `startCol <= tsCol < endCol` (half-open, the
    * window convention). All three columns must be non-negative
    * integers in the same unit (e.g. epoch micros). Empty intervals
    * (end <= start) match nothing. Output = probe columns ++ interval
    * columns (names must not clash).
    *
    * @param bucketWidth blocking granularity, same unit as the
    *        columns — pick it near the TYPICAL interval length: too
    *        fine explodes long intervals into many bucket rows, too
    *        coarse degrades the equi-join's selectivity (more
    *        candidates killed only by the exact filter)
    * @param maxBucketsPerInterval loud-failure guard: an interval
    *        covering more buckets than this (a degenerate
    *        whole-domain interval under a fine bucket) raises at
    *        execution instead of silently exploding the join input */
  def intervalJoin(probe: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval=$maxBucketsPerInterval must be >= 1")
    val clash = probe.columns.toSet intersect intervals.columns.toSet
    require(clash.isEmpty, s"column names clash across sides: $clash")
    require(!(probe.columns ++ intervals.columns).contains("__b"),
      "column '__b' is reserved")
    // integer div (never the DSL's float `/`): exact at any epoch
    // magnitude. Non-negative domain makes truncation = floor.
    val iExp = intervals
      .where(col(startCol) < col(endCol))
      .withColumn("__b", explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        when(
          expr(s"(`$endCol` - 1) div $bucketWidth - `$startCol` div $bucketWidth")
            < maxBucketsPerInterval,
          expr(s"(`$endCol` - 1) div $bucketWidth"))
          .otherwise(raise_error(concat(
            lit(s"intervalJoin: interval covers > $maxBucketsPerInterval " +
              s"buckets at bucketWidth=$bucketWidth: start="),
            col(startCol), lit(" end="), col(endCol)))))))
    probe.withColumn("__b", expr(s"`$tsCol` div $bucketWidth"))
      .join(iExp, "__b")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__b")
  }
}
