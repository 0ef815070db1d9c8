package graft.streaming

import graft.functions.Normalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operational log: schema, sink, retention, rolling metrics
  * (S10, F11-F15, A7/A8, ST2).
  *
  * Batch and streaming share the same aggregation expressions; the
  * streaming variants add a watermark so state is bounded — a strict
  * improvement over the reference's cron-style recomputation
  * (`app/error_utils.py:101-134,224-253`, `app/logging_utils.py`).
  */
object OpsLog {

  val LogSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("level", StringType),
    StructField("category", StringType),
    StructField("operation", StringType),   // query | mutation | system
    StructField("message", StringType),
    StructField("bytes", LongType),
    StructField("submission_name", StringType)))

  /** S10: append to a date-partitioned log table; retention = dropping
    * old `log_date` partitions (a metadata delete, no rewrite). */
  def append(df: DataFrame, logDir: String): Unit =
    df.withColumn("log_date", to_date(col("ts")))
      .write.mode("append").partitionBy("log_date").parquet(logDir)

  /** Drop partitions older than `retentionDays` relative to the max
    * log_date present (deterministic, no wall-clock dependency).
    * Pure metadata: the max date comes from the `log_date=` partition
    * directory NAMES — no Spark job, no data-file scan (on a large log
    * table a max() over the data would read every file to learn what
    * the directory listing already says) — and a missing/empty logDir
    * is a no-op, so a first-run cron never crashes. */
  def enforceRetention(spark: SparkSession, logDir: String, retentionDays: Int): Unit = {
    val base = new org.apache.hadoop.fs.Path(logDir)
    // the filesystem OF logDir, never the default FS: with
    // fs.defaultFS=hdfs and an s3a:// log dir the default handle throws
    // "Wrong FS" (or worse, exists() = false on a local default makes
    // retention a silent permanent no-op)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    val parts = fs.listStatus(base).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("log_date="))
      .flatMap { p =>
        // skip unparseable suffixes (e.g. log_date=__HIVE_DEFAULT_PARTITION__
        // from a null-ts row) instead of letting one bad directory throw
        // DateTimeParseException and kill every future retention run
        scala.util.Try(java.time.LocalDate.parse(
          p.getName.stripPrefix("log_date="))).toOption.map(p -> _)
      }
    if (parts.nonEmpty) {
      val cutoff = parts.map(_._2).max(Ordering.by[java.time.LocalDate, Long](
        _.toEpochDay)).minusDays(retentionDays.toLong)
      parts.foreach { case (p, d) =>
        if (d.isBefore(cutoff)) fs.delete(p, true)
      }
    }
  }

  /** F13 applied to a whole log projection before persistence. */
  def masked(df: DataFrame): DataFrame =
    df.withColumn("message", Normalize.maskSensitive(col("message")))

  /** A7: daily usage rollup over the full batch history. */
  def dailyUsage(logs: DataFrame): DataFrame =
    logs.groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(coalesce(col("bytes"), lit(0L))).as("total_bytes"),
        count(lit(1)).as("operations"),
        sum(when(col("operation") === "mutation", 1).otherwise(0)).as("mutations"),
        sum(when(col("operation") === "query", 1).otherwise(0)).as("queries"))
      .withColumn("over_80pct_of_5gb",
        col("total_bytes") > (0.8 * 5L * 1024 * 1024 * 1024).toLong)

  /** A8: error summary over the trailing 24h anchored at max(ts). */
  def errorSummary24h(logs: DataFrame): DataFrame = {
    val mx = logs.agg(max(col("ts")).as("mx"))
    logs.crossJoin(broadcast(mx))
      .where(col("ts") >= col("mx") - expr("INTERVAL 24 HOURS"))
      .where(col("level") === "ERROR")
      .groupBy(Normalize.errorCategory(col("message")).as("category"))
      .agg(count(lit(1)).as("n"))
  }

  /** ST2: the streaming twin of [[errorSummary24h]] — watermarked
    * tumbling-window ERROR counts by the message-derived category, so
    * the two surfaces agree on both row set (errors only) and category
    * keys (F15's classifier, not the free-form stored column).
    *
    * The ERROR restriction is a conditional count + post-aggregation
    * filter, NOT a row filter: a `.where(level = 'ERROR')` — even
    * written after `withWatermark` — gets pushed BELOW the watermark
    * node by the optimizer, so the watermark would advance only on
    * error events and an INFO-dominated stream would never close its
    * windows (verified: the spec's 01-02 window stalls). This way
    * every event advances the watermark; per-window state is bounded
    * by the category vocabulary (~10), and windows with no errors
    * emit nothing. Call on a `readStream` DataFrame with LogSchema. */
  def streamingErrorWindows(stream: DataFrame,
      window_ : String = "24 hours", watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_),
        Normalize.errorCategory(col("message")).as("category"))
      .agg(sum(when(col("level") === "ERROR", 1L).otherwise(0L)).as("n"))
      .where(col("n") > 0)

  /** ST2: streaming daily usage with a late-data watermark — the SAME
    * output columns as the batch [[dailyUsage]] and the SAME day
    * bucket under the engine's UTC session contract
    * (`Tables.configure` REQUIRES spark.sql.session.timeZone=UTC, so
    * the epoch-aligned 24h tumbling window starts at UTC midnight =
    * exactly `to_date(ts)`'s day). The window — not a bare
    * `to_date` grouping — is what lets Append mode evict each day's
    * state once the watermark passes it; `day` is projected from the
    * window start so consumers read the two surfaces identically. */
  def streamingDailyUsage(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "24 hours"))
      .agg(
        sum(coalesce(col("bytes"), lit(0L))).as("total_bytes"),
        count(lit(1)).as("operations"),
        sum(when(col("operation") === "mutation", 1).otherwise(0)).as("mutations"),
        sum(when(col("operation") === "query", 1).otherwise(0)).as("queries"))
      .select(to_date(col("window.start")).as("day"),
        col("total_bytes"), col("operations"),
        col("mutations"), col("queries"))
      .withColumn("over_80pct_of_5gb",
        col("total_bytes") > (0.8 * 5L * 1024 * 1024 * 1024).toLong)
}
