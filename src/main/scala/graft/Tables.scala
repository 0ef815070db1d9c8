package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders.
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark only reads via
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
  * builder here); the loader converts the raw nanos to a microsecond
  * TimestampType with exact integer division (`div`, not `/` — an epoch
  * in nanos exceeds 2^53 so double math would corrupt it).
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Session config every graft entry point applies. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // full Java charset set for the S1 encoding-detection ladder
      // (Spark 4 otherwise limits CSV to a small allowlist)
      .config("spark.sql.legacy.javaCharsets", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
