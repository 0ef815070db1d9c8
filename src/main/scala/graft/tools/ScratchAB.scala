package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway same-JVM A/B of the round-14 importanceScore single-scan
  * shape vs the round-13 double-gram-scan shape (not shipped in any
  * query path; deleted or inert at round end). Interleaved runs cancel
  * co-tenant load drift. */
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(
      SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val buckets = 4096

    // round-13 form: explode(wordNGrams) + conv(substring(md5)) per gram,
    // gram scan runs once per consumer
    def oldImportance(source: DataFrame, target: DataFrame,
        textCol: String, idCol: String): DataFrame = {
      def bucketOf(g: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(g, lit("#dsir"))), 1, 15), 16, 10)
          .cast("long") % buckets
      def gramBuckets(df: DataFrame, keep: Seq[org.apache.spark.sql.Column]) =
        df.select(keep :+
            explode(TextFunctions.wordNGrams(col(textCol), 2)).as("__g"): _*)
          .withColumn("__b", bucketOf(col("__g"))).drop("__g")
      val sg = gramBuckets(source, Seq(col(idCol)))
      val tg = gramBuckets(target, Seq.empty)
      val sc = sg.groupBy("__b").agg(count(lit(1)).as("__sc"))
      val tc = tg.groupBy("__b").agg(count(lit(1)).as("__tc"))
      val totals = sc.agg(coalesce(sum(col("__sc")), lit(0L)).as("__ns"))
        .crossJoin(broadcast(
          tc.agg(coalesce(sum(col("__tc")), lit(0L)).as("__nt"))))
      val wt = source.sparkSession.range(buckets).toDF("__b")
        .join(sc, Seq("__b"), "left").join(tc, Seq("__b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("__b"), expr(
          s"""CAST((CAST(1000 AS DECIMAL(38,0)) * (coalesce(__tc, 0) + 1) * (__ns + $buckets))
              div (CAST(coalesce(__sc, 0) + 1 AS DECIMAL(38,0)) * (__nt + $buckets)) AS BIGINT)""").as("__w"))
      val scored = sg.join(broadcast(wt), Seq("__b"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("dsir_mills"))
      source.select(col(idCol)).join(scored, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("dsir_mills"), lit(0L)).as("dsir_mills"),
          coalesce(expr("dsir_mills div n_grams"), lit(0L)).as("dsir_avg_mills"))
    }

    val src = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), lower(col("text")).as("text"))

    (1 to 4).foreach { r =>
      println(s"[ab] ===== round $r =====")
      time("gauge q01") {
        graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
      }
      time("OLD importanceScore (q90 shape)") {
        oldImportance(src, src.where(col("doc_id") % 7 === 0),
          "text", "doc_id").count()
      }
      time("NEW importanceScore (q90 shape)") {
        graft.operators.TextAnalysis.importanceScore(
          src, src.where(col("doc_id") % 7 === 0),
          "text", "doc_id", buckets).count()
      }
    }
    spark.stop()
  }
}
