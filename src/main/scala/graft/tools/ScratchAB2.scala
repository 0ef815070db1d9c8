package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Throwaway same-JVM A/B of the round-14 vector codegen kernels vs the
  * interpreted higher-order forms they replaced (not shipped in any
  * query path; deleted or inert at round end). */
object ScratchAB2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(
      SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ab2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val nPlanes = 12; val dim = 64
    // the OLD interpreted bucket form, inlined verbatim
    def oldBucket(qv: org.apache.spark.sql.Column) =
      (0 until nPlanes).map { p =>
        val signs = (0 until dim).map(d =>
          VectorFunctions.rademacherSign(p, d).toLong)
        val proj = aggregate(
          zip_with(qv, typedLit(signs), (x, w) => x * w),
          lit(0L), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("qv"))
      .localCheckpoint(true)

    (1 to 4).foreach { r =>
      println(s"[ab2] ===== round $r =====")
      time("gauge q01") {
        graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
      }
      time("OLD rademacher bucket agg") {
        e.select(oldBucket(col("qv")).as("b"))
          .groupBy("b").count().count()
      }
      time("NEW rademacher bucket agg") {
        e.select(VectorFunctions.rademacherLshBucket(col("qv"), nPlanes, dim).as("b"))
          .groupBy("b").count().count()
      }
      time("OLD zip_with residual sum") {
        e.as("a").join(e.limit(50).select(col("qv").as("cv")).as("b"))
          .select(aggregate(
            zip_with(col("qv"), col("cv"), (x, y) => x - y),
            lit(0L), (acc, v) => acc + v).as("s"))
          .agg(sum("s")).count()
      }
      time("NEW arraySubQ residual sum") {
        e.as("a").join(e.limit(50).select(col("qv").as("cv")).as("b"))
          .select(aggregate(
            VectorFunctions.arraySubQ(col("qv"), col("cv")),
            lit(0L), (acc, v) => acc + v).as("s"))
          .agg(sum("s")).count()
      }
    }
    spark.stop()
  }
}
