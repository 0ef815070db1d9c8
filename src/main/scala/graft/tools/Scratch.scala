package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Throwaway stage profiler for optimization rounds (not shipped in any
  * query path; deleted or inert at round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(
      SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    println("[scratch] embeddings rows: " + e.count())
    (1 to 2).foreach { round =>
      println(s"[scratch] ===== round $round =====")
      val cBase = e.select(col("vec_id").cast("long").as("vec_id"),
        VectorFunctions.quantize(col("embedding")).as("q"))
      val c = time("corpus quantize checkpoint") { cBase.localCheckpoint(true) }
      time("seed collect (orderBy md5 limit 8)") {
        c.where(col("vec_id").isNotNull && col("q").isNotNull)
          .orderBy(md5(col("vec_id").cast("string"))).limit(8)
          .select(col("vec_id"), col("q")).collect()
      }
      time("one lloyd-update-style agg collect") {
        c.select(lit(0L).as("cell"), posexplode(col("q")).as(Seq("pos", "v")))
          .groupBy("cell", "pos")
          .agg(floor(sum(col("v")) / count(lit(1))).cast("long").as("m"))
          .collect()
      }
      time("full pqTopK") {
        graft.operators.SimilaritySearch.pqTopK(
          e.where(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", k = 5, m = 4, ksub = 8, iters = 2).count()
      }
      val df = time("pqTopK frame build (train collects)") {
        graft.operators.SimilaritySearch.pqTopK(
          e.where(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", k = 5, m = 4, ksub = 8, iters = 2)
      }
      time("pqTopK analysis+planning only") { df.queryExecution.executedPlan }
      time("pqTopK final execute") { df.count() }
      time("full ivfPqTopK") {
        graft.operators.SimilaritySearch.ivfPqTopK(
          e.where(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", k = 5, nCells = 8, nProbe = 2,
          m = 4, ksub = 8, iters = 2).count()
      }
    }
    spark.stop()
  }
}
