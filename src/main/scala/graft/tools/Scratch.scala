package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

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
    // warm
    spark.read.parquet(s"$dir/documents.parquet").count()
    (1 to 2).foreach { round =>
      println(s"[scratch] ===== round $round =====")
      val universe = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), lower(col("text")).as("text"))
        .where(col("doc_id") % 5 === 0)
      val d = time("d checkpoint (tokenize+bands)") {
        universe.select(
          col("doc_id"),
          TextFunctions.tokenSetSorted(col("text")).as("toks"),
          array(
            TextFunctions.minhashBand(col("text"), 0 until 4),
            TextFunctions.minhashBand(col("text"), 4 until 8)).as("__bands"))
          .localCheckpoint(true)
      }
      val truth = graft.operators.Dedup.jaccardPairsFromTokens(
        d.select(col("doc_id").as("__id"), col("toks")),
        minJaccardMills = graft.queries.TextQueries.LshAuditMinJac)
      time("truth count") { truth.count() }
      // A/B: broadcast-hinted verify attach
      locally {
        val dd = d.select(col("doc_id").as("__id"), col("toks"))
        val toksB = dd.select(col("__id"), explode(col("toks")).as("shingle"))
        val dfreqB = toksB.groupBy("shingle").agg(count(lit(1)).as("gdf"))
        val byDocB = org.apache.spark.sql.expressions.Window
          .partitionBy("__id").orderBy("gdf", "shingle")
        val prefixB = toksB.join(dfreqB, "shingle")
          .withColumn("rnk", row_number().over(byDocB))
          .withColumn("sz", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("__id")))
          .where(col("rnk") <= col("sz") - ceil(col("sz") * 300 / lit(1000.0)) + 1)
          .select(col("shingle"), col("__id"))
        val candB = graft.operators.Dedup.cappedBucketPairs(
          prefixB, Seq("shingle"), "__id", Int.MaxValue)
        val truthB = candB
          .join(broadcast(dd.select(col("__id").as("id_a"), col("toks").as("ta"))), "id_a")
          .join(broadcast(dd.select(col("__id").as("id_b"), col("toks").as("tb"))), "id_b")
          .withColumn("common",
            graft.functions.ArrayOps.sortedIntersectSize(col("ta"), col("tb")))
          .withColumn("jac_mills",
            floor(lit(1000) * col("common")
              / (size(col("ta")) + size(col("tb")) - col("common"))).cast("long"))
          .where(col("jac_mills") >= 300)
          .select("id_a", "id_b", "jac_mills")
        time("truthB count (broadcast attach)") { println("truthB: " + truthB.count()) }
      }
      if (round == 2) {
        val toks2 = d.select(col("doc_id").as("__id"), explode(col("toks")).as("shingle"))
        val dfreq2 = toks2.groupBy("shingle").agg(count(lit(1)).as("gdf"))
        val byDoc2 = org.apache.spark.sql.expressions.Window
          .partitionBy("__id").orderBy("gdf", "shingle")
        val prefix2 = toks2.join(dfreq2, "shingle")
          .withColumn("rnk", row_number().over(byDoc2))
          .withColumn("sz", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("__id")))
          .where(col("rnk") <= col("sz") - ceil(col("sz") * 300 / lit(1000.0)) + 1)
          .select(col("shingle"), col("__id"))
        time("prefix count") { println("prefix rows: " + prefix2.count()) }
        val cand2 = graft.operators.Dedup.cappedBucketPairs(
          prefix2, Seq("shingle"), "__id", Int.MaxValue)
        time("cand count") { println("cand rows: " + cand2.count()) }
        println("docs: " + d.count() + ", tok rows: " + toks2.count())
      }
      val byBand = d.select(col("doc_id"),
        posexplode(col("__bands")).as(Seq("band_no", "sig")))
      val lp = time("lp checkpoint") {
        graft.operators.Dedup.cappedBucketPairs(
          byBand, Seq("band_no", "sig"), "doc_id",
          graft.queries.TextQueries.LshBucketCap)
          .localCheckpoint(true)
      }
      val comp = time("components") {
        graft.operators.Dedup.connectedComponents(lp).localCheckpoint(true)
      }
      time("final join+agg") {
        val lsh = lp.select(col("id_a"), col("id_b"), lit(1L).as("hit"))
        truth.join(lsh, Seq("id_a", "id_b"), "left")
          .join(comp.select(col("id").as("id_a"), col("comp").as("ca")),
            Seq("id_a"), "left")
          .join(comp.select(col("id").as("id_b"), col("comp").as("cb")),
            Seq("id_b"), "left")
          .withColumn("chit",
            when(col("ca").isNotNull && col("ca") === col("cb"), lit(1L))
              .otherwise(lit(0L)))
          .groupBy(expr("jac_mills div 100").as("bucket_lo_hmills"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0L))).as("n_pair"),
            sum(col("chit")).as("n_closure"))
          .count()
      }
    }
    spark.stop()
  }
}
