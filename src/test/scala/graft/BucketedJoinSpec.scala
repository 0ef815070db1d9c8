package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing contract (COVERAGE.md scale notes): two tables bucketed
  * the same way on the join key join WITHOUT a shuffle — the layout
  * that turns the repeated big-fact ⋈ dim join at 100 TB from
  * two full-data exchanges per query into zero.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("equal bucketing on the join key eliminates both exchanges") {
    val dir = SparkTestSession.sfDir
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS part_bucketed")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite")
      .bucketBy(8, "l_partkey").sortBy("l_partkey")
      .saveAsTable("li_bucketed")
    spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      .write.mode("overwrite")
      .bucketBy(8, "l_partkey").sortBy("l_partkey")
      .saveAsTable("part_bucketed")

    // disable broadcast so the join must co-locate by partitioning —
    // the situation bucketing exists for (dim too large to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("part_bucketed"), "l_partkey")
        .groupBy("p_brand")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(1500))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS part_bucketed")
    }
  }
}
