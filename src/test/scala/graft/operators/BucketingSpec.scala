package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: staging fact and dimension bucketed
  * on the join key lets the join run with NO shuffle exchange on either
  * side — the plan-level proof of the "pre-partition your staging
  * tables" scale strategy in COVERAGE.md. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed staging tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS part_bucketed")
    val li = graft.Tables(spark, SparkTestSession.sfDir, "lineitem")
      .select("l_partkey", "l_quantity")
    val p = graft.Tables(spark, SparkTestSession.sfDir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    li.write.mode("overwrite")
      .bucketBy(8, "l_partkey").sortBy("l_partkey")
      .option("path", s"$wh/li").saveAsTable("li_bucketed")
    p.write.mode("overwrite")
      .bucketBy(8, "l_partkey").sortBy("l_partkey")
      .option("path", s"$wh/part").saveAsTable("part_bucketed")

    // force a sort-merge join so bucket co-location (not broadcast) is
    // what eliminates the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("part_bucketed"), "l_partkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed SMJ should be shuffle-free, got:\n$plan")

      // and it returns the same rows as the plain join
      val expected = li.join(p, "l_partkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS part_bucketed")
  }
}
