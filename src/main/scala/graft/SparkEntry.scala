package graft

import graft.operators.{EntityResolution, SimilaritySearch}
import graft.queries.{RelationalQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (SURVEY.md §2 plus
  * the training-data-pipeline operators); `oracleSql` carries the DuckDB
  * twin for every SQL-expressible entry. Queries without an oracle entry
  * (custom Catalyst expressions, LSH ANN with engine-specific hashing,
  * approximate aggregates) get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship: the reference's core capability end-to-end — explode-free
    * mini entity resolution of part names against a canonical dictionary
    * with exact broadcast lookup, token-set-ratio fuzzy scoring,
    * penalties, top-k ranking and three-band routing. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val p = spark.read.parquet(s"$dir/part.parquet")
    val items = p.where(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("item_id"), col("p_name").as("item_name"))
    val dict = p.where(col("p_partkey") % 2 === 0)
      .groupBy(col("p_name").as("title"))
      .agg(concat(lit("EXT-"), min(col("p_partkey"))).as("ext_id"))
    EntityResolution.resolve(items, dict, Seq("item_id"))
  }

  /** No-oracle queries (rows-only smoke in the driver): custom-expression
    * and approximate operators whose exact values are engine-specific. */
  private val extraDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full resolution pipeline with the custom token_set_ratio /
    // partial_ratio Catalyst expressions + penalties + banding.
    "q40_entity_resolution" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
      val items = p.where(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("item_id"), col("p_name").as("item_name"))
      val dict = p.where(col("p_partkey") % 2 === 0)
        .groupBy(col("p_name").as("title"))
        .agg(concat(lit("EXT-"), min(col("p_partkey"))).as("ext_id"))
      EntityResolution.resolve(items, dict, Seq("item_id"))
        .orderBy("item_id")
    }),
    // Token-blocked fuzzy resolution — the 100 TB shape (no cross join).
    "q41_blocked_resolution" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
      val items = p.where(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("item_id"), col("p_name").as("item_name"))
      val dict = p.where(col("p_partkey") % 2 === 0)
        .groupBy(col("p_name").as("title"))
        .agg(concat(lit("EXT-"), min(col("p_partkey"))).as("ext_id"))
      EntityResolution.resolve(items, dict, Seq("item_id"), blocked = true)
        .orderBy("item_id")
    }),
    // LSH-bucketed approximate nearest neighbors (scale path of q37).
    "q42_lsh_ann" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      SimilaritySearch.lshTopK(
        e.where(col("vec_id") % 100 === 0), e,
        "vec_id", "embedding", k = 5, nPlanes = 4, dim = 64)
        .orderBy("query_id", "rank")
    }),
    // Approximate distinct counts (HLL) — the at-scale variant of A4.
    "q43_approx_distinct" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    }),
    // ST2 through the REAL streaming engine: watermarked tumbling-window
    // counts over the events file source, drained with AvailableNow into
    // a memory sink. Append mode emits only watermark-closed windows, so
    // the row count is a strict subset of the batch twin (q22).
    "q44_streaming_window" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val qname = s"q44_out_${System.nanoTime()}"
      val cp = java.nio.file.Files.createTempDirectory("graft-q44-cp").toString
      val q = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append")
        .format("memory").queryName(qname)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(qname)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), col("n"))
        .orderBy("hour", "event_type")
    }),
    // The spark.sql textual surface: temp views + ANSI SQL (oracle twin
    // in oracleSql — this one IS hash-checked).
    "q45_sql_surface" -> ((s, dir) => {
      graft.Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM orders_v GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),
    // Registered similarity functions callable from SQL text.
    "q46_sql_similarity" -> ((s, dir) => {
      graft.functions.Similarity.register(s)
      graft.Tables(s, dir, "part").createOrReplaceTempView("part_v")
      s.sql(
        """SELECT p_partkey, p_name,
          |  token_set_ratio(p_name, 'small ring') AS tsr,
          |  partial_ratio(p_name, 'ring') AS pr,
          |  indel_ratio(p_name, 'small ring') AS ir
          |FROM part_v WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin)
    }))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++ extraDefs

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ VectorQueries.oracle ++ Map(
      "q45_sql_surface" ->
        """SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
}
