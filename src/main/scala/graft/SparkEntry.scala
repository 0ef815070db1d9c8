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

  /** md5-bucket train/val split of doc_id — the ONE parity-critical
    * split pair (Spark column + DuckDB twin), shared by q54 and q56. */
  private val mdSplit: org.apache.spark.sql.Column =
    when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c", "train")
      .otherwise("val")
  private val mdSplitSql: String =
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train' ELSE 'val' END"

  /** Operator-pipeline queries assembled here rather than in the per-
    * family query modules. Most are hash-checked (oracle twin below);
    * the remaining rows-only ones (q40/q41/q46: rapidfuzz-style indel
    * edit distance, q43: HLL) have no ANSI-SQL-expressible twin. */
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
    // LSH-bucketed approximate nearest neighbors (scale path of q37),
    // with Rademacher md5-parity planes over quantized vectors — exact
    // integer bucketing+scoring, so this one IS hash-checked (oracle
    // twin below).
    "q42_lsh_ann" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      SimilaritySearch.rademacherLshTopK(
        e.where(col("vec_id") % 100 === 0), e,
        "vec_id", "embedding", k = 5, nPlanes = 4, dim = 64)
        .orderBy("query_id", "rank")
    }),
    // IVF (inverted-file) ANN: deterministic k-smallest-md5 centroid
    // seeds, shuffle-free integer-cosine assignment against the inlined
    // centroid set, probe-one-cell — hash-checked like q42.
    "q52_ivf_ann" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      SimilaritySearch.ivfTopK(
        e.where(col("vec_id") % 100 === 0), e,
        "vec_id", "embedding", k = 5, nCells = 16, nProbe = 1)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),
    // Deterministic k-means (2 Lloyd rounds, integer centroids) — the
    // coarse-quantizer training step for IVF, hash-checked.
    "q58_kmeans_assign" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      SimilaritySearch.kmeansAssignments(e, "vec_id", "embedding", k = 8, iters = 2)
        .orderBy("vec_id")
    }),
    // Approximate distinct counts (HLL) — the at-scale variant of A4.
    "q43_approx_distinct" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    }),
    // KMV (k-minimum-values) distinct sketch: unlike HLL, deterministic
    // given the hash — estimate = (k-1)·2^32 / kth-smallest 32-bit md5
    // prefix (exact count when fewer than k distinct hashes). The
    // rn<=k filter plans as WindowGroupLimit: partial min-k per
    // partition before the shuffle, the sketch's at-scale shape.
    "q51_kmv_distinct" -> ((s, dir) => {
      val k = 64
      val h = s.read.parquet(s"$dir/events.parquet")
        .where(col("user_id").isNotNull) // null ordering differs across engines
        .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
      h.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("nd"),
          max(when(col("rn") === k,
            conv(substring(col("h"), 1, 8), 16, 10).cast("long"))).as("vk"))
        .select(col("event_type"),
          when(col("nd") < k, col("nd"))
            .otherwise(floor(lit((k - 1).toLong * 4294967296L) / (col("vk") + 1))
              .cast("long")).as("kmv_users"))
        .orderBy("event_type")
    }),
    // ST2 through the REAL streaming engine: watermarked tumbling-window
    // counts over the events file source, drained with AvailableNow into
    // a memory sink. Append mode emits exactly the windows closed by the
    // final watermark (max event time − 1h) — deterministic, so this IS
    // hash-checked against a batch DuckDB twin of that emission rule.
    "q44_streaming_window" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // one live memory-sink table at a time: drop leftovers from prior
      // invocations (bench runs this 4x per session) before registering
      // the next — the returned DataFrame still reads the new one lazily.
      s.catalog.listTables().collect()
        .filter(_.name.startsWith("q44_out_"))
        .foreach(t => s.catalog.dropTempView(t.name))
      val qname = s"q44_out_${System.nanoTime()}"
      val cp = java.nio.file.Files.createTempDirectory("graft-q44-cp").toString
      // State keyspace is tiny (hours × event types): 32 state-store
      // partitions would mean 32 stores + 32 tasks per micro-batch of
      // pure overhead. Sized at query start from the session conf;
      // restored after the drain (at 100 TB this knob instead scales UP
      // with the key cardinality).
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
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
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        // the drained result lives in the memory sink; the checkpoint is
        // single-use scratch — reclaim it (walk streams hold directory
        // handles open until closed)
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(cp))) { walk =>
          walk.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
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
    // SimHash Hamming<=1 near-dup pairs via probe-key explosion (bits+1
    // probe keys per doc, equi-join — never the O(N^2) pair space). The
    // oracle verifies with a direct bit_count(xor) pair scan, feasible
    // only at oracle scale.
    "q48_simhash_neardup" -> ((s, dir) => {
      // 1-in-3 sample: the synthetic corpus is near-dup-heavy, so the
      // pair OUTPUT grows quadratically with the clique sizes — the
      // sample keeps the benchmark measuring the probe-join design, not
      // result materialization.
      val d = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 3 === 1)
        .repartition(s.sparkContext.defaultParallelism)
      graft.operators.Dedup.simhashNearDupPairs(d, "text", "doc_id", bits = 16)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    }),
    // Multimodal pipeline: synthetic media table (binary payload + typed
    // metadata) -> partition-wise batched feature extraction (decode
    // stub) -> video frame sampling. Output is the float-free projection
    // so it hash-checks; the mapPartitions decode path still executes.
    "q49_multimodal_pipeline" -> ((s, dir) => {
      // null text/n_chars rows are dropped on BOTH sides: the engines'
      // null propagation through octet_length/range differs from the
      // stub's null-guards, and a null-payload media row is not a
      // meaningful pipeline input anyway.
      val media = graft.operators.Multimodal.syntheticMediaFromDocs(s, dir)
        .where(col("content").isNotNull && col("meta.duration_ms").isNotNull)
      val feats = graft.operators.Multimodal.extractFeatures(media)
        .select(col("media_id"), col("kind"), col("n_bytes"))
      val frames = graft.operators.Multimodal.sampleFrames(media)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      feats.join(frames, Seq("media_id"), "left")
        .withColumn("n_frames", coalesce(col("n_frames"), lit(0L)))
        .orderBy("media_id")
    }),
    // Skew-mitigation path: the q06 rollup computed through a salted
    // equi-join (hot keys spread over 8 sub-keys) and a two-phase
    // (partial-on-salt, final) aggregation. Row-identical to the plain
    // join by construction — the oracle is the plain SQL.
    "q50_salted_rollup" -> ((s, dir) => {
      val li = graft.Tables(s, dir, "lineitem")
      val p = graft.Tables(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      val joined = graft.operators.SkewJoin.saltedJoin(
        li, p, Seq("l_partkey"), saltFrom = col("l_orderkey"))
        .withColumn("rc", RelationalQueries.revenueCents)
      graft.operators.SkewJoin.twoPhaseAgg(
        joined, Seq("p_brand"), saltFrom = col("l_orderkey"), nSalts = 8)(
        Seq(sum(col("rc")).as("prc"), count(lit(1)).as("pn")),
        Seq(sum(col("prc")).as("revenue_cents"), sum(col("pn")).as("n_items")))
        .orderBy("p_brand")
    }),
    // Deterministic train/val split: md5-bucket hashing on the document
    // id — the reproducible-split primitive (same row lands in the same
    // split on any engine, any run, any cluster size; no RNG, no seed
    // coordination).
    "q54_det_split" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      d.withColumn("split", mdSplit)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
        .orderBy("split", "lang")
    }),
    // Decontamination: train docs sharing >= 5 distinct word-bigram
    // shingles with any val doc (q54's split). The scale shape is the
    // shared-shingle equi-join — work ∝ shingle collisions, never the
    // train × val cross product.
    "q56_decontam_overlap" -> ((s, dir) => {
      // 1-in-4 sample: the synthetic corpus's near-dup cliques make the
      // contaminated-pair OUTPUT quadratic in clique size (1.1M rows
      // unsampled at sf0.1) — the sample keeps the benchmark measuring
      // the shingle-join design, not result materialization.
      // single-row-group testdata => spread rows before the tokenizing
      // explode (many-file production layouts parallelize natively)
      val d = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 4 === 2)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("split", mdSplit)
        .select(col("doc_id"), col("split"),
          explode(graft.queries.TextQueries.wordBigrams).as("sh"))
      val tr = d.where(col("split") === "train")
        .select(col("doc_id").as("train_id"), col("sh"))
      val va = d.where(col("split") === "val")
        .select(col("doc_id").as("val_id"), col("sh"))
      tr.join(va, "sh")
        .groupBy("train_id", "val_id").agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 5)
        .orderBy("train_id", "val_id")
    }),
    // Supplier-side multiway rollup (J6/J9 shape on the one remaining
    // untouched testdata table): lineitem ⋈ supplier ⋈ nation, both
    // dims broadcast.
    "q55_supplier_rollup" -> ((s, dir) => {
      val li = graft.Tables(s, dir, "lineitem")
      val sup = graft.Tables(s, dir, "supplier")
      val nat = graft.Tables(s, dir, "nation")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(RelationalQueries.revenueCents).as("revenue_cents"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
        .orderBy("n_name")
    }),
    // Exact distributed median by distributed selection (no approximate
    // percentile): aggregate a per-(lang, value) histogram first (one
    // partial-agg shuffle; result size = distinct values per group, not
    // rows), then find the value whose cumulative count brackets the
    // median rank. The window runs over the HISTOGRAM — at 100 TB each
    // group's window input is its value cardinality, never its row
    // count, so no multi-TB single-task sort exists anywhere. The VALUE
    // at rank (n+1)/2 is tie-invariant, so this equals the naive
    // row_number formulation on any engine.
    "q57_exact_median" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .where(col("n_chars").isNotNull) // null sort position differs across engines
      val hist = d.groupBy("lang", "n_chars").agg(count(lit(1)).as("cnt"))
      val byVal = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("n_chars")
      hist
        .withColumn("cum", sum(col("cnt")).over(byVal))
        .withColumn("n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .where(col("cum") - col("cnt") < expr("(n + 1) div 2")
          && expr("(n + 1) div 2") <= col("cum"))
        .select(col("lang"), col("n").as("n_docs"),
          col("n_chars").as("median_chars"))
        .orderBy("lang")
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
      "q42_lsh_ann" -> {
        // Rademacher sign matrix from md5 parity; integer buckets; then
        // the q37-style exact quantized-cosine top-5 within each bucket.
        val quant = graft.queries.VectorQueries.quant
        s"""WITH sgn AS (
             SELECT p.range AS p, d.range AS d,
               CASE WHEN ascii(substr(md5(p.range || '|' || d.range), 1, 1)) % 2 = 1
                 THEN 1 ELSE -1 END AS s
             FROM range(0, 4) p, range(0, 64) d),
           e AS (SELECT vec_id, $quant AS q FROM embeddings),
           bits AS (
             SELECT e.vec_id, sgn.p,
               CASE WHEN sum(e.q[CAST(sgn.d + 1 AS INT)] * sgn.s) >= 0
                 THEN 1 ELSE 0 END AS bit
             FROM e, sgn GROUP BY e.vec_id, sgn.p),
           bucketed AS (
             SELECT vec_id, CAST(sum(bit * (1 << p)) AS BIGINT) AS bucket
             FROM bits GROUP BY vec_id),
           q AS (
             SELECT e.vec_id AS query_id, e.q AS qv, b.bucket
             FROM e JOIN bucketed b USING (vec_id) WHERE e.vec_id % 100 = 0),
           c AS (
             SELECT e.vec_id AS neighbor_id, e.q AS cv, b.bucket
             FROM e JOIN bucketed b USING (vec_id)),
           scored AS (
             SELECT query_id, neighbor_id,
               ${graft.queries.VectorQueries.cossq("qv", "cv")} AS cos_sq_scaled
             FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id),
           ranked AS (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sq_scaled DESC, neighbor_id) AS rank FROM scored)
           SELECT query_id, neighbor_id, cos_sq_scaled, rank
           FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
      },
      "q52_ivf_ann" -> {
        val quant = graft.queries.VectorQueries.quant
        def cossq(a: String, b: String) = graft.queries.VectorQueries.cossq(a, b)
        s"""WITH e AS (SELECT vec_id, $quant AS q FROM embeddings),
           cents AS (
             SELECT vec_id AS cell_id, q AS centroid FROM e
             ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
           casgn AS (
             SELECT * FROM (
               SELECT e.vec_id AS neighbor_id, e.q AS cv, cents.cell_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${cossq("e.q", "cents.centroid")} DESC, cents.cell_id) AS r
               FROM e CROSS JOIN cents) WHERE r = 1),
           qasgn AS (
             SELECT * FROM (
               SELECT e.vec_id AS query_id, e.q AS qv, cents.cell_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${cossq("e.q", "cents.centroid")} DESC, cents.cell_id) AS r
               FROM e CROSS JOIN cents WHERE e.vec_id % 100 = 0) WHERE r = 1),
           scored AS (
             SELECT query_id, neighbor_id, ${cossq("qv", "cv")} AS cos_sq_scaled
             FROM casgn JOIN qasgn USING (cell_id)
             WHERE query_id <> neighbor_id),
           ranked AS (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sq_scaled DESC, neighbor_id) AS rank FROM scored)
           SELECT query_id, neighbor_id, cos_sq_scaled, rank
           FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
      },
      "q58_kmeans_assign" -> {
        val quant = graft.queries.VectorQueries.quant
        def cossq(a: String, b: String) = graft.queries.VectorQueries.cossq(a, b)
        def assign(name: String, cents: String) =
          s"""$name AS (
             SELECT * FROM (
               SELECT e.vec_id, e.q, $cents.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   ${cossq("e.q", s"$cents.centroid")} DESC, $cents.cell) AS r
               FROM e CROSS JOIN $cents) WHERE r = 1)"""
        s"""WITH e AS (SELECT vec_id, $quant AS q FROM embeddings),
           c0 AS (SELECT vec_id AS cell, q AS centroid FROM e
                  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
           ${assign("a1", "c0")},
           c1 AS (
             SELECT cell, list(m ORDER BY d) AS centroid FROM (
               SELECT a1.cell, dd.range AS d,
                 CAST(floor(sum(a1.q[CAST(dd.range + 1 AS INT)]) / count(*)) AS BIGINT) AS m
               FROM a1, range(0, 64) dd GROUP BY a1.cell, dd.range)
             GROUP BY cell),
           ${assign("a2", "c1")}
           SELECT vec_id, cell FROM a2 ORDER BY vec_id"""
      },
      "q51_kmv_distinct" ->
        """WITH h AS (
             SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
             FROM events WHERE user_id IS NOT NULL),
           ranked AS (
             SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
             FROM h),
           st AS (
             SELECT event_type, count(*) AS nd,
               max(CASE WHEN rn = 64
                 THEN CAST(('0x' || substr(h, 1, 8)) AS BIGINT) END) AS vk
             FROM ranked WHERE rn <= 64 GROUP BY event_type)
           SELECT event_type,
             CAST(CASE WHEN nd < 64 THEN nd
               ELSE floor((63 * 4294967296) / (vk + 1)) END AS BIGINT) AS kmv_users
           FROM st ORDER BY event_type""",
      "q57_exact_median" ->
        """WITH h AS (
             SELECT lang, n_chars, count(*) AS cnt
             FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
           r AS (
             SELECT lang, n_chars, cnt,
               sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY lang) AS n
             FROM h)
           SELECT lang, CAST(n AS BIGINT) AS n_docs, n_chars AS median_chars
           FROM r WHERE cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum
           ORDER BY lang""",
      "q56_decontam_overlap" ->
        s"""WITH t AS (
             SELECT doc_id,
               ${graft.queries.TextQueries.tokenListSql} AS l,
               $mdSplitSql AS split
             FROM documents WHERE doc_id % 4 = 2),
           d AS (
             SELECT doc_id, split,
               unnest(${graft.queries.TextQueries.wordBigramsSql}) AS sh
             FROM t)
           SELECT a.doc_id AS train_id, b.doc_id AS val_id,
             count(*) AS n_shared
           FROM d a JOIN d b ON a.sh = b.sh
             AND a.split = 'train' AND b.split = 'val'
           GROUP BY 1, 2 HAVING count(*) >= 5
           ORDER BY train_id, val_id""",
      "q54_det_split" ->
        s"""SELECT $mdSplitSql AS split,
           lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
           FROM documents GROUP BY 1, 2 ORDER BY split, lang""",
      "q55_supplier_rollup" ->
        s"""SELECT n_name,
           ${graft.queries.RelationalQueries.revenueCentsSumSql} AS revenue_cents,
           count(DISTINCT s_suppkey) AS n_suppliers
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name""",
      "q50_salted_rollup" ->
        s"""SELECT p_brand,
           ${graft.queries.RelationalQueries.revenueCentsSumSql} AS revenue_cents,
           count(*) AS n_items
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY p_brand ORDER BY p_brand""",
      "q48_simhash_neardup" -> {
        val tokSet = graft.queries.TextQueries.sqlTokSet
        val sums = (0 until 16).map(i =>
          s"sum(CASE WHEN ascii(substr(md5(tok), ${i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s$i")
          .mkString(", ")
        val pack = (0 until 16).map(i =>
          s"(CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
        s"""WITH toks AS (
             SELECT doc_id, unnest($tokSet) AS tok FROM documents
             WHERE doc_id % 3 = 1),
           bits AS (SELECT doc_id, $sums FROM toks GROUP BY doc_id),
           sig AS (SELECT doc_id, CAST($pack AS BIGINT) AS sim FROM bits)
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(CASE WHEN a.sim = b.sim THEN 0 ELSE 1 END AS BIGINT) AS hamming
           FROM sig a JOIN sig b
             ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 1
           ORDER BY id_a, id_b"""
      },
      "q49_multimodal_pipeline" ->
        """WITH m AS (
             SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               n_chars * 100 AS duration_ms
             FROM documents
             WHERE text IS NOT NULL AND n_chars IS NOT NULL),
           fr AS (
             SELECT media_id, count(*) AS n_frames
             FROM (SELECT media_id,
                     unnest(range(0, duration_ms // 1000 + 1, 10)) AS f
                   FROM m WHERE kind = 'video') u
             GROUP BY media_id)
           SELECT m.media_id, m.kind, m.n_bytes,
             coalesce(fr.n_frames, 0) AS n_frames
           FROM m LEFT JOIN fr USING (media_id) ORDER BY media_id""",
      "q44_streaming_window" ->
        """WITH e AS (
             SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart,
               event_type, CAST(ts AS TIMESTAMP) AS tsu
             FROM events),
           wm AS (
             SELECT date_trunc('millisecond', max(tsu)) - INTERVAL 1 HOUR AS w
             FROM e)
           SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS hour, event_type,
             count(*) AS n
           FROM e, wm WHERE wstart + INTERVAL 1 HOUR <= wm.w
           GROUP BY 1, 2 ORDER BY hour, event_type""",
      "q45_sql_surface" ->
        """SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
}
