package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a fully declarative DataFrame pipeline — the mergeable
  * frequency-sketch complement to [[HeavyHitters]]: where topKExact
  * answers "which items are frequent", the CMS answers "how frequent is
  * THIS item" for any later probe, from `depth × width` counters
  * regardless of corpus size.
  *
  * Scale shape (the reason this is a table, not a driver-side array):
  *  - building = ONE counting shuffle whose key space is at most
  *    `depth × width` (map-side partial agg crushes the exploded rows
  *    long before the exchange);
  *  - the sketch is ADDITIVE — sketches of disjoint corpus slices merge
  *    by `groupBy(row, bucket).sum(cnt)`, so at 100 TB each executor
  *    region builds its own and a tiny final agg combines them (that is
  *    literally what the partial/final hash aggregate already does);
  *  - probing broadcasts the sketch (≤ depth×width rows), never the
  *    corpus: estimates for a billion probe rows stay embarrassingly
  *    parallel.
  *
  * Determinism: buckets come from the repo's cross-engine hash contract
  * (md5 of the item salted with `#cms<row>`, first 15 hex chars parsed
  * as a 60-bit integer, mod width — reproducible bit-for-bit in DuckDB
  * via `CAST('0x'||substr(md5(..)) AS BIGINT)`), so the sketch and every
  * estimate hash-compare across engines. The structural guarantee
  * `estimate >= true count` (counters only ever overcount) is exposed
  * by callers as a pinnable flag.
  */
object CountMin {

  /** Rational over-approximation of Euler's e (2.718282 > e), kept as a
    * BIGINT fraction so the ε bound below is exact integer arithmetic —
    * bit-identical in Spark and DuckDB at any corpus size (double math
    * would drift past 2^53 tokens). */
  val EpsNum = 2718282L
  val EpsDen = 1000000L

  /** The CMS accuracy guarantee as a pinnable bound: with width w, each
    * estimate exceeds the true count by more than ⌈(e/w)·N⌉ only with
    * probability ≤ e^(-depth) (Cormode & Muthukrishnan, Thm 1). Integer
    * ceil via shifted-numerator floor division; `nTokCol` is the total
    * occurrence count N. Callers pin `est <= cnt + bound` TRUE so a
    * geometry regression (shrunk width, build/probe mismatch, a min
    * that stopped being a min) hash-fails instead of silently degrading. */
  def epsBound(nTokCol: String, width: Int): Column = {
    val den = EpsDen * width
    // DECIMAL(38,0), not long: EpsNum · N overflows int64 past N ≈ 3.4e12
    // tokens, a size a 100 TB corpus actually reaches
    expr(s"CAST((CAST(${EpsNum} AS DECIMAL(38,0)) * $nTokCol + ${den - 1}) div ${den} AS BIGINT)")
  }

  /** Bucket of `item` in sketch row `row` — the shared hash contract;
    * the DuckDB twin is [[graft.queries.TextQueries.sqlCmsBucket]]. */
  def bucket(item: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(item, lit(s"#cms$row"))), 1, 15), 16, 10)
      .cast("long") % width

  private def rowBuckets(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r => bucket(item, r, width)): _*)

  /** Builds the sketch table `(row int, bucket long, cnt long)` from an
    * item stream (one input row per occurrence). At most depth × width
    * output rows; absent (row, bucket) pairs mean zero. */
  def sketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth=$depth must be >= 1")
    require(width >= 1, s"width=$width must be >= 1")
    items
      // a NULL item would hash to an all-null bucket array and count
      // into (row, NULL) rows no estimate can ever read back (the
      // probe join never matches NULL) — dead mass in the sketch
      .where(col(itemCol).isNotNull)
      .select(posexplode(rowBuckets(col(itemCol), depth, width)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** As [[sketch]], but over a pre-aggregated (item, weight) histogram
    * — IDENTICAL output (the per-bucket sum of weights equals the
    * occurrence count), for callers that already hold the vocab-bounded
    * histogram and must not re-scan the corpus per sketch. */
  def sketchWeighted(items: DataFrame, itemCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth=$depth must be >= 1")
    require(width >= 1, s"width=$width must be >= 1")
    items
      .where(col(itemCol).isNotNull)
      .select(col(weightCol).cast("long").as("__w"),
        posexplode(rowBuckets(col(itemCol), depth, width)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(sum(col("__w")).as("cnt"))
  }

  /** Inner-product (equi-join size) estimate from two sketches built
    * with the SAME depth/width (Cormode & Muthukrishnan §4.2):
    * |A ⋈ B| = Σ_t fA(t)·fB(t) ≈ min over rows of Σ_bucket cA·cB.
    * Never under-estimates (collisions only add mass); exceeds the
    * truth by more than (e/width)·N_a·N_b with probability ≤
    * e^(-depth). Returns ONE row `(est_join long)`, SATURATED at
    * Long.MaxValue: the inner products live in DECIMAL(38,0) (they
    * pass 2⁶³ near the documented ~3e9-tokens-per-side bound where
    * N_a·N_b ≈ 9e18), and without the clamp a non-ANSI cast would
    * silently turn an above-range estimate into NULL. A saturated
    * Long.MaxValue still reads correctly as "this join is enormous"
    * for the cost model consulting it. The per-row sums are densified
    * over all `depth` rows — a row where the sketches share no bucket
    * must contribute 0 to the min, not vanish from it. Both inputs
    * are ≤ depth×width rows, so the join, the group and the min are
    * all sketch-sized — the estimate never touches either corpus. */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1, s"depth=$depth must be >= 1")
    val perRow = skA.as("x").join(skB.as("y"),
        col("x.row") === col("y.row") && col("x.bucket") === col("y.bucket"))
      .groupBy(col("x.row").as("row"))
      .agg(sum(expr("CAST(x.cnt AS DECIMAL(38,0)) * y.cnt")).as("ip"))
    val rowsD = skA.sparkSession.range(depth)
      .select(col("id").cast("int").as("row"))
    broadcast(rowsD).join(perRow, Seq("row"), "left")
      .agg(least(
          min(coalesce(col("ip"), lit(0).cast("decimal(38,0)"))),
          lit(Long.MaxValue).cast("decimal(38,0)"))
        .cast("long").as("est_join"))
  }

  /** Point-query estimates for `probes(itemCol)`: min over the sketch
    * rows of the probe's bucket counts (missing bucket = 0). Output is
    * ROW-PRESERVING — one result row per probe row, duplicates
    * included (an internal per-row id keeps identical probe rows
    * apart through the depth-explode/re-group). The sketch side
    * broadcasts; `depth`/`width` MUST match the build call (the hash
    * contract has no way to detect a mismatch — estimates would
    * silently read wrong buckets). */
  def estimate(sketchDf: DataFrame, probes: DataFrame, itemCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth=$depth must be >= 1")
    require(width >= 1, s"width=$width must be >= 1")
    val probeCols = probes.columns
    require(probeCols.contains(itemCol), s"probes has no column '$itemCol'")
    Seq("row", "bucket", "cms_est", "__cms_cnt", "__cms_pid").foreach(r =>
      require(!probeCols.contains(r), s"probe column '$r' is reserved"))
    // the sketch's count gets an internal alias so a probe-side `cnt`
    // (the natural name for an exact-count column) never collides
    val sk = sketchDf.select(
      col("row"), col("bucket"), col("cnt").as("__cms_cnt"))
    probes
      // per-probe-row id: grouping by the probe columns alone would
      // silently collapse duplicate probe rows into one estimate
      .withColumn("__cms_pid", monotonically_increasing_id())
      .select((col("__cms_pid") +: probeCols.map(col)) :+
        posexplode(rowBuckets(col(itemCol), depth, width)).as(Seq("row", "bucket")): _*)
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy((col("__cms_pid") +: probeCols.map(col)): _*)
      .agg(min(coalesce(col("__cms_cnt"), lit(0L))).as("cms_est"))
      .drop("__cms_pid")
  }
}
