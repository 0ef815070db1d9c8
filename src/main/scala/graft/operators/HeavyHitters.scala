package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact top-k frequent items WITHOUT a full-cardinality shuffle — the
  * two-pass heavy-hitters pattern for vocabulary/frequency work at
  * corpus scale, where `groupBy(token)` would shuffle one row per
  * distinct token per partition and build unbounded partial-agg hash
  * tables (billions of distinct n-grams at 100 TB):
  *
  *   pass A  per-partition Space-Saving summaries (Metwally, Agrawal,
  *           El Abbadi, "Efficient computation of frequent and top-k
  *           elements in data streams", ICDT 2005) — m counters of
  *           bounded memory per partition, emitting candidate items
  *           plus the partition's item total;
  *   pass B  exact recount of ONLY the candidates (broadcast semi-join
  *           against the corpus, then a hash agg whose key space is
  *           capped by |candidates| <= m × partitions), partial top-k.
  *
  * Exactness is PROVABLE, not hoped-for: Space-Saving's invariant is
  * that any item with partition-local count > n_p/m survives in the
  * summary, and by pigeonhole any item with global count > N/m exceeds
  * n_p/m in at least one partition — so if the k-th recounted candidate
  * has cnt_k > N/m (strictly, which also covers rank-k ties), the
  * candidate set provably contains the true top-k and the result equals
  * the exact answer. The returned `provably_exact` flag states exactly
  * that bound; an oracle pinning it to TRUE makes an undersized `m`
  * fail loud. Even unprovable runs fail loud, not wrong: a missing
  * true-top-k item changes the output rows themselves.
  *
  * The imperative per-partition summary is the one place composition
  * genuinely can't express the semantics (bounded counters with
  * eviction under a streaming pass); everything around it — recount,
  * top-k, gate — is declarative and stays in codegen.
  */
object HeavyHitters {

  /** Space-Saving stream summary: at most `m` counters; eviction
    * replaces the min counter and inherits its count (the classic
    * overestimate that preserves the "count > n/m survives" guarantee).
    * O(log m) per item via a (count, item) tree for min lookup.
    */
  private[graft] final class SpaceSaving(m: Int) {
    private val counts = scala.collection.mutable.HashMap.empty[String, Long]
    private val byCount = scala.collection.mutable.TreeSet.empty[(Long, String)]
    private var seen = 0L

    /** Seed a counter during summary restore (streaming-state resume).
      * Only valid while under capacity and for fresh items — restore
      * replays a summary that was produced by THIS class, so both
      * invariants hold by construction; fail loud otherwise. */
    private[graft] def seed(t: String, c: Long): Unit = {
      require(counts.size < m && !counts.contains(t),
        s"seed($t) on a full or duplicate summary")
      counts(t) = c; byCount += ((c, t))
    }

    /** Restore the stream position during summary restore. */
    private[graft] def restoreSeen(x: Long): Unit = { seen = x }

    /** Current (item, estimated count) entries. */
    private[graft] def entries: Iterator[(String, Long)] = counts.iterator

    def add(t: String): Unit = {
      // fail loud, not with a TreeSet-ordering NPE: the (count, item)
      // tree cannot order a null key, and a null "item" has no count
      // semantics anyway — callers tokenize/filter upstream
      require(t != null, "null item in heavy-hitter stream")
      seen += 1
      counts.get(t) match {
        case Some(c) =>
          byCount -= ((c, t)); counts(t) = c + 1; byCount += ((c + 1, t))
        case None if counts.size < m =>
          counts(t) = 1L; byCount += ((1L, t))
        case None =>
          val (mc, mt) = byCount.head
          byCount -= ((mc, mt)); counts -= mt
          counts(t) = mc + 1; byCount += ((mc + 1, t))
      }
    }

    def n: Long = seen
    def keys: Iterator[String] = counts.keysIterator
  }

  /** @param items    the item stream (one row per occurrence)
    * @param k        result size; ties at rank k break by item asc
    * @param counters Space-Saving counters per partition (`m`) — memory
    *                 bound AND provability knob: results are provably
    *                 exact when the k-th count exceeds N/m
    * @return k rows of (item, cnt, provably_exact), cnt descending
    */
  def topKExact(items: Dataset[String], k: Int, counters: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(counters >= 1, s"counters=$counters must be >= 1")
    val spark = items.sparkSession
    import spark.implicits._
    // pass A — one corpus scan; the "" sentinel row (never a real item:
    // callers tokenize away empties, and a real "" would simply become
    // a candidate) carries the partition total for N
    val summaries = items.mapPartitions { it =>
      val ss = new SpaceSaving(counters)
      it.foreach(ss.add)
      ss.keys.map(t => (t, 0L)) ++ Iterator(("", ss.n))
    }.toDF("item", "part_n")
      // cut lineage so summaries (feeding both N and the candidate
      // join) run pass A's corpus scan ONCE — EAGER, because the two
      // broadcast subqueries downstream materialize on independent
      // threads and a lazy checkpoint only caches partitions as the
      // first job completes them, so concurrent jobs could each rerun
      // the full scan. The checkpointed blocks are tiny (at most
      // (m+1) x partitions rows) and are freed by the context cleaner
      // once the returned plan is dropped
      .localCheckpoint(true)
    val total = summaries.agg(sum(col("part_n")).as("n_items"))
    val candidates = summaries.where(col("part_n") === 0L)
      .select(col("item")).distinct()
    // pass B — recount only candidates; the agg key space is bounded
    // by |candidates|, and only candidate rows reach the shuffle. The
    // gate reads cnt_k via a window over the k-row top-k result (post
    // limit, so the frame is bounded by k), keeping pass B ONE lazy
    // plan instead of a checkpoint + rescan
    val wk = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    items.toDF("item")
      .join(broadcast(candidates), Seq("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)
      .withColumn("cnt_k", min(col("cnt")).over(wk))
      .crossJoin(broadcast(total)) // k rows x 1 row
      // DECIMAL(38,0) product: cnt_k·m wraps int64 at corpus scale
      // (N ~ 2e13 with m ~ 1e6) and would silently flip the flag under
      // non-ANSI arithmetic — same discipline as CountMin.epsBound; the
      // DuckDB twin's BIGINT product upcasts to HUGEINT in lockstep.
      .select(col("item"), col("cnt"),
        (col("cnt_k").cast("decimal(38,0)") * counters >
          col("n_items").cast("decimal(38,0)")).as("provably_exact"))
  }
}
