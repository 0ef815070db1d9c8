package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-dominant scale study for the heavy document-pipeline family.
  *
  * The shipped testdata tops out at sf0.1 (5k documents), where the
  * round-5 exponent study showed the suite is still overhead-bound —
  * the heavy queries (q36/q48/q53/q65, exponents +0.19..+0.48 over
  * sf0.01→sf0.1) had never run at a size where data dominates fixed
  * job/shuffle cost. This main closes that gap:
  *
  *  1. Synthesizes a 10× corpus ("synth sf1", 50k docs) from sf0.1
  *     documents and persists it to parquet under `target/synth-sf1/`.
  *     Replica k > 0 remaps `doc_id` by k·[[IdOffset]] and applies the
  *     token bijection t → "t_rk" to `text`. A bijection on tokens
  *     preserves every intra-replica shingle-set relation EXACTLY
  *     (Jaccard, bigram/trigram repetition mass, token counts), while
  *     making cross-replica token spaces disjoint — so true near-dup
  *     MASS scales linearly with the corpus, the shape a real 10×
  *     crawl has. Naive replication would instead make every doc a
  *     member of a 10-clique of exact duplicates and force the pair
  *     output quadratic by construction, measuring nothing real.
  *  2. Runs the heavy queries at sf0.1 and synth-sf1 (one warmup pass
  *     + best-of-3, the `Bench` protocol) and prints ONE JSON line
  *     with both times and the per-query scale exponent
  *     log10(t_sf1 / t_sf0.1) — 1.0 = linear in the 10× step.
  *
  * The q01 warm gauge from `Bench` rides along (on sf0.1, whose dir
  * has the full table set) so a noisy window is self-evident.
  */
object ScaleStudy {

  /** doc_id remap stride between replicas. Divisible by 420 =
    * lcm(3, 4, 5, 7) — every `doc_id % m` residue filter used by the
    * gated queries (m ∈ {3,4,5,7,21}, all dividing 420 evenly in the
    * modulus sense: 420 ≡ 0 mod each) selects the SAME rows in every
    * replica, so the studied input is exactly 10× the sf0.1 input. */
  val IdOffset: Long = 10000200L
  require(IdOffset % 420 == 0)

  val Replicas = 10

  /** The heavy document-family queries. Notes on the two round-6
    * additions: q78's eval gram set grows 10× past the Bloom bitset's
    * capacity, so its synth-sf1 point measures the saturated-prefilter
    * worst case (everything exact-confirmed) — the confirm equi-join's
    * collision mass is linear by replica disjointness, which is
    * exactly the claim worth measuring. q79's fixed keyword workload
    * matches only replica 0 (salted tokens are disjoint), so its
    * exponent isolates the corpus-proportional scan/explode/semi-join
    * stage; the postings-proportional stages are workload-bound.
    * q83 (two corpus scans: Space-Saving summaries + candidate
    * recount) runs its UNPROVABLE regime at synth sf1 — the token
    * bijection grows the vocab 10× past the counter budget, so
    * provably_exact flips false there (the honest answer; q83's oracle
    * pins the provable regime at the real SFs) — while the scan/
    * recount cost being measured is unaffected by the flag.
    * q84 (Count-Min) also scans the corpus twice — sketch build plus
    * the exact top-K probe agg — but both shuffles have bounded key
    * spaces (depth×width buckets; vocab capped by the probe LIMIT), so
    * its exponent isolates pure scan/explode growth.
    * q85 (chunking) is the shuffle-free floor: pure projection +
    * explode + the oracle sort — its exponent is the output-mass
    * growth itself. q86 (dup passages) adds the window-frequency
    * countDistinct shuffle and the hash-keyed join back; the token
    * bijection keeps replicas' window spaces disjoint, so the distinct-
    * window key space grows 10× and the dup mass stays linear. */
  val HeavyQueries: Seq[String] = Seq(
    "q36_jaccard_pairs", "q48_simhash_neardup",
    "q53_dedup_components", "q65_repetition_stats",
    "q78_bloom_decontam", "q79_bm25_topk", "q83_heavy_hitters",
    "q84_cms_counts", "q85_chunk_windows", "q86_dup_passages")

  /** One replica of `documents`: identity for k = 0, else id-shifted and
    * token-salted. Exposed for the spec that pins the bijection
    * contract (intra-replica similarity preserved, replicas disjoint). */
  def replica(docs: DataFrame, k: Int): DataFrame =
    if (k == 0) docs
    else {
      // token bijection: append a replica tag to every \S+ run
      val salted = regexp_replace(col("text"), "(\\S+)", "$1_r" + k)
      docs.select(
        (col("doc_id") + lit(k * IdOffset)).as("doc_id"),
        salted.as("text"),
        col("lang"), col("source"),
        length(salted).cast("long").as("n_chars"))
    }

  /** Builds `outDir/documents.parquet` (10× the source) unless a synth
    * corpus built from the SAME source is already there. The reuse key
    * is (srcDir, source row count) stamped in a sidecar — a bare
    * _SUCCESS check would silently reuse a stale corpus after the
    * source dir is swapped for a different same-size fixture. */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val d = spark.read.parquet(s"$srcDir/documents.parquet")
    val nSrc = d.count()
    require(nSrc > 0, s"$srcDir/documents.parquet is empty — nothing to replicate")
    // content-sensitive reuse key: row count alone can't see a fixture
    // regenerated in place, so fold in the source files' (size, mtime)
    val srcFile = new java.io.File(s"$srcDir/documents.parquet")
    val parts =
      if (srcFile.isDirectory) srcFile.listFiles().sortBy(_.getName).toSeq
      else Seq(srcFile)
    val sig = parts.map(f => s"${f.length()}:${f.lastModified()}").mkString(",")
    val stamp = s"""{"src":"$srcDir","rows":$nSrc,"sig":"$sig"}"""
    val sidecar = java.nio.file.Paths.get(s"$outDir/source.json")
    val marker = new java.io.File(s"$outDir/documents.parquet/_SUCCESS")
    if (marker.exists() && java.nio.file.Files.exists(sidecar) &&
        new String(java.nio.file.Files.readAllBytes(sidecar),
          java.nio.charset.StandardCharsets.UTF_8) == stamp) return
    // drop any stale stamp FIRST: a rebuild killed between the corpus
    // write and the sidecar write must never leave the old stamp paired
    // with the new corpus
    java.nio.file.Files.deleteIfExists(sidecar)
    // the bijection/disjointness contract holds only if the SOURCE has
    // no replica-tagged tokens and no ids at or past the remap stride —
    // srcDir is caller-overridable, so check the corpus, not just the
    // shipped fixture (ScaleStudySpec pins the toy-level contract)
    val guard = d.agg(
      max(col("doc_id")).as("max_id"),
      sum(when(col("text").rlike("_r\\d+(\\s|$)"), 1L).otherwise(0L))
        .as("tagged")).head()
    require(guard.getAs[Long]("max_id") < IdOffset,
      s"source doc_id ${guard.getAs[Long]("max_id")} >= IdOffset $IdOffset: replica id ranges would collide")
    require(guard.getAs[Long]("tagged") == 0L,
      "source text contains replica-tagged tokens (…_r<k>): cross-replica disjointness would break")
    val full = (0 until Replicas).map(replica(d, _)).reduce(_ unionByName _)
      // spread across files so the scan parallelizes like a real
      // many-file corpus (the sf0.1 fixture is a single row group)
      .repartition(spark.sparkContext.defaultParallelism)
    full.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    java.nio.file.Files.write(sidecar,
      stamp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def bestOf(runs: Int)(body: => Unit): Double =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val synthDir = sys.env.getOrElse("SPARK_GRAFT_SYNTH_DIR", "target/synth-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    synthesize(spark, sfDir, synthDir)
    val n01 = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val n1 = spark.read.parquet(s"$synthDir/documents.parquet").count()
    require(n1 == n01 * Replicas, s"synth corpus $n1 != $Replicas x $n01")

    // load gauge on the full-table sf0.1 dir (the Bench convention)
    val q01 = SparkEntry.queries("q01_pricing_summary")
    q01(spark, sfDir).count()
    val gauge = bestOf(3)(q01(spark, sfDir).count())

    def cs(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val rows = HeavyQueries.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + planning
      val t01 = bestOf(3)(fn(spark, sfDir).count())
      fn(spark, synthDir).count()
      val t1 = bestOf(3)(fn(spark, synthDir).count())
      val exp = math.log10(t1 / t01)
      s""""${name.takeWhile(_ != '_')}":{"sf01":${cs(t01)},"sf1":${cs(t1)},"exp":${cs(exp)}}"""
    }
    println(s"""{"study":"sf0.1->synth-sf1","docs_sf1":$n1,"gauge_q01":${cs(gauge)},"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
