package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end `Engine.processCorpus` wall-clock probe:
  * runMain graft.tools.CorpusTimer <docsDir> — runs the WHOLE
  * training-data pipeline (NFC → line dedup → PII → exact dedup →
  * LSH near-dup + components keeper cut → dup-passage removal →
  * decontam → quality/budget → chunk + pack) on
  * `<docsDir>/documents.parquet` with the q86 passage geometry and
  * a corpus-derived eval slice, forcing every stage (the ledger
  * counts, then the two training outputs), and prints one JSON line:
  * the per-stage ledger plus total seconds. The facade's stages are
  * each oracle-gated individually; this measures their COMPOSITION at
  * whatever scale the caller points it at (sf0.1, target/synth-sf1…).
  *
  * Round 13 adds (a) the `nearDedup` stage (800 mills — the fuzzy
  * within-corpus cut a production pipeline runs between exact dedup
  * and passage surgery), so absolute seconds are NOT comparable to
  * the round-7/8 history rows (BASELINE.md records the protocol
  * change), and (b) the end-to-end CORPUS SCAN count: Hadoop's global
  * `file`-scheme storage statistics bracket the run, so the composed
  * claim "stage scans don't multiply" is measured, not argued —
  * `fs_bytes_read` ÷ a measured single-scan cost ≈ effective
  * full-corpus STORAGE reads, the number a 100 TB bill is written in.
  * (Task `inputMetrics.recordsRead` was the first attempt and is the
  * wrong metric here: Spark reports CACHED-block reads as task input,
  * so every action against a localCheckpoint boundary inflated it
  * ~10× over the true storage traffic. Checkpoint/cache/shuffle reads
  * never touch the Hadoop FS counters — which is exactly the point:
  * with `materializeBoundaries` the raw corpus is re-read a bounded
  * number of times, everything else rides the stage boundaries.) */
object CorpusTimer {

  /** One composed run's measurements: wall seconds, the stage ledger
    * in stage order, physical bytes read from local storage during the
    * run, and the measured cost of ONE full (doc_id, lang, text) scan
    * of the same corpus as the normalizer — raw file size would be the
    * wrong denominator (column pruning + page compression make one
    * projected scan far smaller than the file). */
  case class Composed(sec: Double, stages: Seq[(String, Long)],
      fsBytesRead: Long, oneScanBytes: Long, nDocs: Long) {
    def scans: Double =
      if (oneScanBytes > 0) fsBytesRead.toDouble / oneScanBytes else -1.0
  }

  /** Runs the composed pipeline once on `<docsDir>/documents.parquet`
    * and measures it — shared by this tool's main and `graft.Bench`'s
    * per-round composed row (ONE protocol, two consumers; single-shot
    * timing in both so the rows stay comparable). */
  def composedRun(spark: SparkSession, docsDir: String,
      policy: String = "budget"): Composed = {
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val eval = docs.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    // selection policy under time (default: token budget). k = 500
    // binds per stratum at sf0.1 (~1k docs/lang) and harder at synth
    // sf1, so the policy's rank/score work is actually measured.
    val selection = policy match {
      case "budget" => None
      case "dsir" => Some(graft.Engine.DsirSelection(
        docs.where(col("lang") === "en").select(col("doc_id"), col("text")),
        topK = 500))
      case "mixture" => Some(graft.Engine.MixtureSelection(
        1L, Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.5), 0.25))
      case "exactk" => Some(graft.Engine.ExactKSelection(1L, 500))
      // 2-epoch capacity at a 40% budget: every stratum waterlines at
      // sf0.1 and beyond, so the histogram kernel's selection work is
      // actually measured (the q136/q137 geometry would cap the small
      // strata and skip their cut)
      case "unimax" => Some(graft.Engine.UnimaxSelection(
        maxEpochs = 2, budgetPerMille = Some(400L)))
      case other => sys.error(s"unknown policy '$other'")
    }
    // physical-read bracket: the local[*] executor shares this JVM, so
    // Hadoop's global `file`-scheme statistics see every parquet read
    // the run issues (cache/checkpoint/shuffle traffic bypasses them)
    def fsBytesRead(): Long = {
      val s = org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics.get("file")
      if (s == null) 0L else s.getLong("bytesRead")
    }
    val nDocs = docs.count() // footer metadata only — before calibration
    // calibrate: one full scan of the pipeline's own projection, so
    // `scans` is in units of "passes the pipeline would pay", not raw
    // file bytes (pruning + compression make those incomparable)
    val c0 = fsBytesRead()
    docs.agg(max(length(col("text"))), max(col("doc_id")),
      count(col("lang"))).head()
    val oneScanBytes = fsBytesRead() - c0
    val before = fsBytesRead()
    val t0 = System.nanoTime()
    val r = graft.Engine.processCorpus(docs,
      decontamEval = Some(eval),
      removeDupWindows = Some((
        graft.queries.TextQueries.DupWindowTokens,
        graft.queries.TextQueries.DupAnchorMod)),
      nearDedup = Some(800),
      budgetTokens = 5000000L,
      selection = selection,
      materializeBoundaries = true)
    // the ledger already ran count jobs for every stage INCLUDING the
    // two outputs — read them back instead of re-executing the chunk
    // explode and pack windows a second time (which would double-count
    // the tail-stage cost in `sec`)
    val rows = r.accounting.collect().sortBy(_.getInt(0))
    val sec = (System.nanoTime() - t0) / 1e9
    Composed(sec, rows.map(row => row.getString(1) -> row.getLong(2)).toSeq,
      fsBytesRead() - before, oneScanBytes, nDocs)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1 && args.length <= 2,
      "usage: CorpusTimer <docsDir> [budget|dsir|mixture|exactk|unimax]")
    val spark = graft.Tables.configure(
      SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val policy = if (args.length > 1) args(1) else "budget"
    val c = composedRun(spark, args(0), policy)
    val ledger = c.stages.map { case (k, v) => s""""$k":$v""" }
    val byStage = c.stages.toMap.withDefault(k => sys.error(
      s"accounting stage '$k' missing — Engine.processCorpus stage labels changed?"))
    // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // JSON-escape the interpolated path (quotes/backslashes in a dir
    // name must not corrupt the single-line artifact)
    val dirS = args(0).flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c0 if c0 < ' ' => f"\\u${c0.toInt}%04x"
      case c0 => c0.toString
    }
    // corpus_scans: physical bytes read ÷ the measured one-scan cost —
    // effective full-corpus storage reads (footer re-reads and the
    // eval slice ride the same files, so the ratio is a slight upper
    // bound on semantic passes)
    println(s"""{"tool":"corpus-timer","dir":"$dirS","policy":"$policy","stages":{${ledger.mkString(",")}},"chunks":${byStage("chunks")},"packed":${byStage("packed_docs")},"fs_bytes_read":${c.fsBytesRead},"one_scan_bytes":${c.oneScanBytes},"n_docs":${c.nDocs},"corpus_scans":${fmt(c.scans)},"sec":${fmt(c.sec)}}""")
    spark.stop()
  }
}
