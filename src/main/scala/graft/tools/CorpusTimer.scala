package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end `Engine.processCorpus` wall-clock probe:
  * runMain graft.tools.CorpusTimer <docsDir> — runs the WHOLE
  * training-data pipeline (NFC → line dedup → PII → exact dedup →
  * dup-passage removal → decontam → quality/budget → chunk + pack)
  * on `<docsDir>/documents.parquet` with the q86 passage geometry and
  * a corpus-derived eval slice, forcing every stage (the ledger
  * counts, then the two training outputs), and prints one JSON line:
  * the per-stage ledger plus total seconds. The facade's stages are
  * each oracle-gated individually; this measures their COMPOSITION at
  * whatever scale the caller points it at (sf0.1, target/synth-sf1…).
  */
object CorpusTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1 && args.length <= 2,
      "usage: CorpusTimer <docsDir> [budget|dsir|mixture|exactk|unimax]")
    val spark = graft.Tables.configure(
      SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select("doc_id", "lang", "text")
    val eval = docs.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    // selection policy under time (default: token budget). k = 500
    // binds per stratum at sf0.1 (~1k docs/lang) and harder at synth
    // sf1, so the policy's rank/score work is actually measured.
    val policy = if (args.length > 1) args(1) else "budget"
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
    val t0 = System.nanoTime()
    val r = graft.Engine.processCorpus(docs,
      decontamEval = Some(eval),
      removeDupWindows = Some((
        graft.queries.TextQueries.DupWindowTokens,
        graft.queries.TextQueries.DupAnchorMod)),
      budgetTokens = 5000000L,
      selection = selection,
      materializeBoundaries = true)
    // the ledger already ran count jobs for every stage INCLUDING the
    // two outputs — read them back instead of re-executing the chunk
    // explode and pack windows a second time (which would double-count
    // the tail-stage cost in `sec`)
    val rows = r.accounting.collect().sortBy(_.getInt(0))
    val ledger = rows.map(row => s""""${row.getString(1)}":${row.getLong(2)}""")
    val byStage = rows.map(row => row.getString(1) -> row.getLong(2)).toMap
      .withDefault(k => sys.error(
        s"accounting stage '$k' missing — Engine.processCorpus stage labels changed?"))
    val sec = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
    val secS = String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))
    // JSON-escape the interpolated path (quotes/backslashes in a dir
    // name must not corrupt the single-line artifact)
    val dirS = args(0).flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    println(s"""{"tool":"corpus-timer","dir":"$dirS","policy":"$policy","stages":{${ledger.mkString(",")}},"chunks":${byStage("chunks")},"packed":${byStage("packed_docs")},"sec":$secS}""")
    spark.stop()
  }
}
