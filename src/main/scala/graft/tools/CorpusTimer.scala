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
    require(args.length == 1, "usage: CorpusTimer <docsDir>")
    val spark = graft.Tables.configure(
      SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select("doc_id", "lang", "text")
    val eval = docs.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val r = graft.Engine.processCorpus(docs,
      decontamEval = Some(eval),
      removeDupWindows = Some((
        graft.queries.TextQueries.DupWindowTokens,
        graft.queries.TextQueries.DupAnchorMod)),
      budgetTokens = 5000000L,
      materializeBoundaries = true)
    val ledger = r.accounting.collect()
      .sortBy(_.getInt(0))
      .map(row => s""""${row.getString(1)}":${row.getLong(2)}""")
    val nChunks = r.chunks.count()
    val nPacked = r.packed.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"tool":"corpus-timer","dir":"${args(0)}","stages":{${ledger.mkString(",")}},"chunks":$nChunks,"packed":$nPacked,"sec":${f"$sec%.2f"}}""")
    spark.stop()
  }
}
