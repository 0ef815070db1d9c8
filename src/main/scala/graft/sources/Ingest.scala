package graft.sources

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion sources (S1-S5).
  *
  * - CSV with encoding detection: the reference probes utf-8, utf-8-sig,
  *   latin-1, cp1252, iso-8859-1 on the head of the file and takes the
  *   first that decodes (reference `app/etl.py:15-36`). Here the probe
  *   reads the first KB driver-side and the winning charset feeds
  *   `spark.read.option("encoding", …)` — the scan itself is fully
  *   distributed.
  * - Excel (S2/S3): no zero-egress Spark Excel reader exists; the
  *   capability is modeled as a pre-flight container validation +
  *   driver-side conversion hook producing parquet/CSV for the scan.
  * - JSON dimension scan (S4) and parquet staging (S9).
  */
object Ingest {

  val EncodingLadder: Seq[String] =
    Seq("UTF-8", "windows-1252", "ISO-8859-1")

  /** Probe the first `probeBytes` of a local file; first charset that
    * decodes without error wins (BOM-stripped UTF-8 counts as UTF-8). */
  def detectEncoding(path: String, probeBytes: Int = 1024): String = {
    val all = Files.readAllBytes(Paths.get(path))
    val head = all.take(probeBytes)
    EncodingLadder.find { name =>
      val dec: CharsetDecoder = Charset.forName(name).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      try { dec.decode(java.nio.ByteBuffer.wrap(head)); true }
      catch { case _: Exception => false }
    }.getOrElse("ISO-8859-1") // latin-1 accepts any byte — final fallback
  }

  /** S1: encoding-probed CSV scan with header. */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val enc = detectEncoding(path)
    val base = spark.read
      .option("header", "true")
      .option("encoding", enc)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
  }

  /** S3: pre-flight container validation for xlsx (a real zip with an
    * `xl/` entry). Returns a typed error instead of a parser crash. */
  def validateXlsxContainer(path: String): Either[String, Unit] = {
    try {
      val zf = new java.util.zip.ZipFile(path)
      try {
        val entries = zf.entries()
        var hasXl = false
        while (entries.hasMoreElements && !hasXl)
          hasXl = entries.nextElement().getName.startsWith("xl/")
        if (hasXl) Right(()) else Left("not an Excel workbook: missing xl/ entries")
      } finally zf.close()
    } catch {
      case e: Exception => Left(s"corrupt container: ${e.getMessage}")
    }
  }

  /** S4: multiline JSON dimension scan (e.g. a country list). */
  def readJsonDim(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S9: parquet staging write, partitioned when a column is given. */
  def stage(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S7: single-file CSV report sink (driver-side post-step keeps the
    * reference's one-file-per-report contract). */
  def writeCsvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
