package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built ONLY with the extensions class (no Scala-side
  * registration calls) must expose the graft functions to SQL text. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions wires the function family into plain SQL") {
    // getOrCreate returns the shared suite session if one is alive and
    // ignores withExtensions — register into the live registry then
    // (exactly what spark.sql.extensions does at session build time).
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftColumnBridge.registerInto(ext, spark)
    try {
      import spark.implicits._
      val r = spark.sql(
        """SELECT token_set_ratio('organic tea', 'tea organic') AS tsr,
          |       indel_ratio('abc', 'abc') AS ir,
          |       partial_ratio('tea', 'green tea') AS pr,
          |       cosine_sq_scaled(array(1L, 0L), array(1L, 0L)) AS cs,
          |       simhash64('the quick fox') AS sh""".stripMargin)
        .as[(Double, Double, Double, Long, Long)].head()
      assert(r._1 == 100.0 && r._2 == 100.0 && r._3 == 100.0)
      assert(r._4 == 1000000L)
      assert(r._5 >= 0L && r._5 < (1L << 16))
    } finally {
      // leave the shared session for other suites
    }
  }
}
