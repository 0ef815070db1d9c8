package graft.tools
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
/** Dumps formatted plans for selected queries to stdout for plan review. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder(), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q06_rev_by_brand", "q09_multiway_rollup",
      "q37_knn_bruteforce", "q35_lsh_pairs")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
