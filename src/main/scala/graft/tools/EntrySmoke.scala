package graft.tools
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke: a plain session (none of our configs)
  * calling SparkEntry.entry and checking rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
  }
}
