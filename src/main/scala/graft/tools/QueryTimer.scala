package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.QueryTimer <name> <sfDir> [runs]. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3 ||
        !graft.SparkEntry.queries.contains(args(0)) ||
        (args.length == 3 && args(2).toIntOption.isEmpty)) {
      System.err.println("usage: QueryTimer <query-name> <sfDir> [runs]\n" +
        "queries: " + graft.SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0); val dir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Tables.configure(
      SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[timer] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
