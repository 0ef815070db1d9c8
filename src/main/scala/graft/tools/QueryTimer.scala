package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.QueryTimer <name> <sfDir> [runs]. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq else Nil
    if (args.length < 2 || args.length > 3 ||
        !names.forall(graft.SparkEntry.queries.contains) ||
        (args.length == 3 && args(2).toIntOption.isEmpty)) {
      System.err.println("usage: QueryTimer <query-name>[,<name>…] <sfDir> [runs]\n" +
        "queries: " + graft.SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val dir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Tables.configure(
      SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // q01 is the bench's load gauge (quiet warm ≈ 0.3-0.4 s at sf0.1
    // on 32 cpus): one warmup + one timed run so each timer session is
    // comparable to every other under co-tenant load
    graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    val g0 = System.nanoTime()
    graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    println(f"[timer] gauge_q01 ${(System.nanoTime() - g0) / 1e9}%.2f s")
    names.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[timer] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
