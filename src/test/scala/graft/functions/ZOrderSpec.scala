package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: bit-exact interleave plus a MEASURED
  * data-skipping benefit — the layout claim ("z-sort prunes 2-D boxes
  * where a lexicographic sort prunes only its leading column") is
  * asserted on real parquet row-group statistics, not stated.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave2 matches hand-computed Morton keys, masks, guards") {
    // x=0b101, y=0b011, bits=3: z bits (low->high) x0,y0,x1,y1,x2,y2
    // = 1,1,0,1,1,0 -> 0b011011 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(got == 27L)
    // full-width diagonal: x=y=2^10-1 -> all 20 low bits set
    val diag = Seq((1023L, 1023L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 10).as("z"))
      .as[Long].head()
    assert(diag == (1L << 20) - 1)
    // out-of-range inputs wrap to the masked low bits (no corruption)
    val wrapped = Seq((1024L + 5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 10).as("z"))
      .as[Long].head()
    val plain = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 10).as("z"))
      .as[Long].head()
    assert(wrapped == plain)
    intercept[IllegalArgumentException] {
      ZOrder.interleave2(col("x"), col("y"), 0)
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave2(col("x"), col("y"), 32)
    }
  }

  test("interleave2 round-trips against a driver-side reference on random points") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 12).toLong,
      rnd.nextInt(1 << 12).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave2(col("x"), col("y"), 12).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 12), s"($x,$y)") }
  }

  test("z-clustered layout prunes a 2-D box scan that a lexicographic sort cannot") {
    // 64k uniform points on a 256x256 grid, written twice with 4 KiB
    // parquet row groups: once sorted by x (the lexicographic layout),
    // once through ZOrder.cluster. A 1/8 x 1/8 box predicate then hits
    // the scan: the x-sorted layout's row groups are tight on x only
    // (y spans everything -> min/max prunes just the x range), while
    // the z-clustered groups are tight on BOTH dims. Scan-node output
    // rows measure the rows that SURVIVED row-group pruning.
    val n = 65536
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(n)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextLong())).toDF("x", "y", "payload")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    pts.orderBy("x").coalesce(1).write
      .option("parquet.block.size", "4096").parquet(s"$base/lex")
    ZOrder.cluster(pts, "x", "y", 8, 1).coalesce(1).write
      .option("parquet.block.size", "4096").parquet(s"$base/zord")
    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .where(col("x") >= 96 && col("x") < 128 &&
          col("y") >= 96 && col("y") < 128)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val scans = (plan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      } :+ plan).flatMap(_.collect { case f: FileSourceScanExec => f })
      assert(scans.nonEmpty, "no parquet scan in plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val lex = scannedRows(s"$base/lex")
    val zord = scannedRows(s"$base/zord")
    info(s"rows surviving row-group pruning: lex=$lex zord=$zord of $n")
    // identical query answers either way
    assert(spark.read.parquet(s"$base/lex")
      .where(col("x") >= 96 && col("x") < 128 &&
        col("y") >= 96 && col("y") < 128).count() ==
      spark.read.parquet(s"$base/zord")
        .where(col("x") >= 96 && col("x") < 128 &&
          col("y") >= 96 && col("y") < 128).count())
    // the box is 1/64 of the grid: z-layout must beat the x-only
    // layout by at least 2x (measured is typically far better)
    assert(zord * 2 <= lex,
      s"z-order layout did not out-prune the lexicographic one: $zord vs $lex")
  }
}
