package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming upsert: each micro-batch is reconciled into a keyed target
  * table via the set-oriented MERGE (graft.operators.Merge) inside
  * `foreachBatch` — the streaming twin of the reference's incremental
  * per-file push (reference `app/etl.py:904-930` + `app/routes.py`
  * upsert loop), with exactly-once effect from the checkpoint + an
  * idempotent last-writer-wins merge.
  *
  * Scale notes: the target stays partitioned parquet; each micro-batch
  * performs one full-outer shuffle join on the key (bounded by batch
  * size × target partitions touched); with a Delta-style table format
  * the same `foreachBatch` body becomes a transactional MERGE INTO
  * without changing the streaming graph.
  */
object StreamingMerge {

  /** The filesystem OF THE PATH, never FileSystem.get's default FS:
    * with fs.defaultFS=hdfs and an s3a:// target (or vice versa) the
    * default-FS handle throws "Wrong FS" on every exists/rename and the
    * crash-safe swap never commits a batch. */
  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `targetDir` with trailing slashes stripped: `"/tgt/" + "__staging"`
    * would nest the staging INSIDE the live target, and the first swap
    * would then try to rename the target into its own descendant
    * (deterministic failure with a misleading message). */
  private def normDir(d: String): String = {
    val n = d.replaceAll("/+$", "")
    require(n.nonEmpty, s"targetDir '$d' normalizes to empty")
    n
  }

  /** Crash-safe staged swap: parquet has no transaction, so the swap
    * keeps the invariant that at EVERY instant at least one of
    * `targetDir` / `targetDir + "__old"` holds a complete state, and
    * [[readState]] prefers `targetDir`. A naive delete-then-rename has
    * a window where a crash loses the target entirely and the
    * checkpoint already marks earlier batches committed — state would
    * silently reset. Order here: (1) move the live target ASIDE (one
    * rename), (2) move staging IN (one rename), (3) drop the aside.
    * A crash between (1) and (2) recovers the pre-batch state from the
    * aside dir and the engine replays the uncommitted batch; a crash
    * between (2) and (3) leaves a stale aside that the next swap
    * clears. Replay semantics: the KEY/VALUE state of both merge
    * kernels is idempotent (re-applying a batch reproduces the same
    * rows), so a post-swap pre-checkpoint crash replays to identical
    * data; the one divergence is applyCdc's `cdc_src` bookkeeping,
    * which relabels that batch's freshly inserted keys "updated" on
    * such a replay (the key now exists in the re-read state) — the
    * label is honest about what the replayed apply saw, and the
    * key/seq/payload columns are unchanged.
    *
    * FILESYSTEM contract: the invariant rests on directory rename
    * being ATOMIC — true on HDFS and POSIX-like filesystems. On an
    * object store (s3a), rename is a per-object copy+delete, so a
    * crash mid-"rename" can leave BOTH prefixes partial; point
    * targetDir at a rename-atomic FS (or swap this body for a table
    * format's transactional MERGE) when running against object
    * storage. */
  private def swapIn(
      spark: SparkSession, staging: String, targetDir0: String): Unit = {
    val targetDir = normDir(targetDir0)
    val fs = fsOf(spark, targetDir)
    val tgt = new org.apache.hadoop.fs.Path(targetDir)
    val aside = new org.apache.hadoop.fs.Path(targetDir + "__old")
    // fs.rename AND fs.delete report failure by RETURNING false (HDFS
    // semantics). Both pre-rename steps are require-checked: a silent
    // false from the stale-aside delete would make the next rename
    // nest the live target INSIDE the aside dir (HDFS renames into an
    // existing destination directory) and a later reader would pick up
    // the stale remnants. The final cleanup delete is allowed to fail
    // soft — tgt is live at that point and the NEXT swap's
    // require-checked delete clears the stale aside.
    if (fs.exists(tgt)) { // an existing aside is stale — tgt is live
      require(!fs.exists(aside) || fs.delete(aside, true),
        s"delete of stale aside $aside failed")
      require(fs.rename(tgt, aside), s"rename $tgt -> $aside failed")
    } // else: a prior swap crashed mid-way; aside IS the live state —
      // keep it until the new target lands
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), tgt),
      s"rename $staging -> $tgt failed")
    fs.delete(aside, true)
    ()
  }

  /** Read the live state: the target if present, else the aside dir a
    * mid-swap crash left behind, else `fallback` (first batch only).
    * The presence checks are explicit `fs.exists` — a transient read
    * failure of an EXISTING target propagates and fails the batch
    * instead of silently resetting state to the bootstrap snapshot. */
  private def readState(
      spark: SparkSession, targetDir0: String)(
      fallback: => DataFrame): DataFrame = {
    val targetDir = normDir(targetDir0)
    val fs = fsOf(spark, targetDir)
    if (fs.exists(new org.apache.hadoop.fs.Path(targetDir)))
      spark.read.parquet(targetDir)
    else if (fs.exists(new org.apache.hadoop.fs.Path(targetDir + "__old")))
      spark.read.parquet(targetDir + "__old")
    else fallback
  }

  /** Run an AvailableNow streaming upsert of `inDir` parquet into
    * `targetDir`, keyed by `keys`, merging `valueCols` (incoming wins). */
  def run(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      checkpoint: String,
      targetDir: String,
      keys: Seq[String],
      valueCols: Seq[String]): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing: DataFrame =
          readState(spark, targetDir) { // first batch: empty target
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
          }
        // within-batch dedup: ONE whole row per key (max over the value
        // struct = lexicographically greatest row, deterministic) — never
        // a synthetic row mixing columns from different inputs.
        val deduped = batch.groupBy(keys.map(col): _*)
          .agg(max(struct(valueCols.map(col): _*)).as("__row"))
          .select(keys.map(col) ++
            valueCols.map(c => col("__row").getField(c).as(c)): _*)
        // upsert semantics: every action row is kept (delete-candidates
        // are rows absent from this batch — they stay in the target).
        val merged = Merge.reconcile(existing, deduped, keys, valueCols)
          .drop("action")
        // staged write + crash-safe swap (see swapIn) — a table format
        // would make this a single MERGE INTO commit.
        val staging = normDir(targetDir) + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        swapIn(spark, staging, targetDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC apply: an AvailableNow stream of change ops
    * `(key, seqCol, opCol, payload…)` folded into the keyed state
    * table via [[Merge.applyCdc]] per micro-batch — the streaming twin
    * of the q163 batch operator. State bootstraps from `snapshotDir`
    * on the first batch; each batch's output (with its `cdc_src` /
    * `last_seq` bookkeeping dropped) becomes the next batch's
    * snapshot, staged-and-swapped like [[run]].
    *
    * Composition contract (StreamingMergeSpec): when op files arrive
    * in seq order — a CDC log's delivery guarantee — the final state
    * equals the ONE-SHOT `applyCdc(snapshot, allOps)` on the snapshot
    * columns. The single documented divergence: a key DELETED in an
    * earlier batch and re-upserted in a later one resurrects with
    * null non-payload columns (the snapshot row is genuinely gone),
    * where the one-shot apply — seeing the whole log at once — keeps
    * the snapshot's non-payload columns because the late U supersedes
    * the D. Both are defensible CDC semantics; the spec pins each. */
  def runCdc(
      spark: SparkSession,
      inDir: String,
      opsSchema: org.apache.spark.sql.types.StructType,
      checkpoint: String,
      targetDir: String,
      snapshotDir: String,
      key: String,
      seqCol: String,
      opCol: String): Unit = {
    val stream = spark.readStream.schema(opsSchema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // exists-gated read: the snapshot bootstrap fires ONLY when no
        // target (and no mid-swap aside) exists — first batch. A
        // transient read failure of a live target now fails the batch
        // loudly; the old catch-all would have silently reset state to
        // the original snapshot while the checkpoint already marked
        // earlier batches committed, permanently dropping their ops.
        val state: DataFrame =
          readState(spark, targetDir)(spark.read.parquet(snapshotDir))
            .drop("cdc_src", "last_seq")
        val merged = Merge.applyCdc(state, batch, key, seqCol, opCol)
        val staging = normDir(targetDir) + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        swapIn(spark, staging, targetDir)
      }
      .start()
    q.awaitTermination()
  }
}
