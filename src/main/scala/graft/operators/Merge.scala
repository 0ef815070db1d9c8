package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-oriented MERGE/upsert (S6, J4-J6, U3).
  *
  * The reference pushes per-member lookup-or-create mutations in a
  * sequential HTTP loop (reference `app/routes.py:1042-2038`). The
  * Spark-first form computes the whole reconciliation as one plan:
  * a full-outer join on the natural key splits incoming rows into
  * update / insert / unchanged, anti-joins derive create-new dimension
  * rows, and the reconciled table is written back in one pass. Errors
  * become a collected branch instead of a first-error skip — per-row
  * atomicity is the partition, not an HTTP call.
  */
object Merge {

  /** Classify incoming vs existing on `keys`:
    * NULL-key contract (standard SQL MERGE semantics — the ON clause
    * compares with `=`): a NULL key never matches, so a null-keyed row
    * present on both sides classifies as one delete-candidate plus one
    * insert, not a merge. Callers with legitimately nullable keys must
    * coalesce to a sentinel first.
    * Returns existing ∪ incoming with an `action` column
    * (insert / update / unchanged / delete-candidate) and merged values
    * (incoming wins where present). `compareCols` decides
    * update-vs-unchanged. */
  def reconcile(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    // an empty key list would plan a condition-less full outer join —
    // an |E|·|I| cross product silently classified update/unchanged
    require(keys.nonEmpty, "reconcile needs at least one key column")
    require(!compareCols.contains("present"),
      "compare column name 'present' is reserved by reconcile " +
        "(it would alias to the __e_present/__i_present markers)")
    // presence is an explicit marker per side, never inferred from data
    // nullability: a row whose compare columns are ALL NULL (e.g. an
    // update-to-null pushed through StreamingMerge.upsertSink) is still
    // present on its side.
    val e = existing.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__e_$c"))
        :+ lit(true).as("__e_present"): _*)
    val i = incoming.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__i_$c"))
        :+ lit(true).as("__i_present"): _*)
    val j = e.join(i, keys, "full_outer")
    val ePresent = coalesce(col("__e_present"), lit(false))
    val iPresent = coalesce(col("__i_present"), lit(false))
    // changed compares the MERGED value against existing, not raw
    // incoming vs existing: merged = coalesce(incoming, existing) never
    // writes NULL over a value, so an incoming NULL must read
    // "unchanged", not a phantom update that pushPreview/splitUpsert
    // would emit as a spurious external mutation.
    val changed = compareCols
      .map(c => !(coalesce(col(s"__i_$c"), col(s"__e_$c")) <=> col(s"__e_$c")))
      .reduce(_ || _)
    val merged = compareCols.map(c => coalesce(col(s"__i_$c"), col(s"__e_$c")).as(c))
    j.select(
      keys.map(col) ++ merged :+
        when(!ePresent, "insert")
          .when(!iPresent, "delete-candidate")
          .when(changed, "update")
          .otherwise("unchanged").as("action"): _*)
  }

  /** Apply a CDC (change-data-capture) batch to a snapshot — the
    * Delta/Hudi-style merge: `ops` carries `(key, seqCol, opCol,
    * payload…)` rows where opCol is 'U' (upsert) or 'D' (delete
    * tombstone); per key the HIGHEST seqCol op wins (a real CDC log's
    * LSN is unique per key; if a caller feeds duplicate (key, seq)
    * pairs anyway, the tie breaks DETERMINISTICALLY — op desc so 'U'
    * beats 'D', then the payload struct desc — never by arbitrary
    * partition order, so results are stable across runs and engines),
    * then
    *  - latest 'D'            → the key is absent from the result,
    *  - latest 'U', key known → snapshot row with payload columns
    *                            overridden, `cdc_src` = "updated",
    *  - latest 'U', key new   → payload-only row (non-payload snapshot
    *    columns null — the honest shape of a partial insert),
    *    `cdc_src` = "inserted",
    *  - no op for the key     → snapshot row, `cdc_src` = "snapshot".
    * `last_seq` carries the winning seq (−1 for untouched rows — the
    * harness's null-int sentinel convention). Payload columns must be
    * a subset of snapshot columns (same names = same meaning).
    *
    * Scale shape: the latest-op argmax is a per-key rank window (the
    * W4 kernel — WindowGroupLimit cuts partial top-1 before the
    * exchange) over the CDC BATCH, which in steady state is tiny next
    * to the snapshot; the apply is then ONE full-outer equi-join on
    * the key. Nothing driver-side, no iteration. */
  def applyCdc(snapshot: DataFrame, ops: DataFrame, key: String,
      seqCol: String, opCol: String): DataFrame = {
    // NULL-key contract as reconcile's: the full-outer `=` join never
    // matches a NULL key, so a null-keyed op cannot update or delete a
    // null-keyed snapshot row — coalesce nullable keys to a sentinel
    // upstream.
    val payload = ops.columns.filterNot(Seq(key, seqCol, opCol).contains)
    payload.foreach(c => require(snapshot.columns.contains(c),
      s"payload column '$c' has no snapshot counterpart"))
    Seq("cdc_src", "last_seq", "__rn").foreach(r =>
      require(!snapshot.columns.contains(r), s"snapshot column '$r' is reserved"))
    // total order: seq desc, then op desc ('U' > 'D'), then the payload
    // struct desc — duplicate (key, seq) pairs tie-break the same way
    // everywhere instead of by arbitrary partition order. Only
    // ORDERABLE payload columns join the struct: a map-typed payload
    // column cannot be a sort key (analysis error), and excluding it
    // must not break callers whose seq values are unique anyway.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => orderable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          orderable(a.elementType)
        case _ => true
      }
    val sortablePayload = payload.filter(c =>
      orderable(ops.schema(c).dataType))
    val tieBreak = col(opCol).desc +:
      (if (sortablePayload.nonEmpty)
        Seq(struct(sortablePayload.map(col).toSeq: _*).desc)
       else Nil)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(seqCol).desc +: tieBreak: _*)
    val latest = ops.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val out: Seq[org.apache.spark.sql.Column] =
      coalesce(col(s"s.$key"), col(s"l.$key")).as(key) +:
      (snapshot.columns.filterNot(_ == key).map { c =>
        if (payload.contains(c))
          when(col(s"l.$opCol") === "U", col(s"l.$c"))
            .otherwise(col(s"s.$c")).as(c)
        else col(s"s.$c").as(c)
      }.toSeq :+
      when(col(s"l.$opCol").isNull, "snapshot")
        .when(col(s"s.$key").isNull, "inserted")
        .otherwise("updated").as("cdc_src") :+
      coalesce(col(s"l.$seqCol"), lit(-1L)).as("last_seq"))
    snapshot.as("s")
      .join(latest.as("l"), col(s"s.$key") === col(s"l.$key"), "full_outer")
      .where(col(s"l.$opCol").isNull || col(s"l.$opCol") =!= "D")
      .select(out: _*)
  }

  /** The update/insert fork as explicit semi/anti joins (J4):
    * (updates, inserts). */
  def splitUpsert(incoming: DataFrame, existing: DataFrame, keys: Seq[String])
      : (DataFrame, DataFrame) = {
    require(keys.nonEmpty, "splitUpsert needs at least one key column")
    (incoming.join(existing.select(keys.map(col): _*), keys, "left_semi"),
     incoming.join(existing.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Create-missing-dimension rows (J5): items referencing a dim title
    * that doesn't exist yet, deduped, with deterministic new ids. */
  def missingDimRows(
      items: DataFrame, dim: DataFrame,
      itemTitleCol: String, dimTitleCol: String, idPrefix: String): DataFrame =
    items
      .select(trim(col(itemTitleCol)).as("title"))
      .where(length(col("title")) > 0)
      .join(dim.select(lower(trim(col(dimTitleCol))).as("__k")),
        lower(col("title")) === col("__k"), "left_anti")
      .groupBy(lower(col("title")).as("__k"))
      .agg(min(col("title")).as("title"))
      .withColumn("ext_id", concat(lit(idPrefix), md5(col("__k"))))
      .select("title", "ext_id")

  /** Mutation preview (reference `app/routes.py:871-1040`): the first
    * `n` rows of the would-be upsert — reconcile's insert/update branch
    * ordered by the natural key — so a reviewer inspects exactly what
    * the push sink would send before any external call happens.
    * Deterministic (key-ordered TakeOrdered, not engine row order); the
    * full reconcile plan is untouched. */
  def pushPreview(reconciled: DataFrame, keys: Seq[String], n: Int = 5): DataFrame =
    reconciled
      .where(col("action").isin("insert", "update"))
      .orderBy(keys.map(col): _*)
      .limit(n)

  /** External-push sink shape: per-partition delivery with categorized
    * retry/backoff (F14/F15). `send` is the boundary adapter (HTTP,
    * queue, …) — everything else stays set-oriented. Retries are
    * per-batch; rows that exhaust retries are collected and returned
    * via an accumulator-free errors table written by the caller. */
  def pushSink(
      df: DataFrame,
      send: Seq[org.apache.spark.sql.Row] => Unit,
      batchSize: Int = 1000,
      maxRetries: Int = 3,
      baseDelayMs: Long = 1000L): Unit = {
    require(batchSize >= 1, s"batchSize=$batchSize must be >= 1")
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        var attempt = 0
        var done = false
        while (!done) {
          try { send(batch); done = true }
          catch {
            // task cancellation must propagate NOW — retrying/sleeping
            // through an interrupt would pin a killed task for the
            // whole backoff ladder
            case e: InterruptedException => throw e
            case e: Exception if attempt < maxRetries =>
              Thread.sleep(baseDelayMs * (1L << attempt))
              attempt += 1
            case e: Exception => throw e // Spark task retry takes over
          }
        }
      }
    }
  }
}
