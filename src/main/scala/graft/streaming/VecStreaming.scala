package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming near-dup dedup for EMBEDDINGS — the vector twin of
  * [[DocStreaming.startNearDupDedup]] (which covers text), completing the
  * incremental story: batch delta op ([[Similarity.nearDupDelta]]) +
  * streaming wrapper for both modalities.
  */
object VecStreaming {

  /** Streaming embedding near-dup dedup over a PERSISTENT
    * [[Similarity.saveIvfIndex]] layout, first-arrival-wins: each
    * micro-batch runs the incremental batch operator
    * [[Similarity.nearDupDelta]] against the stored index PLUS every
    * prior micro-batch's appended vectors, then appends its own
    * cell-assigned rows so later batches chain through dropped docs —
    * the same contract as the text twin's shingle store.
    *
    * Idempotence under at-least-once foreachBatch delivery: appends land
    * in per-batch-id partitions (`<indexDir>/appends/batch=<id>/cell=…`,
    * overwrite mode), so a replayed micro-batch overwrites its own
    * partition instead of duplicating rows, and the corpus filter
    * `batch < batchId` keeps a replay from seeing its own half-written
    * rows. The base `corpus` dir written by [[Similarity.saveIvfIndex]]
    * is never touched. Centroids are never retrained per batch (standard
    * IVF practice): rebuild the index offline when the appended volume
    * rivals the original corpus, then restart the stream against it.
    *
    * The appends are read with an explicit schema: a crash can leave the
    * appends dir holding only an uncommitted `_temporary` dir, and schema
    * inference over zero committed files throws on every replay — a
    * permanent crash loop (the same hazard the text twin guards).
    *
    * Ids must be numeric ([[Similarity.nearDupDelta]]'s sentinel
    * contract).
    *
    * `healthEveryN > 0` runs [[Similarity.indexHealth]] every Nth batch
    * (batchId % N == 0), AFTER the batch's own append lands, and writes
    * the one-row report to `<indexDir>/health/batch=<id>` (per-batch-id
    * overwrite — replay-idempotent like the appends) with a loud log
    * when `recommend_rebuild` fires. The stream NEVER rebuilds in place
    * — centroid retrain under a live append stream is the crash-
    * corruption case [[Similarity.rebuildIvfIndex]] forbids; the owner
    * watches the health rows (or the log) and runs
    * [[Similarity.maintainIndex]] offline with the stream stopped. The
    * check is metadata-sized (footer census), so an every-Nth cadence
    * costs no data scan. */
  def startNearDupDedup(vecs: DataFrame, idCol: String, vecCol: String,
                        indexDir: String, survivorsDir: String,
                        checkpointDir: String,
                        threshold: Double, nprobe: Int = 4,
                        replicate: Int = 2, dim: Int = 64,
                        planes: Int = 0, tables: Int = 0,
                        trigger: Trigger = Trigger.AvailableNow(),
                        healthEveryN: Int = 0): StreamingQuery = {
    val processBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val spark = batch.sparkSession
      val appendsDir = s"$indexDir/appends"
      val appendsPath = new org.apache.hadoop.fs.Path(appendsDir)
      val fs = appendsPath.getFileSystem(spark.sessionState.newHadoopConf())
      // finish any compaction that crashed between source-deletion and
      // rename BEFORE trusting the appends: without this, a restart in
      // that window would dedup every batch against an appends dir
      // missing all compacted vectors until compactStore was re-run
      StoreCompaction.recover(fs, appendsPath)
      val appendSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("neighbor_id",
          batch.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType)))
      val appends =
        if (fs.exists(appendsPath) && fs.listStatus(appendsPath).nonEmpty)
          Some(spark.read.schema(appendSchema).parquet(appendsDir)
            .filter(col("batch") < batchId).drop("batch"))
        else None
      val (survivors, assign) = Similarity.nearDupDelta(spark, indexDir,
        batch.toDF(), threshold, nprobe, replicate, dim, idCol, vecCol,
        planes, tables, extraCorpus = appends)
      // survivors FIRST (planned against the pre-write appends snapshot);
      // both writes are per-batch-id overwrites — replay-idempotent
      survivors.write.mode("overwrite")
        .parquet(s"$survivorsDir/batch=$batchId")
      assign.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$appendsDir/batch=$batchId")
      if (healthEveryN > 0 && batchId % healthEveryN == 0) {
        val health = Similarity.indexHealth(spark, indexDir)
          .withColumn("batch", lit(batchId))
        val row = health.select("recommend_rebuild", "reason").head()
        if (row.getBoolean(0))
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"[vec-stream] index $indexDir batch $batchId " +
            s"recommends rebuild: ${row.getString(1)} — stop the stream " +
            "and run Similarity.maintainIndex at a fresh path")
        health.coalesce(1).write.mode("overwrite")
          .parquet(s"$indexDir/health/batch=$batchId")
      }
    }
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch)
      .trigger(trigger)
      .start()
  }

  /** Compact a [[startNearDupDedup]] appends store
    * (`<indexDir>/appends/batch=<id>/cell=…`): merge every batch
    * partition EXCEPT the newest into one `batch=-1` partition,
    * RE-PARTITIONED BY `cell` so the probe-side pruning that makes
    * [[Similarity.nearDupDelta]]'s corpus scan cheap keeps working on
    * the compacted rows. See [[StoreCompaction]] for the shared
    * replay-idempotence and crash-safety contract (the text twin is
    * [[DocStreaming.compactStore]]). Run with the stream STOPPED; an
    * interrupted run is healed by the next micro-batch's recovery
    * pass. */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): Unit =
    StoreCompaction.compact(spark, s"$indexDir/appends",
      Seq("neighbor_id", "cv"), partCols = Seq("cell"))

  /** Health report for this twin's appends store — live batch-partition
    * count, footer-census row counts, and the compaction
    * recommendation; see [[StoreCompaction.storeHealth]]. (The INDEX
    * health — cell skew, appended fraction, rebuild advice — is
    * [[Similarity.indexHealth]]; this measures the per-batch appends
    * layout that [[compactStore]] maintains.) */
  def storeHealth(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String, maxLiveBatches: Int = 16)
  : org.apache.spark.sql.DataFrame =
    StoreCompaction.storeHealth(spark, s"$indexDir/appends",
      maxLiveBatches)

  /** Maintenance tick for this twin's appends store: [[storeHealth]] →
    * conditional [[compactStore]] ([[StoreCompaction.maintainStore]]'s
    * measure-then-act contract — a healthy store is a metadata-sized
    * no-op; the compacted snapshot stays cell-partitioned so probe-side
    * pruning keeps working). Run with the stream STOPPED. Returns the
    * pre-compaction health row extended with `compacted`. */
  def maintainStore(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String, maxLiveBatches: Int = 16)
  : org.apache.spark.sql.DataFrame =
    StoreCompaction.maintainStore(spark, s"$indexDir/appends",
      Seq("neighbor_id", "cv"), partCols = Seq("cell"),
      maxLiveBatches = maxLiveBatches)
}
