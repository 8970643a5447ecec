package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.EntityResolution

/** Streaming entity resolution — the streaming twin of
  * [[graft.operators.EntityResolution]] under the same foreachBatch +
  * per-batch-id store protocol as [[DocStreaming.startNearDupDedup]]
  * (north-star extension; the reference has no streaming at all,
  * SURVEY §2.10).
  *
  * Each micro-batch runs the incremental batch operator
  * [[EntityResolution.resolveDelta]] against the accumulated entity
  * store: batch records adopt the smallest matched stored entity id,
  * unmatched components become new entities, stored labels are never
  * rewritten. The labeled batch appends to the store under
  * `batch=<id>` (dynamic per-partition overwrite → replay-idempotent
  * under at-least-once delivery), so the store IS the entity table a
  * consumer reads — and what a nightly batch [[EntityResolution
  * .resolve]] compaction would rebuild to heal frozen bridges.
  */
object ErStreaming {

  /** Start the resolve stream. `records` must carry `idCol` (numeric,
    * unique), `keyCol` (string), `blockCol`. The store at `storeDir`
    * holds (idCol, keyCol, blockCol, entity_id) partitioned by batch. */
  def startResolveStream(records: DataFrame, idCol: String, keyCol: String,
                         blockCol: String, maxDist: Int,
                         storeDir: String, checkpointDir: String,
                         q: Int = 2,
                         trigger: Trigger = Trigger.AvailableNow())
  : StreamingQuery =
    startResolveStreamMulti(records, idCol, keyCol, Seq(Seq(blockCol)),
      maxDist, storeDir, checkpointDir, q, trigger)

  /** Multi-pass streaming resolution — [[EntityResolution
    * .resolveDeltaMulti]]'s OR-of-blocking-keys per micro-batch: the
    * first batch resolves with [[EntityResolution.resolveMulti]], every
    * later batch adopts stored entities reachable through ANY pass. The
    * store carries the distinct union of all pass columns, so heal and
    * compaction see every blocking key. */
  def startResolveStreamMulti(records: DataFrame, idCol: String,
                              keyCol: String,
                              blockPasses: Seq[Seq[String]], maxDist: Int,
                              storeDir: String, checkpointDir: String,
                              q: Int = 2,
                              trigger: Trigger = Trigger.AvailableNow())
  : StreamingQuery = {
    require(blockPasses.nonEmpty, "at least one blocking pass required")
    require(blockPasses.forall(_.nonEmpty),
      "every blocking pass needs at least one column")
    val keep = (idCol +: keyCol +: blockPasses.flatten).distinct
    val processBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val spark = batch.sparkSession
      // explicit schema — schema inference over a crash-emptied store
      // throws on every replay (the DocStreaming lesson)
      val storeSchema = org.apache.spark.sql.types.StructType(
        keep.map(c => org.apache.spark.sql.types.StructField(c,
          batch.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField("entity_id",
          batch.schema(idCol).dataType) :+
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType))
      val storePath = new org.apache.hadoop.fs.Path(storeDir)
      val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
      StoreCompaction.recover(fs, storePath)
      // prior batches only: a replayed batch must not adopt labels from
      // its OWN half-written partition
      val stored =
        if (fs.exists(storePath) && fs.listStatus(storePath).nonEmpty)
          Some(spark.read.schema(storeSchema).parquet(storeDir)
            .filter(col("batch") < batchId).drop("batch"))
        else None
      val b = batch.select(keep.map(col): _*)
      val labeled = stored match {
        case Some(corpus) => EntityResolution.resolveDeltaMulti(
          corpus, b, idCol, keyCol, blockPasses, maxDist, q)
        case None => EntityResolution.resolveMulti(
          b, idCol, keyCol, blockPasses, maxDist, q)
      }
      labeled.select((keep.map(col) :+ col("entity_id")): _*)
        .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
    }
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch)
      .trigger(trigger)
      .start()
  }

  /** Compact the entity store's batch partitions (stream STOPPED) —
    * the shared [[StoreCompaction]] contract. */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   storeDir: String, idCol: String = "rid",
                   keyCol: String = "name", blockCol: String = "blk"): Unit =
    StoreCompaction.compact(spark, storeDir,
      Seq(idCol, keyCol, blockCol, "entity_id"))

  /** Compaction for a [[startResolveStreamMulti]] store (columns = the
    * union of pass columns). */
  def compactStoreMulti(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String, idCol: String, keyCol: String,
                        blockPasses: Seq[Seq[String]]): Unit =
    StoreCompaction.compact(spark, storeDir,
      (idCol +: keyCol +: blockPasses.flatten).distinct :+ "entity_id")

  /** BATCH HEAL (stream STOPPED): re-run a full
    * [[EntityResolution.resolve]] over the accumulated store and rewrite
    * it under the shared [[StoreCompaction]] crash-safe protocol —
    * merging frozen-label bridges that [[EntityResolution.resolveDelta]]
    * deliberately leaves unmerged (its stored labels are append-only; a
    * delta record that bridges two stored entities adopts the smaller id
    * WITHOUT relabeling the other). This is the documented rebuild
    * contract as an operator instead of advice.
    *
    * Scope, inherited from the compaction contract: every committed
    * batch BELOW the newest is re-resolved into `batch=-1`; the newest
    * partition stays untouched because it is the only one an
    * at-least-once restart may replay, and a replay must overwrite its
    * own partition, never collide with healed data. A bridge sitting in
    * the newest batch heals on the next call once a later batch exists.
    * Crash safety is [[StoreCompaction]]'s: tmp snapshot + manifest,
    * recovery finishes or discards, and the stream's per-batch reads
    * call that recovery before every store scan, so a resumed stream
    * continues from the healed store transparently. */
  def healStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                maxDist: Int, idCol: String = "rid",
                keyCol: String = "name", blockCol: String = "blk",
                q: Int = 2): Unit =
    healStoreMulti(spark, storeDir, maxDist, idCol, keyCol,
      Seq(Seq(blockCol)), q)

  /** Multi-pass heal — the batch [[EntityResolution.resolveMulti]] over
    * a [[startResolveStreamMulti]] store (store columns must carry the
    * union of pass columns, which that writer guarantees). */
  def healStoreMulti(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String, maxDist: Int, idCol: String,
                     keyCol: String, blockPasses: Seq[Seq[String]],
                     q: Int = 2): Unit =
    StoreCompaction.compact(spark, storeDir,
      ((idCol +: keyCol +: blockPasses.flatten).distinct :+ "entity_id"),
      merge = df => EntityResolution.resolveMulti(
        df.drop("entity_id").distinct(), idCol, keyCol, blockPasses,
        maxDist, q))
}
