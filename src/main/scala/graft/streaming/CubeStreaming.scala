package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.io.CubeIO

/** Streaming maintenance of a stored star ([[CubeIO.saveStar]] layout) —
  * the capstone of the incremental story: raw delta rows arrive on a
  * stream and merge into the partitioned fact continuously, so the cube a
  * dashboard reads is at most one trigger behind the data. The reference
  * is batch-only; this is the Spark-native extension, and it is ALL
  * composition: Structured Streaming drives [[CubeIO.ingestIntoStarOnce]]
  * per micro-batch.
  *
  * Delivery semantics: foreachBatch is at-least-once, and a star merge is
  * not naturally idempotent (re-adding a delta double-counts) — the
  * batch-id journal inside `ingestIntoStarOnce` closes that: a replayed
  * micro-batch finds its marker and skips. Cost per trigger scales with
  * the batch's partition footprint, not the star size (the
  * [[CubeIO.ingestIntoStar]] contract).
  */
object CubeStreaming {

  /** Start merging a stream of raw delta rows (star schema: id.vars +
    * measure-name columns) into the stored star at `path`. One merge per
    * micro-batch, journal-deduplicated under replay. */
  def startIngestIntoStar(deltas: DataFrame, path: String,
                          checkpointDir: String,
                          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val processBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      CubeIO.ingestIntoStarOnce(batch.sparkSession, path, batch.toDF(), batchId): Unit
    }
    deltas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch)
      .trigger(trigger)
      .start()
  }

  /** Streaming maintenance of an [[graft.operators.AggregateNavigator]]
    * summary store: each micro-batch of raw fact rows folds into every
    * stored summary grain (one grouping-sets pass over the batch, never
    * a base re-scan), journal-deduplicated under at-least-once replay —
    * the dashboards reading routed summaries are at most one trigger
    * behind the stream while the base fact can stay cold storage. */
  /** Streaming maintenance of a distinct-count sketch cube — the
    * [[startIngestIntoStar]] pattern applied to the one aggregate whose
    * merge needs NO replay journal: HLL union is register-max, so
    * re-unioning a replayed micro-batch's sketches is a bitwise no-op
    * (the forgiving property additive ingest lacks — see
    * [[graft.operators.Sketches.ingestSketchCube]]). Per-trigger cost
    * scales with the batch's partition footprint; the store may start
    * nonexistent (first batch creates it). */
  def startIngestSketchCube(deltas: DataFrame, path: String,
                            grain: Seq[String], valueCol: String,
                            partitionBy: String, checkpointDir: String,
                            lgConfigK: Int = 12,
                            trigger: Trigger = Trigger.AvailableNow())
  : StreamingQuery = {
    val processBatch: (Dataset[Row], Long) => Unit = { (batch, _) =>
      graft.operators.Sketches.ingestSketchCube(batch.sparkSession, path,
        batch.toDF(), grain, valueCol, partitionBy, lgConfigK): Unit
    }
    deltas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch)
      .trigger(trigger)
      .start()
  }

  def startRefreshSummaries(deltas: DataFrame, root: String,
                            checkpointDir: String,
                            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val processBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      graft.operators.AggregateNavigator
        .refreshSummariesOnce(batch.toDF(), root, batchId): Unit
    }
    deltas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch)
      .trigger(trigger)
      .start()
  }
}
