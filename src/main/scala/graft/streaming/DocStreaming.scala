package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Streaming document-pipeline operators — the streaming twins of
  * [[graft.operators.Dedup]] (north-star extension; the reference has no
  * streaming at all, SURVEY §2.10).
  */
object DocStreaming {

  /** Streaming exact dedup: fingerprint the normalized text and keep the
    * FIRST arrival per fingerprint across micro-batches — the streaming
    * twin of [[graft.operators.Dedup.exact]].
    *
    * `dropDuplicatesWithinWatermark` holds one state entry per fingerprint
    * seen inside the watermark horizon and expires it once the watermark
    * passes — bounded state at any scale (a plain `dropDuplicates` on a
    * stream keeps every key forever and OOMs on an unbounded corpus).
    * Consequence: two duplicates separated by more than `lateness` in
    * event time can BOTH survive — the dedup horizon equals the watermark;
    * run the batch operator for a full-corpus pass. State and shuffle are
    * keyed on the 16-byte md5 fingerprint, never the text.
    *
    * Output: (idCol, tsCol, fp) — one row per surviving document. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String,
                 tsCol: String, lateness: String = "2 hours"): DataFrame =
    docs
      .select(col(idCol), col(tsCol), fingerprint(col(textCol)).as("fp"))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
}
