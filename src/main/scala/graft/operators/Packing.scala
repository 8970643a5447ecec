package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines (north-star extension; no
  * reference counterpart): concatenate documents into fixed token-budget
  * training sequences. The assignment is the streaming concat-and-cut
  * used in practice — documents in a stable order, a running token total,
  * and a new pack whenever the running total crosses a budget multiple (a
  * document BELONGS to the pack where it starts; the pack that straddles
  * a boundary carries the overhang, exactly like a sequence that gets
  * split at the boundary token).
  *
  * Scale shape: packing is per-SHARD (`shardCol` — a source, date, or
  * writer-task key), so the window cumsum partitions by shard instead of
  * funneling the corpus through one unpartitioned window task. That is
  * also the production semantics: each shard packs independently, packs
  * never span shards, and adding a shard never re-packs existing ones —
  * the property that makes incremental corpus builds reproducible.
  */
object Packing {

  /** Assign every doc a `(shardCol, pack_seq)` pack id. Deterministic in
    * (shard, idCol order, token counts); one window shuffle keyed on the
    * shard. `tokenCol` is any token-count expression (e.g.
    * `TextFunctions.nTokens(col("text"))` or a stored count column).
    *
    * Output = input columns + `pack_tokens` (the doc's token count) +
    * `pack_seq` (0-based within shard). */
  def packByBudget(docs: DataFrame, idCol: String, tokenCol: Column,
                   budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    Seq("pack_tokens", "pack_seq", "__start").foreach { c =>
      require(!docs.columns.contains(c),
        s"input already has a '$c' column — rename it before packing " +
          "(re-packing a packed corpus clobbers the previous assignment)")
    }
    // ROWS frame explicitly: the default RANGE frame treats equal idCol
    // values as one peer group, handing duplicate ids each other's tokens
    // and assigning docs to packs they don't start in. idCol should still
    // be UNIQUE per shard for a run-stable assignment — with duplicates
    // the tie order between the equal rows is partition-order dependent.
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("pack_tokens", tokenCol.cast("long"))
      // start offset of this doc within its shard's concatenated stream
      .withColumn("__start",
        sum("pack_tokens").over(w) - col("pack_tokens"))
      .withColumn("pack_seq", floor(col("__start") / budget))
      .drop("__start")
  }

  /** Pack-level summary: docs per pack and token fill. The overhang
    * contract shows up here: `sum_tokens - last doc's tokens < budget`
    * for every pack (only the boundary-straddling doc overflows). */
  def packSummary(docs: DataFrame, idCol: String, tokenCol: Column,
                  budget: Int, shardCol: String): DataFrame =
    packByBudget(docs, idCol, tokenCol, budget, shardCol)
      .groupBy(col(shardCol), col("pack_seq"))
      .agg(count("*").as("n_docs"), sum("pack_tokens").as("sum_tokens"))
}
