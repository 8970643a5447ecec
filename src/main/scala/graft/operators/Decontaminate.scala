package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter decontamination — the 100 TB shape of the train/eval leak
  * check (north-star extension; no reference counterpart).
  *
  * [[Dedup.crossJaccardPairs]] (q39) is the exact form: an inverted-index
  * JOIN between the training corpus and the eval set. At 100 TB of
  * training data that join shuffles the training index. The production
  * alternative exploits the asymmetry — eval sets are tiny, training data
  * is not: build a Bloom filter over the eval set's n-gram hashes (a few
  * MB regardless of training size), embed it as a LITERAL in the plan,
  * and probe every training n-gram with Spark's codegen'd
  * `BloomFilterMightContain` (the expression behind runtime row-level
  * filtering). The training side is then scanned ONCE with zero joins and
  * zero shuffles before the final per-doc aggregation — and Bloom
  * one-sidedness means NO false negatives: a leaked n-gram is never
  * missed, false positives only ever over-count, bounded by `fpp`.
  */
object Decontaminate {

  /** Serialized Bloom filter over the DISTINCT n-gram hashes of an eval
    * corpus. `expectedItems` sizes the filter; when absent, one count job
    * measures the exact distinct-gram cardinality first (eval sets are
    * small — the count is cheap; at scale pass the known cardinality).
    * The filter is built distributed (`stat.bloomFilter` tree-aggregates
    * partial filters) and only the final ~MB bit array reaches the
    * driver. */
  def ngramBloom(evalDocs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, fpp: Double = 1e-6,
                 expectedItems: Option[Long] = None): Array[Byte] = {
    // eager localCheckpoint ONLY when the count fallback makes a second
    // consumer of the pipeline; with expectedItems supplied (the at-scale
    // path, whose point is skipping extra jobs) the bloom aggregation is
    // the single consumer and a checkpoint would be a pure extra pass
    val base = Dedup.docShingles(evalDocs, idCol, textCol, n)
      .select("s").distinct()
    val hashes = if (expectedItems.isEmpty) base.transform(graft.util.Stage.materialize) else base
    serializeBloom(hashes, "s", expectedItems.getOrElse(hashes.count()), fpp)
  }

  /** Build + serialize a Bloom filter over a LongType hash column — the
    * one shared construction every bloom consumer uses ([[ngramBloom]],
    * [[Dedup.exactDelta]]), so sizing/fpp fixes cannot drift between
    * call sites. */
  private[operators] def serializeBloom(hashes: DataFrame, hashCol: String,
                                        items: Long, fpp: Double): Array[Byte] = {
    val bf = hashes.stat.bloomFilter(hashCol, items.max(1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe: `might_contain(<literal filter>, hash)`.
    * `hashCol` must be the same xxhash64 longs the filter was built over
    * ([[Dedup.docShingles]]'s `s` column). */
  def mightContain(bloom: Array[Byte], hashCol: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(hashCol)))

  /** Per-training-doc leak report against an eval-set Bloom filter:
    * (doc_id, n_grams, n_hit, hit_share) where `n_hit` counts this doc's
    * distinct n-grams that (might-)occur in the eval set. Exactly the
    * q39/Gopher contamination signal, computed with one scan of the
    * training corpus + one doc-keyed aggregation — no join against the
    * eval set. Overcount ≤ fpp · n_grams; never an undercount. */
  def bloomLeakReport(train: DataFrame, bloom: Array[Byte],
                      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sh = Dedup.docShingles(train, idCol, textCol, n)
    sh.groupBy("doc_id")
      .agg(count("*").as("n_grams"),
        sum(when(mightContain(bloom, col("s")), 1L).otherwise(0L)).as("n_hit"))
      .withColumn("hit_share",
        round(col("n_hit").cast("double") / col("n_grams").cast("double"), 6))
  }

  // -------------------------------------------------------------------
  // Span-level decontamination — [[Dedup.duplicateSpans]]'s ExactSubstr
  // machinery pointed across the train/eval boundary: instead of scoring
  // whole training docs by gram overlap ([[bloomLeakReport]], q39/q53),
  // find — and remove — the exact leaked REGIONS. A benchmark question
  // quoted inside an otherwise-clean web page keeps the page; only the
  // quoted span is cut (the modern pre-training decontamination contract,
  // e.g. Lee et al. 2022 §6.2 applied to eval overlap).
  // -------------------------------------------------------------------

  /** Contaminated-span report: (idCol, span_start, span_end) — every
    * maximal run of training-doc token positions (1-based, inclusive)
    * covered by some `minTokens`-token gram that appears VERBATIM
    * anywhere in the eval corpus. Unlike [[Dedup.duplicateSpans]],
    * train↔train duplication is deliberately NOT flagged — boilerplate
    * shared only among training docs is dedup's business, not
    * decontamination's.
    *
    * Scale shape (train is ~100 TB, eval sets are MBs): training gram
    * rows never join the eval set head-on. The eval corpus's distinct
    * gram hashes build a Bloom filter (a plan LITERAL, probed by the
    * codegen'd `might_contain` — no false negatives, so no leaked gram
    * escapes), which cuts the training gram stream to a sliver BEFORE
    * the one exact semi-join that removes Bloom false positives; the
    * eval side of that join is size-guarded broadcast. Net: one scan of
    * the training corpus, shuffle bounded by actually-contaminated
    * positions. */
  def contaminatedSpans(train: DataFrame, evalDocs: DataFrame,
                        idCol: String, textCol: String, minTokens: Int,
                        fpp: Double = 1e-6): DataFrame =
    contaminatedSpansWith(train,
      buildEvalIndex(evalDocs, idCol, textCol, minTokens, fpp),
      idCol, textCol)

  /** Removal transform: rebuild every training doc with its eval-shared
    * spans dropped ([[Dedup.removeDuplicateSpans]] semantics — untouched
    * docs pass through `textCol` byte-identical, rebuilt docs are
    * whitespace-normalized and may become empty when fully covered; all
    * other columns pass through unchanged). */
  def removeContaminatedSpans(train: DataFrame, evalDocs: DataFrame,
                              idCol: String, textCol: String,
                              minTokens: Int,
                              fpp: Double = 1e-6): DataFrame =
    removeContaminatedSpansWith(train,
      buildEvalIndex(evalDocs, idCol, textCol, minTokens, fpp),
      idCol, textCol)

  /** Leak-ATTRIBUTION report: (idCol, eval_id, n_shared) — for every
    * (training doc, eval doc) pair sharing at least one verbatim
    * `minTokens`-token gram, how many DISTINCT gram hashes they share.
    * [[contaminatedSpans]] says WHERE a training doc leaks;
    * this says WHICH eval item leaked into it — the audit a benchmark
    * owner asks for ("which pages quote GSM8K item 417?").
    *
    * Same scale shape as the span path: the training side is cut to
    * per-doc DISTINCT grams, Bloom-prefiltered by the eval gram set
    * (plan-literal probe, no false negatives) BEFORE the one exact
    * md5 join whose right side is the size-guarded-broadcast eval gram
    * list; the output aggregation is keyed by (train doc, eval doc) —
    * shuffle bounded by actual contamination, never the corpus. */
  def attributionReport(train: DataFrame, evalDocs: DataFrame,
                        idCol: String, textCol: String, minTokens: Int,
                        fpp: Double = 1e-6): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val evalG = Dedup.gramRows(evalDocs, idCol, textCol, minTokens)
      .select(col(idCol).as("eval_id"), col("__h")).distinct()
      .transform(graft.util.Stage.materialize)
    val bloom = serializeBloom(
      evalG.select(xxhash64(col("__h")).as("__hx")).distinct(), "__hx",
      evalG.count(), fpp)
    Dedup.gramRows(train, idCol, textCol, minTokens)
      .select(col(idCol), col("__h")).distinct()
      .filter(mightContain(bloom, xxhash64(col("__h"))))
      .join(graft.model.Joins.maybeBroadcast(evalG), Seq("__h"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** A frozen, reusable eval-side gram index: the Bloom prefilter bytes
    * plus the exact distinct gram-hash set (localCheckpoint'ed — the
    * eval corpus tokenized once, however many training batches probe
    * it). Build once with [[buildEvalIndex]]; every batch/streaming
    * decontamination call against the same eval set shares it. */
  final case class EvalGramIndex(bloom: Array[Byte], grams: DataFrame,
                                 minTokens: Int)

  /** Tokenize + gram-hash the eval corpus once into an [[EvalGramIndex]]
    * ([[contaminatedSpans]]/[[removeContaminatedSpans]] build this
    * internally; streaming decontamination builds it ONCE and probes it
    * every micro-batch). */
  def buildEvalIndex(evalDocs: DataFrame, idCol: String, textCol: String,
                     minTokens: Int, fpp: Double = 1e-6): EvalGramIndex = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val evalGrams = Dedup.gramRows(evalDocs, idCol, textCol, minTokens)
      .select("__h").distinct().transform(graft.util.Stage.materialize)
    EvalGramIndex(serializeBloom(
      evalGrams.select(xxhash64(col("__h")).as("__hx")), "__hx",
      evalGrams.count(), fpp), evalGrams, minTokens)
  }

  /** [[contaminatedSpans]] against a prebuilt [[EvalGramIndex]]. */
  def contaminatedSpansWith(train: DataFrame, idx: EvalGramIndex,
                            idCol: String, textCol: String): DataFrame =
    Dedup.explodeSpanArrays(
      Dedup.spansFromStarts(
        contaminatedStarts(train, idx, idCol, textCol),
        idCol, idx.minTokens),
      idCol)

  /** [[removeContaminatedSpans]] against a prebuilt [[EvalGramIndex]]. */
  def removeContaminatedSpansWith(train: DataFrame, idx: EvalGramIndex,
                                  idCol: String, textCol: String): DataFrame =
    Dedup.removeSpansWith(train,
      Dedup.spansFromStarts(
        contaminatedStarts(train, idx, idCol, textCol),
        idCol, idx.minTokens),
      idCol, textCol)

  /** Training gram positions whose gram occurs verbatim in the eval
    * corpus: Bloom prefilter (over xxhash64 of the 16-byte gram md5 —
    * hashing the fixed-width digest, not the gram text, keeps the probe
    * input tiny) then exact md5 semi-join against the index's gram
    * set. */
  private def contaminatedStarts(train: DataFrame, idx: EvalGramIndex,
                                 idCol: String,
                                 textCol: String): DataFrame =
    Dedup.gramRows(train, idCol, textCol, idx.minTokens)
      .filter(mightContain(idx.bloom, xxhash64(col("__h"))))
      .join(graft.model.Joins.maybeBroadcast(idx.grams), Seq("__h"),
        "left_semi")
      .select(col(idCol), col("start"))

  /** Per-doc NOVELTY score of a delta batch against a frozen corpus gram
    * index: (idCol, n_grams, n_seen, novelty) where `n_grams` is the
    * doc's distinct `minTokens`-token gram count, `n_seen` how many of
    * those occur verbatim anywhere in the indexed corpus, and
    * `novelty = (n_grams − n_seen) / n_grams` — the memorization-risk /
    * freshness signal ("is this crawl increment new text, or a re-crawl
    * of what we already have?"). The same verbatim-overlap machinery as
    * decontamination, pointed at the corpus itself instead of an eval
    * set, and scoring instead of cutting.
    *
    * EXACT despite the Bloom: misses are definitely-novel (one-sided
    * filter, no false negatives), and the false-positive sliver that
    * survives the probe is removed by the exact md5 join against the
    * index's gram set — the [[contaminatedSpans]] shape, so the delta
    * never joins the corpus head-on and the shuffle is bounded by
    * actually-seen grams. Docs shorter than `minTokens` tokens have no
    * grams to judge: n_grams = 0, novelty = NULL (not 1.0 — "no
    * evidence" is not "all new").
    *
    * Build the index once with [[buildEvalIndex]] over the stored
    * corpus; every delta batch probes the same frozen index. */
  def noveltyReportWith(delta: DataFrame, idx: EvalGramIndex,
                        idCol: String, textCol: String): DataFrame = {
    // ONE pass over the delta: left-join the (distinct) gram rows to
    // the index with a seen flag and take both counts in a single
    // aggregation, instead of deriving the gram subtree twice (once
    // for n_grams, once bloom-filtered for n_seen) — at 100 TB the
    // old shape tokenized the delta twice. With a broadcastable index
    // the join adds no shuffle; when it must shuffle, the one extra
    // gram-keyed exchange replaces a whole second tokenize+distinct.
    // The Bloom stays as a cheap probe-skip on the flag: misses are
    // definitely-unseen (no false negatives), so rows failing it never
    // need the exact flag to be consulted.
    val g = Dedup.gramRows(delta, idCol, textCol, idx.minTokens)
      .select(col(idCol), col("__h")).distinct()
    val flagged = graft.model.Joins.maybeBroadcast(
      idx.grams.select(col("__h")).withColumn("__seen", lit(true)))
    val per = g
      .join(flagged, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(when(mightContain(idx.bloom, xxhash64(col("__h"))) &&
          col("__seen"), lit(1))).as("n_seen"))
    delta.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        when(col("n_grams") > 0,
          round((col("n_grams") - coalesce(col("n_seen"), lit(0L)))
            .cast("double") / col("n_grams").cast("double"), 6))
          .as("novelty"))
  }

  /** [[noveltyReportWith]] with the index built in place — corpus
    * tokenized once; prefer the `With` form when scoring several delta
    * batches against the same corpus. */
  def noveltyReport(corpus: DataFrame, delta: DataFrame, idCol: String,
                    textCol: String, minTokens: Int,
                    fpp: Double = 1e-6): DataFrame =
    noveltyReportWith(delta,
      buildEvalIndex(corpus, idCol, textCol, minTokens, fpp),
      idCol, textCol)
}
