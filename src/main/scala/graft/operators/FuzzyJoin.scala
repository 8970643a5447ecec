package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Joins.maybeBroadcast

/** Approximate string join: all pairs of keys within a bounded edit
  * (Levenshtein) distance — the record-linkage / fuzzy-dedup primitive
  * (north-star extension; no reference-repo counterpart).
  *
  * Candidate generation is positional-free q-gram PREFIX FILTERING
  * (Gravano et al., VLDB 2001; Xiao et al. Ed-Join, VLDB 2008): d edits
  * destroy at most q·d distinct q-grams, so two keys within distance d
  * share at least max(g_a, g_b) − q·d grams; ordering every key's gram
  * set by one GLOBAL rarest-first order and keeping only the first
  * q·d + 1 grams per key, any qualifying pair must collide on at least
  * one prefix gram. Candidates therefore come from an equi-join on
  * single grams — never a cross join — and are verified with a native
  * banded-DP edit-distance kernel
  * ([[graft.functions.StringExpressions.boundedLevenshtein]]).
  *
  * Keys with ≤ q·d distinct grams carry no prefix guarantee (the bound
  * max(g_a, g_b) − q·d can reach 0 when BOTH sides are that short), so
  * all such keys additionally share one sentinel bucket — all-pairs
  * among the short keys only, never against the long ones (a
  * short–long pair is covered by the long side's prefix guarantee).
  *
  * Scale contract (100 TB): the join operates on DISTINCT keys — the
  * quadratic blow-up in any fuzzy join is identical-key multiplicity,
  * which belongs to exact dedup (one hash aggregation) and is collapsed
  * here before any pair is enumerated. Candidate volume is then bounded
  * by gram-bucket sizes over the distinct-key vocabulary: rarest-first
  * prefixes steer every key to its most selective grams, the shuffle
  * carries (gram, key) rows — keys are short by the operator's domain
  * (names, titles, identifiers), never documents — and verification is
  * a per-row early-exit expression. [[graft.operators.EntityResolution]]
  * composes the id-level expansion with linear star edges instead of
  * member × member fan-out.
  */
object FuzzyJoin {

  /** Sentinel bucket for keys whose gram set is too small to carry the
    * prefix guarantee. a NUL character cannot appear in a real q-gram of
    * parquet string data read through Spark (and even a collision would
    * only ADD candidates, never drop one). */
  private val ShortKeyBucket = "\u0000short"

  /** Distinct q-grams of `key` (empty array when length < q). */
  def gramSet(key: Column, q: Int): Column =
    when(length(key) >= q,
      array_distinct(transform(
        sequence(lit(0), length(key) - q),
        i => key.substr(i + 1, lit(q)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct non-null keys of `df` as (block…, __k, __gs), EAGERLY
    * materialized: the relation fans out to four plan branches (gram
    * counts, prefix buckets × both join sides, sentinel bucket), and
    * exchange reuse does not reliably dedupe them across the differing
    * projections — without materialization the upstream scan + distinct
    * re-ran per branch (measured 48 s → 11 s on the 8× probe step). The
    * checkpointed relation is (block, key, grams) only — key-sized, not
    * corpus-sized. */
  private def keyRows(df: DataFrame, keyCol: String, q: Int,
                      blockCols: Seq[String]): DataFrame =
    df.select((blockCols :+ keyCol).map(c => col(c)): _*)
      .filter(col(keyCol).isNotNull)
      .distinct()
      .withColumnRenamed(keyCol, "__k")
      .withColumn("__gs", gramSet(col("__k"), q))
      .transform(graft.util.Stage.materialize)

  /** Prefix-bucket rows (block…, __g, __k): each key's `prefLen` rarest
    * grams under the shared global order `counts`, plus the sentinel
    * bucket for gram-poor keys. Column order matters — the candidate
    * joins rename POSITIONALLY. */
  private def prefixBuckets(keys: DataFrame, counts: DataFrame,
                            prefLen: Int, qd: Int,
                            blockCols: Seq[String]): DataFrame = {
    val pref = keys
      .select((blockCols.map(col) :+ col("__k") :+
        explode(col("__gs")).as("__g")): _*)
      .join(maybeBroadcast(counts), "__g")
      .groupBy((blockCols :+ "__k").map(col): _*)
      .agg(slice(array_sort(collect_list(struct(col("count"), col("__g")))),
        1, prefLen).as("__p"))
      .select((blockCols.map(col) :+
        explode(transform(col("__p"), _.getField("__g"))).as("__g") :+
        col("__k")): _*)
    val short = keys.filter(size(col("__gs")) <= qd)
      .select((blockCols.map(col) :+ lit(ShortKeyBucket).as("__g") :+
        col("__k")): _*)
    pref.unionByName(short)
  }

  /** Spread the PROBE side of the candidate join across the full core
    * count. The bucket relation is key-sized (a few MB), so AQE
    * coalesces its exchange to one or two partitions — but the join it
    * probes EXPANDS to the candidate volume (thousands of pairs per
    * bucket row), and a coalesced probe side runs that expansion nearly
    * serial (measured: a 35 M-candidate verification stage at ~2-way
    * parallelism — 20 s of a 25 s step). An explicit numPartitions
    * repartition is exempt from AQE coalescing, sizing the expansion
    * stage by its OUTPUT, not its input bytes. */
  private def spreadProbe(buckets: DataFrame): DataFrame = {
    val n = buckets.sparkSession.sessionState.conf.numShufflePartitions
    buckets.repartition(n, col("__k"))
  }

  /** Verify candidates IN the join stage — length filter + early-exit
    * levenshtein — then dedupe the survivors. Order matters at scale:
    * a key can reach the same partner through up to `prefLen` shared
    * grams, and deduping candidates BEFORE verification shuffles the
    * whole candidate volume (quadratic in gram-bucket sizes — measured
    * 64× candidate growth at 8× rows on a low-diversity corpus, 37 s in
    * the scale probe). Verifying first costs at most `prefLen` − 1
    * redundant early-exit DP evaluations per true pair — nanoseconds,
    * map-side, no memory — and the distinct() then shuffles only
    * verified pairs: bytes ∝ OUTPUT, not candidates. */
  private def verified(cand: DataFrame, maxDist: Int): DataFrame =
    cand
      .filter(abs(length(col("a")) - length(col("b"))) <= maxDist)
      // native banded kernel — same contract as the builtin
      // levenshtein(a, b, d), measured ~25% cheaper per candidate
      // in-plan; the verification stage evaluates every candidate pair,
      // so the kernel constant is the stage's CPU cost
      .withColumn("dist", graft.functions.StringExpressions
        .boundedLevenshtein(col("a"), col("b"), maxDist))
      .filter(col("dist") =!= -1)
      .distinct()

  /** All pairs of DISTINCT keys `(a, b, dist)` with
    * `levenshtein(a, b) <= maxDist` and `a < b`, optionally restricted
    * to pairs agreeing on `blockCol` (classic blocking — the block key
    * rides every shuffle key, so blocks never mix).
    *
    * Output: (`blockCol`?, `a`, `b`, `dist`).
    */
  def pairsWithinDistance(df: DataFrame, keyCol: String, maxDist: Int,
                          q: Int = 2,
                          blockCol: Option[String] = None): DataFrame =
    pairsWithinDistanceBlocked(df, keyCol, maxDist, q, blockCol.toSeq)

  /** Composite-block variant: pairs must agree on EVERY column of
    * `blockCols` (AND within one blocking pass — the OR-of-passes shape
    * lives in [[EntityResolution.resolveMulti]], which unions the pair
    * sets of several calls). All block columns ride every shuffle key,
    * so blocks never mix; a NULL in any block column excludes the row
    * (equi-join semantics, same as the single-column contract). */
  def pairsWithinDistanceBlocked(df: DataFrame, keyCol: String,
                                 maxDist: Int, q: Int,
                                 blockCols: Seq[String]): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val keys = keyRows(df, keyCol, q, blockCols)
    pairsFromKeys(keys, gramCountsOf(keys), maxDist, q, blockCols)
  }

  /** Materialized (block…, __k, __gs) key relation — the shareable
    * half of a fuzzy join. [[graft.operators.EntityResolution
    * .resolveDelta]] derives the delta's keys ONCE and reuses them for
    * both the cross-corpus scan and the within-delta pairs (each
    * public entry point otherwise re-derives its own). */
  private[operators] def keyRowsOf(df: DataFrame, keyCol: String, q: Int,
                                   blockCols: Seq[String]): DataFrame =
    keyRows(df, keyCol, q, blockCols)

  /** Global rarest-first gram order over the union of the given key
    * vocabularies, eagerly materialized: the table feeds one broadcast
    * per prefix-bucket build (up to three in resolveDelta), and ANY
    * consistent global order preserves the recall-1 prefix guarantee —
    * so one union order can serve several joins. Deliberately NOT per
    * block. */
  private[operators] def gramCountsOf(keys: DataFrame*): DataFrame =
    keys.map(_.select(explode(col("__gs")).as("__g")))
      .reduce(_ unionByName _)
      .groupBy("__g").count()
      .transform(graft.util.Stage.materialize)

  /** Self-join pair enumeration over precomputed keys + gram order. */
  private[operators] def pairsFromKeys(keys: DataFrame, counts: DataFrame,
                                       maxDist: Int, q: Int,
                                       blockCols: Seq[String]): DataFrame = {
    val buckets = prefixBuckets(keys, counts, q * maxDist + 1, q * maxDist,
      blockCols)
    val joinKeys = blockCols :+ "__g"
    val cand = spreadProbe(buckets).toDF((joinKeys :+ "a"): _*)
      .join(buckets.toDF((joinKeys :+ "b"): _*), joinKeys)
      .filter(col("a") < col("b"))
      .select((blockCols :+ "a" :+ "b").map(col): _*)
    verified(cand, maxDist)
  }

  /** CROSS-side variant: all (left key `a`, right key `b`, `dist`)
    * pairs within `maxDist` — including equal keys (dist 0); `a` always
    * comes from `left`, `b` from `right`. The gram-frequency order is
    * computed over the UNION of both key vocabularies (the prefix
    * guarantee needs one consistent global order). This is the
    * incremental shape: `left` the stored corpus keys, `right` a delta
    * — the corpus keys are scanned and bucketed, never paired among
    * themselves. */
  def crossPairsWithinDistance(left: DataFrame, right: DataFrame,
                               keyCol: String, maxDist: Int, q: Int = 2,
                               blockCol: Option[String] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val blockCols = blockCol.toSeq
    val kl = keyRows(left, keyCol, q, blockCols)
    val kr = keyRows(right, keyCol, q, blockCols)
    crossPairsFromKeys(kl, kr, gramCountsOf(kl, kr), maxDist, q, blockCols)
  }

  /** Cross pair enumeration over precomputed key relations + a shared
    * gram order (must cover BOTH vocabularies — [[gramCountsOf]]). */
  private[operators] def crossPairsFromKeys(kl: DataFrame, kr: DataFrame,
                                            counts: DataFrame, maxDist: Int,
                                            q: Int,
                                            blockCols: Seq[String]): DataFrame = {
    val prefLen = q * maxDist + 1
    val joinKeys = blockCols :+ "__g"
    val cand = spreadProbe(prefixBuckets(kl, counts, prefLen, q * maxDist,
        blockCols))
      .toDF((joinKeys :+ "a"): _*)
      .join(prefixBuckets(kr, counts, prefLen, q * maxDist, blockCols)
        .toDF((joinKeys :+ "b"): _*), joinKeys)
      .select((blockCols :+ "a" :+ "b").map(col): _*)
    verified(cand, maxDist)
  }
}
