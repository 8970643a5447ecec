package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus-level text analysis (north-star extension; no reference
  * counterpart): term statistics over a document table. */
object Corpus {

  /** Per-document top-k terms by term frequency, with corpus document
    * frequency attached — the exact-integer core of tf-idf keyword
    * extraction (the idf transform is a per-row log the consumer applies;
    * keeping the operator integer-exact keeps it engine-portable). One
    * explode + two aggregations + one window over (doc, tf) — the window
    * partitions by doc, so no global funnel; df re-joins on the term.
    * Ties break by term order (deterministic). Output:
    * (doc_id, term, tf, df, rank). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
      // whitespace-only / tab-prefixed docs split to an EMPTY token (trim
      // strips spaces only), and "" sorts FIRST in the tie-break — drop it
      // or it displaces real keywords and inflates its own df
      .filter(col("term") =!= "")
    val tf = tok.groupBy("doc_id", "term").agg(count("*").as("tf"))
    val df = tf.groupBy("term").agg(count("*").as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("term").asc)
    tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(df, "term")
      .select("doc_id", "term", "tf", "df", "rank")
  }

  /** Per-document duplicate-n-gram share — the corpus-overlap quality
    * signal (the "duplicate n-gram fraction" family of pretraining
    * filters): for each doc, the fraction of its DISTINCT n-grams that
    * also occur in at least one other document. 1.0 means every n-gram is
    * seen elsewhere (boilerplate / near-copy); ~0 means mostly original
    * text.
    *
    * Deliberately UNCAPPED (unlike the dedup-family index): the hottest
    * corpus-wide n-grams are precisely the duplicated mass this metric
    * measures, so a maxDf cap would censor the signal. Cost stays linear:
    * the df aggregation shuffles 8-byte n-gram hashes once, and the
    * df join-back is 1:1 on the index rows (fan-out bounded by the index
    * size itself, not df²) — safe at any corpus size, unlike the dedup
    * pair join this index shape feeds there.
    *
    * Output: (doc_id, n_distinct, n_dup, dup_share). */
  def duplicateNgramShare(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3): DataFrame = {
    val sh = Dedup.docShingles(docs, idCol, textCol, n)
    val df = sh.groupBy("s").agg(count("*").as("df"))
    sh.join(df, "s")
      .groupBy("doc_id")
      .agg(count("*").as("n_distinct"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_share",
        round(col("n_dup").cast("double") / col("n_distinct").cast("double"), 6))
  }

  /** Temperature-weighted corpus mixing (the multi-source sampling recipe:
    * sample source s with probability ∝ tokens_s^T). T=1 is proportional
    * (big sources dominate); T→0 flattens toward uniform (up-samples small
    * high-quality sources) — the standard knob for balancing web-scale
    * crawl against small curated corpora.
    *
    * Shape: one per-source token aggregation (map-side combined), then the
    * normalization runs on the aggregate — one row per source, never
    * per-doc — via a single-row cross join (broadcast by AQE), not an
    * unpartitioned window over data-sized input.
    *
    * Output: (sourceCol, tokens, weight) with Σ weight = 1. */
  def mixingWeights(docs: DataFrame, sourceCol: String, tokenCol: Column,
                    temperature: Double = 0.7): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val per = docs.groupBy(col(sourceCol))
      .agg(sum(tokenCol.cast("long")).as("tokens"))
      .withColumn("w_raw", pow(col("tokens").cast("double"), lit(temperature)))
    val tot = per.agg(sum("w_raw").as("w_tot"))
    per.crossJoin(graft.model.Joins.maybeBroadcast(tot))
      .withColumn("weight", round(col("w_raw") / col("w_tot"), 6))
      .select(col(sourceCol), col("tokens"), col("weight"))
  }
}
