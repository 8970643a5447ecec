package graft.operators

import org.apache.spark.sql.DataFrame
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
}
