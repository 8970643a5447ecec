package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit over a table — the constraint-check
  * pass a production ingest runs before data enters the cube or a
  * training mix (completeness / uniqueness / domain rules, the
  * deequ-style surface). No reference counterpart; extension operator.
  *
  * Everything is computed in ONE aggregation over ONE scan: each rule
  * contributes a conditional-sum column (uniqueness contributes a
  * count-distinct, which Catalyst plans into the same pass via Expand),
  * the single result row is then exploded into one report row per rule —
  * at 100 TB an audit costs one fact scan regardless of how many rules
  * it checks, and nothing but per-rule counters ever shuffles.
  *
  * Violation semantics are rule-local so rules compose without double
  * counting: NULLs violate only `NotNull` — range/domain rules skip them
  * (a null price is a completeness problem, not a range problem). */
object Quality {

  sealed trait Rule
  /** `column` must not be NULL. */
  final case class NotNull(column: String) extends Rule
  /** The tuple `columns` must be unique across complete rows (rows with
    * a NULL key component are skipped — count-distinct semantics in
    * every engine — and flagged by a NotNull rule instead). */
  final case class Unique(columns: Seq[String]) extends Rule
  /** Non-null `column` must lie in [lo, hi] (inclusive). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule
  /** Non-null `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Rule

  private def ruleAgg(r: Rule): Column = r match {
    case NotNull(c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case Unique(cs) =>
      // excess duplicates among complete rows: complete - distinct
      sum(when(cs.map(col(_).isNotNull).reduce(_ && _), 1L).otherwise(0L)) -
        countDistinct(col(cs.head), cs.tail.map(col): _*)
    case InRange(c, lo, hi) =>
      sum(when(col(c).isNotNull &&
        (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
    case AcceptedValues(c, vs) =>
      sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
  }

  private def ruleName(r: Rule): String = r match {
    case _: NotNull        => "not_null"
    case _: Unique         => "unique"
    case _: InRange        => "in_range"
    case _: AcceptedValues => "accepted_values"
  }

  private def ruleColumn(r: Rule): String = r match {
    case NotNull(c)           => c
    case Unique(cs)           => cs.mkString(",")
    case InRange(c, _, _)     => c
    case AcceptedValues(c, _) => c
  }

  /** Run `rules` against `df`. Output: one row per rule, in rule order —
    * (rule_no, rule, target, n_rows, violations, pass) — where `n_rows`
    * is the table row count and `pass` = 1 iff violations = 0. (`target`
    * not `column`, `n_rows` not `rows`: both are reserved words somewhere
    * among the engines a report lands in.) */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val aggs = count(lit(1)).as("__rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        coalesce(ruleAgg(r), lit(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(
        lit(i + 1).as("rule_no"),
        lit(ruleName(r)).as("rule"),
        lit(ruleColumn(r)).as("target"),
        col("__rows").as("n_rows"),
        col(s"__v$i").as("violations"),
        (col(s"__v$i") === 0L).cast("int").as("pass"))
    }
    one.select(explode(array(entries: _*)).as("r")).select("r.*")
  }

  // -------------------------------------------------------------------
  // Learned quality classifier — the CCNet/fastText-style filter: a
  // linear model over hashed bag-of-words features separating "looks
  // like my curated corpus" from "looks like raw crawl". Built on
  // Spark ML's public pipeline primitives (HashingTF + logistic
  // regression), so training is the distributed treeAggregate LBFGS
  // the cluster already knows how to run, and scoring is a per-row
  // sparse dot against broadcast coefficients — no shuffle, no UDF,
  // linear in tokens at any corpus size.
  // -------------------------------------------------------------------

  /** A fitted quality model (hashed-BoW logistic regression). */
  final case class QualityModel(
      lr: org.apache.spark.ml.classification.LogisticRegressionModel,
      numFeatures: Int)

  private def hashedFeatures(df: DataFrame, textCol: String,
                             numFeatures: Int): DataFrame = {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(numFeatures)
    tf.transform(df.withColumn("__toks",
      array_remove(graft.functions.TextFunctions.tokens(col(textCol)), "")))
  }

  /** Fit the classifier on a labeled corpus (`labelCol` ∈ {0, 1};
    * 1 = keep-quality). `numFeatures` is the hashing-trick width —
    * collisions degrade gracefully; 2^18 suits web-scale vocabularies.
    * Training cost: one cached featurization + `maxIter` distributed
    * gradient aggregations over it. */
  def trainQualityClassifier(labeled: DataFrame, textCol: String,
                             labelCol: String, numFeatures: Int = 1 << 18,
                             maxIter: Int = 20,
                             regParam: Double = 1e-4): QualityModel = {
    val feats = hashedFeatures(labeled, textCol, numFeatures)
      .select(col("__feat"), col(labelCol).cast("double").as("__label"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
    QualityModel(lr.fit(feats), numFeatures)
  }

  /** Score documents: (idCol, quality = P(label=1)), rounded to 4
    * decimals so downstream threshold filters are reproducible across
    * partitionings. One projection over one scan. */
  def scoreQuality(model: QualityModel, docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val feats = hashedFeatures(docs, textCol, model.numFeatures)
      .select(col(idCol), col("__feat"))
    model.lr.transform(feats)
      .select(col(idCol),
        round(org.apache.spark.ml.functions.vector_to_array(
          col(model.lr.getProbabilityCol)).getItem(1), 4).as("quality"))
  }
}
