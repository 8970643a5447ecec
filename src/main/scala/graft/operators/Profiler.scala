package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ingest-time data-quality gate
  * (north-star extension; no reference counterpart): per-column row
  * count, null count, approximate distinct cardinality, and min/max,
  * ALL from a single aggregation over ONE scan.
  *
  * Scale shape: every statistic here is algebraic (count, HLL++ sketch,
  * min, max), so the whole profile is one map-side-combined aggregation
  * to a SINGLE row — no per-column jobs, no shuffle of data rows, no
  * exact-distinct expand. The row→column pivot happens on that one row
  * (an explode of a literal-width array), which is driver-trivial at
  * any corpus size. Profiling 100 TB costs exactly one pass, the same
  * as counting it.
  *
  * Distinct counts are approximate BY DESIGN (HLL++, rsd 1%): an exact
  * per-column distinct is a full shuffle per column — callers that need
  * exactness for a specific column run that one aggregation themselves
  * (the q123 oracle pins the approximation against exact counts with a
  * 5% verdict, the q31 doctrine). min/max are computed in the column's
  * NATIVE type (string casts would order "10" < "9") and cast to string
  * only for the uniform output schema.
  *
  * Output: (column, n_rows, n_null, approx_distinct, min_value,
  * max_value) — one row per profiled column, in the requested order.
  * With `quantiles` non-empty, a `quantiles: array<double>` column is
  * appended: approximate percentiles (Greenwald-Khanna via Spark's
  * percentile_approx, rank error ≤ rows/`quantileAccuracy`) for each
  * NUMERIC profiled column, NULL for non-numeric ones — still the same
  * single aggregation pass (the sketch is algebraic like the HLL).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String] = Nil,
              quantiles: Seq[Double] = Nil,
              quantileAccuracy: Int = 10000): DataFrame = {
    // min/max need an ordering and the HLL needs a hashable type —
    // map columns have neither. The all-columns default SKIPS them
    // (profiling everything profilable beats aborting the gate on one
    // metadata map); an explicitly requested unorderable column fails
    // by name.
    def orderable(c: String): Boolean =
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(df.schema(c).dataType)
    val use =
      if (cols.nonEmpty) cols else df.columns.toSeq.filter(orderable)
    require(use.nonEmpty, "profile: no columns to profile")
    val missing = use.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // a duplicated name would emit duplicate __n_<c>/__d_<c> aliases and
    // surface later as an opaque ambiguous-reference AnalysisException —
    // fail it by name like the missing/unorderable cases
    val dup = use.diff(use.distinct).distinct
    require(dup.isEmpty, s"profile: duplicate column(s): ${dup.mkString(", ")}")
    val bad = use.filterNot(orderable)
    require(bad.isEmpty,
      s"profile: unorderable column type(s) (maps?) cannot be profiled: " +
        bad.map(c => s"$c: ${df.schema(c).dataType.simpleString}").mkString(", "))
    require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"profile: quantiles must be in [0, 1], got ${quantiles.mkString(", ")}")
    require(quantileAccuracy >= 1,
      s"profile: quantileAccuracy must be >= 1, got $quantileAccuracy")
    def numeric(c: String): Boolean =
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    // cast to double BEFORE sketching so the output array type is uniform
    // across int/long/decimal columns
    val qaggs =
      if (quantiles.isEmpty) Nil
      else use.filter(numeric).map(c =>
        percentile_approx(col(c).cast("double"),
          array(quantiles.map(lit): _*), lit(quantileAccuracy)).as(s"__q_$c"))
    val aggs = (count(lit(1)).as("__rows") +: use.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      approx_count_distinct(col(c), 0.01).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))) ++ qaggs
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = use.map { c =>
      val base = Seq(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("approx_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
      val withQ =
        if (quantiles.isEmpty) base
        else base :+ (if (numeric(c)) col(s"__q_$c").as("quantiles")
                      else lit(null).cast("array<double>").as("quantiles"))
      struct(withQ: _*)
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
