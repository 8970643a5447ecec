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
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
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
    val bad = use.filterNot(orderable)
    require(bad.isEmpty,
      s"profile: unorderable column type(s) (maps?) cannot be profiled: " +
        bad.map(c => s"$c: ${df.schema(c).dataType.simpleString}").mkString(", "))
    val aggs = count(lit(1)).as("__rows") +: use.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      approx_count_distinct(col(c), 0.01).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = use.map(c => struct(
      lit(c).as("column"),
      col("__rows").as("n_rows"),
      (col("__rows") - col(s"__n_$c")).as("n_null"),
      col(s"__d_$c").as("approx_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value")))
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
