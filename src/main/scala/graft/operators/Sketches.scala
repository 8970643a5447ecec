package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches over a cube grain — the standard
  * OLAP answer to the one aggregate that refuses to be additive.
  * COUNT(DISTINCT x) cannot be rolled up from stored per-cell counts
  * (distinct sets overlap), so a naive cube must rescan the raw fact for
  * every coarser grouping. HLL sketches restore additivity: build ONE
  * sketch per grain cell (one fact scan, ever), store the sketch table
  * like any other aggregate, and answer any coarser distinct-count
  * rollup by sketch UNION over the stored cells — at 100 TB the fact is
  * scanned once at ingest and never again, and the sketch table is
  * grain-sized, not fact-sized. Uses Spark's native Datasketches HLL
  * functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`), which merge exactly and are codegen'd; the
  * estimate error is the standard HLL bound (~1.6% at the default
  * lgConfigK = 12).
  */
object Sketches {

  /** One HLL sketch of `valueCol` per `grain` cell — a binary column
    * named `<valueCol>_sketch`, mergeable forever after. One shuffle on
    * the grain (map-side partial sketches combine first). */
  def distinctSketchAtGrain(df: DataFrame, grain: Seq[String],
                            valueCol: String,
                            lgConfigK: Int = 12): DataFrame = {
    require(grain.nonEmpty, "sketch grain needs at least one column")
    df.groupBy(grain.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK))
        .as(s"${valueCol}_sketch"))
  }

  /** Roll stored sketches up to a coarser grouping: approximate distinct
    * count per `by` cell by unioning the cell sketches — no fact access.
    * Empty `by` = one grand-total row. */
  def rollupDistinct(sketches: DataFrame, by: Seq[String],
                     sketchCol: String,
                     outCol: String = "approx_distinct"): DataFrame = {
    val est: Column =
      hll_sketch_estimate(hll_union_agg(col(sketchCol))).as(outCol)
    if (by.isEmpty) sketches.agg(est)
    else sketches.groupBy(by.map(col): _*).agg(est)
  }
}
