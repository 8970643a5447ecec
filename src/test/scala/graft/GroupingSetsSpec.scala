package graft

import org.apache.spark.sql.functions._

import graft.builders.Tpch
import graft.query.dsl._

/** Grouping-sets laws from the reference's tests (SURVEY §5.3):
  * double-counting, level numbering, INDEX filtering, rollup-as-cube
  * renormalization. Runs on the sf0.001 fixture. */
class GroupingSetsSpec extends SparkSpec {

  private lazy val cube = Tpch.cube(spark, sfDir)

  test("rollup double-counting law: every level sums to the grand total") {
    val rolled = cube.rollupFlat(Seq("d_year", "d_quarter"))
    val perLevel = rolled.groupBy("level")
      .agg(sum("n").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perLevel.keySet == Set(0, 1, 2))
    assert(perLevel(0) == perLevel(1) && perLevel(1) == perLevel(2))
  }

  test("level 0 of a rollup equals the plain aggregate") {
    val rolled = cube.rollupFlat(Seq("d_year", "d_quarter"), index = Seq(0))
    val plain = cube.aggregate(Seq("d_year", "d_quarter")).fact.data
    assert(rolled.count() == plain.count())
    val a = rolled.select("d_year", "d_quarter", "n")
    val b = plain.select("d_year", "d_quarter", "n")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("grand-total level has exactly one row with null keys") {
    val top = cube.rollupFlat(Seq("d_year", "d_quarter"), index = Seq(2))
    val rows = top.collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(top.columns.indexOf("d_year")))
  }

  test("cube produces 2^n grouping sets levels") {
    val c2 = cube.cubeFlat(Seq("c_mktsegment", "d_year"))
    val levels = c2.select("level").distinct().collect().map(_.getInt(0)).toSet
    assert(levels == Set(0, 1, 2))
    // level 1 contains both single-attr groupings: segments + years rows
    val nSeg = cube.aggregate(Seq("c_mktsegment")).fact.data.count()
    val nYear = cube.aggregate(Seq("d_year")).fact.data.count()
    assert(c2.filter(col("level") === 1).count() == nSeg + nYear)
  }

  test("rollupCube renormalizes: level dimension bound and navigable") {
    val rc = cube.rollupCube(Seq("d_year", "d_quarter"))
    assert(rc.dimensions.contains("level"))
    // slicing level=0 equals the leaf aggregate row count
    val leaf = rc.q(Seq(dim("level").where("level" -> Seq(0))), drop = false)
    val plain = cube.aggregate(Seq("d_year", "d_quarter")).fact.data
    assert(leaf.fact.data.count() == plain.count())
  }

  test("in-DSL + (rollup op) over the date hierarchy") {
    val r = cube.q(
      dim("part").collapse(), dim("supplier").collapse(), dim("order").collapse(),
      dim("date").rollup("d_year", "d_quarter"))
    assert(r.dimensions.contains("level"))
    val lvls = r.fact.data.select("level").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lvls == Set(0, 1, 2))
  }

  test("groupingSetsFlat computes exactly the requested sets") {
    val gs = cube.groupingSetsFlat(
      margin = Seq("d_year", "c_mktsegment"),
      sets = Seq(Seq("d_year"), Seq.empty))
    val nYear = cube.aggregate(Seq("d_year")).fact.data.count()
    assert(gs.count() == nYear + 1)
  }
}
