package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.builders.Tpch
import graft.query.dsl._

/** Physical-plan shape guards: the properties that keep the engine fast at
  * scale must survive refactors — dimension joins stay broadcast (no
  * sort-merge join on the fact path), filters reach the parquet scan,
  * aggregation is the only fact-side exchange. Asserting on plan text is
  * deliberate: a silent fallback to a shuffle join is a performance bug
  * even when results stay correct. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val cube = Tpch.cube(spark, sfDir)

  test("dimension joins on the query path are broadcast, never sort-merge") {
    val q = cube.q(Seq(
      dim("order").where("c_mktsegment" -> Seq("BUILDING")),
      dim("part").where("p_brand" -> Seq("Brand#1", "Brand#2"))
    ), drop = false).aggregate(Seq("p_brand", "d_year"))
    val p = plan(q.fact.data)
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"),
      s"fact-path dimension join degraded to sort-merge:\n$p")
  }

  test("filter-only subset does not re-aggregate the fact") {
    val filtered = cube.q(Seq(
      dim("part").where("p_brand" -> Seq("Brand#1"))), drop = false)
    // grain unchanged -> Fact.subset skips the groupBy. Legit aggregates
    // remain (the ingest grain agg — cached or inline — and the
    // dimension-side distinct); a REDUNDANT re-aggregation would add
    // measure-producing HashAggregates beyond what the unfiltered fact's
    // own plan contains. Count them in both and require equality — this
    // holds with and without the cube cache.
    def measureAggs(p: String): Int =
      p.linesIterator.count(l => l.contains("HashAggregate") && l.contains("sum_qty"))
    val baseline = measureAggs(plan(cube.fact.data))
    val got = measureAggs(plan(filtered.fact.data))
    assert(got == baseline,
      s"filter-only subset added $got - $baseline measure aggregations:\n" +
        plan(filtered.fact.data))
  }

  test("raw parquet scan pushes filters and prunes columns") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val p = li.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed to parquet:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned at the scan:\n$p")
  }

  test("bucketed fact tables join without a shuffle") {
    import graft.io.CubeIO
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      CubeIO.saveFactBucketed(cube, "bucketed_fact_a", "o_orderkey", 4)
      CubeIO.saveFactBucketed(cube, "bucketed_fact_b", "o_orderkey", 4)
      val a = spark.table("bucketed_fact_a")
      val b = spark.table("bucketed_fact_b").select("o_orderkey", "n")
        .groupBy("o_orderkey").agg(sum("n").as("n_b"))
      val joined = a.join(b, "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      // same bucketing on both sides: sort-merge join with zero Exchange
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bucketed_fact_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_fact_b")
    }
  }

  test("rollup is one Expand pass, not a union of aggregations") {
    val r = cube.rollupFlat(Seq("d_year", "d_quarter", "d_month"))
    val p = plan(r)
    assert(p.contains("Expand"), "expected native Expand for grouping sets")
    assert(!p.contains("Union"), s"rollup fell back to union-all:\n$p")
  }

  test("pairwise similarity uses the native dot_product, HOFs only per-row") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = graft.operators.Similarity.nearDupPairs(e, 0.9)
    val p = plan(pairs)
    assert(p.contains("dot_product("),
      s"pair scan lost the native expression:\n$p")
    // the n² join must not evaluate interpreted lambda chains per pair —
    // lambdas are allowed only in the once-per-row normalize projections
    val joinPart = p.linesIterator
      .filter(l => l.contains("Join") || l.contains("cos#"))
      .mkString("\n")
    assert(!joinPart.contains("lambdafunction"),
      s"interpreted lambdas leaked into the pairwise join:\n$joinPart")
  }
}
