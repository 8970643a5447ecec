package graft

import org.apache.spark.sql.types._

/** Pins the edge-type doctrine across EVERY driver-checked query: no
  * raw DECIMAL in any output schema (Verify.decimalColumns — the same
  * walk Verify enforces at dump time). Spark's sum(decimal(12,2)) is
  * decimal(22,2) while DuckDB's is decimal(38,2); the driver's typed
  * hash flags that representation gap even when every value matches
  * (q95, round 10). Schemas come from plan analysis, so the sweep is
  * cheap even though it touches all 100 queries. */
class EdgeSchemaSpec extends SparkSpec {

  test("no query exposes a raw DECIMAL column at the edge") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val raw = Verify.decimalColumns(fn(spark, sfDir).schema)
        if (raw.isEmpty) Nil else Seq(s"$name: ${raw.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"raw DECIMAL at the query edge:\n  ${offenders.mkString("\n  ")}")
  }

  test("decimalColumns flags nested and top-level decimals, passes clean schemas") {
    val dirty = StructType(Seq(
      StructField("a", DecimalType(12, 2)),
      StructField("b", StructType(Seq(StructField("c", DecimalType(38, 2))))),
      StructField("d", ArrayType(DecimalType(10, 0))),
      StructField("e", DoubleType)))
    assert(Verify.decimalColumns(dirty) === Seq("a", "b.c", "d[]"))
    val clean = StructType(Seq(
      StructField("x", LongType), StructField("y", DoubleType),
      StructField("z", ArrayType(StringType))))
    assert(Verify.decimalColumns(clean).isEmpty)
  }
}
