package graft

import org.apache.spark.sql.functions._

import graft.builders.PopulateStar
import graft.io.CubeIO
import graft.model.Measure
import graft.query.dsl._

/** The reference's differential/round-trip strategy (SURVEY §5.1, §5.3):
  * cube ops vs the dense array oracle, array↔cube↔storage round trips,
  * format/pivot golden behavior. */
class RoundTripSpec extends SparkSpec {

  private lazy val star = PopulateStar.cube(spark, n = 500,
    yearFrom = 2013, yearTo = 2014, seed = 1L)

  test("populate_star: deterministic across invocations") {
    val a = PopulateStar.cube(spark, 500, 2013, 2014, 1L)
      .fact.data.agg(sum("amount")).head().getDouble(0)
    val b = PopulateStar.cube(spark, 500, 2013, 2014, 1L)
      .fact.data.agg(sum("amount")).head().getDouble(0)
    assert(a == b)
  }

  test("dense array round trip: array -> cube -> array") {
    val dims = Seq(
      "color" -> Seq("red", "green", "blue"),
      "size" -> Seq("S", "M", "L", "XL"))
    val flat = Array.tabulate(12)(i => if (i % 5 == 4) Double.NaN else i * 1.5)
    val cube = PopulateStar.fromDenseArray(spark, flat, dims)
    // NA cells dropped from the sparse fact
    assert(cube.fact.data.count() == flat.count(!_.isNaN))
    val (outDims, outFlat) = CubeIO.toDenseArray(cube, "value")
    assert(outDims == Seq(Seq("blue", "green", "red"), Seq("L", "M", "S", "XL")))
    // compare cell sets (order differs because keys are re-sorted)
    val inCells = (for {
      c <- 0 until 3; s <- 0 until 4
      v = flat(c * 4 + s) if !v.isNaN
    } yield (dims(0)._2(c), dims(1)._2(s), v)).toSet
    val outCells = (for {
      c <- 0 until 3; s <- 0 until 4
      v = outFlat(c * 4 + s) if !v.isNaN
    } yield (outDims(0)(c), outDims(1)(s), v)).toSet
    assert(inCells == outCells)
  }

  test("collapse on the star cube equals the dense-array margin sum") {
    // collapse everything but product: equals summing the array over the
    // other margins — computed here directly from the fact
    val collapsed = star.q(
      dim("customer").collapse(), dim("currency").collapse(),
      dim("geography").collapse(), dim("time").collapse())
    val expect = star.fact.data.groupBy("prod_name")
      .agg(sum("amount").as("amount"), sum("value").as("value"))
    val got = collapsed.fact.data
    assert(got.select("prod_name", "amount", "value")
      .except(expect).count() == 0)
    assert(expect.except(got.select("prod_name", "amount", "value"))
      .count() == 0)
  }

  test("hierarchy attribute aggregation over two dims (vignette query)") {
    val r = star.aggregate(Seq("time_year", "curr_type"),
      filters = Map("currency" -> Map("curr_type" -> Seq("crypto"))))
    val rows = r.fact.data.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "crypto"))
    assert(r.dimensions.keySet == Set("time", "currency"))
  }

  test("save/load star schema round trip preserves query results") {
    val dir = java.nio.file.Files.createTempDirectory("star_io").toString
    CubeIO.saveStar(star, dir)
    val loaded = CubeIO.loadStar(spark, dir)
    assert(loaded.dimensions.keySet == star.dimensions.keySet)
    val a = star.aggregate(Seq("geog_region_name")).fact.data
      .orderBy("geog_region_name").collect().map(_.toString).toSeq
    val b = loaded.aggregate(Seq("geog_region_name")).fact.data
      .orderBy("geog_region_name").collect().map(_.toString).toSeq
    assert(a == b)
    // hierarchies survive the round trip
    assert(loaded.dimension("time").hierarchies.keySet == Set("monthly", "weekly"))
  }

  test("numeric-looking string partition keys round-trip (no type inference)") {
    import spark.implicits._
    import graft.model._
    import scala.collection.immutable.ListMap
    // zero-padded string ids: Hive partition-VALUE inference would reload
    // '00123' as int 123 — lost padding, corrupted join grain
    val f = Seq(("00123", 2.0), ("00124", 3.0), ("7", 5.0)).toDF("k", "v")
    val dimK = Seq(("00123", "a"), ("00124", "b"), ("7", "c")).toDF("k", "attr")
    val c1 = DataCube.build(
      Fact.build(f, Seq("k"), Seq(Measure.sum("v", "sum_v"))),
      Seq(Dimension.build("kd", "k", ListMap.empty, dimK)))
    val dir = java.nio.file.Files.createTempDirectory("star_padded").toString
    CubeIO.saveStar(c1, dir, partitionFact = Seq("k"))
    val loaded = CubeIO.loadStar(spark, dir)
    val kField = loaded.fact.data.schema("k")
    assert(kField.dataType == org.apache.spark.sql.types.StringType,
      s"partition column reloaded as ${kField.dataType}, not string")
    assert(loaded.fact.data.select("k").as[String].collect().sorted.toSeq ==
      Seq("00123", "00124", "7"))
    // the dimension join grain survives: every fact row still matches
    assert(loaded.denormalize().count() == 3)
    // and incremental ingest merges on the STRING key, not an inferred int
    assert(CubeIO.ingestIntoStar(spark, dir,
      Seq(("00123", 1.0)).toDF("k", "sum_v")) == 1)
    val merged = CubeIO.loadStar(spark, dir).fact.data
      .select("k", "sum_v").as[(String, Double)].collect().toMap
    assert(merged == Map("00123" -> 3.0, "00124" -> 3.0, "7" -> 5.0))
  }

  test("incremental ingest rewrites only touched partitions and matches a rebuild") {
    import spark.implicits._
    import graft.model._
    import scala.collection.immutable.ListMap
    val half1 = Seq((1, "d1", 2.0), (2, "d1", 3.0), (1, "d2", 5.0)).toDF("k", "d", "v")
    // the delta merges into an existing grain row (1,d2) AND opens a new
    // partition (d3) — both paths of the merge
    // delta arrives in the STAR's schema: id.vars + measure-name columns
    val delta = Seq((1, "d2", 7.0), (3, "d3", 1.0)).toDF("k", "d", "sum_v")
    val dimK = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "attr")
    val c1 = DataCube.build(
      Fact.build(half1, Seq("k", "d"), Seq(Measure.sum("v", "sum_v"))),
      Seq(Dimension.build("kd", "k", ListMap.empty, dimK),
        Dimension.build("dd", "d", ListMap.empty, half1.select("d").distinct())))
    val dir = java.nio.file.Files.createTempDirectory("star_ingest").toString
    CubeIO.saveStar(c1, dir, partitionFact = Seq("d"))
    val untouched = new java.io.File(s"$dir/fact/d=d1")
    val before = untouched.listFiles().map(f => f.getName -> f.lastModified()).toMap
    val rewritten = CubeIO.ingestIntoStar(spark, dir, delta)
    assert(rewritten == 2, s"expected 2 touched partitions, got $rewritten")
    // d1 was not in the delta: its files must be byte-for-byte untouched
    val after = untouched.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "untouched partition was rewritten")
    // merged fact equals a full rebuild over half1 ++ delta
    val got = CubeIO.loadStar(spark, dir).fact.data
      .collect().map(r => (r.getInt(0), r.getAs[String]("d")) -> r.getDouble(r.fieldIndex("sum_v"))).toMap
    assert(got == Map(
      (1, "d1") -> 2.0, (2, "d1") -> 3.0, (1, "d2") -> 12.0, (3, "d3") -> 1.0))
    // empty delta is a no-op
    assert(CubeIO.ingestIntoStar(spark, dir, delta.limit(0)) == 0)
    // unpartitioned stars refuse incremental ingest
    val flat = java.nio.file.Files.createTempDirectory("star_flat").toString
    CubeIO.saveStar(c1, flat)
    intercept[IllegalArgumentException] {
      CubeIO.ingestIntoStar(spark, flat, delta)
    }
  }

  test("retraction drops dead rows, removes empty partitions, rejects over-retraction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.model._
    import scala.collection.immutable.ListMap
    // grain rows: (1,d1) n=1, (2,d1) n=1, (1,d2) n=2, (3,d3) n=1
    val base = Seq((1, "d1", 2.0), (2, "d1", 3.0), (1, "d2", 5.0),
      (1, "d2", 1.0), (3, "d3", 4.0)).toDF("k", "d", "v")
    val dimK = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "attr")
    val c1 = DataCube.build(
      Fact.build(base.withColumn("one", lit(1L)), Seq("k", "d"),
        Seq(Measure.sum("v", "sum_v"), Measure.sum("one", "n"))),
      Seq(Dimension.build("kd", "k", ListMap.empty, dimK),
        Dimension.build("dd", "d", ListMap.empty, base.select("d").distinct())))
    val dir = java.nio.file.Files.createTempDirectory("star_retract").toString
    CubeIO.saveStar(c1, dir, partitionFact = Seq("d"))
    val untouched = new java.io.File(s"$dir/fact/d=d3")
    val before = untouched.listFiles().map(f => f.getName -> f.lastModified()).toMap
    // retract ALL of d2 (its one grain row dies -> the partition dies)
    // and only (2,d1) inside d1 (partial merge in a surviving partition)
    val retraction = Seq(("d2", 1, 6.0, 2L), ("d1", 2, 3.0, 1L))
      .toDF("d", "k", "sum_v", "n")
    val rewritten = CubeIO.retractFromStar(spark, dir, retraction, "n")
    assert(rewritten == 2, s"expected 2 touched partitions, got $rewritten")
    assert(!new java.io.File(s"$dir/fact/d=d2").exists(),
      "fully-retracted partition directory must be removed")
    val after = untouched.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "untouched partition was rewritten")
    def read() = CubeIO.loadStar(spark, dir).fact.data
      .collect().map(r => (r.getInt(r.fieldIndex("k")), r.getAs[String]("d")) ->
        (r.getDouble(r.fieldIndex("sum_v")), r.getLong(r.fieldIndex("n")))).toMap
    assert(read() == Map((1, "d1") -> ((2.0, 1L)), (3, "d3") -> ((4.0, 1L))))
    // over-retraction fails loudly BEFORE any write — star unchanged
    intercept[IllegalStateException] {
      CubeIO.retractFromStar(spark, dir,
        Seq(("d1", 1, 99.0, 5L)).toDF("d", "k", "sum_v", "n"), "n")
    }
    assert(read() == Map((1, "d1") -> ((2.0, 1L)), (3, "d3") -> ((4.0, 1L))),
      "failed retraction must leave the star untouched")
    // empty retraction is a no-op; unknown support measure is rejected
    assert(CubeIO.retractFromStar(spark, dir, retraction.limit(0), "n") == 0)
    intercept[IllegalArgumentException] {
      CubeIO.retractFromStar(spark, dir, retraction, "nope")
    }
  }

  test("SCD1 dimension update corrects attributes in place and guards orphans") {
    import spark.implicits._
    import graft.model._
    import scala.collection.immutable.ListMap
    val fact = Seq((1, 2.0), (2, 3.0)).toDF("k", "v")
    val dimK = Seq((1, "alise", "emea"), (2, "bob", "apac"))
      .toDF("k", "name", "region")
    val cube = DataCube.build(
      Fact.build(fact, Seq("k"), Seq(Measure.sum("v", "sum_v"))),
      Seq(Dimension.build("who", "k",
        ListMap("h" -> Hierarchy("region" -> Seq.empty, "k" -> Seq("name"))),
        dimK)))
    val dir = java.nio.file.Files.createTempDirectory("star_scd1").toString
    CubeIO.saveStar(cube, dir)
    // type-1 correction: fix the misspelled name, move member 2's region
    CubeIO.updateDimensionInStar(spark, dir, "who",
      Seq((1, "alice", "emea"), (2, "bob", "emea"), (3, "carol", "apac"))
        .toDF("k", "name", "region"))
    val loaded = CubeIO.loadStar(spark, dir)
    val byRegion = loaded.aggregate(Seq("region")).fact.data.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byRegion == Map("emea" -> 5.0), s"updated region grouping: $byRegion")
    val names = loaded.denormalize().select("name").collect()
      .map(_.getString(0)).toSet
    assert(names == Set("alice", "bob"), s"corrected attributes: $names")
    // an update missing fact key 2 would orphan its rows: refused
    val err = intercept[IllegalArgumentException] {
      CubeIO.updateDimensionInStar(spark, dir, "who",
        Seq((1, "alice", "emea")).toDF("k", "name", "region"))
    }
    assert(err.getMessage.contains("orphan"))
    assert(CubeIO.loadStar(spark, dir).denormalize().count() == 2,
      "failed update must leave the star intact")
    // unknown dimension and missing hierarchy columns are named errors
    intercept[IllegalArgumentException] {
      CubeIO.updateDimensionInStar(spark, dir, "nope", dimK)
    }
    intercept[IllegalArgumentException] {
      CubeIO.updateDimensionInStar(spark, dir, "who", Seq((1, "x")).toDF("k", "name"))
    }
  }

  test("retraction removes TIMESTAMP-partitioned directories (writer path parity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.model._
    import scala.collection.immutable.ListMap
    // timestamp partition values: the writer's directory name comes from
    // cast-to-string ("2026-01-01 00:00:00"), NOT Timestamp.toString
    // (trailing ".0") — the delete must target the writer's path
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    val base = Seq((1, t1, 2.0), (1, t2, 3.0)).toDF("k", "m", "v")
    val cube = DataCube.build(
      Fact.build(base.withColumn("one", lit(1L)), Seq("k", "m"),
        Seq(Measure.sum("v", "sum_v"), Measure.sum("one", "n"))),
      Seq(Dimension.build("kd", "k", ListMap.empty, Seq(1 -> "a").toDF("k", "attr")),
        Dimension.build("md", "m", ListMap.empty, base.select("m").distinct())))
    val dir = java.nio.file.Files.createTempDirectory("star_retract_ts").toString
    CubeIO.saveStar(cube, dir, partitionFact = Seq("m"))
    val parts = () => new java.io.File(s"$dir/fact").listFiles()
      .map(_.getName).filter(_.startsWith("m=")).toSet
    assert(parts().size == 2, s"fixture should have 2 month partitions: ${parts().toSeq}")
    // retract ALL of t1's partition
    CubeIO.retractFromStar(spark, dir,
      Seq((1, t1, 2.0, 1L)).toDF("k", "m", "sum_v", "n"), "n")
    assert(parts().size == 1 && !parts().exists(_.contains("2026-01")),
      s"timestamp partition must be physically removed: ${parts().toSeq}")
    val left = CubeIO.loadStar(spark, dir).fact.data.collect()
    assert(left.length == 1 && left.head.getTimestamp(left.head.fieldIndex("m")) == t2)
  }

  test("format applies measure formatting and sorts NA-last") {
    val small = star.aggregate(Seq("curr_type"))
    val f = CubeIO.format(small,
      overrides = Map("amount" -> Measure.currencyFormat("USD")))
    val rows = f.select("curr_type", "amount").collect()
    assert(rows.forall(_.getString(1).endsWith(" USD")))
  }

  test("pivot multi-column headers (dcast formula year ~ type)") {
    val agg = star.aggregate(Seq("time_year", "curr_type")).fact.data
    val wide = CubeIO.pivot(agg, Seq("time_year"), "curr_type",
      Seq("amount"), values = Seq("crypto", "fiat"))
    assert(wide.columns.toSet == Set("time_year", "crypto", "fiat"))
    assert(wide.count() == 2) // 2013, 2014
  }

  test("pivotMulti concatenates column keys (year ~ type + region)") {
    val agg = star.aggregate(Seq("time_year", "curr_type", "geog_region_name"))
      .fact.data
    val wide = CubeIO.pivotMulti(agg, Seq("time_year"),
      Seq("curr_type", "geog_region_name"), Seq("amount"))
    assert(wide.columns.contains("crypto_West"))
    assert(wide.count() == 2)
  }

  test("introspection: head, dimnames, length, describe") {
    val small = star.aggregate(Seq("curr_type", "geog_region_name"))
    assert(small.head(3).length == 3)
    val dn = small.dimnames
    assert(dn("currency") == Seq("crypto", "fiat"))
    assert(dn("geography").toSet == Set("Midwest", "Northeast", "South", "West"))
    assert(small.length == small.fact.data.count())
    val desc = small.describe()
    assert(desc.exists(_._1 == "fact") &&
      desc.exists(_._1.startsWith("dimension:")))
    // the reference's schema() reports bytes per table (R/schema.R:2-11):
    // every row carries a positive size estimate
    assert(desc.forall(_._4 > 0), s"non-positive size estimate in $desc")
  }

  test("one-call format dcast: denormalize + format + pivot + NA-last sort") {
    val small = star.aggregate(Seq("time_year", "curr_type"))
    val wide = CubeIO.format(small, Seq("time_year"), Seq("curr_type"),
      Seq("amount"), Map("amount" -> Measure.currencyFormat("USD")),
      values = Seq("crypto", "fiat"))
    assert(wide.columns.toSet == Set("time_year", "crypto", "fiat"))
    val rows = wide.collect()
    assert(rows.length == 2) // 2013, 2014 — sorted ascending
    assert(rows.map(_.getInt(0)).toSeq == Seq(2013, 2014))
    // fun.format was applied BEFORE the pivot: wide cells are strings
    assert(rows.forall(r => r.getString(1).endsWith(" USD")))
  }

  test("save/load round trip survives ] and quote in a dimension name") {
    import scala.collection.immutable.ListMap
    import spark.implicits._
    import graft.model._
    val weird = """we]ird"dim"""
    val fact = Seq((1, 2.0), (2, 3.0), (2, 4.0)).toDF("k", "v")
    val d = Seq((1, "x"), (2, "y")).toDF("k", "attr")
    val cube = DataCube.build(
      Fact.build(fact, Seq("k"), Seq(Measure.sum("v", "sum_v"))),
      Seq(Dimension.build(weird, "k",
        ListMap("h" -> Hierarchy("attr" -> Seq.empty, "k" -> Seq.empty)), d)))
    val dir = java.nio.file.Files.createTempDirectory("star_weird").toString
    CubeIO.saveStar(cube, dir)
    val loaded = CubeIO.loadStar(spark, dir)
    assert(loaded.dimensions.keySet == Set(weird))
    assert(loaded.dimension(weird).hierarchies("h").levels.keys.toSeq ==
      Seq("attr", "k"))
    val got = loaded.aggregate(Seq("attr")).fact.data
      .orderBy("attr").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("x", 2.0), ("y", 7.0)))
  }

  test("dense shape conveniences: 1-D vector and 0-dim scalar") {
    // 1-D: collapse to one dimension, export as (keys, vector)
    val oneD = star.q(
      dim("customer").collapse(), dim("currency").collapse(),
      dim("geography").collapse(), dim("time").collapse())
    val (keys, vec) = CubeIO.toDenseVector(oneD, "amount")
    assert(keys.size == vec.length)
    assert(vec.exists(!_.isNaN))
    // 0-dim: grand total drops to a scalar
    val zeroD = star.applyMargin(Seq.empty)
    val total = CubeIO.toScalar(zeroD, "amount")
    val expect = star.fact.data.agg(sum("amount")).head().getDouble(0)
    assert(math.abs(total - expect) < 1e-6)
  }
}
