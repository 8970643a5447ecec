package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.model._
import graft.sources.Sources

/** Custom-Aggregator measures (§2.9 escape hatch) and source-side ETL
  * helpers (§2.1). */
class SourcesAggregatorsSpec extends SparkSpec {

  test("Aggregator measure: product and geomean plug into the cube") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 3.0), ("b", 4.0)).toDF("g", "v")
    val cube = DataCube.build(
      Fact.build(df, Seq("g"), Seq(
        Aggregators.measure("v", "prod_v", Aggregators.Product),
        Measure.sum("v", "sum_v"))),
      Seq(Dimension.build("two", "g", ListMap.empty, df.select("g").distinct())))
    val m = cube.fact.data.orderBy("g").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("a" -> 6.0, "b" -> 4.0))
    // grand total re-aggregates the custom aggregate from the grain
    val total = cube.applyMargin(Seq.empty).fact.data.head().getDouble(0)
    assert(total == 24.0)
  }

  test("geomean aggregator") {
    import spark.implicits._
    val df = Seq(1.0, 8.0).toDF("v")
    val gm = df.agg(Aggregators.asMeasureFn(Aggregators.GeoMean)(col("v")))
      .head().getDouble(0)
    assert(math.abs(gm - math.sqrt(8.0)) < 1e-9)
  }

  test("csv source round trip with explicit schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csv_src").toString
    Seq((1, "x", 2.5), (2, "y", 3.5)).toDF("id", "name", "v")
      .write.option("header", "true").mode("overwrite").csv(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, name STRING, v DOUBLE")
    val back = Sources.readCsv(spark, dir, Some(schema))
    assert(back.count() == 2)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v"))
    assert(back.filter($"id" === 1).head().getDouble(2) == 2.5)
  }

  test("json source round trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("json_src").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "name")
      .write.mode("overwrite").json(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING")
    val back = Sources.read(spark, dir, "json", Some(schema))
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("x", "y"))
  }

  test("extractDimension: cranlogs surrogate-key ETL pattern") {
    import spark.implicits._
    val fact = Seq(("r", "linux", 1.0), ("r", "mac", 2.0), ("py", "linux", 3.0))
      .toDF("pkg", "os", "n")
    val (dim, withId) = Sources.extractDimension(fact, Seq("pkg"), "pkg_id")
    assert(dim.columns.toSet == Set("pkg", "pkg_id"))
    assert(dim.count() == 2)
    // ids dense by key order: py=1, r=2
    val ids = dim.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ids == Map("py" -> 1, "r" -> 2))
    assert(withId.columns.contains("pkg_id"))
    assert(withId.count() == 3)
  }

  test("lookup rejects column collisions; adds columns by key") {
    import spark.implicits._
    val fact = Seq((1, 10.0)).toDF("k", "v")
    val dim = Seq((1, "x", 99.0)).toDF("k", "attr", "v")
    intercept[IllegalArgumentException] {
      Sources.lookup(fact, dim, "k", Seq("attr", "v"))
    }
    val ok = Sources.lookup(fact, dim, "k", Seq("attr"))
    assert(ok.columns.toSeq == Seq("k", "v", "attr"))
    assert(ok.head().getString(2) == "x")
  }

  test("distributed surrogate keys are dense and unique") {
    val df = spark.range(1000).toDF("x").repartition(7)
    val withId = Sources.surrogateKeyDistributed(df, "sk")
    val ids = withId.select("sk").collect().map(_.getLong(0)).sorted
    assert(ids.head == 1 && ids.last == 1000 && ids.distinct.length == 1000)
  }

  test("scd2 intervals tile per key: no gaps, no overlaps, one open version") {
    import graft.sources.Sources
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val changes = Seq(
      (1L, ts(1), "a"), (1L, ts(3), "b"), (1L, ts(7), "c"), // three versions
      (2L, ts(5), "x")                                      // single version
    ).toDF("user_id", "ts", "state")
    val v = Sources.scd2(changes, Seq("user_id"), "ts")
      .select("user_id", "valid_from", "valid_to", "state").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), r.getString(3)))
    assert(v.length == 4, "one version per change row")
    // each non-final version closes exactly at the next version's start
    val byUser = v.groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime))
    byUser.foreach { case (u, vs) =>
      vs.sliding(2).foreach {
        case Array((_, _, Some(to), _), (_, from, _, _)) =>
          assert(to == from, s"user $u: gap/overlap between $to and $from")
        case _ =>
      }
      assert(vs.last._3.isEmpty, s"user $u: current version must stay open")
      assert(vs.init.forall(_._3.nonEmpty), s"user $u: only the last is open")
    }
    // column collisions are rejected, not silently overwritten
    intercept[IllegalArgumentException] {
      Sources.scd2(changes.withColumn("valid_to", lit(1)), Seq("user_id"), "ts")
    }
  }

  test("streaming sessionizeAll emits every closed session") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events_all").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = graft.streaming.EventsStreaming.readEvents(spark, dir)
    val typed = stream
      .select($"ts".cast("timestamp").as("ts"), $"user_id", $"event_type", $"value")
      .as[graft.streaming.EventsStreaming.Event]
    val q = graft.streaming.EventsStreaming.sessionizeAll(typed, 30)
      .writeStream.format("memory").queryName("sess_all")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val emitted = spark.table("sess_all")
      .as[graft.streaming.EventsStreaming.Session].collect()
    val batch = graft.operators.Events.sessionsSql(
      graft.sources.Sources.readEvents(spark, sfDir), 30)
    val users = batch.select("user_id").distinct().count()
    val total = batch.count()
    // single input batch: every session except each user's open last one
    // is closed and emitted
    assert(emitted.length >= total - users)
    val batchSet = batch.select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    emitted.foreach { s =>
      assert(batchSet.contains((s.user_id, s.session_start, s.n_events)))
    }
  }
}
