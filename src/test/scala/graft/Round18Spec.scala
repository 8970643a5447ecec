package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EntityResolution}

/** Round-18 optimization laws: the stage-materialization policy switch
  * (local vs reliable checkpoint, one conf — the round-17 verdict's
  * localCheckpoint-proliferation item), Par.run's no-cancel +
  * suppressed-failure contract, Jobs.labeled description restoration,
  * and the restructured resolveDeltaMulti / nearDupDelta equivalences
  * (their outputs are also oracle-pinned per round; these are the
  * operator-level laws). */
class Round18Spec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------
  // Stage.materialize policy
  // ------------------------------------------------------------------

  test("Stage.materialize default = localCheckpoint (truncated lineage, " +
    "same rows); reliable mode = reliable checkpoint under the conf " +
    "switch with no call-site change") {
    val df = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    val local = graft.util.Stage.materialize(df)
    def isBarrier(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.logical.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD]
    assert(isBarrier(local), "default mode must checkpoint (plan barrier)")
    assert(local.collect().map(_.getLong(1)).sorted.toSeq ==
      df.collect().map(_.getLong(1)).sorted.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("stage_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val reliable = graft.util.Stage.materialize(df)
      assert(isBarrier(reliable), "reliable mode must checkpoint too")
      assert(reliable.collect().map(_.getLong(1)).sorted.toSeq ==
        df.collect().map(_.getLong(1)).sorted.toSeq)
      // the reliable checkpoint actually landed in the checkpoint dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try assert(files.filter(java.nio.file.Files.isRegularFile(_))
        .count() > 0, "reliable checkpoint wrote no files")
      finally files.close()
    } finally spark.conf.set("spark.graft.checkpoint.reliable", "false")
  }

  // ------------------------------------------------------------------
  // Par.run failure contract
  // ------------------------------------------------------------------

  test("Par.run: first failure (input order) propagates with the other " +
    "legs' failures suppressed; successful legs still ran (no-cancel)") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException](graft.util.Par.run[Int](Seq(
      () => { ran.incrementAndGet(); 1 },
      () => throw new IllegalStateException("leg-b"),
      () => throw new IllegalArgumentException("leg-c"),
      () => { ran.incrementAndGet(); 4 })))
    assert(e.getMessage == "leg-b", "first failure in input order wins")
    assert(e.getSuppressed.exists(_.getMessage == "leg-c"),
      "later failures must attach via addSuppressed, not vanish")
    assert(ran.get() == 2, "non-failing legs run to completion")
  }

  test("Par.run returns results in input order") {
    assert(graft.util.Par.run[Int](
      Seq(() => { Thread.sleep(50); 1 }, () => 2, () => 3)) == Seq(1, 2, 3))
  }

  // ------------------------------------------------------------------
  // Jobs.labeled restoration
  // ------------------------------------------------------------------

  test("Jobs.labeled restores the caller's previous job description " +
    "instead of clearing it (nested labels keep the outer scope)") {
    val sc = spark.sparkContext
    sc.setJobDescription("outer")
    try {
      graft.util.Jobs.labeled(sc, "inner") {
        assert(sc.getLocalProperty("spark.job.description") == "inner")
      }
      assert(sc.getLocalProperty("spark.job.description") == "outer",
        "outer label must survive a nested labeled region")
    } finally sc.setJobDescription(null)
    graft.util.Jobs.labeled(sc, "solo")(())
    assert(sc.getLocalProperty("spark.job.description") == null,
      "a null previous description must be restored as null")
  }

  // ------------------------------------------------------------------
  // resolveDeltaMulti restructure equivalence
  // ------------------------------------------------------------------

  test("resolveDeltaMulti after the r18 restructure: adoption minimum " +
    "still propagates to every component member, components with no " +
    "adopted member keep their component-min id, non-edge records keep " +
    "their own id") {
    // corpus: two stored entities under nation blocking
    val corpus = Seq(
      (100L, "smith", 1), (101L, "smith", 1), // entity 100
      (200L, "jones", 2)                      // entity 200
    ).toDF("rid", "name", "blk")
    val stored = EntityResolution.resolve(corpus, "rid", "name", "blk", 1)
    val delta = Seq(
      (300L, "smith", 1),  // adopts 100 directly
      (301L, "smyth", 1),  // within-delta edge to 300 (dist 1) → adopts 100
      (400L, "zzzzz", 2),  // fresh pair: new entity labeled by min id
      (401L, "zzzzz", 2),
      (500L, "alone", 3)   // isolated, matches nothing: keeps own id
    ).toDF("rid", "name", "blk")
    val got = EntityResolution.resolveDelta(stored, delta, "rid", "name",
      "blk", 1).select("rid", "entity_id").as[(Long, Long)]
      .collect().toMap
    assert(got == Map(300L -> 100L, 301L -> 100L,
      400L -> 400L, 401L -> 400L, 500L -> 500L))
  }

  // ------------------------------------------------------------------
  // nearDupDelta restructure equivalence
  // ------------------------------------------------------------------

  test("nearDupDelta after the r18 Par restructure: cross hits drop the " +
    "whole delta component, fresh components keep their min id, and a " +
    "provided carved index gives the same survivors as the built one") {
    val mk = (id: Long, t: String) => (id, t)
    val corpusDocs = Seq(
      mk(2L, "alpha beta gamma delta epsilon zeta eta theta"),
      mk(4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val deltaDocs = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta"), // cross dup
      mk(3L, "nine ten eleven twelve thirteen fourteen fifteen"), // fresh
      mk(5L, "nine ten eleven twelve thirteen fourteen fifteen")  // twin of 3
    ).toDF("doc_id", "text")
    val corpusIdx = Dedup.buildShingleIndex(corpusDocs, "doc_id", "text", 3)
    val (survBuilt, deltaIdx) = Dedup.nearDupDelta(
      Some(corpusIdx), deltaDocs, "doc_id", "text")
    assert(survBuilt.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(3L), "1 drops (cross), 3 survives (component min), 5 drops")
    // carved-index form: same survivors
    val (survCarved, _) = Dedup.nearDupDelta(
      Some(corpusIdx), deltaDocs, "doc_id", "text",
      deltaShinglesDf = Some(deltaIdx))
    assert(survCarved.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(3L))
  }
}
