package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Corpus, Decontaminate, Dedup, Quality}

/** Round-14 operator laws: within-doc repetition removal, block-aware
  * HTML extraction, the plan-composed UniMax twin, trained language-ID,
  * NULL-source divergence, the fused one-pass novelty scoring, and the
  * new named guards. */
class Round14Spec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------
  // removeRepeatedLines
  // ------------------------------------------------------------------

  private def repeatedFixture = Seq(
    // L2 repeats L1 case-varied, L4 repeats L1 verbatim -> both drop;
    // "shared line" is cross-doc boilerplate but within-doc unique ->
    // kept in BOTH docs; "### 1 ###" is structure (normalizes to "") ->
    // kept even though repeated within the doc
    (1L, "alpha beta gamma\nALPHA BETA GAMMA\nshared line\n### 1 ###\nalpha beta gamma\n### 1 ###\ntail one"),
    (2L, "delta epsilon\nshared line\ntail two"),
    (3L, "untouched doc with no repeats at all")
  ).toDF("doc_id", "text")

  test("removeRepeatedLines drops all-but-first occurrences within a doc") {
    val out = Dedup.removeRepeatedLines(repeatedFixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) ==
      "alpha beta gamma\nshared line\n### 1 ###\n### 1 ###\ntail one")
    // cross-doc shared lines are NOT this operator's business
    assert(out(2L) == "delta epsilon\nshared line\ntail two")
  }

  test("removeRepeatedLines: untouched docs pass through byte-identical") {
    val out = Dedup.removeRepeatedLines(repeatedFixture, "doc_id", "text")
      .filter(col("doc_id") === 3L).head().getString(1)
    assert(out == "untouched doc with no repeats at all")
  }

  test("removeRepeatedLines law: repetitionReport sees ~0 duplicate lines after") {
    // fixture without repeated structure lines (repetitionReport's line
    // census is RAW, so surviving structure repeats would count there)
    val docs = Seq(
      (1L, "one two three\none two three\nfour five six\none two three"),
      (2L, "seven eight\nseven eight\nnine ten")
    ).toDF("doc_id", "text")
    val fixed = Dedup.removeRepeatedLines(docs, "doc_id", "text")
    val rep = Quality.repetitionReport(fixed, "doc_id", "text")
    val maxDup = rep.agg(max(col("dup_line_frac"))).head().getDouble(0)
    assert(maxDup == 0.0, s"dup_line_frac should be 0 after fix, got $maxDup")
  }

  // ------------------------------------------------------------------
  // stripHtmlBlocks
  // ------------------------------------------------------------------

  test("stripHtmlBlocks keeps one line per block and decodes entities") {
    val html = "<html><head><title>T</title><script>var x = 1 < 2;</script>" +
      "<style>p{}</style></head><body><p>first  para</p><!-- gone -->" +
      "<p>second &amp; more</p><div>third</div>line<br/>after</body></html>"
    val out = Seq(Tuple1(html)).toDF("h")
      .select(TextFunctions.stripHtmlBlocks(col("h")).as("t"))
      .head().getString(0)
    assert(out == "T\nfirst para\nsecond & more\nthird\nline\nafter")
  }

  test("stripHtmlBlocks agrees with stripHtml modulo line structure") {
    val html = "<body><p>a b</p><p>c &lt;d&gt;</p></body>"
    val df = Seq(Tuple1(html)).toDF("h")
    val flat = df.select(TextFunctions.stripHtml(col("h"))).head().getString(0)
    val blocks = df.select(TextFunctions.stripHtmlBlocks(col("h")))
      .head().getString(0)
    assert(blocks.replace("\n", " ") == flat)
  }

  // ------------------------------------------------------------------
  // unimaxWeights ≡ unimaxAllocation
  // ------------------------------------------------------------------

  test("unimaxWeights matches the driver-side unimaxAllocation, NULL source included") {
    val docs = Seq(
      (Some("big"), 600L), (Some("big"), 600L), (Some("mid"), 300L),
      (Some("small"), 50L), (None, 80L)
    ).toDF("src", "tok")
    val total = 600L + 600 + 300 + 50 + 80
    val a = Corpus.unimaxAllocation(docs, "src", col("tok"),
      budget = 3L * total / 2L, maxEpochs = 2.0)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    val b = Corpus.unimaxWeights(docs, "src", col("tok"),
      budgetNum = 3L, budgetDen = 2L, maxEpochs = 2.0)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(a == b)
  }

  test("unimaxWeights: budget above total capacity gives every source its cap") {
    val docs = Seq(("a", 10L), ("b", 20L)).toDF("src", "tok")
    val out = Corpus.unimaxWeights(docs, "src", col("tok"),
      budgetNum = 100L, budgetDen = 1L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out == Map("a" -> 20.0, "b" -> 40.0))
  }

  // ------------------------------------------------------------------
  // trained language-ID
  // ------------------------------------------------------------------

  private def plantedLangCorpus = {
    val base = (0 until 240).map { i =>
      val li = i % 3
      val lang = Seq("aa", "bb", "cc")(li)
      val pre = Seq("ka", "zo", "mx")(li)
      val text = (0 until 25)
        .map(j => s"${pre}_${(i * 7 + j * 13) % 150 + li * 150}")
        .mkString(" ")
      (i.toLong, lang, text)
    }
    base.toDF("doc_id", "lang", "text")
  }

  test("trainLangId separates planted languages on held-out docs") {
    val all = plantedLangCorpus
    val train = all.filter(col("doc_id") % 2 === 0)
    val test0 = all.filter(col("doc_id") % 2 === 1)
    val m = Quality.trainLangId(train, "text", "lang",
      numFeatures = 1 << 14, maxIter = 10)
    assert(m.labels == Seq("aa", "bb", "cc"))
    val pred = Quality.predictLang(m, test0, "doc_id", "text")
      .select(col("doc_id"), col("lang").as("pred"))
      .join(test0.select("doc_id", "lang"), "doc_id")
    val (n, ok) = {
      val r = pred.agg(count(lit(1)),
        sum(when(col("pred") === col("lang"), 1L).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(n == 120)
    assert(ok >= (n * 0.95).toLong, s"held-out accuracy $ok/$n below 95%")
  }

  test("predictLang is partition-invariant") {
    val all = plantedLangCorpus
    val m = Quality.trainLangId(all, "text", "lang",
      numFeatures = 1 << 14, maxIter = 5)
    val p1 = Quality.predictLang(m, all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val p2 = Quality.predictLang(m, all.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(p1 == p2)
  }

  test("predictLang confidence is a probability and rounds to 4 decimals") {
    val all = plantedLangCorpus
    val m = Quality.trainLangId(all, "text", "lang",
      numFeatures = 1 << 14, maxIter = 5)
    val bad = Quality.predictLang(m, all, "doc_id", "text")
      .filter(col("confidence") < 1.0 / 3 - 1e-9 || col("confidence") > 1.0)
      .count()
    assert(bad == 0)
  }

  // ------------------------------------------------------------------
  // divergenceReport NULL source
  // ------------------------------------------------------------------

  test("divergenceReport reports a NULL source instead of dropping it") {
    val docs = Seq(
      (Some("a"), "apple banana apple cherry"),
      (Some("b"), "apple banana banana dates"),
      (None: Option[String], "cherry cherry dates apple")
    ).toDF("source", "text")
    val out = Corpus.divergenceReport(docs, "source", "text", maxVocab = 16)
      .collect()
    assert(out.length == 3)
    val nullRow = out.find(_.isNullAt(0))
    assert(nullRow.isDefined, "NULL source row missing")
    assert(nullRow.get.getLong(1) == 4L) // its 4 tokens counted
    // and the named sources still carry finite divergences
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(3).isNaN))
  }

  // ------------------------------------------------------------------
  // fused one-pass novelty
  // ------------------------------------------------------------------

  test("noveltyReport: fused plan keeps exact counts and NULL semantics") {
    val corpus = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "a b c d e f g h i j"), // fully seen: novelty 0
      (11L, "z y x w v u t s r q"), // fully new: novelty 1
      (12L, "short doc")            // under minTokens: NULL novelty
    ).toDF("doc_id", "text")
    val out = Decontaminate.noveltyReport(corpus, delta, "doc_id", "text",
        minTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out == Set(
      (10L, 3L, 3L, Some(0.0)),
      (11L, 3L, 0L, Some(1.0)),
      (12L, 0L, 0L, None)))
  }

  // ------------------------------------------------------------------
  // named guards
  // ------------------------------------------------------------------

  test("paragraph delta: batchId -1 is refused by name") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_r14_guard").toString
    Dedup.saveParagraphStore(docs, "doc_id", "text", root)
    val e = intercept[IllegalArgumentException] {
      Dedup.dropDuplicateParagraphsDelta(docs, "doc_id", "text", root,
        batchId = Some(-1L))
    }
    assert(e.getMessage.contains("reserved for the initial corpus"))
  }

  test("zAddress refuses non-integral columns by name") {
    val df = Seq((1.5, 2L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Layout.zAddress(df, Seq("x", "y"))
    }
    assert(e.getMessage.contains("integral"))
  }

  // ------------------------------------------------------------------
  // sequence packing
  // ------------------------------------------------------------------

  test("packSequences: doc intervals tile the stream exactly, seq ids cover") {
    import graft.operators.Sampling
    val docs = (1L to 200L).map(i => (i, (i % 37 + 1).toInt))
      .toDF("doc_id", "n")
    val out = Sampling.packSequences(docs, "doc_id", col("n"), seqLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = out.map(_._2).sum
    // intervals are disjoint and contiguous: sorted by start, each doc
    // begins exactly where the previous ended
    val byStart = out.sortBy(_._3)
    byStart.zip(byStart.drop(1)).foreach { case (a, b) =>
      assert(a._3 + a._2 == b._3, s"gap/overlap between $a and $b") }
    assert(byStart.head._3 == 0L)
    assert(byStart.last._3 + byStart.last._2 == total)
    // seq ids are the covering interval at L=64
    out.foreach { case (_, n, start, sf, sl) =>
      assert(sf == start / 64)
      assert(sl == (start + n - 1) / 64)
    }
  }

  test("packSequences: zero-token docs occupy no interval, order is stable") {
    import graft.operators.Sampling
    val docs = Seq((1L, 5), (2L, 0), (3L, 7)).toDF("doc_id", "n")
    val out = Sampling.packSequences(docs, "doc_id", col("n"), seqLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None
         else Some((r.getLong(3), r.getLong(4))))).toMap
    assert(out(2L)._1 == 0L && out(2L)._3.isEmpty)
    // stability: a second run assigns identical offsets
    val out2 = Sampling.packSequences(docs.repartition(5), "doc_id",
      col("n"), seqLen = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.view.mapValues(_._2).toMap == out2)
  }

  // ------------------------------------------------------------------
  // weighted interleave
  // ------------------------------------------------------------------

  test("interleaveByWeight: every prefix carries sources in ~weight proportion") {
    val docs = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "heavy" else "light")).toDF("doc_id", "source")
    val w = Seq(("heavy", 0.75), ("light", 0.25)).toDF("source", "weight")
    val out = Corpus.interleaveByWeight(docs, "doc_id", "source", w,
      numShards = 1, pivots = 16)
      .orderBy("pos").select("source").collect().map(_.getString(0))
    // heavy has 100 docs at weight .75, light 200 at .25: until heavy
    // exhausts (key 100/.75 ≈ 133), prefixes should run ~3:1 heavy
    val prefix = out.take(80)
    val heavy = prefix.count(_ == "heavy")
    assert(heavy >= 50 && heavy <= 70,
      s"80-prefix heavy count $heavy outside the ~60 ± 10 band")
    // and the whole schedule is a permutation of the corpus
    assert(out.length == 300)
  }

  test("interleaveByWeight: deterministic under repartitioning") {
    val docs = (1L to 120L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val w = (0 until 4).map(i => (s"s$i", 0.1 + i * 0.2)).toDF("source", "weight")
    val a = Corpus.interleaveByWeight(docs, "doc_id", "source", w, 4)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Corpus.interleaveByWeight(docs.repartition(7), "doc_id",
      "source", w, 4)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("interleaveByWeight: a source missing from the weights fails by name") {
    val docs = Seq((1L, "known"), (2L, "unknown")).toDF("doc_id", "source")
    val w = Seq(("known", 1.0)).toDF("source", "weight")
    val e = intercept[Exception] {
      Corpus.interleaveByWeight(docs, "doc_id", "source", w, 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("interleaveByWeight")))
  }

  test("packSequences: negative token counts fail by name") {
    import graft.operators.Sampling
    val docs = Seq((1L, -3)).toDF("doc_id", "n")
    val e = intercept[Exception] {
      Sampling.packSequences(docs, "doc_id", col("n"), seqLen = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("packSequences")))
  }
}
