package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE training against the hand-computable classic fixture (the
  * low/lower/newest/widest corpus of the BPE paper) plus encode paths. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("classic fixture: exact merge sequence with deterministic tie-break") {
    val m = Bpe.trainBpe(corpus, "text", numMerges = 4)
    // hand-computed: es(9), es+t</w>(9), l+o(7), then a 3-way tie at 6
    // — (e,w), (n,e), (w,est</w>) — broken by (left, right) ascending
    assert(m.merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"),
      ("e", "w")))
  }

  test("segment applies merges in order; dictionary matches segment()") {
    val m = Bpe.trainBpe(corpus, "text", numMerges = 4)
    assert(m.segment("lowest") == Seq("lo", "w", "est</w>"))
    assert(m.segment("newest") == Seq("n", "ew", "est</w>"))
    assert(m.segment("low") == Seq("lo", "w</w>"))
    // every dictionary word's stored segmentation == segment(word)
    m.dictSegments.foreach { case (w, segs) =>
      assert(segs == m.segment(w), s"word $w")
    }
  }

  test("encodeTokenCounts: dictionary words by model, loose OOV mode " +
    "(exactOov = false) counts characters") {
    val m = Bpe.trainBpe(corpus, "text", numMerges = 4)
    val docs = Seq((1L, "low lower zzz"), (2L, "newest a"))
      .toDF("doc_id", "text")
    val got = Bpe.encodeTokenCounts(docs, "doc_id", "text", m,
        exactOov = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val low = m.segment("low").length // 2
    val lower = m.segment("lower").length
    assert(got(1L) == ((low + lower + 3L, 3L))) // zzz OOV -> 3 chars
    assert(got(2L) == ((m.segment("newest").length + 1L, 2L))) // "a" OOV -> 1
  }

  test("encodeSegments equals driver-side segmentation incl. OOV fallback") {
    val m = Bpe.trainBpe(corpus, "text", numMerges = 4)
    val docs = Seq((1L, "low zzz")).toDF("doc_id", "text")
    val got = Bpe.encodeSegments(docs, "doc_id", "text", m,
        exactOov = false)
      .orderBy("pos", "token")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    val expected = Seq(0 -> "lo", 0 -> "w</w>", 1 -> "z", 1 -> "z",
      1 -> "z</w>")
    assert(got.sorted.toSeq == expected.sorted)
  }

  test("exactOov: distributed encode equals segment() for EVERY word") {
    // train on a dictionary capped to 2 words, so real corpus words go
    // OOV — "lowest" is OOV but the learned merges still apply to it
    val m = Bpe.trainBpe(corpus, "text", numMerges = 4, maxDictWords = 2)
    val docs = Seq((1L, "low lowest zzz"), (2L, "newest low a"))
      .toDF("doc_id", "text")
    // segment stream, word by word, equals the driver tokenizer exactly
    val got = Bpe.encodeSegments(docs, "doc_id", "text", m, exactOov = true)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val words = Map((1L, 0) -> "low", (1L, 1) -> "lowest", (1L, 2) -> "zzz",
      (2L, 0) -> "newest", (2L, 1) -> "low", (2L, 2) -> "a")
    words.foreach { case (k, w) =>
      assert(got(k).sorted == m.segment(w).sorted,
        s"word $w at $k: got ${got(k)}, want ${m.segment(w)}")
    }
    // token counts match too
    val counts = Bpe.encodeTokenCounts(docs, "doc_id", "text", m,
        exactOov = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) ==
      Seq("low", "lowest", "zzz").map(m.segment(_).length.toLong).sum)
    assert(counts(2L) ==
      Seq("newest", "low", "a").map(m.segment(_).length.toLong).sum)
    // and the loose path genuinely differs on a merge-applicable OOV
    // word (it char-splits), proving exactOov isn't vacuous here
    val dflt = Bpe.encodeTokenCounts(docs, "doc_id", "text", m,
        exactOov = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dflt(1L) > counts(1L),
      "char-split OOV count should exceed the merge-applied count")
  }

  test("training is invariant to partitioning") {
    val base = corpus
    val m1 = Bpe.trainBpe(base.repartition(1), "text", 6)
    val m7 = Bpe.trainBpe(base.repartition(7), "text", 6)
    assert(m1.merges == m7.merges)
    assert(m1.dictSegments == m7.dictSegments)
  }

  test("merge exhaustion stops early instead of looping") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Bpe.trainBpe(tiny, "text", numMerges = 50)
    // "ab" -> a,b</w> -> ab</w>: exactly one merge possible
    assert(m.merges == Seq(("a", "b</w>")))
    assert(m.segment("ab") == Seq("ab</w>"))
  }
}
