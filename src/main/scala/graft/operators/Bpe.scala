package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al., ACL 2016) — the subword-vocabulary step of an LLM data pipeline
  * (north-star extension; no reference-repo counterpart).
  *
  * Scale shape: classic BPE iterates a global argmax over pair counts,
  * which is hostile to distributed execution if run over the corpus —
  * so, as every production tokenizer trainer does, training runs on the
  * WORD-FREQUENCY DICTIONARY: one distributed tokenize+count scan of
  * the corpus, a bounded TakeOrdered keeps the `maxDictWords` most
  * frequent words (top-k per partition + driver merge — never a full
  * sort), and the exact merge loop runs driver-side over that bounded
  * dictionary. At 100 TB the corpus is read once; everything after is
  * O(dictionary).
  *
  * Application is UDF-free: the trained model segments its dictionary
  * driver-side into a (word → segments) table that BROADCASTS; encoding
  * a corpus is explode-words → broadcast-join → fallback for
  * out-of-dictionary words (character split, the untrained-symbol
  * semantics). Token ids, counts, and segment streams all derive from
  * that one join.
  */
object Bpe {

  /** A trained BPE model: ordered merge rules + the segmentation of the
    * training dictionary (word → subword segments, end-of-word marker
    * `</w>` on the final segment). */
  final case class BpeModel(merges: Seq[(String, String)],
                            dictSegments: Map[String, Seq[String]]) {
    /** Exact classic-BPE segmentation of one word (chars + `</w>`,
      * then the learned merges in order).
      *
      * CONTRACT vs the distributed encode paths: for a word IN the
      * training dictionary this agrees with [[encodeSegments]]/
      * [[encodeTokenCounts]] exactly (their broadcast table is built by
      * this very method). For an out-of-dictionary word this applies
      * the learned merges (classic encode-time BPE), while the
      * distributed paths DEFAULT to the character split: applying an
      * ordered merge list inside a Spark expression needs one nested
      * pass per merge (plan depth ∝ numMerges — thousands), and the
      * no-scalar-UDF doctrine rules out the per-row escape hatch. OOV
      * words are the dictionary's long tail by construction; callers
      * who need exact OOV merges distributively pass `exactOov = true`
      * to [[encodeTokenCounts]]/[[encodeSegments]] (segments the
      * DISTINCT OOV vocabulary once via mapPartitions — vocabulary-
      * bounded, never per-occurrence) or train with a larger
      * `maxDictWords` so the tail is in the table. */
    def segment(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms = word.map(_.toString).toVector
      syms = syms.init :+ (syms.last + "</w>")
      // apply merges in learned order (the classic algorithm):
      // each rule replaces every adjacent occurrence left-to-right
      merges.foreach { case (a, b) =>
        var i = 0
        val out = Vector.newBuilder[String]
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
  }

  /** Train `numMerges` BPE merges on the corpus. One distributed
    * tokenize + word-count scan; the `maxDictWords` most frequent words
    * (freq desc, word asc — fully deterministic) form the training
    * dictionary; the exact merge loop runs driver-side.
    *
    * Determinism: the global argmax breaks ties by (pair count desc,
    * left symbol asc, right symbol asc), so the same corpus always
    * yields the same merge table on any engine or partitioning. */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               maxDictWords: Int = 65536): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxDictWords > 0, s"maxDictWords must be > 0, got $maxDictWords")
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxDictWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // driver-side classic BPE over the bounded dictionary
    var dict: Array[(Vector[String], Long)] = wordFreq.map { case (w, f) =>
      val syms = w.map(_.toString).toVector
      (syms.init :+ (syms.last + "</w>"), f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var done = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        dict = dict.map { case (syms, f) =>
          var i = 0
          val out = Vector.newBuilder[String]
          while (i < syms.length) {
            if (i + 1 < syms.length &&
              syms(i) == best._1 && syms(i + 1) == best._2) {
              out += (best._1 + best._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        done += 1
      }
    }
    BpeModel(merges.result(),
      wordFreq.map(_._1).zip(dict.map(_._1.toSeq)).toMap)
  }

  /** Per-word segmentation table of the model's dictionary — the
    * broadcast side of [[encodeTokenCounts]]/[[encodeSegments]]. */
  private def segmentTable(docs: DataFrame, model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    model.dictSegments.toSeq
      .map { case (w, segs) => (w, segs, segs.length) }
      .toDF("w", "segs", "n_segs")
  }

  /** Exact merge-applied segmentation of a DISTINCT word relation (one
    * string column `w`) — [[BpeModel.segment]] mapped over partitions.
    * mapPartitions is sanctioned here for the same reason as multimodal
    * decode: a per-element JVM algorithm (numMerges ordered passes) that
    * no expression tree can express, over a relation bounded by the
    * VOCABULARY (distinct words), never the corpus. The model (merges +
    * dict) ships once per executor via broadcast. */
  private def oovSegmentTable(words: DataFrame, model: BpeModel): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    words.select(col("w")).as[String]
      .mapPartitions { it => val m = bc.value; it.map(w => (w, m.segment(w))) }
      .toDF("w", "segs")
      .withColumn("n_segs", size(col("segs")))
  }

  /** The dictionary table, plus (when `exactOov`) exact merge-applied
    * segments for the corpus words the dictionary misses — derived from
    * the DISTINCT OOV vocabulary (the explode→distinct shuffle is
    * vocabulary-bounded after partial aggregation). */
  private def fullSegmentTable(words: DataFrame, model: BpeModel,
                               exactOov: Boolean): DataFrame = {
    val dictT = segmentTable(words, model)
    if (!exactOov) dictT
    else dictT.unionByName(oovSegmentTable(
      words.select("w").distinct()
        .join(dictT.select("w"), Seq("w"), "left_anti"), model))
  }

  // ===================================================================
  // Unigram language-model tokenizer (Kudo, ACL 2018 — the SentencePiece
  // "unigram" algorithm), the second of the two standard subword
  // trainers next to [[trainBpe]]. Same production scale shape: ONE
  // distributed tokenize+count scan builds the bounded word-frequency
  // dictionary; training then runs EM over the DICTIONARY — the E-step
  // is a per-word Viterbi against the BROADCAST vocabulary
  // (mapPartitions over the dictionary frame, sanctioned exactly like
  // [[oovSegmentTable]]: per-element JVM dynamic programming over a
  // vocabulary-bounded relation), the M-step is one token-count
  // aggregation per round. At 100 TB the corpus is read once;
  // everything after is O(dictionary · rounds).
  //
  // DETERMINISM over fidelity-to-paper where they conflict: this is
  // Viterbi (hard) EM — each word contributes its single best
  // segmentation, so the M-step counts are INTEGRAL (frequency-weighted
  // longs), summation order cannot perturb them, and the trained
  // vocabulary is bit-identical under any partitioning (the trainBpe
  // doctrine; soft-EM posterior fractions would re-associate). Viterbi
  // ties break (score, then fewer tokens, then lexicographic token
  // stream) so segmentation itself is total-ordered.
  // ===================================================================

  /** A trained unigram-LM tokenizer: `pieces` (token → log-probability,
    * sorted by token) and the training dictionary's segmentation. */
  final case class UnigramModel(pieces: Map[String, Double],
                                dictSegments: Map[String, Seq[String]]) {
    /** Unknown-character penalty: below every real piece's log-prob, so
      * an unknown char never outcompetes a known piece covering it. */
    private val unkLp =
      (if (pieces.isEmpty) 0.0 else pieces.values.min) - 100.0

    /** Longest piece length, hoisted out of [[segment]]: computed once
      * per model instance (so once per broadcast deserialization on an
      * executor), not per word — inside trainUnigram's E-step a per-call
      * scan of all vocabulary keys costs O(|dict| · |vocab|) extra
      * key-length reads per EM round, dominating training time. */
    private lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max

    /** Viterbi-best segmentation under the trained piece probabilities.
      * Characters outside the vocabulary become single-char tokens at
      * the unknown penalty (SentencePiece's unk semantics). Ties break
      * deterministically: higher score, then fewer tokens, then the
      * lexicographically smaller final piece (evaluated left-to-right,
      * so the full chain is total-ordered). */
    def segment(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      val n = word.length
      // dp(i): best (score, tokens, lastPieceStart) for prefix of length i
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val toks = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1)
      score(0) = 0.0; toks(0) = 0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - math.max(maxLen, 1))
        while (j < i) {
          if (score(j) != Double.NegativeInfinity) {
            val piece = word.substring(j, i)
            val lp = pieces.getOrElse(piece,
              if (i - j == 1) unkLp else Double.NegativeInfinity)
            if (lp != Double.NegativeInfinity) {
              val s = score(j) + lp
              val t = toks(j) + 1
              val better = s > score(i) ||
                (s == score(i) && (t < toks(i) ||
                  (t == toks(i) && back(i) >= 0 &&
                    piece < word.substring(back(i), i))))
              if (better) { score(i) = s; toks(i) = t; back(i) = j }
            }
          }
          j += 1
        }
        i += 1
      }
      val out = List.newBuilder[String]
      var p = n
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      while (p > 0) { rev += word.substring(back(p), p); p = back(p) }
      rev.reverse.foreach(out += _)
      out.result()
    }
  }

  /** Train a unigram-LM vocabulary of (at most) `vocabSize` pieces —
    * EXCEPT that every single character seen in the dictionary is kept
    * unconditionally (SentencePiece's `required_chars` coverage
    * semantics: a dropped char would make some word unsegmentable), so
    * on a corpus with more distinct characters than `vocabSize` the
    * final vocabulary is exactly those characters and the true bound is
    * `max(vocabSize, distinct chars)`. Verdicts over the trained size
    * must use that bound, not `vocabSize` alone.
    *
    *  1. ONE distributed tokenize + word-count scan; the `maxDictWords`
    *     most frequent words (freq desc, word asc) form the dictionary
    *     — the [[trainBpe]] shape.
    *  2. SEED: every substring of a dictionary word up to `maxPieceLen`
    *     chars, scored by Σ freq over its occurrences; all single
    *     characters survive unconditionally (coverage), the top
    *     `seedSize` multi-char candidates by (score desc, token asc)
    *     join them. Driver-side over the bounded dictionary.
    *  3. `emRounds` rounds of Viterbi-EM: E — per-word best
    *     segmentation against the broadcast vocabulary, distributed
    *     over the persisted dictionary frame; M — ONE (token, Σ freq)
    *     aggregation (integral counts). Each round keeps the single
    *     chars plus the top multi-char pieces by (count desc, token
    *     asc), shrinking by `shrink` per round but never below
    *     `vocabSize` (the final round cuts exactly to it); zero-count
    *     pieces drop (Viterbi never used them).
    *
    * Log-probs are `log(count / total)` from the final round, rounded
    * to 12 decimals so the stored model is digit-stable across JVMs. */
  def trainUnigram(docs: DataFrame, textCol: String, vocabSize: Int,
                   maxDictWords: Int = 65536, maxPieceLen: Int = 8,
                   seedSize: Int = 1 << 14, emRounds: Int = 4,
                   shrink: Double = 0.75): UnigramModel = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    require(shrink > 0 && shrink <= 1, s"shrink must be in (0, 1], got $shrink")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxDictWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(wordFreq.nonEmpty, "trainUnigram: empty corpus")
    // ---- seed (driver, dictionary-bounded) ----
    val seedScore = scala.collection.mutable.Map.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val sub = w.substring(i, j)
          seedScore(sub) = seedScore.getOrElse(sub, 0L) + f
          j += 1
        }
        i += 1
      }
    }
    val chars = seedScore.keysIterator.filter(_.length == 1).toVector.sorted
    val multis = seedScore.toSeq.filter(_._1.length > 1)
      .sortBy { case (t, s) => (-s, t) }
      .take(seedSize).map(_._1)
    var vocab: Map[String, Double] = {
      val tot = (chars ++ multis).map(seedScore).sum.toDouble
      (chars ++ multis).map(t => t -> math.log(seedScore(t) / tot)).toMap
    }
    // ---- Viterbi-EM over the persisted dictionary frame ----
    val dictDs = wordFreq.toSeq.toDF("w", "f").persist()
    try {
      dictDs.count() // materialize once; every round re-reads this
      var round = 0
      var multiBudget = multis.length
      while (round < emRounds) {
        val bcPieces = spark.sparkContext.broadcast(vocab)
        // E: per-word Viterbi (broadcast vocab), M: one aggregation —
        // counts are integral, so the result is partition-invariant
        val counts: Map[String, Long] = dictDs.as[(String, Long)]
          .mapPartitions { it =>
            val m = UnigramModel(bcPieces.value, Map.empty)
            it.flatMap { case (w, f) => m.segment(w).map(_ -> f) }
          }
          .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .collect().toMap // vocabulary-bounded
        bcPieces.destroy()
        multiBudget = math.max(vocabSize - chars.length,
          if (round == emRounds - 1) 0
          else math.floor(multiBudget * shrink).toInt)
        val keptMultis = counts.toSeq
          .filter { case (t, c) => t.length > 1 && c > 0 }
          .sortBy { case (t, c) => (-c, t) }
          .take(multiBudget).map(_._1)
        val kept = chars.filter(c =>
          counts.getOrElse(c, 0L) > 0 || vocab.contains(c)) ++ keptMultis
        val tot = kept.map(t => math.max(counts.getOrElse(t, 0L), 1L)).sum.toDouble
        vocab = kept.map(t => t ->
          math.rint(math.log(math.max(counts.getOrElse(t, 0L), 1L) / tot)
            * 1e12) / 1e12).toMap
        round += 1
      }
      val model = UnigramModel(vocab, Map.empty)
      val segs = wordFreq.map { case (w, _) => w -> model.segment(w) }.toMap
      UnigramModel(vocab, segs)
    } finally dictDs.unpersist(): Unit
  }

  /** Viterbi segment-count table for a DISTINCT word relation (one
    * string column `w`) under a broadcast [[UnigramModel]] — the unigram
    * analog of [[oovSegmentTable]], with the same sanction: per-element
    * JVM dynamic programming over a VOCABULARY-bounded relation (distinct
    * OOV words), never the corpus; the model ships once per executor. */
  private def unigramOovTable(words: DataFrame,
                              model: UnigramModel): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    words.select(col("w")).as[String]
      .mapPartitions { it =>
        val m = bc.value; it.map(w => (w, m.segment(w).length))
      }
      .toDF("w", "n_segs")
  }

  /** Unigram token count per document — the [[encodeTokenCounts]] shape
    * over the unigram dictionary segmentation: explode words, one
    * size-guarded broadcast join, out-of-dictionary words fall back to
    * their character count (an upper bound — a learned multi-char piece
    * may cover part of an unseen word). `exactOov = true` (the
    * DEFAULT — one documented default across both tokenizers and the
    * packed-export compositions) instead Viterbi-segments the DISTINCT
    * OOV vocabulary against the broadcast model (the
    * [[encodeTokenCounts]] exactOov move), so counts equal the driver
    * tokenizer ([[UnigramModel.segment]]) for EVERY word. Nothing
    * corpus-sized shuffles either way; pass `exactOov = false` only
    * when an upper-bound proxy is acceptable and the distinct-OOV
    * segmentation pass is worth skipping. */
  def unigramTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         model: UnigramModel,
                         exactOov: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val dictT = model.dictSegments.toSeq
      .map { case (w, segs) => (w, segs.length) }
      .toDF("w", "n_segs")
    val fullT =
      if (!exactOov) dictT
      else dictT.unionByName(unigramOovTable(
        words.select("w").distinct()
          .join(dictT.select("w"), Seq("w"), "left_anti"), model))
    val seg = graft.model.Joins.maybeBroadcast(fullT)
    words
      .join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("n_segs"), length(col("w"))))
        .as("n_uni_tokens"),
        count(lit(1)).as("n_words"))
  }

  /** BPE token count per document: explode words, broadcast-join the
    * dictionary segmentation. Out-of-dictionary words default to the
    * character-level count (length + 1 symbols — each char plus the
    * end-of-word marker merged onto the last char counts as length;
    * see [[BpeModel.segment]]); `exactOov = true` (the DEFAULT — one
    * documented default across both tokenizers and the packed-export
    * compositions) instead segments the distinct OOV vocabulary exactly
    * (merge-applied), so counts equal the driver tokenizer for EVERY
    * word. One scan + one size-guarded broadcast join; nothing
    * corpus-sized shuffles. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        model: BpeModel, exactOov: Boolean = true): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val seg = graft.model.Joins.maybeBroadcast(
      fullSegmentTable(words, model, exactOov))
    words
      .join(seg.select(col("w"), col("n_segs")), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("n_segs"), length(col("w"))))
        .as("n_bpe_tokens"),
        count(lit(1)).as("n_words"))
  }

  /** Subword segment stream per document (ordered by word position):
    * the actual tokenized form. Out-of-dictionary words default to
    * their character split with `</w>` on the last char; `exactOov =
    * true` applies the learned merges to the distinct OOV vocabulary,
    * making the stream identical to [[BpeModel.segment]] word by word. */
  def encodeSegments(docs: DataFrame, idCol: String, textCol: String,
                     model: BpeModel, exactOov: Boolean = true): DataFrame = {
    val words = docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val seg = graft.model.Joins.maybeBroadcast(
      fullSegmentTable(words, model, exactOov))
    val charSplit = // OOV fallback: chars, "</w>" appended to the last
      transform(split(col("w"), ""),
        (c, i) => when(i === length(col("w")) - 1, concat(c, lit("</w>")))
          .otherwise(c))
    words
      .join(seg.select(col("w"), col("segs")), Seq("w"), "left")
      .select(col(idCol), col("pos"),
        explode(coalesce(col("segs"), charSplit)).as("token"))
  }
}
