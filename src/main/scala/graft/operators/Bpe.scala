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

  /** BPE token count per document: explode words, broadcast-join the
    * dictionary segmentation. Out-of-dictionary words default to the
    * character-level count (length + 1 symbols — each char plus the
    * end-of-word marker merged onto the last char counts as length;
    * see [[BpeModel.segment]]); `exactOov = true` instead segments the
    * distinct OOV vocabulary exactly (merge-applied), so counts equal
    * the driver tokenizer for EVERY word. One scan + one size-guarded
    * broadcast join; nothing corpus-sized shuffles. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        model: BpeModel, exactOov: Boolean = false): DataFrame = {
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
                     model: BpeModel, exactOov: Boolean = false): DataFrame = {
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
