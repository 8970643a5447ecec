package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Token-window chunking for retrieval / context-window pipelines
  * (north-star extension; no reference counterpart): split each document
  * into overlapping windows of `width` tokens advancing by `stride`
  * (stride < width ⇒ width−stride tokens of overlap between consecutive
  * chunks — the standard RAG chunking shape; stride = width ⇒ disjoint
  * packing-style chunks).
  *
  * Scale shape: pure per-row computation — tokenize once, one
  * `posexplode` over the chunk starts, no shuffle at all (chunking 100 TB
  * is embarrassingly parallel and the plan says so). Token arrays are
  * staged as a real column before the explode (HOF-argument re-evaluation
  * doctrine, see [[graft.functions.TextFunctions.shinglesFromTokens]]).
  */
object Chunking {

  /** Chunk assignments: one output row per (doc, window).
    *
    * Starts are the multiples of `stride` below the token count, so every
    * token lands in ≥1 chunk and the last chunk is the only short one
    * (the trailing window clamps at the document end). `chunk_idx` is the
    * 0-based window sequence within the doc.
    *
    * Output: (doc_id, chunk_idx, n_tokens, chunk_text). */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    width: Int, stride: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(stride > 0 && stride <= width,
      s"stride must be in [1, width=$width], got $stride (stride > width " +
        "would silently drop the tokens between consecutive windows)")
    docs
      // NULL text tokenizes to a NULL array whose size() is -1 under the
      // non-ANSI default, turning the sequence stop bound negative and
      // crashing the whole job ('Illegal sequence boundaries'). Drop such
      // rows — the degrade-the-row convention, and what a SQL oracle's
      // tokenizer join does implicitly.
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      // last start = greatest multiple of stride strictly below n_tokens;
      // integer arithmetic via floor-div (Column./ is floating division)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          floor((size(col("toks")) - 1) / stride).cast("int") * stride,
          lit(stride))).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(width)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }

  /** [[chunkByTokens]] with the chunk text collapsed to an md5
    * fingerprint — the cross-engine-comparable form (and the shape a
    * chunk-level dedup consumes). Output: (doc_id, chunk_idx, n_tokens,
    * chunk_fp). */
  def chunkFingerprints(docs: DataFrame, idCol: String, textCol: String,
                        width: Int, stride: Int): DataFrame =
    chunkByTokens(docs, idCol, textCol, width, stride)
      .withColumn("chunk_fp", md5(col("chunk_text")))
      .drop("chunk_text")
}
