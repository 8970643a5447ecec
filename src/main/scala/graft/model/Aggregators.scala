package graft.model

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The measure escape hatch (SURVEY §2.9 / §7.3): the reference accepts any
  * R closure as `fun.aggregate`; the Spark engine's open-world equivalent
  * is a typed `Aggregator[IN, BUF, OUT]` wrapped into a `Column` function
  * so it plugs into [[Measure]] like any built-in. Partial aggregation
  * (map-side combine) comes from `merge` — unlike an R closure, a Spark
  * Aggregator scales because the planner can split it. */
object Aggregators {

  /** Wrap a double Aggregator as a Measure-compatible Column function. */
  def asMeasureFn(agg: Aggregator[Double, _, Double]): Column => Column = {
    val fn = udaf(agg, Encoders.scalaDouble)
    c => fn(c)
  }

  def measure(vr: String, name: String,
              agg: Aggregator[Double, _, Double]): Measure =
    Measure(vr, name, asMeasureFn(agg))

  /** Product of values — an aggregate Spark has no builtin for (the
    * canonical "user closure" example). */
  object Product extends Aggregator[Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: Double): Double = b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** One (score, id) candidate flowing into [[TopKByScore]]. */
  final case class ScoredId(score: Double, id: Long)

  /** Bounded-buffer contents of [[TopKByScore]] (a case-class wrapper so
    * `Encoders.product` handles the nested Seq). */
  final case class TopKBuf(items: Seq[ScoredId])

  /** Fixed-size primitive heap buffer of [[TopKByScore]]: parallel
    * score/id arrays in binary-min-heap order (root = WEAKEST retained
    * element under (score desc, id asc)), `n` live slots. A case class so
    * `Encoders.product` codegens the (rare — spill/shuffle only)
    * serialization; the arrays are mutated in place on the per-row path. */
  final case class TopKHeap(scores: Array[Double], ids: Array[Long], n: Int)

  /** Bounded per-group top-k by (score desc, id asc) — the aggregation
    * form of TakeOrdered for grouped data. As a `udaf` the planner gives
    * it map-side partial aggregation (ObjectHashAggregate), so a shuffle
    * carries at most k elements per (partition, group) instead of every
    * scored row: ranking |Q|·|C| brute-force kNN candidates shuffles
    * |Q|·k·partitions rows, not |Q|·|C| (the row_number-window form
    * shuffles everything). The buffer is a fixed-size primitive min-heap
    * keyed weakest-at-root: each incoming row is one root comparison and
    * at most O(log k) in-place sifts — no per-row allocation, no periodic
    * re-sort (the previous Vector-append buffer re-sorted boxed elements
    * every 2k appends, a measured ~0.6 s constant on q22's 12.5k rows).
    * The retained set is the exact top-k under the total order, so the
    * result is deterministic regardless of arrival order; NaN scores are
    * dropped as unrankable (never retained, never block retention). */
  final class TopKByScore(k: Int)
      extends Aggregator[ScoredId, TopKHeap, TopKBuf] {
    require(k > 0, s"k must be positive, got $k")
    /** (s1, i1) loses to (s2, i2) under (score desc, id asc)? */
    private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)
    private def swap(b: TopKHeap, i: Int, j: Int): Unit = {
      val s = b.scores(i); b.scores(i) = b.scores(j); b.scores(j) = s
      val d = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = d
    }
    private def insert(b: TopKHeap, s: Double, id: Long): TopKHeap =
      // NaN is unrankable and would poison the heap (a NaN root loses
      // every `weaker` comparison, permanently blocking real elements) —
      // treat it as "not a candidate", matching rankTopK's pre-filter
      if (s.isNaN) b
      else if (b.n < k) { // filling: place at the end, sift up
        var pos = b.n
        b.scores(pos) = s; b.ids(pos) = id
        while (pos > 0 && {
          val p = (pos - 1) >> 1
          weaker(b.scores(pos), b.ids(pos), b.scores(p), b.ids(p))
        }) { val p = (pos - 1) >> 1; swap(b, pos, p); pos = p }
        b.copy(n = b.n + 1) // arrays shared; only the live count changes
      } else if (weaker(b.scores(0), b.ids(0), s, id)) {
        // stronger than the weakest retained: replace the root, sift down
        b.scores(0) = s; b.ids(0) = id
        var pos = 0
        var done = false
        while (!done) {
          val l = 2 * pos + 1
          val r = l + 1
          var m = pos
          if (l < b.n && weaker(b.scores(l), b.ids(l), b.scores(m), b.ids(m))) m = l
          if (r < b.n && weaker(b.scores(r), b.ids(r), b.scores(m), b.ids(m))) m = r
          if (m == pos) done = true else { swap(b, pos, m); pos = m }
        }
        b
      } else b
    def zero: TopKHeap = TopKHeap(new Array[Double](k), new Array[Long](k), 0)
    def reduce(b: TopKHeap, a: ScoredId): TopKHeap = insert(b, a.score, a.id)
    def merge(x: TopKHeap, y: TopKHeap): TopKHeap = {
      var acc = x
      var i = 0
      while (i < y.n) { acc = insert(acc, y.scores(i), y.ids(i)); i += 1 }
      acc
    }
    def finish(b: TopKHeap): TopKBuf =
      TopKBuf(Array.tabulate(b.n)(i => ScoredId(b.scores(i), b.ids(i)))
        .sortBy(s => (-s.score, s.id)).toSeq)
    def bufferEncoder: Encoder[TopKHeap] = Encoders.product[TopKHeap]
    def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** One (score, id) candidate flowing into [[TopKByScoreStr]]. */
  final case class ScoredStrId(score: Double, id: String)

  /** Bounded-buffer contents of [[TopKByScoreStr]]. */
  final case class TopKStrBuf(items: Seq[ScoredStrId])

  /** String-id heap buffer of [[TopKByScoreStr]] — the [[TopKHeap]]
    * layout with a String id array. */
  final case class TopKStrHeap(scores: Array[Double], ids: Array[String],
                               n: Int)

  /** Code-point string comparison — Spark's UTF8String ordering
    * (UTF-8 byte order = code-point order). Java/Scala String ordering
    * compares UTF-16 code units, which ranks supplementary-plane
    * characters below U+E000–U+FFFF and would break ties differently
    * than the row_number-window form this heap replaces (the
    * [[graft.operators.Dedup]] localOrdering doctrine). */
  private[graft] def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** [[TopKByScore]] for STRING ids (URL/UUID-keyed corpora): the same
    * bounded primitive min-heap under (score desc, id asc) with ids
    * ordered by CODE POINT (Spark's string order), so heap output ≡ the
    * window form it replaces. NaN scores and NULL ids are unrankable —
    * dropped, matching the integral path's pre-filters. */
  final class TopKByScoreStr(k: Int)
      extends Aggregator[ScoredStrId, TopKStrHeap, TopKStrBuf] {
    require(k > 0, s"k must be positive, got $k")
    private def weaker(s1: Double, i1: String, s2: Double, i2: String): Boolean =
      s1 < s2 || (s1 == s2 && codePointCompare(i1, i2) > 0)
    private def swap(b: TopKStrHeap, i: Int, j: Int): Unit = {
      val s = b.scores(i); b.scores(i) = b.scores(j); b.scores(j) = s
      val d = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = d
    }
    private def insert(b: TopKStrHeap, s: Double, id: String): TopKStrHeap =
      if (s.isNaN || id == null) b
      else if (b.n < k) {
        var pos = b.n
        b.scores(pos) = s; b.ids(pos) = id
        while (pos > 0 && {
          val p = (pos - 1) >> 1
          weaker(b.scores(pos), b.ids(pos), b.scores(p), b.ids(p))
        }) { val p = (pos - 1) >> 1; swap(b, pos, p); pos = p }
        b.copy(n = b.n + 1)
      } else if (weaker(b.scores(0), b.ids(0), s, id)) {
        b.scores(0) = s; b.ids(0) = id
        var pos = 0
        var done = false
        while (!done) {
          val l = 2 * pos + 1
          val r = l + 1
          var m = pos
          if (l < b.n && weaker(b.scores(l), b.ids(l), b.scores(m), b.ids(m))) m = l
          if (r < b.n && weaker(b.scores(r), b.ids(r), b.scores(m), b.ids(m))) m = r
          if (m == pos) done = true else { swap(b, pos, m); pos = m }
        }
        b
      } else b
    def zero: TopKStrHeap =
      TopKStrHeap(new Array[Double](k), new Array[String](k), 0)
    def reduce(b: TopKStrHeap, a: ScoredStrId): TopKStrHeap =
      insert(b, a.score, a.id)
    def merge(x: TopKStrHeap, y: TopKStrHeap): TopKStrHeap = {
      var acc = x
      var i = 0
      while (i < y.n) { acc = insert(acc, y.scores(i), y.ids(i)); i += 1 }
      acc
    }
    def finish(b: TopKStrHeap): TopKStrBuf =
      TopKStrBuf(Array.tabulate(b.n)(i => ScoredStrId(b.scores(i), b.ids(i)))
        .sortWith((a, c) => a.score > c.score ||
          (a.score == c.score && codePointCompare(a.id, c.id) < 0)).toSeq)
    def bufferEncoder: Encoder[TopKStrHeap] = Encoders.product[TopKStrHeap]
    def outputEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]
  }

  /** Misra-Gries heavy-hitters summary buffer: candidate item → count
    * lower bound, at most k entries (case-class wrapper so
    * `Encoders.product` handles the Map). */
  final case class MgBuf(counts: Map[String, Long])

  /** Bounded-memory frequent-items sketch (Misra-Gries): tracks at most
    * `k` candidate items; any item with true count > n/(k+1) over n
    * observations is GUARANTEED present in the summary, and every
    * reported count is a lower bound within n/(k+1) of the truth — the
    * mergeable-summaries form (Agarwal et al., PODS'12), so map-side
    * partial aggregation preserves the bound. The point at 100 TB: a
    * full `groupBy(term)` must materialize the whole vocabulary
    * (unbounded memory / shuffle); MG holds O(k) per partition and
    * shuffles at most k rows per partition, turning "top terms of a
    * corpus" into a candidate-generation pass that a tiny exact
    * second pass over ≤ k candidates then confirms
    * ([[graft.operators.Corpus.frequentTerms]]).
    *
    * The summary CONTENTS (which sub-threshold candidates survive, and
    * the exact lower bounds) depend on arrival/merge order — only the
    * guarantees above are deterministic. Callers wanting deterministic
    * output must re-verify candidates exactly, as frequentTerms does. */
  final class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
    require(k > 0, s"k must be positive, got $k")
    def zero: MgBuf = MgBuf(Map.empty)
    def reduce(b: MgBuf, item: String): MgBuf = {
      val m = b.counts
      m.get(item) match {
        case Some(c) => MgBuf(m.updated(item, c + 1))
        case None if m.size < k => MgBuf(m.updated(item, 1L))
        // summary full: decrement every counter (the classic step — one
        // "vote" from each of k+1 distinct items cancels), dropping zeros
        case None => MgBuf(m.collect { case (t, c) if c > 1 => t -> (c - 1) })
      }
    }
    def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val combined = y.counts.foldLeft(x.counts) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) MgBuf(combined)
      else {
        // subtract the (k+1)-th largest count from everything and drop
        // non-positives — at most k survive, error grows by that count,
        // staying within the summed n/(k+1) bound (mergeable-summaries)
        val cs = combined.values.toArray
        java.util.Arrays.sort(cs)
        val cut = cs(cs.length - (k + 1))
        MgBuf(combined.collect { case (t, c) if c > cut => t -> (c - cut) })
      }
    }
    def finish(b: MgBuf): MgBuf = b
    def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  }

  /** One sanitized vector row flowing into [[ArrayMinMax]] (a case-class
    * wrapper so `Encoders.product` supplies the input encoder; the
    * caller pre-encodes null/non-finite ELEMENTS as NaN). */
  final case class VecRow(v: Seq[Double])

  /** Elementwise (min, max) buffer of [[ArrayMinMax]]: two dim-length
    * arrays, whatever the vector width. */
  final case class MinMaxBuf(mins: Seq[Double], maxs: Seq[Double])

  /** Per-dimension (min, max) over fixed-width double arrays in ONE
    * aggregation slot — the scalar-quantizer grid trainer's combiner
    * ([[graft.operators.Similarity.trainSq]]). The alternative (2·dim
    * independent min/max aggregate EXPRESSIONS over `element_at`) blows
    * past wholestage-codegen's method budget and the driver's planner at
    * production embedding widths (768–4096 dims = thousands of agg
    * slots); this buffer stays two arrays at any width. NaN elements
    * (the caller's sentinel for null/±Inf input) are skipped; a
    * dimension that never sees a finite value finishes (+Inf, −Inf) and
    * the caller maps it to its degenerate grid. min/max are
    * order-insensitive, so the result is bit-identical under any
    * partitioning. */
  final class ArrayMinMax(dim: Int)
    extends Aggregator[VecRow, MinMaxBuf, MinMaxBuf] {
    def zero: MinMaxBuf = MinMaxBuf(
      Seq.fill(dim)(Double.PositiveInfinity),
      Seq.fill(dim)(Double.NegativeInfinity))
    def reduce(b: MinMaxBuf, a: VecRow): MinMaxBuf = {
      if (a == null || a.v == null) b
      else {
        val mn = b.mins.toArray
        val mx = b.maxs.toArray
        val n = math.min(dim, a.v.length)
        var i = 0
        while (i < n) {
          val x = a.v(i)
          if (!x.isNaN) {
            if (x < mn(i)) mn(i) = x
            if (x > mx(i)) mx(i) = x
          }
          i += 1
        }
        MinMaxBuf(mn.toIndexedSeq, mx.toIndexedSeq)
      }
    }
    def merge(x: MinMaxBuf, y: MinMaxBuf): MinMaxBuf = MinMaxBuf(
      x.mins.lazyZip(y.mins).map((a, b) => math.min(a, b)).toIndexedSeq,
      x.maxs.lazyZip(y.maxs).map((a, b) => math.max(a, b)).toIndexedSeq)
    def finish(r: MinMaxBuf): MinMaxBuf = r
    def bufferEncoder: Encoder[MinMaxBuf] = Encoders.product[MinMaxBuf]
    def outputEncoder: Encoder[MinMaxBuf] = Encoders.product[MinMaxBuf]
  }

  /** Geometric mean via log-space sums (stable + mergeable). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
