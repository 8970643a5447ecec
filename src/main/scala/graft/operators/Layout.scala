package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Multi-dimensional data LAYOUT clustering — Z-order (Morton-curve)
  * addressing, the lakehouse `OPTIMIZE ZORDER BY` operation: co-locate
  * rows that are close in SEVERAL columns at once so min/max file
  * statistics prune scans on ANY of the clustered columns, not just the
  * first sort key. A plain `ORDER BY (a, b)` clusters perfectly on `a`
  * and not at all on `b`; the Z-address interleaves the bits of both, so
  * a range predicate on either column touches O(selectivity) of the
  * files instead of all of them. At 100 TB this is the difference
  * between a full scan and reading a handful of row groups when the
  * query filters on the *second* dimension.
  *
  * Scale shape: ONE min/max aggregation per call produces a single stats
  * row (broadcast by AQE via the single-row cross join — the
  * [[Corpus.mixingWeights]] doctrine, nothing collects to the driver);
  * the Z-address itself is pure integer arithmetic per row — scale,
  * then bit-interleave via a `shiftright`/`bitwiseAND`/`shiftleft` chain
  * that stays inside whole-stage codegen (bits × ncols terms, bounded by
  * the [[ZMaxTotalBits]] require). The clustering write is ONE
  * `repartitionByRange` on the address (sampled range boundaries — no
  * global sort) plus a partition-local sort.
  *
  * All arithmetic is exact long math (integral `div`, never double
  * division), so an external SQL engine replays the addresses
  * bit-for-bit.
  */
object Layout {

  /** Interleaved addresses stay inside one signed long. */
  val ZMaxTotalBits = 62

  /** Exact integral division (SQL `div`) — `(a / b).cast("long")` rides
    * through a double and corrupts quotients past 2^53; key spaces at
    * 100 TB are full-range longs. */
  private def ldiv(a: Column, b: Column): Column =
    Bridge.column(new IntegralDivide(Bridge.expression(a),
      Bridge.expression(b)))

  /** Per-column bucket in [0, 2^bits): rank-free min/max scaling
    * `((v − min) · 2^bits) div (max − min + 1)` — exact long math, and
    * the `+ 1` keeps `v = max` inside the top bucket. NULLs scale to
    * bucket 0 (they sort first, matching the NULLS FIRST convention
    * everywhere else in this library).
    *
    * `(v − min) · 2^bits` must fit in a signed long, so the column RANGE
    * is capped at 2^(63−bits) — enforced IN-PLAN by `raise_error` (the
    * [[Sampling.shuffleShards]] self-enforcing-guard doctrine: a
    * full-range key space fails by name, never wraps silently).
    * `max − min` is computed with `try_subtract` so the range > 2^63
    * case surfaces as NULL for the guard instead of tripping the ANSI
    * overflow error before the named message can fire. */
  private def bucketOf(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val span = try_subtract(mx, mn) // NULL ⇔ range > 2^63 (mx ≥ mn by construction)
    // the numerator uses try_* so it can never throw a generic
    // ARITHMETIC_OVERFLOW under spark.sql.ansi.enabled (it yields NULL
    // instead); the NAMED guard stays on the DENOMINATOR, which
    // division codegen evaluates FIRST (divide-by-zero check) — so a
    // full-range column fails by name in codegen, and in interpreted
    // eval the try_* numerator quietly nulls before the denominator's
    // raise_error fires. Either path, the named error wins.
    val num = try_multiply(try_subtract(coalesce(v, mn), mn),
      lit(1L << bits))
    val guarded = when(
      span.isNull || span > lit(Long.MaxValue >> bits),
      raise_error(concat(lit(s"Layout: column range exceeds 2^${63 - bits} " +
        s"at bits=$bits (min="), mn.cast("string"), lit(", max="),
        mx.cast("string"),
        lit(") — lower bits or pre-bucket the column"))).cast("long")
    ).otherwise(span + lit(1L))
    ldiv(num, guarded)
  }

  /** Morton interleave of pre-scaled buckets: bit b of column c lands at
    * position `b · ncols + c` — column order is significant only below
    * bit granularity. Pure long bit ops; stays in codegen. */
  private[operators] def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      b <- 0 until bits
      (c, ci) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Append the Z-address of `cols` as `zCol`. Columns must be integral
    * (cast your dates/decimals to their underlying long first); every
    * other column passes through unchanged. Stats come from the frame
    * itself — address values are comparable only WITHIN one call. */
  def zAddress(df: DataFrame, cols: Seq[String], bits: Int = 8,
               zCol: String = "__z"): DataFrame = {
    require(cols.size >= 2,
      s"Z-ordering needs at least 2 columns, got ${cols.size} " +
        "(one column is a plain sort)")
    require(bits >= 1 && cols.size * bits <= ZMaxTotalBits,
      s"bits must be in [1, ${ZMaxTotalBits / cols.size}] for " +
        s"${cols.size} columns, got $bits")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    require(cols.distinct.size == cols.size,
      s"duplicate Z-order columns: ${cols.diff(cols.distinct).mkString(", ")}")
    // same named integral guard as prefixSum: a silent cast("long") of
    // a double column truncates toward zero and quietly degrades the
    // clustering — reject by name instead
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    val nonIntegral =
      cols.filter(c => !integral.contains(df.schema(c).dataType.toString))
    require(nonIntegral.isEmpty,
      s"zAddress needs integral columns, got non-integral " +
        s"${nonIntegral.map(c => s"$c: ${df.schema(c).dataType}").mkString(", ")} " +
        "(cast dates/decimals/doubles to their underlying long first)")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__mn_$c"),
      max(col(c).cast("long")).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val buckets = cols.map(c => bucketOf(col(c).cast("long"),
      coalesce(col(s"__mn_$c"), lit(0L)), coalesce(col(s"__mx_$c"), lit(0L)),
      bits))
    df.crossJoin(graft.model.Joins.maybeBroadcast(stats))
      .withColumn(zCol, interleave(buckets, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Cluster the frame along the Z-curve: range-partition on the
    * address (sampled boundaries — no global sort) and sort each
    * partition locally, so every output file covers a compact Z-range
    * and carries tight min/max stats on EVERY clustered column. The
    * address column is dropped — it is a layout device, not data. */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int = 8,
             numPartitions: Option[Int] = None): DataFrame = {
    val z = zAddress(df, cols, bits)
    val ranged = numPartitions
      .map(n => z.repartitionByRange(n, col("__z")))
      .getOrElse(z.repartitionByRange(col("__z")))
    ranged.sortWithinPartitions("__z").drop("__z")
  }

  /** Clustering-quality report: bucket the curve into `2^prefixBits`
    * consecutive Z-ranges and report, per range, the row count and the
    * min/max span of every clustered column — the numbers a file-skipping
    * scan planner would see as per-file statistics. Tight spans on every
    * column = the layout prunes on every column. One aggregation, output
    * bounded by 2^prefixBits rows. */
  def zProfile(df: DataFrame, cols: Seq[String], bits: Int = 8,
               prefixBits: Int = 4): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= cols.size * bits,
      s"prefixBits must be in [1, ${cols.size * bits}], got $prefixBits")
    val spans = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"min_$c"),
      max(col(c).cast("long")).as(s"max_$c")))
    zAddress(df, cols, bits)
      .withColumn("z_range",
        shiftright(col("__z"), cols.size * bits - prefixBits))
      .groupBy("z_range")
      .agg(count(lit(1)).as("n_rows"), spans: _*)
  }

  /** EXACT global running total of an integral column in `orderCols`
    * order, WITHOUT a global sort or a single-partition window: range-
    * partition on the keys (sampled boundaries), window INSIDE each
    * partition (keyed — every executor works), then shift each
    * partition by the broadcast totals of the partitions before it (one
    * bounded collect, ≤ numPartitions rows). The two jobs see the same
    * partition assignment because the staged frame is checkpointed —
    * range boundaries are sampled, and resampling between the offsets
    * job and the output job could move a row across partitions.
    *
    * The result is partition-independent (a row's running total depends
    * only on the global order), so sampled boundaries never leak into
    * the output. Ties take SQL RANGE-frame semantics — all peers of a
    * key get the total THROUGH the tie group — which every engine
    * agrees on, so duplicate keys stay oracle-replayable.
    *
    * Integral values only: a double prefix sum re-associates differently
    * under every partitioning, and this operator's contract is
    * bit-stable output. */
  def prefixSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
                outCol: String = "running_total",
                numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "prefixSum needs at least one order column")
    val missing = (orderCols :+ valueCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    val vt = df.schema(valueCol).dataType.toString
    require(integral.contains(vt),
      s"prefixSum needs an integral value column, $valueCol is $vt " +
        "(double prefix sums re-associate; pre-scale to long)")
    val keys = orderCols.map(col)
    val staged = numPartitions
      .map(n => df.repartitionByRange(n, keys: _*))
      .getOrElse(df.repartitionByRange(keys: _*))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.util.Stage.materialize)
    // partition totals, in range (= pid) order: pid p's offset is the
    // sum of every earlier partition's total
    val totals = staged.groupBy("__pid")
      .agg(sum(col(valueCol).cast("long")).as("t"))
      .collect()
      // an all-NULL partition sums to NULL — it contributes 0 to every
      // later partition's offset (sum() skips NULLs row-wise too)
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft(0 -> 0L) {
      case ((_, acc), (pid, t)) => pid -> (acc + t)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
      .toMap
    val offLit = typedLit(offsets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(keys: _*)
    staged
      .withColumn(outCol,
        sum(col(valueCol).cast("long")).over(w) +
          coalesce(element_at(offLit, col("__pid")), lit(0L)))
      .drop("__pid")
  }

  /** Compaction plan — the lakehouse `OPTIMIZE` bin-packing step: assign
    * every file of a manifest to a compaction group of ~`targetSize`
    * consecutive bytes in `orderCols` order (order by (Z-range, path) to
    * keep [[zorder]]'s clustering through the rewrite). A file's group
    * is the bin holding its first byte,
    * `(running_total − size) / targetSize` (exact integral math —
    * replayable); files larger than `targetSize` own their group.
    *
    * `orderCols` must identify each file UNIQUELY (include the path):
    * tied keys have no defined first byte — [[prefixSum]]'s RANGE-frame
    * tie semantics would hand every peer the tie group's total and
    * mis-bin the whole group — so duplicates fail by name IN-PLAN, as
    * do negative or NULL sizes (the self-enforcing-guard doctrine).
    *
    * Scale shape: one [[prefixSum]] (range partition + keyed window +
    * a ≤ numPartitions collect) plus one key-keyed duplicate-check
    * window over the MANIFEST — metadata, ~800k rows for 100 TB of
    * 128 MB files — then a per-row projection. The data files
    * themselves are never read. */
  def compactionPlan(files: DataFrame, orderCols: Seq[String],
                     sizeCol: String, targetSize: Long,
                     groupCol: String = "file_group"): DataFrame = {
    require(targetSize >= 1, s"targetSize must be positive, got $targetSize")
    val sized = prefixSum(files, orderCols, sizeCol, "__cum")
    val size = col(sizeCol).cast("long")
    val dupW = org.apache.spark.sql.expressions.Window
      .partitionBy(orderCols.map(col): _*)
    val guarded = when(size.isNull || size < 0, raise_error(concat(
      lit(s"compactionPlan: negative or NULL $sizeCol ("),
      coalesce(size.cast("string"), lit("NULL")), lit(")"))).cast("long"))
      .when(count(lit(1)).over(dupW) > 1, raise_error(concat(
        lit("compactionPlan: duplicate key ("),
        concat_ws(", ", orderCols.map(c => col(c).cast("string")): _*),
        lit(") — orderCols must identify each file uniquely (add the " +
          "path)"))).cast("long"))
      .otherwise(col("__cum") - size)
    sized
      .withColumn(groupCol, ldiv(guarded, lit(targetSize)))
      .drop("__cum")
  }

  /** Write `df` as a BUCKETED parquet table (hash-partitioned into
    * `numBuckets` files per write-task group on `bucketCol`, optionally
    * sorted within buckets): the one-time shuffle that buys every LATER
    * equi-join / aggregation on `bucketCol` a shuffle-free plan — Spark's
    * bucketed scan reports `HashPartitioning(bucketCol, numBuckets)`, so
    * a join of two tables bucketed the same way needs NO Exchange on
    * either side (Round14Spec pins that plan). At 100 TB this is the
    * difference between re-shuffling the fact table on every query and
    * paying the shuffle once at ingest — the same trade the IVF store
    * makes for vectors, applied to the star schema. The table is
    * registered in the session catalog under `table` — EXTERNAL when
    * `path` is given (data lives there), managed (warehouse dir)
    * otherwise; mode overwrite replaces both. The cube-fact form
    * ([[graft.io.CubeIO.saveFactBucketed]]) delegates here.
    *
    * Bucket-count choice at scale: buckets are per-task output files, so
    * pick `numBuckets` ≈ target parallelism of the downstream joins (a
    * power of two keeps future split/merge cheap); 8 suits the local
    * fixtures, 4096-ish suits a 1000-executor cluster. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   numBuckets: Int, sortCols: Seq[String] = Nil,
                   path: Option[String] = None): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(df.columns.contains(bucketCol),
      s"saveBucketed: no column $bucketCol in ${df.columns.mkString(", ")}")
    val w0 = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    val w1 = path.fold(w0)(p => w0.option("path", p))
    val w = if (sortCols.nonEmpty) w1.sortBy(sortCols.head, sortCols.tail: _*)
            else w1
    w.saveAsTable(table)
  }
}
