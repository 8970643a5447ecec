package graft.model

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.broadcast

/** Broadcast policy for dimension-side DataFrames.
  *
  * The star-schema assumption says dimensions are small, so the engine
  * prefers broadcast joins — but an unconditional `broadcast()` hint
  * FORCES the plan, and at 100 TB a monster dimension (billions of keys)
  * would OOM every executor. `maybeBroadcast` hints only when Catalyst's
  * size estimate is under the session's autoBroadcastJoinThreshold × a
  * slack factor; above it, the plan is left unhinted and Catalyst picks a
  * shuffle join (and AQE can still convert back to broadcast at runtime if
  * the real size turns out small — the safe default in both directions). */
object Joins {

  // Catalyst size estimates on derived (joined/dedup'd) plans overshoot
  // badly — the guard exists to stop multi-GB monster dimensions, not to
  // second-guess mid-size ones, so the cutoff is a wide multiple of the
  // configured threshold (default 10 MB × 16 = 160 MB estimated).
  private val Slack = 16L

  // Size estimates memoized by canonicalized analyzed plan: reading
  // `.stats` OPTIMIZES the subplan on the driver, and chained query
  // composition (subset → aggregate → rollup) re-derives the same
  // dimension projection several times — at hundreds-of-dimensions
  // metadata scale that's a real driver latency tax. Canonicalized plans
  // compare structurally, so each distinct dimension subtree pays the
  // optimizer once per JVM. Bounded (estimates are tiny; the cap guards
  // plan-object retention in long-lived JVMs cycling working sets).
  private val estimates = new ConcurrentHashMap[LogicalPlan, BigInt]()
  private val MaxEntries = 1024

  /** Cache-miss stats evaluations — observable by PlanSpec to pin the
    * one-optimizer-pass-per-distinct-plan contract. */
  private[graft] val statsEvals = new AtomicLong(0)

  private[graft] def invalidateEstimates(): Unit = estimates.clear()

  def maybeBroadcast(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      .replace("b", "").replace("B", "") match {
      case s if s.endsWith("k") || s.endsWith("K") => s.dropRight(1).toLong << 10
      case s if s.endsWith("m") || s.endsWith("M") => s.dropRight(1).toLong << 20
      case s if s.endsWith("g") || s.endsWith("G") => s.dropRight(1).toLong << 30
      case s => s.toLong
    }
    if (threshold <= 0) return df // broadcasting disabled
    val key =
      try df.queryExecution.analyzed.canonicalized
      catch { case scala.util.control.NonFatal(_) => null }
    val estimate =
      if (key == null) computeEstimate(df)
      else {
        if (estimates.size > MaxEntries) estimates.clear()
        estimates.computeIfAbsent(key, _ => computeEstimate(df))
      }
    if (estimate <= BigInt(threshold) * Slack) broadcast(df) else df
  }

  private def computeEstimate(df: DataFrame): BigInt = {
    statsEvals.incrementAndGet()
    try df.queryExecution.optimizedPlan.stats.sizeInBytes
    catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
  }

  /** Skew-safe inner equi-join: salt the big side's hot keys across
    * `salts` sub-keys and replicate the small side once per salt, so a
    * single monster key (the classic power-law fact key that lands 30% of
    * 100 TB on one reducer) spreads over `salts` tasks instead of
    * straggling on one. Semantically identical to `big.join(small, key)`.
    *
    * The salt is DETERMINISTIC — `xxhash64(saltSource) mod salts`, not
    * `rand()` — so retried/speculated tasks recompute identical rows
    * (a nondeterministic salt breaks exactly-once under task retry: the
    * retry re-draws salts and the join drops or duplicates rows).
    * `saltSource` should be a column (or struct of columns) that varies
    * WITHIN a key group — a line number, a unique id — so the hot key's
    * rows actually spread.
    *
    * AQE's skew-join handles sort-merge skew automatically when it can
    * split partitions; explicit salting remains the tool when the skew is
    * in a single key value (AQE cannot split one key) or when the join is
    * already broadcast-ineligible. */
  /** Key-skew report — the diagnostic you run BEFORE deciding to salt:
    * the k heaviest join-key values with their row counts and corpus
    * share. A top key holding 30% of the rows is the [[saltedJoin]]
    * signal; a flat report says AQE alone is enough.
    *
    * Scale shape: one hash aggregation on the key, then `orderBy.limit(k)`
    * — Spark plans TakeOrdered (per-partition top-k, driver merges k·p
    * rows), NOT a global sort or a data-sized window. The rank window runs
    * AFTER the limit, over k rows. Output: (rank, key, n, share). */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, round, row_number}
    require(k > 0, s"k must be positive, got $k")
    val top = df.groupBy(col(keyCol).as("key")).agg(count("*").as("n"))
      .orderBy(col("n").desc, col("key").asc).limit(k)
    val total = maybeBroadcast(df.agg(count("*").as("__total")))
    top.crossJoin(total)
      // unpartitioned window is safe here: it ranks the k-row top set,
      // not the corpus
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("key").asc)))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .select("rank", "key", "n", "share")
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 saltSource: org.apache.spark.sql.Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt column name collision")
    import org.apache.spark.sql.functions.{array, col, explode, lit, pmod, xxhash64}
    val b = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    // replicate the SMALL side salts× (explode of a literal array — a few
    // extra copies of a small table is the price for splitting the hot key)
    val s = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Interval (range) join — `fact.valueCol ∈ [band.lo, band.hi)` — rewritten
    * as an EQUI-join on fixed-width buckets. The reference has no range
    * joins at all (SURVEY §2.4); the naive Spark plan for a pure inequality
    * join is BroadcastNestedLoopJoin (every fact row × every band — a
    * scale-killer the moment the band table isn't tiny, and a driver OOM
    * when it isn't broadcastable). Bucket decomposition restores a hashable
    * key: each band explodes into the `ceil(width/bucketWidth)+1` buckets it
    * overlaps, each fact row computes its single bucket, and the join is a
    * plain equi-join on the bucket id with the exact `[lo, hi)` check as a
    * residual filter — hash-partitionable, AQE-skew-splittable, broadcast
    * only when [[maybeBroadcast]]'s size estimate says so.
    *
    * Overlapping bands are fine (a fact row matches each band covering it);
    * half-open `[lo, hi)` semantics; negative values are fine (floor on a
    * DOUBLE division — `Long./` would truncate toward zero and send
    * negative values to the wrong bucket).
    *
    * Pick `bucketWidth` near the typical band width: much smaller multiplies
    * the band-side explode; much larger widens the residual filter's
    * false-candidate window. Both only cost work, never correctness.
    *
    * Output: every fact column, then every band column. */
  def rangeJoin(fact: DataFrame, bands: DataFrame, valueCol: String,
                loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!fact.columns.contains("__bucket") && !bands.columns.contains("__bucket"),
      "__bucket column name collision")
    val shared = fact.columns.toSet & bands.columns.toSet
    require(shared.isEmpty,
      s"fact and bands share column name(s) ${shared.mkString(", ")} — " +
        "rename one side; the join would resolve them ambiguously")
    import org.apache.spark.sql.functions.{col, explode, floor, lit, sequence}
    val w = lit(bucketWidth)
    val b = bands.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol).cast("double") / w).cast("long"),
        // hi is exclusive, so floor(hi/w) is the last bucket any value
        // < hi can land in (a band ending exactly on a bucket boundary
        // costs one empty bucket — the residual filter drops it)
        floor(col(hiCol).cast("double") / w).cast("long"))))
    val f = fact.withColumn("__bucket",
      floor(col(valueCol).cast("double") / w).cast("long"))
    f.join(maybeBroadcast(b), Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
      .select((fact.columns ++ bands.columns).map(col).toSeq: _*)
  }
}
