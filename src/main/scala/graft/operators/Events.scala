package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed operators over the `events` fixture — the streaming-shaped
  * extension surface (SURVEY §2.10: the reference has none; this is the
  * batch form of the Structured Streaming path in graft.streaming). The
  * same `window()` / `session_window()` expressions run unchanged under
  * `readStream` — that symmetry is the point of implementing them with
  * native functions. */
object Events {

  /** Tumbling-window aggregation: (window start, event_type) → count,
    * sum(value). One shuffle on (window, type) — at scale the window
    * column derives from the timestamp, so partition pruning on date
    * partitions still applies upstream. */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count("*").as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Per-user session aggregation with an inactivity gap, batch form:
    * native `session_window` (merges rows < gap apart into one session).
    * Output: one row per (user, session) with bounds and stats. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count("*").as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Sessionization via gaps-and-islands (lag + cumulative sum) — the
    * window-function formulation, equivalent to [[sessions]] except that
    * session_end is the last event's ts (session_window pads by the gap).
    * Kept because it is the portable SQL form the oracle uses and it
    * demonstrates the window-function surface (SURVEY §2.8). */
  def sessionsSql(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val marked = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            gapMinutes * 60L * 1000000L,
          1).otherwise(0))
      .withColumn("session_no", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy("user_id", "session_no")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count("*").as("n_events"), sum("value").as("sum_value"))
  }

  /** Ordered conversion funnel: per stage k, the users with events of
    * types `stages(0..k)` in strictly increasing timestamp order. Greedy
    * first-occurrence is optimal for strict ordering (taking the EARLIEST
    * qualifying event at each stage dominates any later choice), so stage
    * k+1's time is `min(ts | type = stages(k+1), ts > t_k)` — one grouped
    * aggregation + user-keyed join per stage, shuffling only (user, ts)
    * pairs. Output: (stage_no, stage, n_users), n_users non-increasing. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // Frontier fold: (user, t_k) = earliest time the user completes the
    // ordered prefix stages(0..k). Each frontier is MATERIALIZED (eager
    // localCheckpoint, the connectedComponents pattern): frontier k has
    // two consumers — frontier k+1 and its own count — and without
    // truncation each stage's plan embeds every earlier stage's, so an
    // n-stage funnel would re-scan events O(n²) times instead of n. The
    // frontiers are per-user rows (small); events is scanned once per
    // stage, with the stage filter pushed to the scan.
    val frontiers = stages.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
        .transform(graft.util.Stage.materialize)) {
      case (prev, stage) =>
        events.filter(col(typeCol) === stage)
          .join(prev.withColumnRenamed("t", "t_prev"), userCol)
          .filter(col(tsCol) > col("t_prev"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
          .transform(graft.util.Stage.materialize)
    }
    frontiers.zip(stages.zipWithIndex).map { case (df, (stage, i)) =>
      df.agg(count("*").as("n_users"))
        .select(lit(i + 1).as("stage_no"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Per-event trailing-window count: for every event, how many events
    * the same key produced in the last `widthSeconds` (inclusive range
    * frame over event time — the per-event rate signal behind bot/abuse
    * detection and rate limiting).
    *
    * A RANGE frame over unix micros, not a ROWS frame: the window is
    * defined by TIME, so bursts of equal-timestamp events are peers and
    * all count each other (value-based frames are the cross-engine
    * semantics; ROWS frames tie-break by partition order and are not
    * reproducible). One shuffle keyed on `keyCol` — no global window.
    * Output: input columns + `n_window`. */
  def trailingCount(events: DataFrame, widthSeconds: Long,
                    keyCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    require(!events.columns.contains("__us"), "input already has a __us column")
    val w = Window.partitionBy(keyCol).orderBy(col("__us"))
      .rangeBetween(-widthSeconds * 1000000L, 0)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("n_window", count(lit(1)).over(w))
      .drop("__us")
  }

  /** Last-touch attribution: for every `toType` event, the MOST RECENT
    * `fromType` event by the same user at most `within` before it (NULL
    * when none — the unattributed conversions). The classic
    * view→purchase credit assignment.
    *
    * Shape: one user-keyed equi-join (the time bound is a post-join
    * filter on the hash join, not a range-join blowup — per-pair cost is
    * a comparison) + one grouped max. Fan-out is views-per-user ×
    * conversions-per-user, bounded by per-user activity, and only
    * (user, ts) pairs shuffle. The same join with both sides watermarked
    * is the streaming form
    * ([[graft.streaming.EventsStreaming.attributionStream]]) — Spark can
    * expire join state there precisely because the `within` bound is in
    * the join condition.
    *
    * Output: (event_id, user_id, to_ts, from_ts). */
  def attribution(events: DataFrame, fromType: String, toType: String,
                  within: String = "30 minutes",
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val from = events.filter(col(typeCol) === fromType)
      .select(col(userCol).as("f_user"), col(tsCol).as("from_ts"))
    val to = events.filter(col(typeCol) === toType)
      .select(col(idCol).as("event_id"), col(userCol).as("user_id"),
        col(tsCol).as("to_ts"))
    to.join(from,
        col("f_user") === col("user_id") &&
          col("from_ts") <= col("to_ts") &&
          col("from_ts") >= col("to_ts") - expr(s"INTERVAL $within"),
        "left")
      .groupBy("event_id", "user_id", "to_ts")
      .agg(max("from_ts").as("from_ts"))
  }

  /** Cohort-retention matrix: group users by the period of their FIRST
    * event (their cohort), then count how many of each cohort are still
    * active 0, 1, 2, … periods later — the standard growth/retention
    * triangle. Periods are calendar-truncated (`date_trunc(period)`), so
    * offsets are exact period multiples.
    *
    * Scale shape: ONE user-keyed shuffle builds, per user, the first
    * period AND the distinct-period set in the same aggregation
    * (`collect_set` over calendar periods is bounded by the dataset's
    * calendar span — weeks-per-year, not events-per-user — so the buffer
    * is small by construction, unlike collecting events). The explode +
    * (cohort, offset) count is a second shuffle over the user-period
    * relation, and the cohort-size window runs on the AGGREGATED result
    * (cells = cohorts × offsets, grain-sized), partitioned by cohort —
    * never a data-sized or global window. No self-join of events against
    * events, which is the naive formulation's cost.
    *
    * Output: (cohort_period DATE, offset_periods INT, n_active, cohort_size)
    * — n_active(offset 0) = cohort_size by construction (a user is active
    * in their own first period), so retention rate = n_active/cohort_size
    * is left to the caller as an exact division. */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts",
                       period: String = "week"): DataFrame = {
    val daysPer = period match {
      case "week" => 7
      case "day"  => 1
      case other => throw new IllegalArgumentException(
        s"retention period must be 'week' or 'day' (calendar-regular), got $other")
    }
    val perUser = events
      .select(col(userCol).as("__u"),
        date_trunc(period, col(tsCol)).cast("date").as("__p"))
      .groupBy("__u")
      .agg(min(col("__p")).as("cohort_period"),
        collect_set(col("__p")).as("__ps"))
    // both endpoints are period-truncated, so datediff is an exact
    // multiple of daysPer and the cast is exact (no floor semantics to
    // disagree on across engines)
    val matrix = perUser
      .select(col("cohort_period"), explode(col("__ps")).as("__p"))
      .select(col("cohort_period"),
        (datediff(col("__p"), col("cohort_period")) / daysPer)
          .cast("int").as("offset_periods"))
      .groupBy("cohort_period", "offset_periods")
      .agg(count(lit(1)).as("n_active"))
    val byCohort = Window.partitionBy("cohort_period")
    matrix.withColumn("cohort_size",
      max(when(col("offset_periods") === 0, col("n_active"))).over(byCohort))
  }

  /** As-of (point-in-time) join: attach to every left row the single most
    * recent right row for the same key with `right.ts <= left.ts`
    * (`<` when `strict`; the NEXT right row at-or-after when `forward`),
    * NULLs when no right row qualifies — the classic
    * trades-to-quotes / event-to-state lookup. The reference has no
    * theta/as-of join at all (SURVEY §2.4); this is the Spark-native
    * extension, built by composition rather than a custom physical plan:
    * union both sides with a side tag, then one `last(_, ignoreNulls)`
    * window per payload column keyed on `keys` and ordered by
    * `(ts, side)` — at equal timestamps the right row sorts before the
    * left row exactly when non-strict semantics make it visible, and
    * `forward` just reverses the time ordering (the nearest-at-or-after
    * match is the running-last in descending time).
    *
    * Scale shape: ONE shuffle on `keys` (the union is shuffle-free), a
    * keyed — never global — running window, and no range-join fan-out:
    * each left row costs O(1) regardless of how far back its match lies,
    * where the equi-join + time-bound formulation ([[attribution]]) pays
    * views×conversions per user and cannot express "unboundedly far back".
    *
    * Determinism contract: the right side must be unique per
    * `(keys, tsCol)` — pre-aggregate with `max_by` otherwise; with
    * duplicate right timestamps the window's `last` pick is
    * partition-order-dependent.
    *
    * `tolerance` (an SQL interval string, e.g. `"15 minutes"`) bounds
    * the match distance: a running match farther back (ahead, when
    * `forward`) than the tolerance is nulled out AFTER the window — the
    * trades-to-quotes staleness guard ("use the last quote, but never
    * one older than 15 minutes"). The O(1)-per-row shape is unchanged:
    * the bound is a post-filter on the matched timestamp the output
    * already carries, not a range-join fan-out.
    *
    * Output: every left column, then `prefix+tsCol` (the matched right
    * timestamp) and `prefix+c` for each payload column. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               prefix: String = "asof_", strict: Boolean = false,
               forward: Boolean = false,
               tolerance: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(!left.columns.contains("__side") && !left.columns.contains("__asof"),
      "input already has a __side/__asof column")
    val rPay = (tsCol +: payloadCols).map(prefix + _)
    require(rPay.forall(c => !left.columns.contains(c)),
      s"left already has a ${rPay.find(left.columns.contains).get} column")
    // non-strict: right (0) sorts before left (1) at equal ts, so the
    // running `last` sees a same-timestamp match; strict flips the tags
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    // the matched row travels as ONE struct (never null for right rows),
    // so `last(ignoreNulls)` skips only the left rows' null placeholders —
    // a genuine NULL inside a matched payload field stays NULL instead of
    // being backfilled from an older right row (per-column running lasts
    // tear rows exactly that way)
    val payStruct = org.apache.spark.sql.types.StructType(
      ((tsCol +: payloadCols) zip rPay).map { case (c, p) =>
        right.schema(c).copy(name = p)
      })
    val l2 = left.select(
      (keys :+ tsCol).map(col) ++ Seq(lit(lTag).as("__side")) ++
        leftOnly.map(col) ++
        Seq(lit(null).cast(payStruct).as("__asof")): _*)
    val r2 = right.select(
      (keys :+ tsCol).map(col) ++ Seq(lit(rTag).as("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(((tsCol +: payloadCols) zip rPay)
          .map { case (c, p) => col(c).as(p) }: _*).as("__asof")): _*)
    val tsOrd = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l2.unionByName(r2)
      .select(
        (keys :+ tsCol).map(col) ++ Seq(col("__side")) ++ leftOnly.map(col) ++
          Seq(last(col("__asof"), ignoreNulls = true).over(w).as("__asof")): _*)
      .filter(col("__side") === lTag)
      .drop("__side")
    val bounded = tolerance.fold(joined) { tol =>
      val matched = col("__asof").getField(prefix + tsCol)
      val stale =
        if (forward) matched > col(tsCol) + expr(s"INTERVAL $tol")
        else matched < col(tsCol) - expr(s"INTERVAL $tol")
      // nulling the whole struct nulls every asof_ column together,
      // evaluated against the original matched timestamp
      joined.withColumn("__asof",
        when(stale, lit(null).cast(payStruct)).otherwise(col("__asof")))
    }
    bounded.select(left.columns.toSeq.map(col) ++
      rPay.map(p => col("__asof").getField(p).as(p)): _*)
  }

  /** Ingest-volume anomaly report: per (group, day) event counts scored
    * against the TRAILING `window` days' mean/stddev — the monitoring
    * query a pipeline runs before trusting a day's data (a collapsed
    * crawler or a double-delivered feed shows up as |z| > `z` long
    * before any content-level check fires).
    *
    * The window runs at DAY grain: its input is one row per (group,
    * day) — bounded by calendar time, never by event volume (36,525
    * rows per group-century), so the keyed window is driver-scale even
    * at 100 TB of events; the only data-sized work is the first
    * aggregation, which map-side combines. The current day is EXCLUDED
    * from its own baseline (rows -window..-1): a 10× spike must not
    * defend itself by inflating the stats it is judged against.
    *
    * zscore and is_anomaly are NULL while the baseline is undefined
    * (fewer than 2 trailing days, or zero variance) — explicitly, so
    * engines that differ on x/0 and NULL-vs-false CASE semantics
    * replay bit-identically.
    *
    * Output: groupCols + (day, n, mu, sigma, zscore, is_anomaly). */
  def volumeAnomalies(events: DataFrame, tsCol: String = "ts",
                      groupCols: Seq[String] = Nil,
                      window: Int = 7, z: Double = 3.0): DataFrame =
    scoreDailyCounts(
      events.groupBy(
        (groupCols.map(col) :+ date_trunc("DAY", col(tsCol)).as("day")): _*)
        .agg(count(lit(1)).as("n")),
      groupCols, window, z)

  /** The scoring tail of [[volumeAnomalies]], public so the STREAMING
    * path can reuse it verbatim on a maintained day-count sink
    * ([[graft.streaming.EventsStreaming.anomaliesFromSink]]): input is
    * the already-aggregated (groupCols..., day, n) frame.
    *
    * The day axis is DENSIFIED before scoring — each group's calendar
    * is filled from its own first day through the GLOBAL last day with
    * n = 0 — because the monitor's headline failure mode is a feed that
    * goes silent: a zero-event day produces no aggregate row at all, so
    * a ROWS frame over observed rows alone would never score it (and a
    * long gap would silently stretch "trailing 7 days" across months).
    * With a dense axis the row frame IS the calendar frame, and a
    * collapsed feed fires on its first silent day. Densification stays
    * day-grain (a sequence explode per group over its own span) — never
    * data-sized. */
  def scoreDailyCounts(daily: DataFrame, groupCols: Seq[String] = Nil,
                       window: Int = 7, z: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2 trailing days, got $window")
    val gc = groupCols.map(col)
    val spanEnd = daily.agg(max(col("day")).as("__gmax"))
    val dense = daily
      .groupBy(gc: _*).agg(min(col("day")).as("__gmin"))
      .crossJoin(graft.model.Joins.maybeBroadcast(spanEnd))
      .select(gc :+ explode(sequence(col("__gmin"), col("__gmax"),
        expr("INTERVAL 1 DAY"))).as("day"): _*)
      .join(daily, groupCols :+ "day", "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy(gc: _*)
      .orderBy(col("day").asc).rowsBetween(-window, -1)
    dense
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sigma", stddev_samp(col("n")).over(w))
      .withColumn("zscore",
        when(col("sigma").isNull || col("sigma") === 0.0, lit(null))
          .otherwise((col("n") - col("mu")) / col("sigma")))
      .withColumn("is_anomaly",
        when(col("zscore").isNull, lit(null).cast("int"))
          .otherwise((abs(col("zscore")) > z).cast("int")))
  }
}
