package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.builders.Tpch
import graft.functions.TextFunctions
import graft.model.{DataCube, Hierarchy, Measure}
import graft.operators.{Dedup, Events, Sampling, Similarity}

/** North-star extension queries (BASELINE.json): the training-data-pipeline
  * operators — text analysis, dedup family, similarity search, windowed
  * events — each DuckDB-oracle-checked where SQL-expressible.
  *
  * Portability conventions (same as ParityQueries): md5-derived hashes only
  * (bit-identical in DuckDB), doubles rounded before comparison whenever an
  * engine-side summation order could differ, exact decimal for money-like
  * sums, every output fully ordered NULLS FIRST.
  */
object ExtensionQueries {

  private def sorted(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toSeq: _*)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Shared 3-gram shingle index over documents — persisted per (session,
    * dir) so the dedup family (q19 Jaccard, q20 MinHash-LSH) builds the
    * inverted index once, mirroring the cube's build-once-query-many model.
    *
    * The index is CAPPED (maxDf = [[Dedup.DefaultMaxDf]]) *before* the
    * persist: the cap is part of the dedup-family semantics (the oracle
    * applies the identical cap), and capping downstream of the cache would
    * re-run the df aggregation + semi-join in every branch of every
    * consuming plan — the round-2 bench paid 72 s for q19 alone that way.
    * Consumers pass this index with `maxDf = None`. */
  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, () => Unit)]()
  private def shingles3(s: SparkSession, dir: String): DataFrame = {
    val entry = shingleCache.computeIfAbsent((s, dir), { case (ss, d) =>
      // hook registered AFTER the index composes (throwing build must not
      // leak hook closures per retry — same contract as Tpch.cube)
      val sh = Dedup.buildShingleIndex(docs(ss, d), "doc_id", "text", 3,
        maxDf = Some(Dedup.DefaultMaxDf))
      if (!sys.env.contains("SPARK_GRAFT_NO_CACHE"))
        sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val detach = graft.util.SessionCleanup.onApplicationEnd(ss) { () =>
        shingleCache.remove((ss, d)): Unit
      }
      (sh, detach)
    })
    // application ended during build: the hook may have fired before the
    // entry was inserted — evict post-insertion (see Tpch.cube)
    if (s.sparkContext.isStopped)
      Option(shingleCache.remove((s, dir))).foreach(_._2.apply())
    entry._1
  }

  /** Force-fill the shared shingle index cache (bench `build_shingles`
    * accounting line — the index is the dominant cost of the dedup family
    * and is paid once, not per query). */
  def warmShingles(s: SparkSession, dir: String): Unit =
    shingles3(s, dir).count(): Unit

  /** Eviction hook: drop + unpersist the shared shingle index and detach
    * its application-end cleanup hook. */
  def invalidateShingles(s: SparkSession, dir: String): Unit =
    Option(shingleCache.remove((s, dir))).foreach { case (sh, detach) =>
      sh.unpersist()
      detach()
      // drop memoized broadcast size estimates with the working set (an
      // estimate taken against the persisted index is stale once dropped)
      graft.model.Joins.invalidateEstimates()
    }
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  /** Fixture-generation-robust events reader — see Sources.readEvents
    * (handles both TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)/NTZ). */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Sources.readEvents(s, dir)

  // -------------------------------------------------------------------
  // q16 — text statistics (token count, punct, quality scoring)
  // -------------------------------------------------------------------
  def q16(s: SparkSession, dir: String): DataFrame = {
    import TextFunctions._
    val en = langProfiles.toMap.apply("en")
    val t = col("text")
    sorted(docs(s, dir).select(
      col("doc_id"),
      nTokens(t).as("n_tokens"),
      nChars(t).cast("long").as("n_chars"),
      nPunct(t).cast("long").as("n_punct"),
      round(meanTokenLen(t), 6).as("mean_token_len"),
      round(stopwordRatio(t, en), 6).as("stopword_ratio"),
      qualityScore(t, en).as("quality")))
  }

  private val enWords = TextFunctions.langProfiles.toMap.apply("en")
  private def sqlWordList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  val q16Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') toks FROM documents
      |), m AS (
      |  SELECT doc_id,
      |         CAST(len(toks) AS INT) AS n_tokens,
      |         CAST(length(text) AS BIGINT) AS n_chars,
      |         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
      |         round(length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0 / len(toks), 6) AS mean_token_len,
      |         round(len(list_filter(toks, x -> x IN (${sqlWordList(enWords)}))) * 1.0 / len(toks), 6) AS stopword_ratio,
      |         len(list_filter(toks, x -> x IN (${sqlWordList(enWords)}))) * 1.0 / len(toks) AS swr_raw,
      |         len(toks) AS nt,
      |         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS np
      |  FROM t
      |)
      |SELECT doc_id, n_tokens, n_chars, n_punct, mean_token_len, stopword_ratio,
      |       round((CASE WHEN nt BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END)
      |           * (CASE WHEN np > 0 THEN 1.0 ELSE 0.8 END)
      |           * (CASE WHEN swr_raw > 0.05 THEN 1.0 ELSE 0.6 END), 6) AS quality
      |FROM m
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q17 — language-ID (stopword-profile argmax, deterministic tie-break)
  // -------------------------------------------------------------------
  def q17(s: SparkSession, dir: String): DataFrame = {
    import TextFunctions._
    sorted(docs(s, dir).select(
      col("doc_id"),
      langId(col("text")).as("lang_pred"),
      langScore(col("text")).as("lang_score")))
  }

  val q17Sql: String = {
    val profs = TextFunctions.langProfiles.sortBy(_._1)
    val hitExprs = profs.map { case (l, ws) =>
      s"len(list_filter(toks, x -> x IN (${sqlWordList(ws)}))) AS h_$l"
    }.mkString(",\n      |         ")
    val langs = profs.map(_._1)
    val g = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val pick = langs.map(l => s"WHEN h_$l = g THEN '$l'").mkString(" ")
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') toks FROM documents
      |), h AS (
      |  SELECT doc_id,
      |         $hitExprs
      |  FROM t
      |), s AS (
      |  SELECT doc_id, h_de, h_en, h_es, h_fr, h_zh, $g AS g FROM h
      |)
      |SELECT doc_id,
      |       CASE WHEN g = 0 THEN 'und' $pick END AS lang_pred,
      |       CAST(g AS INT) AS lang_score
      |FROM s
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q18 — exact dedup by normalized-text fingerprint
  // -------------------------------------------------------------------
  def q18(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.exact(docs(s, dir), "doc_id", "text"))

  val q18Sql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |       min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  /** Shared DuckDB shingle CTE (3-gram, distinct per doc) — the oracle
    * counterpart of Dedup.docShingles, including the short-doc fallback
    * (documents with < n tokens contribute their full token string as the
    * single shingle, so no document vanishes from dedup). `capDf` mirrors
    * the operator's maxDf stop-shingle cap: shingles in more than capDf
    * docs are dropped from the index AND the per-doc sizes, exactly like
    * Dedup.jaccardPairs. */
  private def shingleCteWith(capDf: Option[Int]): String = {
    val shFinal = capDf match {
      case None => ""
      case Some(cap) =>
        s"""|, sh AS (
            |  SELECT * FROM sh0
            |  WHERE s IN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $cap)
            |)""".stripMargin
    }
    val shName = if (capDf.isEmpty) "sh" else "sh0"
    s"""WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') t FROM documents
      |), $shName AS (
      |  SELECT DISTINCT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, array_to_string(t, ' ') AS s FROM toks WHERE len(t) < 3
      |)$shFinal, sizes AS (
      |  SELECT doc_id, count(*) n FROM sh GROUP BY 1
      |), pairs AS (
      |  SELECT a.doc_id i, b.doc_id j, count(*) inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin
  }
  private val shingleCte: String = shingleCteWith(None)

  private val jaccardSelect: String =
    """SELECT i, j, round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
      |FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q19 — exact n-gram Jaccard near-dup pairs (inverted shingle index),
  //       with the default stop-shingle cap ACTIVE (maxDf=256) so the
  //       join fan-out stays bounded at any corpus size; the oracle
  //       applies the identical cap. The shared index is pre-capped and
  //       persisted, so maxDf = None here (capping downstream of the
  //       cache would re-run the cap in every plan branch).
  // -------------------------------------------------------------------
  def q19(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3,
      threshold = 0.8, maxDf = None, shinglesDf = Some(shingles3(s, dir)))
      .withColumn("jaccard", round(col("jaccard"), 6)))

  val q19Sql: String =
    shingleCteWith(Some(Dedup.DefaultMaxDf)) + "\n" + jaccardSelect

  // -------------------------------------------------------------------
  // q20 — MinHash + banded LSH, exact-verified: must equal q19 (recall
  //       of the banding is ~1 at this similarity; precision is exactly 1
  //       because candidates are verified) — so the *exact* pairs SQL is
  //       a legitimate oracle for the approximate pipeline
  // -------------------------------------------------------------------
  def q20(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.minhashLsh(docs(s, dir), "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.8,
      maxDf = None, shinglesDf = Some(shingles3(s, dir)))
      .withColumn("jaccard", round(col("jaccard"), 6)))

  val q20Sql: String = q19Sql

  // -------------------------------------------------------------------
  // q21 — SimHash near-dup pairs (hamming ≤ 3 via pigeonhole banding)
  // -------------------------------------------------------------------
  def q21(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
      .withColumn("hamming", col("hamming").cast("long")))

  val q21Sql: String = {
    val votes = (0 until 60).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j")
      .mkString(",\n      |         ")
    val sig = (0 until 60).map(j =>
      s"(CASE WHEN v$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
      |  SELECT doc_id, CAST(concat('0x', substr(md5(t.x), 1, 15)) AS BIGINT) AS h
      |  FROM documents, LATERAL (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS x) t
      |), votes AS (
      |  SELECT doc_id,
      |         $votes
      |  FROM tok GROUP BY 1
      |), sig AS (
      |  SELECT doc_id, $sig AS simhash FROM votes
      |)
      |SELECT a.doc_id i, b.doc_id j,
      |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q22 — brute-force cosine top-k similarity search
  // -------------------------------------------------------------------
  def q22(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
    sorted(Similarity.bruteKnn(q, e, k = 5)
      .withColumn("cos", round(col("cos"), 4)))
  }

  val q22Sql: String =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      |p AS (
      |  SELECT q.vec_id query_id, e.vec_id neighbor_id, q.embedding qe, e.embedding ce
      |  FROM q JOIN embeddings e ON e.vec_id != q.vec_id
      |), ex AS (
      |  SELECT query_id, neighbor_id,
      |         unnest(qe)::DOUBLE qv, unnest(ce)::DOUBLE cv
      |  FROM p
      |), d AS (
      |  SELECT query_id, neighbor_id,
      |         SUM(qv*cv) / sqrt(SUM(qv*qv)) / sqrt(SUM(cv*cv)) AS cos
      |  FROM ex GROUP BY 1, 2
      |), rk AS (
      |  SELECT query_id, neighbor_id,
      |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
      |         round(cos, 4) AS cos
      |  FROM d
      |)
      |SELECT query_id, neighbor_id, rank, cos FROM rk WHERE rank <= 5
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q23 — embedding near-duplicate pairs (cosine ≥ threshold)
  // -------------------------------------------------------------------
  def q23(s: SparkSession, dir: String): DataFrame =
    sorted(Similarity.nearDupPairs(emb(s, dir), threshold = 0.47)
      .withColumn("cos", round(col("cos"), 4)))

  val q23Sql: String =
    """WITH p AS (
      |  SELECT a.vec_id i, b.vec_id j, a.embedding va, b.embedding vb
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |), ex AS (
      |  SELECT i, j, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM p
      |), d AS (
      |  SELECT i, j, SUM(x*y) / sqrt(SUM(x*x)) / sqrt(SUM(y*y)) AS cos
      |  FROM ex GROUP BY 1, 2
      |)
      |SELECT i, j, round(cos, 4) AS cos FROM d WHERE cos >= 0.47
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q24 — tumbling-window event aggregation (batch form of the
  //       Structured Streaming path; exact decimal sums)
  // -------------------------------------------------------------------
  def q24(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("value", col("value").cast("decimal(14,2)"))
    sorted(Events.tumbling(ev, "1 hour")
      .withColumn("sum_value", col("sum_value").cast("double")))
  }

  val q24Sql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q25 — per-user sessionization (30-min inactivity gap)
  // -------------------------------------------------------------------
  def q25(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("value", col("value").cast("decimal(14,2)"))
    sorted(Events.sessionsSql(ev, gapMinutes = 30)
      .drop("session_no")
      .withColumn("sum_value", col("sum_value").cast("double")))
  }

  val q25Sql: String =
    """WITH m AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |               OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), g AS (
      |  SELECT user_id, ts, value,
      |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM m
      |)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, session_no
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q26 — single-table cube constructor (as.data.cube.data.table, S3):
  //       documents as a denormalized table → cube keyed by (lang, source)
  // -------------------------------------------------------------------
  def q26(s: SparkSession, dir: String): DataFrame = {
    val cube = DataCube.fromTable(
      docs(s, dir).withColumn("one", lit(1L)),
      measures = Seq(Measure.sum("n_chars", "sum_chars"), Measure.sum("one", "n_docs")),
      dims = Seq(
        ("lang", "lang", ListMap("default" -> Hierarchy.flat("lang")), Seq.empty),
        ("source", "source", ListMap("default" -> Hierarchy.flat("source")), Seq.empty)))
    sorted(cube.q(Seq(graft.query.dsl.dim("lang")
        .where("lang" -> Seq("en", "de"))), drop = false)
      .fact.data.select("lang", "source", "sum_chars", "n_docs"))
  }

  val q26Sql: String =
    """SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, COUNT(*) AS n_docs
      |FROM documents WHERE lang IN ('en', 'de')
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q27 — distinct-count measure (A7/A8 extension): orders per year
  // -------------------------------------------------------------------
  def q27(s: SparkSession, dir: String): DataFrame = {
    val denorm = Tpch.cube(s, dir).denormalize(dims = Seq("date"))
    sorted(denorm.groupBy("d_year")
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("n")).as("n_lineitems")))
  }

  val q27Sql: String =
    """SELECT CAST(year(l_shipdate) AS INT) AS d_year,
      |       COUNT(DISTINCT l_orderkey) AS n_orders,
      |       COUNT(*) AS n_lineitems
      |FROM lineitem GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q28 — winnowing document fingerprints (rolling-hash scheme)
  // -------------------------------------------------------------------
  def q28(s: SparkSession, dir: String): DataFrame =
    sorted(docs(s, dir).select(col("doc_id"),
      explode(TextFunctions.winnowFingerprints(col("text"), k = 8, w = 4))
        .as("fp")))

  val q28Sql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      |  FROM documents
      |), g AS (
      |  SELECT doc_id,
      |         [CAST(concat('0x', substr(md5(substr(norm, CAST(i AS INT), 8)), 1, 15)) AS BIGINT)
      |          FOR i IN range(1, greatest(length(norm) - 7, 1) + 1)] AS grams
      |  FROM t
      |), m AS (
      |  SELECT doc_id,
      |         list_distinct([list_min(grams[CAST(j AS INT):CAST(j + 3 AS INT)])
      |                        FOR j IN range(1, greatest(len(grams) - 3, 1) + 1)]) AS fps
      |  FROM g
      |)
      |SELECT doc_id, unnest(fps) AS fp FROM m
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q29 — BPE-ish regex token counting vs whitespace tokens
  // -------------------------------------------------------------------
  def q29(s: SparkSession, dir: String): DataFrame =
    sorted(docs(s, dir).select(col("doc_id"),
      TextFunctions.nBpeTokens(col("text")).as("n_bpe"),
      TextFunctions.nTokens(col("text")).as("n_ws")))

  val q29Sql: String =
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe,
      |       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws
      |FROM documents
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q30 — JSON scalar functions over the events props column
  // -------------------------------------------------------------------
  def q30(s: SparkSession, dir: String): DataFrame =
    sorted(events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count("*").as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k")))

  val q30Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q31 — approx_count_distinct (HLL++): the raw sketch estimate has no
  //       cross-engine oracle (different algorithms), so the query outputs
  //       the EXACT distinct count plus a tolerance verdict — approx_ok =
  //       1 iff |approx - exact| <= 5% of exact (rsd is 1%, so 5% is a
  //       deterministic-pass margin). The oracle computes the exact count
  //       and asserts the verdict column is literally 1: the hash compare
  //       becomes a real accuracy check instead of rows-only.
  // -------------------------------------------------------------------
  def q31(s: SparkSession, dir: String): DataFrame = {
    val denorm = Tpch.cube(s, dir).denormalize(dims = Seq("date"))
    sorted(denorm.groupBy("d_year")
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        approx_count_distinct(col("o_orderkey"), 0.01).as("approx"))
      .select(col("d_year"), col("n_orders"),
        (abs(col("approx") - col("n_orders"))
          <= col("n_orders") * lit(0.05)).cast("int").as("approx_ok")))
  }

  val q31Sql: String =
    """SELECT CAST(year(l_shipdate) AS INT) AS d_year,
      |       COUNT(DISTINCT l_orderkey) AS n_orders,
      |       1 AS approx_ok
      |FROM lineitem GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q32 — sliding windows (1h width, 30m slide): every event lands in
  //       exactly width/slide = 2 windows; the oracle spells that out as
  //       a UNION ALL of two shifted time_buckets
  // -------------------------------------------------------------------
  def q32(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("value", col("value").cast("decimal(14,2)"))
    sorted(graft.streaming.EventsStreaming.slidingCounts(ev, "1 hour", "30 minutes",
      lateness = "0 seconds")
      .drop("window_end")
      .withColumn("sum_value", col("sum_value").cast("double")))
  }

  val q32Sql: String =
    """WITH b AS (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value FROM events
      |)
      |SELECT ws AS window_start, event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM b GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q33 — SQL interop: the cube's views queried with plain Spark SQL
  // -------------------------------------------------------------------
  def q33(s: SparkSession, dir: String): DataFrame = {
    Tpch.cube(s, dir).createViews("graft_")
    sorted(s.sql(
      """SELECT p.p_type, SUM(f.sum_qty) AS sum_qty, CAST(SUM(f.n) AS BIGINT) AS n
        |FROM graft_fact f JOIN graft_part p USING (p_partkey)
        |GROUP BY 1""".stripMargin))
  }

  val q33Sql: String =
    """SELECT p_type, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q34 — near-dup connected components: the canonicalization step after
  //       pair generation (keep/drop must be transitive even though
  //       near-duplication isn't). Spark side: iterative min-label
  //       propagation over the exact-verified MinHash-LSH pairs; oracle:
  //       the same pair set transitively closed with a recursive CTE,
  //       component = min reachable id.
  // -------------------------------------------------------------------
  def q34(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.connectedComponents(
      Dedup.minhashLsh(docs(s, dir), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.8,
        maxDf = None, shinglesDf = Some(shingles3(s, dir)))))

  val q34Sql: String = {
    val cte = shingleCteWith(Some(Dedup.DefaultMaxDf))
      .replaceFirst("WITH ", "WITH RECURSIVE ")
    cte + """, jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |)
      |SELECT a AS doc_id, least(a, min(b)) AS component
      |FROM reach GROUP BY a
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q35 — deterministic train/val/test split: hash-of-id assignment
  //       (Sampling.assignSplit), per-split count + id range + char
  //       volume. The ORACLE CHECKS MEMBERSHIP itself (same md5-derived
  //       uniform in DuckDB), not just sizes — a changed hash or
  //       threshold arithmetic fails the row hash.
  // -------------------------------------------------------------------
  def q35(s: SparkSession, dir: String): DataFrame =
    sorted(Sampling.assignSplit(docs(s, dir), "doc_id")
      .groupBy("split")
      .agg(count("*").as("n"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        sum("n_chars").as("sum_chars")))

  val q35Sql: String =
    """WITH h AS (
      |  SELECT doc_id, n_chars,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |           / 1152921504606846976.0 AS u
      |  FROM documents
      |)
      |SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
      |            ELSE 'test' END AS split,
      |       count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM h GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q36 — exact distribution quantiles per group: Spark `percentile`
  //       (exact linear interpolation) ≡ DuckDB `quantile_cont`. On a
  //       quantity column holding small integers the interpolation
  //       arithmetic is exact in both engines — safe to hash-compare.
  // -------------------------------------------------------------------
  def q36(s: SparkSession, dir: String): DataFrame =
    sorted(s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        percentile(col("l_quantity"), lit(0.99)).as("p99")))

  val q36Sql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS p50,
      |       quantile_cont(l_quantity, 0.9) AS p90,
      |       quantile_cont(l_quantity, 0.99) AS p99
      |FROM lineitem GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q37 — skew-safe salted join: Joins.saltedJoin(lineitem, part) must
  //       be RESULT-identical to the plain join (the oracle is the plain
  //       SQL join) while spreading each part key over 8 salted sub-keys.
  //       l_linenumber varies within an order; (orderkey, linenumber)
  //       varies within a part key group — a proper salt source.
  // -------------------------------------------------------------------
  def q37(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
    val part = s.read.parquet(s"$dir/part.parquet").select("p_partkey", "p_brand")
    sorted(graft.model.Joins
      .saltedJoin(li, part, "p_partkey", salts = 8,
        saltSource = struct(col("l_orderkey"), col("l_linenumber")))
      .groupBy("p_brand")
      .agg(sum("l_quantity").as("sum_qty"), count("*").as("n")))
  }

  val q37Sql: String =
    """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q38 — within-document repetition ratio (the repetitive-text quality
  //       signal): per doc, total vs distinct 3-gram occurrences and
  //       1 - distinct/total. Pure per-row arithmetic — no shuffle.
  // -------------------------------------------------------------------
  def q38(s: SparkSession, dir: String): DataFrame =
    sorted(docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextFunctions.shinglesFromTokens(col("toks"), 3).as("sh"))
      .select(col("doc_id"),
        size(col("sh")).as("n_grams"),
        size(array_distinct(col("sh"))).as("n_distinct"),
        TextFunctions.repetitionRatio(col("sh")).as("rep_ratio")))

  val q38Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents
      |), sh AS (
      |  SELECT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION ALL
      |  SELECT doc_id, array_to_string(t, ' ') AS s FROM toks WHERE len(t) < 3
      |), agg AS (
      |  SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
      |         CAST(count(DISTINCT s) AS INT) AS n_distinct
      |  FROM sh GROUP BY 1
      |)
      |SELECT doc_id, n_grams, n_distinct,
      |       1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS rep_ratio
      |FROM agg
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q39 — train/eval decontamination: treat source 'src0' as the eval
  //       set and every other source as training data; report training
  //       docs sharing >= 0.8 n-gram Jaccard with any eval doc (the
  //       leakage that inflates benchmark scores). Cross-corpus inverted
  //       index — same join shape as q19, no i<j (sides are disjoint).
  // -------------------------------------------------------------------
  def q39(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // per-side indexes carved from the SHARED persisted index (one
    // source-lookup join each, size-guarded broadcast: the id list is
    // SF-proportional) — the cap is therefore the GLOBAL corpus cap,
    // mirrored by the oracle; tokenization never re-runs (q19/q20
    // doctrine: build the index once)
    val bySource = (pred: Column) => shingles3(s, dir)
      .join(graft.model.Joins.maybeBroadcast(
        d.select(col("doc_id"), col("source")).filter(pred)
          .select("doc_id")), "doc_id")
    sorted(Dedup.crossJaccardPairs(
      d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
      "doc_id", "text", n = 3, threshold = 0.8, maxDf = None,
      leftShinglesDf = Some(bySource(col("source") =!= "src0")),
      rightShinglesDf = Some(bySource(col("source") === "src0"))))
  }

  val q39Sql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') t
      |  FROM documents
      |), sh0 AS (
      |  SELECT DISTINCT doc_id, source,
      |         t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, source, array_to_string(t, ' ') AS s
      |  FROM toks WHERE len(t) < 3
      |), shx AS (
      |  SELECT * FROM sh0
      |  WHERE s IN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= ${Dedup.DefaultMaxDf})
      |), a AS (SELECT doc_id, s FROM shx WHERE source <> 'src0'
      |), b AS (SELECT doc_id, s FROM shx WHERE source = 'src0'
      |), sza AS (SELECT doc_id, count(*) n FROM a GROUP BY 1
      |), szb AS (SELECT doc_id, count(*) n FROM b GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id i, b.doc_id j, count(*) c
      |  FROM a JOIN b ON a.s = b.s GROUP BY 1, 2
      |)
      |SELECT i, j, c * 1.0 / (sza.n + szb.n - c) AS jaccard
      |FROM inter JOIN sza ON sza.doc_id = i JOIN szb ON szb.doc_id = j
      |WHERE c * 1.0 / (sza.n + szb.n - c) >= 0.8
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q40 — sequence packing: per-source streaming concat-and-cut into
  //       512-token packs (Packing.packSummary); per-pack doc count and
  //       token fill. Window cumsum partitions by source — no
  //       unpartitioned-window funnel.
  // -------------------------------------------------------------------
  def q40(s: SparkSession, dir: String): DataFrame =
    sorted(graft.operators.Packing.packSummary(
      docs(s, dir), "doc_id", TextFunctions.nTokens(col("text")),
      budget = 512, shardCol = "source"))

  val q40Sql: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |         len(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), s AS (
      |  SELECT source, doc_id, tok,
      |         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id) - tok AS strt
      |  FROM t
      |)
      |SELECT source, CAST(floor(strt / 512.0) AS BIGINT) AS pack_seq,
      |       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
      |FROM s GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q41 — ordered conversion funnel view → click → purchase by first
  //       qualifying occurrence (greedy-earliest is optimal for strict
  //       ordering); per-stage distinct-user counts, non-increasing.
  // -------------------------------------------------------------------
  def q41(s: SparkSession, dir: String): DataFrame =
    sorted(Events.funnel(events(s, dir), Seq("view", "click", "purchase")))

  val q41Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
      |)
      |SELECT 1 AS stage_no, 'view' AS stage, (SELECT count(*) FROM s1) AS n_users
      |UNION ALL
      |SELECT 2, 'click', (SELECT count(*) FROM s2)
      |UNION ALL
      |SELECT 3, 'purchase', (SELECT count(*) FROM s3)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q42 — PII redaction parity: the fixture text carries no PII, so both
  //       engines INJECT identical synthetic PII derived from doc_id
  //       (email, IP, long number), redact, and hash — any divergence in
  //       regex semantics or replacement order fails the row hash.
  // -------------------------------------------------------------------
  def q42(s: SparkSession, dir: String): DataFrame =
    sorted(docs(s, dir).select(
      col("doc_id"),
      md5(TextFunctions.redactPii(concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        // doc_id mod 250: an octet must be <= 3 digits or the IPv4 pattern
        // silently stops matching and the parity check tests nothing
        lit("@example.com at 10.0."), pmod(col("doc_id"), lit(250)).cast("string"),
        lit(".7 ref 90210"), col("doc_id").cast("string"),
        lit("55512 done")))).as("redacted_fp")))

  val q42Sql: String =
    // the regexes interpolate from TextFunctions so the oracle CANNOT
    // drift from the operator (same convention as ${Dedup.DefaultMaxDf})
    s"""SELECT doc_id,
      |  md5(regexp_replace(regexp_replace(regexp_replace(
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |         || '@example.com at 10.0.' || CAST(doc_id % 250 AS VARCHAR)
      |         || '.7 ref 90210' || CAST(doc_id AS VARCHAR) || '55512 done',
      |    '${TextFunctions.EmailPattern}', '<EMAIL>', 'g'),
      |    '${TextFunctions.Ipv4Pattern}', '<IP>', 'g'),
      |    '${TextFunctions.LongNumberPattern}', '<NUM>', 'g')) AS redacted_fp
      |FROM documents
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q43 — per-doc top-3 terms with corpus df (the exact-integer core of
  //       tf-idf keyword extraction): explode + tf agg + doc-partitioned
  //       row_number + df join. Integer-exact, deterministic tie-break.
  // -------------------------------------------------------------------
  def q43(s: SparkSession, dir: String): DataFrame =
    sorted(graft.operators.Corpus.topTerms(docs(s, dir), "doc_id", "text", k = 3))

  val q43Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term <> '' GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), ranked AS (
      |  SELECT doc_id, term, tf,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY tf DESC, term ASC) AS rnk
      |  FROM tf
      |)
      |SELECT r.doc_id, r.term, r.tf, d.df, CAST(r.rnk AS INT) AS rank
      |FROM ranked r JOIN dfreq d USING (term)
      |WHERE r.rnk <= 3
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q44 — image near-dup end-to-end (REAL PNG encode → decode → aHash →
  //       banding): a deterministic synthetic gallery where ids i and
  //       i+10000 carry the same block pattern with a small edit — the
  //       planted near-dups. Binary decode is not SQL-expressible, but
  //       the EXPECTED PAIR SET is pure id arithmetic {(i, i+10000)}, so
  //       the output is the (i, j) set (hamming dropped — its bound is
  //       pinned by PipelineOpsSpec) and the DuckDB oracle generates the
  //       same set from range(): a golden check that the whole
  //       encode→decode→hash→band pipeline finds exactly the plants,
  //       with no false positives among the 100 avalanche-mixed decoys.
  // -------------------------------------------------------------------
  def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gallery = s.range(100).flatMap { idBox =>
      val id: Long = idBox // spark.range boxes; a j.l.Long in the tuple
                           // would type the Seq as Any and lose the encoder
      def png(edit: Boolean): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 64) {
          var x = 0
          while (x < 64) {
            // pseudo-random per (cell, id) via the splitmix64 finalizer:
            // a single multiply does NOT avalanche (ids 56 apart stayed
            // within 5 bits through the carry structure) — full xor-shift
            // mixing makes per-cell bits independent across ids, so the
            // only near-dups are the planted (i, i+10000) edit pairs
            var z = ((x / 8) + (y / 8) * 8 + id * 64) * 0x9E3779B97F4A7C15L
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^= z >>> 31
            val bright = (z & 0x7fffffffL) % 3 == 0
            val v = if (bright) 220 else 30
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        if (edit) { var i = 0; while (i < 5) { img.setRGB(i, 0, 0xffffff); i += 1 } }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      Seq((id, png(false)), (id + 10000L, png(true)))
    }.toDF("media_id", "content")
    sorted(graft.operators.Multimodal.imageNearDupPairs(gallery, maxHamming = 5)
      .select("i", "j"))
  }

  val q44Sql: String =
    """SELECT CAST(i AS BIGINT) AS i, CAST(i + 10000 AS BIGINT) AS j
      |FROM range(100) t(i)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q45 — near-dup dedup END-TO-END: the actual deliverable of the dedup
  //       family — pairs (MinHash-LSH, exact-verified) → transitive
  //       closure → one canonical doc per cluster → the SURVIVING CORPUS,
  //       summarized per source. Oracle: q34's recursive-CTE closure plus
  //       the same min-id canonicalization and anti-join.
  // -------------------------------------------------------------------
  def q45(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.minhashLsh(d, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.8,
      maxDf = None, shinglesDf = Some(shingles3(s, dir)))
    sorted(Dedup.dropNearDups(d, pairs, "doc_id")
      .groupBy("source")
      .agg(count("*").as("n_docs"), sum("n_chars").as("sum_chars")))
  }

  val q45Sql: String = {
    val cte = shingleCteWith(Some(Dedup.DefaultMaxDf))
      .replaceFirst("WITH ", "WITH RECURSIVE ")
    cte + """, jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a
      |), losers AS (
      |  SELECT doc_id FROM comp WHERE doc_id <> component
      |)
      |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q46 — duplicate-n-gram share (the Gopher/C4-style corpus-overlap
  //       quality filter): per doc, fraction of its distinct 3-grams that
  //       occur in >= 2 documents. UNCAPPED index by design — the hottest
  //       n-grams ARE the duplicated mass being measured (the df join-back
  //       is 1:1, so no cap is needed for the cost bound either).
  // -------------------------------------------------------------------
  def q46(s: SparkSession, dir: String): DataFrame =
    sorted(graft.operators.Corpus.duplicateNgramShare(
      docs(s, dir), "doc_id", "text", n = 3))

  val q46Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, array_to_string(t, ' ') AS s FROM toks WHERE len(t) < 3
      |), dfq AS (
      |  SELECT s, count(*) AS df FROM sh GROUP BY 1
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
      |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |       round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
      |         AS dup_share
      |FROM sh JOIN dfq USING (s)
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q47 — RAG token-window chunking: width-64 windows advancing by 48
  //       (16-token overlap), chunk text fingerprinted for cross-engine
  //       hash comparison. Start positions = multiples of stride below
  //       the token count in BOTH engines (range() in DuckDB, the
  //       floor-div sequence in Spark) — the window arithmetic itself is
  //       what the hash pins.
  // -------------------------------------------------------------------
  def q47(s: SparkSession, dir: String): DataFrame =
    sorted(graft.operators.Chunking.chunkFingerprints(
      docs(s, dir), "doc_id", "text", width = 64, stride = 48))

  val q47Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents
      |), st AS (
      |  SELECT doc_id, t, unnest(range(0, len(t), 48)) AS strt FROM toks
      |), c AS (
      |  SELECT doc_id, CAST(strt // 48 AS INT) AS chunk_idx,
      |         list_slice(t, strt + 1, strt + 64) AS chunk
      |  FROM st
      |)
      |SELECT doc_id, chunk_idx, CAST(len(chunk) AS INT) AS n_tokens,
      |       md5(array_to_string(chunk, ' ')) AS chunk_fp
      |FROM c
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q48 — temperature-weighted corpus mixing (tokens^0.7 sampling
  //       weights): per-source token totals are integer-exact; the only
  //       float arithmetic (pow + normalize) is rounded to 6 decimals in
  //       both engines.
  // -------------------------------------------------------------------
  def q48(s: SparkSession, dir: String): DataFrame =
    sorted(graft.operators.Corpus.mixingWeights(
      docs(s, dir), "source", TextFunctions.nTokens(col("text")),
      temperature = 0.7))

  val q48Sql: String =
    """WITH per AS (
      |  SELECT source,
      |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |           AS tokens
      |  FROM documents GROUP BY 1
      |)
      |SELECT source, tokens,
      |       round(pow(CAST(tokens AS DOUBLE), 0.7) /
      |             (SELECT sum(pow(CAST(tokens AS DOUBLE), 0.7)) FROM per), 6)
      |         AS weight
      |FROM per
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q49 — last-touch attribution: every purchase joined to the most
  //       recent view by the same user within 30 minutes (NULL when
  //       unattributed). Raw-timestamp output is hash-safe: the fixture's
  //       ns timestamps are micros-aligned (verified), so Spark's µs
  //       truncation is value-identical to DuckDB's ns reads.
  // -------------------------------------------------------------------
  def q49(s: SparkSession, dir: String): DataFrame =
    sorted(Events.attribution(events(s, dir), "view", "purchase",
      within = "30 minutes"))

  val q49Sql: String =
    """WITH f AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'view'
      |), t AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT t.event_id, t.user_id, t.ts AS to_ts, max(f.ts) AS from_ts
      |FROM t LEFT JOIN f
      |  ON f.user_id = t.user_id
      | AND f.ts <= t.ts
      | AND f.ts >= t.ts - INTERVAL '30 minutes'
      |GROUP BY 1, 2, 3
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q50 — approx quantiles (the sketch path you actually run at 100 TB):
  //       exact interpolated percentiles plus a percentile_approx verdict
  //       column, q31-style — the approx sketch has no cross-engine
  //       oracle, so the hash pins the exact values and the assertion
  //       that the sketch landed within tolerance. l_quantity is an
  //       integer grid, so |approx - exact| <= 2 is a deterministic-pass
  //       margin at accuracy 10000.
  // -------------------------------------------------------------------
  def q50(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    sorted(li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("a50"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("a90"))
      .select(col("l_returnflag"), col("p50"), col("p90"),
        (abs(col("a50") - col("p50")) <= 2.0 &&
          abs(col("a90") - col("p90")) <= 2.0).cast("int").as("approx_ok")))
  }

  val q50Sql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS p50,
      |       quantile_cont(l_quantity, 0.9) AS p90,
      |       1 AS approx_ok
      |FROM lineitem GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q51 — per-event trailing 1-hour rate (RANGE frame over event time):
  //       the bot/rate-limit signal. Value-based frames make equal-ts
  //       bursts peers in both engines — the frame SET is pinned by the
  //       hash, so any tie-handling divergence fails loudly.
  // -------------------------------------------------------------------
  def q51(s: SparkSession, dir: String): DataFrame =
    sorted(Events.trailingCount(events(s, dir), widthSeconds = 3600)
      .select("event_id", "user_id", "ts", "n_window"))

  val q51Sql: String =
    """SELECT event_id, user_id, ts,
      |       count(*) OVER (PARTITION BY user_id ORDER BY ts
      |         RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
      |         AS n_window
      |FROM events
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q52 — NATIVE session_window sessionization (q25 is the SQL
  //       gaps-and-islands twin): same inactivity islands, but
  //       session_end is padded by the gap (window close time) — the
  //       oracle mirrors that as max(ts) + 30 minutes. This makes the
  //       operator actually used in streaming (session_window runs
  //       unchanged under readStream) oracle-checked in batch.
  // -------------------------------------------------------------------
  def q52(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("value", col("value").cast("decimal(14,2)"))
    sorted(Events.sessions(ev, gap = "30 minutes")
      .withColumn("sum_value", col("sum_value").cast("double")))
  }

  val q52Sql: String =
    """WITH m AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |               OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), g AS (
      |  SELECT user_id, ts, value,
      |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM m
      |)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL '30 minutes' AS session_end,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, session_no
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q53 — Bloom-filter decontamination (the scan-only form of q39): per
  //       training doc, distinct 3-grams and how many occur in the eval
  //       set (source 'src0'), both as the exact semi-join count AND as
  //       the bloom-probe count. Bloom one-sidedness makes the pair
  //       comparable: n_bloom >= n_exact always (no false negatives), and
  //       at fpp 1e-6 over ~1e5 probes the overcount is 0 with
  //       probability ~1 - 1e-1... per-doc slack 2 makes the verdict
  //       deterministic. Oracle: exact counts + literal verdict.
  // -------------------------------------------------------------------
  def q53(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Decontaminate
    val d = docs(s, dir)
    val evalD = d.filter(col("source") === "src0")
    val trainSh = Dedup.docShingles(
      d.filter(col("source") =!= "src0"), "doc_id", "text", 3)
    val evalSh = Dedup.docShingles(evalD, "doc_id", "text", 3)
      .select("s").distinct().withColumn("in_eval", lit(1L))
    val bloom = Decontaminate.ngramBloom(evalD, "doc_id", "text", 3)
    sorted(trainSh
      .join(graft.model.Joins.maybeBroadcast(evalSh), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count("*").as("n_grams"),
        sum(coalesce(col("in_eval"), lit(0L))).as("n_leaked"),
        sum(when(Decontaminate.mightContain(bloom, col("s")), 1L)
          .otherwise(0L)).as("n_bloom"))
      .select(col("doc_id"), col("n_grams"), col("n_leaked"),
        round(col("n_leaked").cast("double") / col("n_grams").cast("double"), 6)
          .as("leak_share"),
        (col("n_bloom") >= col("n_leaked") &&
          col("n_bloom") - col("n_leaked") <= 2L).cast("int").as("bloom_ok")))
  }

  val q53Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') t
      |  FROM documents
      |), sh0 AS (
      |  SELECT DISTINCT doc_id, source,
      |         t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, source, array_to_string(t, ' ') AS s
      |  FROM toks WHERE len(t) < 3
      |), ev AS (
      |  SELECT DISTINCT s FROM sh0 WHERE source = 'src0'
      |), tr AS (
      |  SELECT doc_id, sh0.s, CASE WHEN ev.s IS NULL THEN 0 ELSE 1 END AS hit
      |  FROM sh0 LEFT JOIN ev ON sh0.s = ev.s
      |  WHERE source <> 'src0'
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(sum(hit) AS BIGINT) AS n_leaked,
      |       round(sum(hit) * 1.0 / count(*), 6) AS leak_share,
      |       1 AS bloom_ok
      |FROM tr
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q54 — key-skew report (the pre-salting diagnostic): top-20 heaviest
  //       l_suppkey values with row share. TakeOrdered top-k (no global
  //       sort/window); ties broken by key for determinism.
  // -------------------------------------------------------------------
  def q54(s: SparkSession, dir: String): DataFrame =
    sorted(graft.model.Joins.skewReport(
      s.read.parquet(s"$dir/lineitem.parquet"), "l_suppkey", k = 20))

  val q54Sql: String =
    """WITH c AS (
      |  SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1
      |), t AS (
      |  SELECT count(*) AS total FROM lineitem
      |), r AS (
      |  SELECT key, n, row_number() OVER (ORDER BY n DESC, key ASC) AS rnk
      |  FROM c
      |)
      |SELECT CAST(r.rnk AS INT) AS rank, r.key, r.n,
      |       round(r.n * 1.0 / t.total, 6) AS share
      |FROM r, t
      |WHERE r.rnk <= 20
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q55 — incremental exact dedup (delta vs stored corpus): a synthetic
  //       delta where every 5th doc is a verbatim corpus copy (fresh ids)
  //       and the rest carry an id-derived tail. The bloom prefilter +
  //       exact verification must equal the plain anti-join — which is
  //       exactly what the oracle computes.
  // -------------------------------------------------------------------
  def q55(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
    val delta = corpus.select(
      (col("doc_id") + lit(1000000L)).as("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0, col("text"))
        .otherwise(concat(col("text"), lit(" tail"),
          col("doc_id").cast("string"))).as("text"))
    sorted(Dedup.exactDelta(corpus, delta, "doc_id", "text")
      .withColumn("is_dup", col("is_dup").cast("int")))
  }

  val q55Sql: String =
    """WITH delta AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |         CASE WHEN doc_id % 5 = 0 THEN text
      |              ELSE text || ' tail' || CAST(doc_id AS VARCHAR) END AS text
      |  FROM documents
      |), cfp AS (
      |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents
      |)
      |SELECT d.doc_id,
      |       md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS fp,
      |       CASE WHEN cfp.fp IS NULL THEN 0 ELSE 1 END AS is_dup
      |FROM delta d
      |LEFT JOIN cfp
      |  ON cfp.fp = md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g'))
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q56 — corpus-mix construction end-to-end: temperature weights (q48)
  //       → per-source keep rates min(1, budget·w/tokens) → deterministic
  //       hash sampling (q35's md5-u) → per-source sampled mass. The
  //       oracle re-derives the rates from the same integer token counts
  //       and 6-decimal-rounded weights, so the float arithmetic is
  //       bit-identical and membership itself is checked.
  // -------------------------------------------------------------------
  def q56(s: SparkSession, dir: String): DataFrame =
    sorted(Sampling.sampleToBudget(
      docs(s, dir), "doc_id", "source", TextFunctions.nTokens(col("text")),
      budgetTokens = 10000L, temperature = 0.7)
      .select(col("doc_id"), col("source"),
        TextFunctions.nTokens(col("text")).cast("long").as("tok"))
      .groupBy("source")
      .agg(count("*").as("n_docs"), sum("tok").as("sum_tokens")))

  val q56Sql: String =
    """WITH per AS (
      |  SELECT source,
      |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |           AS tokens
      |  FROM documents GROUP BY 1
      |), w AS (
      |  SELECT source, tokens,
      |         round(pow(CAST(tokens AS DOUBLE), 0.7) /
      |               (SELECT sum(pow(CAST(tokens AS DOUBLE), 0.7)) FROM per), 6)
      |           AS weight
      |  FROM per
      |), r AS (
      |  SELECT source, least(1.0, 10000.0 * weight / tokens) AS rate FROM w
      |), s AS (
      |  SELECT d.doc_id, d.source,
      |         CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS tok
      |  FROM documents d JOIN r USING (source)
      |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |          / 1152921504606846976.0 < r.rate
      |)
      |SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
      |FROM s GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q57 — VIDEO near-dup end-to-end (REAL MJPEG-AVI encode → RIFF demux →
  //       per-frame aHash → majority hash → banding): q44's gallery
  //       construction lifted to video — ids i and i+10000 carry the same
  //       3-frame block-pattern clip with one edited frame. As in q44,
  //       the expected pair set is pure id arithmetic {(i, i+10000)}, so
  //       the output is the (i, j) set and the oracle generates it from
  //       range() — a golden check on the full demux→hash→band pipeline
  //       (hamming bound pinned by PipelineOpsSpec).
  // -------------------------------------------------------------------
  def q57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gallery = s.range(50).flatMap { idBox =>
      val id: Long = idBox
      def frame(frameNo: Int, edit: Boolean): java.awt.image.BufferedImage = {
        val img = new java.awt.image.BufferedImage(
          64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 64) {
          var x = 0
          while (x < 64) {
            // splitmix64 over (cell, frame, id) — q44's avalanche rationale
            var z = ((x / 8) + (y / 8) * 8 + frameNo * 64 + id * 256) *
              0x9E3779B97F4A7C15L
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^= z >>> 31
            val v = if ((z & 0x7fffffffL) % 3 == 0) 220 else 30
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        if (edit) { var i = 0; while (i < 6) { img.setRGB(i, 0, 0xffffff); i += 1 } }
        img
      }
      def avi(edit: Boolean): Array[Byte] =
        graft.operators.Multimodal.encodeMjpegAvi(
          // the edit touches only frame 1 of 3: the majority hash must
          // still band the pair together
          (0 until 3).map(f => frame(f, edit && f == 1)), microsPerFrame = 40000L)
      Seq((id, avi(false)), (id + 10000L, avi(true)))
    }.toDF("media_id", "content")
    sorted(graft.operators.Multimodal.videoNearDupPairs(gallery, maxHamming = 5)
      .select("i", "j"))
  }

  val q57Sql: String =
    """SELECT CAST(i AS BIGINT) AS i, CAST(i + 10000 AS BIGINT) AS j
      |FROM range(50) t(i)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q58 — INCREMENTAL near-dup dedup end-to-end (the batch-ingest /
  //       streaming micro-batch unit): even-id docs are the already-
  //       ingested corpus, odd-id docs arrive as the delta; a delta doc
  //       survives iff its transitive within-delta near-dup component
  //       contains no corpus near-dup and it is the component's min id.
  //       Exercises the Bloom-prefiltered cross verification and the
  //       sentinel-collapsed closure. Both side indexes are CARVED from
  //       the shared persisted global-capped index (q19/q20/q39
  //       doctrine — tokenization never re-runs; measured 9.6 s → ~2 s
  //       at sf0.1), so the cap is the global corpus cap, mirrored by
  //       the oracle. Oracle: globally-capped parity-split cross +
  //       within jaccard in SQL, recursive-CTE closure,
  //       tainted-component drop.
  // -------------------------------------------------------------------
  def q58(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sh = shingles3(s, dir)
    val delta = d.filter(col("doc_id") % 2 === 1)
    val (surv, _) = Dedup.nearDupDelta(
      Some(sh.filter(col("doc_id") % 2 === 0)), delta, "doc_id", "text",
      deltaShinglesDf = Some(sh.filter(col("doc_id") % 2 === 1)))
    sorted(surv.select("doc_id", "source"))
  }

  val q58Sql: String =
    s"""WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') t FROM documents
      |), sh0 AS (
      |  SELECT DISTINCT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, array_to_string(t, ' ') AS s FROM toks WHERE len(t) < 3
      |), shx AS (
      |  SELECT * FROM sh0
      |  WHERE s IN (SELECT s FROM sh0 GROUP BY s
      |              HAVING count(*) <= ${Dedup.DefaultMaxDf})
      |), shc AS (
      |  SELECT * FROM shx WHERE doc_id % 2 = 0
      |), shd AS (
      |  SELECT * FROM shx WHERE doc_id % 2 = 1
      |), szc AS (SELECT doc_id, count(*) n FROM shc GROUP BY 1
      |), szd AS (SELECT doc_id, count(*) n FROM shd GROUP BY 1
      |), crosshit AS (
      |  SELECT DISTINCT x.j FROM (
      |    SELECT c.doc_id i, dd.doc_id j, count(*) inter
      |    FROM shc c JOIN shd dd ON c.s = dd.s GROUP BY 1, 2
      |  ) x JOIN szc ON szc.doc_id = x.i JOIN szd ON szd.doc_id = x.j
      |  WHERE x.inter * 1.0 / (szc.n + szd.n - x.inter) >= 0.8
      |), wp AS (
      |  SELECT x.i, x.j FROM (
      |    SELECT a.doc_id i, b.doc_id j, count(*) inter
      |    FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2
      |  ) x JOIN szd sa ON sa.doc_id = x.i JOIN szd sb ON sb.doc_id = x.j
      |  WHERE x.inter * 1.0 / (sa.n + sb.n - x.inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM wp UNION SELECT j, i FROM wp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
      |), full_comp AS (
      |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
      |  LEFT JOIN comp c ON c.doc_id = d.doc_id
      |), tainted AS (
      |  SELECT DISTINCT component FROM full_comp
      |  WHERE doc_id IN (SELECT j FROM crosshit)
      |), losers AS (
      |  SELECT doc_id FROM full_comp
      |  WHERE component IN (SELECT component FROM tainted)
      |     OR doc_id <> component
      |)
      |SELECT doc_id, source FROM documents
      |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM losers)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q59 — INCREMENTAL embedding near-dup dedup against a STORED IVF
  //       index (the vector twin of q58): the embeddings table is the
  //       already-ingested corpus (saved as a cell-partitioned IVF
  //       index); the delta plants all three behaviors deterministically
  //       — vec_id%10==0 re-ingested verbatim (cross hit → drop),
  //       %10==1 rotated by 13 positions (fresh → survive; rotation is
  //       an isometry, so rotated-vs-rotated cosines equal the raw pair
  //       cosines, and rotated-vs-raw cosines are empirically ≤ 0.57 at
  //       every gate scale vs the 0.9 threshold — pinned per-dataset by
  //       check_correctness.py's q59 margin pin), %10==2 rotated TWICE
  //       under two ids (within-delta twin pair → min id survives).
  //       Delta ids are MULTIPLICATIVELY encoded (vec_id*4+1, *4+2):
  //       collision-free within the delta for ANY corpus id set, unlike
  //       a fixed additive offset (which collides once ids span it —
  //       the ScaleProbe lesson from this same round).
  //       Deterministic despite nprobe < nlist: an identical re-ingest
  //       ranks cells exactly like its stored twin (nprobe 4 ≥ replicate
  //       2 ⇒ guaranteed cell overlap), and cos-1.0 within twins collide
  //       in every LSH table. Oracle: exact-cosine cross + within pairs,
  //       recursive-CTE closure, tainted-component drop (q58's shape).
  // -------------------------------------------------------------------
  def q59(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q59_ivf_" +
      Integer.toHexString(dir.hashCode)
    // one refinement iteration: q59's determinism never depends on
    // centroid QUALITY (an identical re-ingest ranks cells identically
    // to its stored twin under ANY centroids), so the extra k-means
    // passes only pay driver-action latency per call
    Similarity.saveIvfIndex(e, path, nlist = 16, replicate = 2,
      kmeansIters = 1)
    val rot = concat(slice(col("embedding"), 14, 51),
      slice(col("embedding"), 1, 13))
    val delta = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") * 4 + 1).as("vec_id"), col("embedding"))
      .unionByName(e.filter(col("vec_id") % 10 === 1)
        .select((col("vec_id") * 4 + 1).as("vec_id"), rot.as("embedding")))
      .unionByName(e.filter(col("vec_id") % 10 === 2)
        .select(explode(array(col("vec_id") * 4 + 1, col("vec_id") * 4 + 2))
          .as("vec_id"), rot.as("embedding")))
    // explicit light banding (16 planes × 8 tables): every true pair in
    // this fixture is an identical-vector pair (cos 1.0 — the margin pin
    // above), and identical vectors collide in EVERY table under any
    // banding, so recall stays 1 deterministically while the bucket-row
    // explode shrinks 7× vs the threshold-derived 12×55
    val (surv, _) = Similarity.nearDupDelta(s, path, delta, threshold = 0.9,
      planes = 16, tables = 8)
    sorted(surv.select("vec_id"))
  }

  val q59Sql: String =
    """WITH RECURSIVE delta AS (
      |  SELECT vec_id * 4 + 1 AS vid, embedding AS v
      |  FROM embeddings WHERE vec_id % 10 = 0
      |  UNION ALL
      |  SELECT vec_id * 4 + 1, embedding[14:] || embedding[:13]
      |  FROM embeddings WHERE vec_id % 10 = 1
      |  UNION ALL
      |  SELECT vec_id * 4 + 1, embedding[14:] || embedding[:13]
      |  FROM embeddings WHERE vec_id % 10 = 2
      |  UNION ALL
      |  SELECT vec_id * 4 + 2, embedding[14:] || embedding[:13]
      |  FROM embeddings WHERE vec_id % 10 = 2
      |), cp AS (
      |  SELECT c.vec_id i, d.vid j, c.embedding va, d.v vb
      |  FROM embeddings c, delta d
      |), cex AS (SELECT i, j, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM cp
      |), cd AS (
      |  SELECT i, j, SUM(x*y)/sqrt(SUM(x*x))/sqrt(SUM(y*y)) cos
      |  FROM cex GROUP BY 1, 2
      |), crosshit AS (SELECT DISTINCT j FROM cd WHERE cos >= 0.9
      |), wp0 AS (
      |  SELECT a.vid i, b.vid j, a.v va, b.v vb
      |  FROM delta a JOIN delta b ON a.vid < b.vid
      |), wex AS (SELECT i, j, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM wp0
      |), wp AS (
      |  SELECT i, j FROM (
      |    SELECT i, j, SUM(x*y)/sqrt(SUM(x*x))/sqrt(SUM(y*y)) cos
      |    FROM wex GROUP BY 1, 2
      |  ) WHERE cos >= 0.9
      |), edges AS (
      |  SELECT i AS a, j AS b FROM wp UNION SELECT j, i FROM wp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
      |), full_comp AS (
      |  SELECT d.vid AS doc_id, coalesce(c.component, d.vid) AS component
      |  FROM delta d LEFT JOIN comp c ON c.doc_id = d.vid
      |), tainted AS (
      |  SELECT DISTINCT component FROM full_comp
      |  WHERE doc_id IN (SELECT j FROM crosshit)
      |), losers AS (
      |  SELECT doc_id FROM full_comp
      |  WHERE component IN (SELECT component FROM tainted)
      |     OR doc_id <> component
      |)
      |SELECT vid AS vec_id FROM delta
      |WHERE vid NOT IN (SELECT doc_id FROM losers)
      |ORDER BY 1 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q60 — AS-OF JOIN: every purchase joined to the user's most recent
  //       click at-or-before it (NULLs when none) — the point-in-time
  //       lookup the reference cannot express (SURVEY §2.4: equi-joins
  //       only). Union + keyed running window: ONE user-keyed shuffle,
  //       O(1) per row however far back the match lies. The right side
  //       is pre-aggregated to unique (user, ts) with max_by — the
  //       operator's determinism contract. Oracle: DuckDB's native
  //       ASOF LEFT JOIN, an independent implementation of the same
  //       semantics.
  // -------------------------------------------------------------------
  def q60(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
    sorted(Events.asofJoin(purchases, clicks, Seq("user_id"), "ts",
      payloadCols = Seq("click_id", "click_value")))
  }

  val q60Sql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, ts, max(event_id) AS click_id,
      |         arg_max(value, event_id) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
      |)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |       c.ts AS asof_ts, c.click_id AS asof_click_id,
      |       c.click_value AS asof_click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q61 — RANGE (interval) JOIN: lineitem quantities against OVERLAPPING
  //       price-band intervals [lo, hi), bucket-decomposed into an
  //       equi-join (graft.model.Joins.rangeJoin) — no
  //       BroadcastNestedLoopJoin, no cartesian (PlanSpec pins it).
  //       Money summed as exact cents (BIGINT) so the hash compare never
  //       rides on float summation order.
  // -------------------------------------------------------------------
  def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val bands = Seq(
      ("low", 0.0, 15.0), ("mid", 10.0, 30.0),
      ("high", 25.0, 51.0), ("all", 0.0, 51.0)
    ).toDF("band", "lo", "hi")
    val joined = graft.model.Joins.rangeJoin(
      li, bands, "l_quantity", "lo", "hi", bucketWidth = 5.0)
    sorted(joined.groupBy("band", "l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents")))
  }

  val q61Sql: String =
    """SELECT b.band, l.l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM lineitem l
      |JOIN (VALUES ('low', 0, 15), ('mid', 10, 30),
      |             ('high', 25, 51), ('all', 0, 51)) b(band, lo, hi)
      |  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q62 — INCREMENTAL CUBE REFRESH end-to-end: build a stored star from
  //       the orders fact pre-1998 partitioned by year, then ingest a
  //       raw delta (everything from 1997-07-01 on) with
  //       CubeIO.ingestIntoStar — the delta merges INTO existing 1997
  //       grain rows AND opens new 1998–2001 partitions, and only the
  //       touched partitions are rewritten (RoundTripSpec pins the
  //       byte-identical untouched files; this query oracle-checks the
  //       merged VALUES against a from-scratch recompute). Money as
  //       exact cents: additive longs keep the stored schema stable
  //       across re-ingests.
  // -------------------------------------------------------------------
  def q62(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact}
    import graft.io.CubeIO
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    val base = orders.filter(col("o_orderdate") < "1998-01-01")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("one", lit(1L))
    val delta = orders.filter(col("o_orderdate") >= "1997-07-01")
      .select(col("o_year"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("sum_cents"),
        lit(1L).as("n_orders"))
    // dimensions span the FULL key domain (base + delta years): loadStar
    // conforms the fact to its dimensions, so a delta-opened 1999
    // partition must already have a matching dimension row
    val cube = DataCube.build(
      Fact.build(base, Seq("o_year", "o_orderpriority"),
        Seq(Measure.sum("cents", "sum_cents"), Measure.sum("one", "n_orders"))),
      Seq(
        Dimension.build("year", "o_year", ListMap.empty,
          orders.select("o_year").distinct()),
        Dimension.build("priority", "o_orderpriority", ListMap.empty,
          orders.select("o_orderpriority").distinct())))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q62_star_" +
      Integer.toHexString(dir.hashCode)
    // full overwrite each call: ingest is (by design) not idempotent, so
    // the query rebuilds its fixture star rather than double-ingesting
    // across bench reps
    CubeIO.saveStar(cube, path, partitionFact = Seq("o_year"))
    CubeIO.ingestIntoStar(s, path, delta)
    sorted(CubeIO.loadStar(s, path).fact.data
      .select("o_year", "o_orderpriority", "n_orders", "sum_cents"))
  }

  val q62Sql: String =
    """WITH merged AS (
      |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      |)
      |SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM merged GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q63 — TEMPORAL DIMENSION (SCD2 + point-in-time lookup): signup
  //       events become a versioned user-state dimension
  //       (Sources.scd2: [valid_from, valid_to) intervals via one keyed
  //       lead window), then every purchase joins to the version valid
  //       AT ITS OWN TIMESTAMP via Events.asofJoin. The oracle is an
  //       INDEPENDENT formulation — an interval-containment join on the
  //       LEAD-derived intervals — so a hash match proves the scd2
  //       intervals tile gap- and overlap-free AND the as-of pick
  //       equals interval membership.
  // -------------------------------------------------------------------
  def q63(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Sources
    val ev = events(s, dir)
    val changes = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("state"))
    val versions = Sources.scd2(changes, Seq("user_id"), "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    sorted(Events.asofJoin(purchases,
      versions.select("user_id", "ts", "state"),
      Seq("user_id"), "ts", payloadCols = Seq("state")))
  }

  val q63Sql: String =
    """WITH ch AS (
      |  SELECT user_id, ts, arg_max(value, event_id) AS state
      |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
      |), v AS (
      |  SELECT user_id, ts, state,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      |  FROM ch
      |), p AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.ts,
      |       v.ts AS asof_ts, v.state AS asof_state
      |FROM p LEFT JOIN v ON p.user_id = v.user_id
      |  AND p.ts >= v.ts AND (v.valid_to IS NULL OR p.ts < v.valid_to)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q64 — STAR RETRACTION (the delete half of incremental maintenance,
  //       q62 being the upsert half): build the full-history star, then
  //       retract (a) EVERY 1992 order — the o_year=1992 partition must
  //       physically disappear, which dynamic partition overwrite alone
  //       cannot do — and (b) only the 1-URGENT slice of 1996 — a
  //       partial merge inside a surviving partition. The post-retraction
  //       star is read back via loadStar, so stale files from an
  //       un-deleted partition would resurface as extra rows and fail
  //       the hash. Oracle: from-scratch recompute over the non-retracted
  //       raw rows.
  // -------------------------------------------------------------------
  def q64(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact}
    import graft.io.CubeIO
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    val base = orders
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("one", lit(1L))
    val retraction = orders
      .filter(col("o_year") === 1992 ||
        (col("o_year") === 1996 && col("o_orderpriority") === "1-URGENT"))
      .select(col("o_year"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("sum_cents"),
        lit(1L).as("n_orders"))
    val cube = DataCube.build(
      Fact.build(base, Seq("o_year", "o_orderpriority"),
        Seq(Measure.sum("cents", "sum_cents"), Measure.sum("one", "n_orders"))),
      Seq(
        Dimension.build("year", "o_year", ListMap.empty,
          orders.select("o_year").distinct()),
        Dimension.build("priority", "o_orderpriority", ListMap.empty,
          orders.select("o_orderpriority").distinct())))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q64_star_" +
      Integer.toHexString(dir.hashCode)
    // full overwrite each call: retraction is (by design) not idempotent,
    // so the query rebuilds its fixture star rather than double-retracting
    // across bench reps
    CubeIO.saveStar(cube, path, partitionFact = Seq("o_year"))
    CubeIO.retractFromStar(s, path, retraction, supportCol = "n_orders")
    sorted(CubeIO.loadStar(s, path).fact.data
      .select("o_year", "o_orderpriority", "n_orders", "sum_cents"))
  }

  val q64Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM orders
      |WHERE NOT (year(o_orderdate) = 1992
      |           OR (year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'))
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q65 — EXACT-quota stratified sample: exactly N rows per source,
  //       membership = the quota-prefix of the per-source ranking by
  //       the portable md5 hash (Sampling.stratifiedExactSample). The
  //       ORACLE REPRODUCES MEMBERSHIP row-for-row (same md5-derived
  //       ordering in DuckDB), so a changed hash, ordering, or tiebreak
  //       fails the row hash — not just the counts.
  // -------------------------------------------------------------------
  def q65(s: SparkSession, dir: String): DataFrame =
    sorted(Sampling.stratifiedExactSample(docs(s, dir), "doc_id", "source",
        Map("src1" -> 40, "src2" -> 10, "src3" -> 7))
      .select("doc_id", "source"))

  val q65Sql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source ORDER BY
      |           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |             AS BIGINT) / 1152921504606846976.0, doc_id) AS rn
      |  FROM documents
      |)
      |SELECT doc_id, source FROM ranked
      |WHERE rn <= CASE source WHEN 'src1' THEN 40 WHEN 'src2' THEN 10
      |                        WHEN 'src3' THEN 7 ELSE 0 END
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q66 — DRILL-ACROSS (Kimball multi-fact): a customer cube and a
  //       supplier cube, both on the conformed nation dimension, merged
  //       at nation grain (full-outer: nations with customers but no
  //       suppliers keep NULL supplier measures) and then re-aggregated
  //       BY REGION through the merged cube's dimension — proving both
  //       the fact merge and that the conformed dimension still answers
  //       queries afterwards. Oracle: FULL JOIN of two GROUP BYs, then
  //       the region rollup.
  // -------------------------------------------------------------------
  def q66(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact, Hierarchy}
    val nation = s.read.parquet(s"$dir/nation.parquet")
    val region = s.read.parquet(s"$dir/region.parquet")
    val nd = nation.join(region, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nationkey"), col("n_name"), col("r_name"))
    def nationDim = Dimension.build("nation", "nationkey",
      ListMap("geo" -> Hierarchy(
        "r_name" -> Seq.empty,
        "nationkey" -> Seq("n_name"))), nd)
    val custCube = DataCube.build(
      Fact.build(
        s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_nationkey").as("nationkey"),
            round(col("c_acctbal") * 100).cast("long").as("cbal"),
            lit(1L).as("one")),
        Seq("nationkey"),
        Seq(Measure.sum("cbal", "cust_bal_cents"), Measure.sum("one", "n_cust"))),
      Seq(nationDim))
    val suppCube = DataCube.build(
      Fact.build(
        s.read.parquet(s"$dir/supplier.parquet")
          .select(col("s_nationkey").as("nationkey"),
            round(col("s_acctbal") * 100).cast("long").as("sbal"),
            lit(1L).as("one")),
        Seq("nationkey"),
        Seq(Measure.sum("sbal", "supp_bal_cents"), Measure.sum("one", "n_supp"))),
      Seq(nationDim))
    sorted(custCube.drillAcross(suppCube)
      .aggregate(Seq("r_name")).fact.data
      .select("r_name", "n_cust", "cust_bal_cents", "n_supp", "supp_bal_cents"))
  }

  val q66Sql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS nationkey,
      |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |           AS cust_bal_cents,
      |         CAST(count(*) AS BIGINT) AS n_cust
      |  FROM customer GROUP BY 1
      |), s AS (
      |  SELECT s_nationkey AS nationkey,
      |         CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
      |           AS supp_bal_cents,
      |         CAST(count(*) AS BIGINT) AS n_supp
      |  FROM supplier GROUP BY 1
      |), merged AS (
      |  SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |         cust_bal_cents, n_cust, supp_bal_cents, n_supp
      |  FROM c FULL JOIN s ON c.nationkey = s.nationkey
      |)
      |SELECT r_name,
      |       CAST(sum(n_cust) AS BIGINT) AS n_cust,
      |       CAST(sum(cust_bal_cents) AS BIGINT) AS cust_bal_cents,
      |       CAST(sum(n_supp) AS BIGINT) AS n_supp,
      |       CAST(sum(supp_bal_cents) AS BIGINT) AS supp_bal_cents
      |FROM merged
      |JOIN nation ON n_nationkey = nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q67 — SEMI-ADDITIVE MEASURE (monthly balance): events.value as a
  //       per-user balance reading — the monthly figure per event_type
  //       is the sum over users of each user's LAST reading in the month
  //       (additive across users, last-along-time). Two grouped stages
  //       through the cube API: Measure.lastBy at (type, user, month)
  //       ingest grain, Measure.sum entity-out — no window. Oracle:
  //       row_number()-picked last reading, then the same sum.
  // -------------------------------------------------------------------
  def q67(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact}
    val base = events(s, dir)
      .withColumn("month", date_trunc("month", col("ts")))
    val fact = Fact.build(base, Seq("event_type", "user_id", "month"),
      Seq(Measure.lastBy("value", "last_value",
        struct(col("ts"), col("event_id")))))
    val cube = DataCube.build(fact, Seq(
      Dimension.build("etype", "event_type", ListMap.empty,
        base.select("event_type").distinct()),
      Dimension.build("user", "user_id", ListMap.empty,
        base.select("user_id").distinct()),
      Dimension.build("month", "month", ListMap.empty,
        base.select("month").distinct())))
    // exact cents at the additive stage: double summation order differs
    // across engines at the 1e-12 level, cents are engine-portable
    sorted(cube.aggregate(Seq("event_type", "month"),
        measures = Seq(
          Measure("last_value", "balance_cents",
            c => sum(round(c * 100).cast("long"))),
          Measure.count("last_value", "n_users")))
      .fact.data.select("event_type", "month", "n_users", "balance_cents"))
  }

  val q67Sql: String =
    """WITH g AS (
      |  SELECT event_type, user_id, date_trunc('month', ts) AS month, value,
      |         row_number() OVER (
      |           PARTITION BY event_type, user_id, date_trunc('month', ts)
      |           ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |)
      |SELECT event_type, month,
      |       CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |         AS balance_cents
      |FROM g WHERE rn = 1
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q68 — TIME INTELLIGENCE: monthly order revenue per priority with
  //       period-to-date running totals and month-over-month deltas
  //       (DataCube.timeIntelligence: one keyed window partitioned by
  //       the non-time grain, exact cents). Oracle: the same grouped
  //       base + window SUM/LAG in DuckDB.
  // -------------------------------------------------------------------
  def q68(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact}
    val base = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("month", date_trunc("month", col("o_orderdate")))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val cube = DataCube.build(
      Fact.build(base, Seq("month", "o_orderpriority"),
        Seq(Measure.sum("cents", "sum_cents"))),
      Seq(
        Dimension.build("month", "month", ListMap.empty,
          base.select("month").distinct()),
        Dimension.build("priority", "o_orderpriority", ListMap.empty,
          base.select("o_orderpriority").distinct())))
    sorted(cube.timeIntelligence("month")
      .select("month", "o_orderpriority", "sum_cents",
        "cum_sum_cents", "prev_sum_cents", "delta_sum_cents"))
  }

  val q68Sql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS sum_cents
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT month, o_orderpriority, sum_cents,
      |       CAST(sum(sum_cents) OVER (PARTITION BY o_orderpriority
      |         ORDER BY month) AS BIGINT) AS cum_sum_cents,
      |       lag(sum_cents) OVER (PARTITION BY o_orderpriority
      |         ORDER BY month) AS prev_sum_cents,
      |       sum_cents - lag(sum_cents) OVER (PARTITION BY o_orderpriority
      |         ORDER BY month) AS delta_sum_cents
      |FROM m
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST, 6 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q69 — RATIO-TO-PARENT: each priority's share of its year's revenue
  //       (DataCube.shareAlong — one keyed window over the at-grain
  //       fact). Exact-cents numerators/denominators make the single
  //       double division engine-portable. Oracle: value / window SUM.
  // -------------------------------------------------------------------
  def q69(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact}
    val base = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val cube = DataCube.build(
      Fact.build(base, Seq("o_year", "o_orderpriority"),
        Seq(Measure.sum("cents", "sum_cents"))),
      Seq(
        Dimension.build("year", "o_year", ListMap.empty,
          base.select("o_year").distinct()),
        Dimension.build("priority", "o_orderpriority", ListMap.empty,
          base.select("o_orderpriority").distinct())))
    sorted(cube.shareAlong("o_orderpriority")
      .select("o_year", "o_orderpriority", "sum_cents", "share_sum_cents"))
  }

  val q69Sql: String =
    """WITH m AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS sum_cents
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT o_year, o_orderpriority, sum_cents,
      |       CAST(sum_cents AS DOUBLE) /
      |         CAST(sum(sum_cents) OVER (PARTITION BY o_year) AS DOUBLE)
      |         AS share_sum_cents
      |FROM m
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q70 — TOP-K + OTHER: per year, the top-3 priorities by revenue and
  //       one OTHER row aggregating the tail (DataCube.topKOther: keyed
  //       rank window + one grouped re-aggregation with the measures'
  //       own functions). Oracle: row_number + CASE relabel + group.
  // -------------------------------------------------------------------
  def q70(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact}
    val base = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("one", lit(1L))
    val cube = DataCube.build(
      Fact.build(base, Seq("o_year", "o_orderpriority"),
        Seq(Measure.sum("cents", "sum_cents"), Measure.sum("one", "n_orders"))),
      Seq(
        Dimension.build("year", "o_year", ListMap.empty,
          base.select("o_year").distinct()),
        Dimension.build("priority", "o_orderpriority", ListMap.empty,
          base.select("o_orderpriority").distinct())))
    sorted(cube.topKOther("o_orderpriority", k = 3, rankMeasure = "sum_cents")
      .select("o_year", "o_orderpriority", "n_orders", "sum_cents"))
  }

  val q70Sql: String =
    """WITH m AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS sum_cents,
      |         CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1, 2
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_year
      |    ORDER BY sum_cents DESC, o_orderpriority ASC) AS rn
      |  FROM m
      |)
      |SELECT o_year,
      |       CASE WHEN rn <= 3 THEN o_orderpriority ELSE 'OTHER' END
      |         AS o_orderpriority,
      |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
      |       CAST(sum(sum_cents) AS BIGINT) AS sum_cents
      |FROM ranked
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q71 — TOLERANCE-BOUNDED AS-OF: every purchase joins to the latest
  //       same-user click, but only if it happened within the last 15
  //       minutes (the trades-to-quotes staleness guard). The oracle is
  //       an INDEPENDENT formulation — arg_max over an interval-bounded
  //       join — while the operator is the O(1)-per-row running window
  //       with a post-filter on the matched timestamp.
  // -------------------------------------------------------------------
  def q71(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("click_id"))
    sorted(Events.asofJoin(purchases, clicks, Seq("user_id"), "ts",
      payloadCols = Seq("click_id"), tolerance = Some("15 minutes")))
  }

  val q71Sql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, ts, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
      |), matched AS (
      |  SELECT p.event_id, arg_max(c.ts, c.ts) AS asof_ts,
      |         arg_max(c.click_id, c.ts) AS asof_click_id
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 15 MINUTE
      |  GROUP BY 1
      |)
      |SELECT p.event_id, p.user_id, p.ts, m.asof_ts, m.asof_click_id
      |FROM p LEFT JOIN matched m ON p.event_id = m.event_id
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q72 — SCD1 DIMENSION UPDATE end-to-end: save a customer star on the
  //       nation dimension, correct the dimension IN PLACE (merge the
  //       regions of nationkeys 0-9 into one 'MERGED' region —
  //       CubeIO.updateDimensionInStar, orphan-guarded), reload, and
  //       aggregate by the UPDATED region attribute. Oracle recomputes
  //       with the same CASE mapping from the raw tables — a stale or
  //       partially-written dimension fails the hash.
  // -------------------------------------------------------------------
  def q72(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{Dimension, Fact, Hierarchy}
    import graft.io.CubeIO
    val nation = s.read.parquet(s"$dir/nation.parquet")
    val region = s.read.parquet(s"$dir/region.parquet")
    val flat = nation.join(region, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nationkey"), col("n_name"), col("r_name"))
    def dimOf(d: DataFrame) = Dimension.build("nation", "nationkey",
      ListMap("geo" -> Hierarchy(
        "r_name" -> Seq.empty,
        "nationkey" -> Seq("n_name"))), d)
    val cube = DataCube.build(
      Fact.build(
        s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_nationkey").as("nationkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal"),
            lit(1L).as("one")),
        Seq("nationkey"),
        Seq(Measure.sum("bal", "bal_cents"), Measure.sum("one", "n_cust"))),
      Seq(dimOf(flat)))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q72_star_" +
      Integer.toHexString(dir.hashCode)
    // rebuild per call so bench reps don't double-apply the correction
    CubeIO.saveStar(cube, path)
    val corrected = flat.withColumn("r_name",
      when(col("nationkey") < 10, lit("MERGED")).otherwise(col("r_name")))
    CubeIO.updateDimensionInStar(s, path, "nation", corrected)
    sorted(CubeIO.loadStar(s, path).aggregate(Seq("r_name")).fact.data
      .select("r_name", "n_cust", "bal_cents"))
  }

  val q72Sql: String =
    """SELECT CASE WHEN n_nationkey < 10 THEN 'MERGED' ELSE r_name END
      |         AS r_name,
      |       CAST(count(*) AS BIGINT) AS n_cust,
      |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |         AS bal_cents
      |FROM customer
      |JOIN nation ON n_nationkey = c_nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q73 — MERGEABLE SKETCH CUBE: distinct customers per year answered
  //       from STORED per-(year, priority) HLL sketches by union
  //       (Sketches.distinctSketchAtGrain + rollupDistinct — the fact
  //       is scanned once for the sketch table, never for the rollup;
  //       COUNT DISTINCT is otherwise the one non-additive aggregate a
  //       cube can't roll up). Emits the exact count plus a 5% sketch
  //       verdict, q31-style; oracle = exact + verdict 1.
  // -------------------------------------------------------------------
  def q73(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    val sketches = Sketches.distinctSketchAtGrain(orders,
      Seq("o_year", "o_orderpriority"), "o_custkey")
    val approx = Sketches.rollupDistinct(sketches, Seq("o_year"),
      "o_custkey_sketch")
    val exact = orders.groupBy("o_year")
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
    sorted(exact.join(approx, Seq("o_year"))
      .select(col("o_year"), col("n_cust"),
        (abs(col("approx_distinct") - col("n_cust"))
          <= col("n_cust") * lit(0.05)).cast("int").as("approx_ok")))
  }

  val q73Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |       COUNT(DISTINCT o_custkey) AS n_cust,
      |       1 AS approx_ok
      |FROM orders GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q74 — RETENTION COHORTS: users grouped by first-event week, distinct
  //       active users per (cohort, week offset) — the growth triangle
  //       (Events.retentionCohorts: one user-keyed shuffle building first
  //       period + distinct-period set in the same agg, window only on
  //       the aggregated matrix). Exact counts, exact oracle.
  // -------------------------------------------------------------------
  def q74(s: SparkSession, dir: String): DataFrame =
    sorted(Events.retentionCohorts(events(s, dir)))

  val q74Sql: String =
    """WITH f AS (
      |  SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_period
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |m AS (
      |  -- both endpoints are week-truncated Mondays, so the day diff is an
      |  -- exact multiple of 7 and the division is exact in either engine
      |  SELECT cohort_period,
      |         CAST(date_diff('day', cohort_period, wk) / 7 AS INT)
      |           AS offset_periods,
      |         count(*) AS n_active
      |  FROM a JOIN f USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_period, offset_periods, n_active,
      |       CAST(max(CASE WHEN offset_periods = 0 THEN n_active END)
      |            OVER (PARTITION BY cohort_period) AS BIGINT) AS cohort_size
      |FROM m
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q75 — MERGEABLE HISTOGRAM CUBE: per-(event_type, month) equi-width
  //       value histograms (Sketches.histogramAtGrain — ONE grain-keyed
  //       shuffle, nBins conditional sums), merged to event_type by
  //       element-wise cell addition (rollupHistogram — fact never
  //       re-scanned), emitted as nonzero (type, bin, n) rows plus a
  //       histogram-median verdict (histogramQuantile within one bin
  //       width of the exact percentile, q73-style). Counts are exact —
  //       fixed bin edges make the cells mergeable by construction.
  // -------------------------------------------------------------------
  def q75(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = events(s, dir)
      .withColumn("month", date_trunc("month", col("ts")))
    val cells = Sketches.histogramAtGrain(ev, Seq("event_type", "month"),
      "value", lo = 0.0, width = 25.0, nBins = 20)
    val rolled = Sketches.rollupHistogram(cells, Seq("event_type"),
      "value_hist")
    val est = rolled.select(col("event_type"),
      Sketches.histogramQuantile(col("value_hist"), 0.0, 25.0, 0.5)
        .as("p50_est"))
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50_exact"))
    val verdict = est.join(exact, Seq("event_type"))
      .select(col("event_type"),
        (abs(col("p50_est") - col("p50_exact")) <= lit(25.0))
          .cast("int").as("p50_ok"))
    sorted(rolled
      .select(col("event_type"),
        posexplode(col("value_hist")).as(Seq("bin", "n")))
      .filter(col("n") > 0)
      .withColumn("bin", col("bin").cast("long"))
      .join(verdict, Seq("event_type")))
  }

  val q75Sql: String =
    """WITH b AS (
      |  SELECT event_type,
      |         LEAST(GREATEST(CAST(FLOOR(value / 25.0) AS INT), 0), 19) AS bin
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type, bin, count(*) AS n, 1 AS p50_ok
      |FROM b GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q76 — FREQUENT TERMS via sketch-prune + exact-verify: a Misra-Gries
  //       bounded-memory pass narrows the vocabulary to ≤ k candidates,
  //       a tiny exact pass confirms counts (Corpus.frequentTerms). With
  //       minShare > 1/(k+1) the result is EXACT and order-independent
  //       (MG guarantees zero false negatives at the threshold; the
  //       exact pass kills false positives) — so the oracle is a plain
  //       GROUP BY ... HAVING over the full vocabulary, which is
  //       precisely the unbounded-memory plan the operator avoids.
  // -------------------------------------------------------------------
  def q76(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Corpus
    sorted(Corpus.frequentTerms(docs(s, dir), "text"))
  }

  val q76Sql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |t2 AS (SELECT term FROM tok WHERE term <> ''),
      |tot AS (SELECT count(*) AS n FROM t2)
      |SELECT term, count(*) AS n_term
      |FROM t2, tot
      |GROUP BY term, tot.n
      |HAVING count(*) >= CEIL(tot.n * 0.00005)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q77 — DATA-QUALITY AUDIT: declarative constraint checks (Quality
  //       .audit) — completeness, key uniqueness, range, accepted
  //       values — ALL computed in one aggregation over one scan of
  //       orders (rules 3 and 4 differ only in bound so the report
  //       shows both a passing and a failing range rule). Exact counts;
  //       oracle = the same metrics as a UNION ALL of plain aggregates.
  // -------------------------------------------------------------------
  def q77(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quality
    import graft.operators.Quality._
    val orders = s.read.parquet(s"$dir/orders.parquet")
    sorted(Quality.audit(orders, Seq(
      NotNull("o_custkey"),
      Unique(Seq("o_orderkey")),
      InRange("o_totalprice", 0.0, 600000.0),
      InRange("o_totalprice", 0.0, 100000.0),
      AcceptedValues("o_orderpriority", Seq(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))))
  }

  val q77Sql: String =
    """SELECT 1 AS rule_no, 'not_null' AS rule, 'o_custkey' AS target,
      |       count(*) AS n_rows,
      |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS violations,
      |       CASE WHEN sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
      |            THEN 1 ELSE 0 END AS pass
      |FROM orders
      |UNION ALL
      |SELECT 2, 'unique', 'o_orderkey', count(*),
      |       CAST(count(CASE WHEN o_orderkey IS NOT NULL THEN 1 END)
      |            - count(DISTINCT o_orderkey) AS BIGINT),
      |       CASE WHEN count(CASE WHEN o_orderkey IS NOT NULL THEN 1 END)
      |                 = count(DISTINCT o_orderkey) THEN 1 ELSE 0 END
      |FROM orders
      |UNION ALL
      |SELECT 3, 'in_range', 'o_totalprice', count(*),
      |       CAST(sum(CASE WHEN o_totalprice IS NOT NULL
      |                     AND (o_totalprice < 0 OR o_totalprice > 600000)
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CASE WHEN sum(CASE WHEN o_totalprice IS NOT NULL
      |                     AND (o_totalprice < 0 OR o_totalprice > 600000)
      |                     THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END
      |FROM orders
      |UNION ALL
      |SELECT 4, 'in_range', 'o_totalprice', count(*),
      |       CAST(sum(CASE WHEN o_totalprice IS NOT NULL
      |                     AND (o_totalprice < 0 OR o_totalprice > 100000)
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CASE WHEN sum(CASE WHEN o_totalprice IS NOT NULL
      |                     AND (o_totalprice < 0 OR o_totalprice > 100000)
      |                     THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END
      |FROM orders
      |UNION ALL
      |SELECT 5, 'accepted_values', 'o_orderpriority', count(*),
      |       CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
      |                     AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
      |                       '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CASE WHEN sum(CASE WHEN o_orderpriority IS NOT NULL
      |                     AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
      |                       '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
      |                     THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END
      |FROM orders
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST, 6 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q78 — INCREMENTAL SKETCH-CUBE MAINTENANCE: a stored per-(year,
  //       priority) HLL cube built from history, then two delta ingests
  //       (one merging INTO existing year partitions, one opening new
  //       years) via Sketches.ingestSketchCube — only touched partitions
  //       rewritten, fact history never re-scanned. HLL union is
  //       lossless, so the maintained store answers the per-year
  //       distinct-customer rollup exactly as a from-scratch sketch
  //       would; emitted q73-style (exact + 5% sketch verdict).
  // -------------------------------------------------------------------
  def q78(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    val grain = Seq("o_year", "o_orderpriority")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q78_skcube_" +
      Integer.toHexString(dir.hashCode)
    // rebuild per call so bench reps don't re-merge the same deltas
    Sketches.saveSketchCube(
      orders.filter(col("o_orderdate") < "1996-07-01"),
      path, grain, "o_custkey", "o_year")
    Sketches.ingestSketchCube(s, path,
      orders.filter(col("o_orderdate") >= "1996-07-01" &&
        col("o_orderdate") < "1997-01-01"),
      grain, "o_custkey", "o_year")
    Sketches.ingestSketchCube(s, path,
      orders.filter(col("o_orderdate") >= "1997-01-01"),
      grain, "o_custkey", "o_year")
    val approx = Sketches.rollupDistinct(
      s.read.parquet(path), Seq("o_year"), "o_custkey_sketch")
    val exact = orders.groupBy("o_year")
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
    sorted(exact.join(approx, Seq("o_year"))
      .select(col("o_year"), col("n_cust"),
        (abs(col("approx_distinct") - col("n_cust"))
          <= col("n_cust") * lit(0.05)).cast("int").as("approx_ok")))
  }

  val q78Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |       COUNT(DISTINCT o_custkey) AS n_cust,
      |       1 AS approx_ok
      |FROM orders GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q79 — AGGREGATE NAVIGATOR (Kimball aggregate navigation): build two
  //       stored summaries of lineitem in ONE grouping-sets pass —
  //       (returnflag, linestatus, ship_year) and (returnflag,
  //       linestatus) — then answer a returnflag-only request. The
  //       navigator routes to the SMALLER covering summary (rf_ls) and
  //       re-aggregates its stored partials (sum of sums, sum of
  //       counts); the base fact is never rescanned (the scan-path pin
  //       lives in AggregateNavigatorSpec). The oracle recomputes from the raw table, and the
  //       routed_via literal pins the routing decision itself.
  // -------------------------------------------------------------------
  def q79(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator
    import graft.operators.AggregateNavigator.NavMeasure
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("ship_year", year(col("l_shipdate")))
    val measures = Seq(
      NavMeasure("sum", "l_quantity", "sum_qty"),
      NavMeasure("count", "*", "n_rows"),
      NavMeasure("min", "l_quantity", "min_qty"),
      NavMeasure("max", "l_quantity", "max_qty"))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q79_nav_" +
      Integer.toHexString(dir.hashCode)
    val sums = AggregateNavigator.buildSummaries(li, Seq(
      "rf_ls_year" -> Seq("l_returnflag", "l_linestatus", "ship_year"),
      "rf_ls" -> Seq("l_returnflag", "l_linestatus")),
      measures, root)
    val (ans, via) = AggregateNavigator.query(s, li, sums,
      Seq("l_returnflag"), measures)
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q79Sql: String =
    """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
      |       count(*) AS n_rows,
      |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |       'rf_ls' AS routed_via
      |FROM lineitem GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q80 — NAVIGATOR INCREMENTAL REFRESH end-to-end: summaries built
  //       from the pre-1996 fact only, then the 1996+ delta is folded
  //       in WITHOUT rescanning the base (one grouping-sets pass over
  //       the delta, cell-wise partial merge: sums/counts add, min/max
  //       take the extreme — q62's ingest doctrine applied to the
  //       summary store). The routed answer after refresh must equal
  //       the full-corpus oracle exactly — including 1996+ cells the
  //       build never saw.
  // -------------------------------------------------------------------
  def q80(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator
    import graft.operators.AggregateNavigator.NavMeasure
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("ship_year", year(col("l_shipdate")))
    val measures = Seq(
      NavMeasure("sum", "l_quantity", "sum_qty"),
      NavMeasure("count", "*", "n_rows"),
      NavMeasure("max", "l_extendedprice", "max_price"))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q80_nav_" +
      Integer.toHexString(dir.hashCode)
    AggregateNavigator.buildSummaries(li.filter(col("ship_year") < 1996),
      Seq(
        "rf_ls_year" -> Seq("l_returnflag", "l_linestatus", "ship_year"),
        "rf_ls" -> Seq("l_returnflag", "l_linestatus")),
      measures, root)
    val refreshed = AggregateNavigator.refreshSummaries(
      li.filter(col("ship_year") >= 1996), root)
    val (ans, via) = AggregateNavigator.query(s, li, refreshed,
      Seq("l_returnflag", "l_linestatus"), measures)
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q80Sql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |       count(*) AS n_rows, max(l_extendedprice) AS max_price,
      |       'rf_ls' AS routed_via
      |FROM lineitem GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q81 — CUBE-SURFACE aggregate navigation: the TPC-H cube declares two
  //       stored summaries over its hierarchy attributes (segment ×
  //       year × region, segment × year) — built in one grouping-sets
  //       pass over the denormalized fact — then an attribute-grain
  //       request for segment alone routes to the SMALLER covering
  //       summary and re-aggregates its stored partials. Since the cube
  //       fact is itself pre-aggregated to grain, a summary is just a
  //       coarser stored grain: sum-of-sums keeps the reference's
  //       "re-aggregate from the stored grain" contract intact. The
  //       request also carries an equality filter on d_year — routing
  //       requires the grain to keep the filtered column, and the
  //       filter prunes summary partials BEFORE re-aggregation (the
  //       filtered-report pattern). The oracle recomputes from the raw
  //       star with the same WHERE; routed_via pins routing.
  // -------------------------------------------------------------------
  def q81(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator.NavMeasure
    val c = graft.builders.Tpch.cube(s, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q81_nav_" +
      Integer.toHexString(dir.hashCode)
    c.summarize(root, Seq(
      "seg_year_region" -> Seq("c_mktsegment", "d_year", "r_name"),
      "seg_year" -> Seq("c_mktsegment", "d_year")),
      Seq(NavMeasure("sum", "sum_qty", "sum_qty"),
        NavMeasure("sum", "n", "n")))
    val (ans, via) = c.aggregateRouted(Seq("c_mktsegment"), root,
      filters = Map("d_year" -> Seq(1994, 1995, 1996)))
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q81Sql: String =
    """SELECT c_mktsegment, SUM(l_quantity) AS sum_qty, COUNT(*) AS n,
      |       'seg_year' AS routed_via
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |WHERE year(l_shipdate) IN (1994, 1995, 1996)
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q82 — ROUTED ROLLUP: a subtotal report (segment × year ROLLUP with
  //       the level contract) answered entirely from the stored
  //       seg×year summary — the Expand runs over ~35 partial rows
  //       instead of the fact, sum-of-sums per grouping set. The
  //       100 TB shape this exercises: subtotal dashboards never touch
  //       the fact once the summary exists. Oracle: DuckDB ROLLUP over
  //       the raw star (q06's shape), routing pinned as a literal.
  // -------------------------------------------------------------------
  def q82(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator.NavMeasure
    val c = graft.builders.Tpch.cube(s, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q82_nav_" +
      Integer.toHexString(dir.hashCode)
    c.summarize(root, Seq(
      "seg_year" -> Seq("c_mktsegment", "d_year")),
      Seq(NavMeasure("sum", "sum_qty", "sum_qty"),
        NavMeasure("sum", "n", "n")))
    val (ans, via) = c.rollupRoutedFlat(Seq("c_mktsegment", "d_year"), root)
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q82Sql: String =
    """SELECT c_mktsegment, CAST(year(l_shipdate) AS INT) AS d_year,
      |       SUM(l_quantity) AS sum_qty, COUNT(*) AS n,
      |       CAST(GROUPING(c_mktsegment) + GROUPING(year(l_shipdate)) AS INT)
      |         AS level,
      |       'seg_year' AS routed_via
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |GROUP BY ROLLUP(c_mktsegment, year(l_shipdate))
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q83 — N-GRAM LM QUALITY SCORE (the perplexity filter): add-one-
  //       smoothed bigram model trained on the corpus itself, each doc
  //       scored by mean -log2 P(w2|w1). Bigrams come from a per-row
  //       zip of the token array with its own tail (no self-join); the
  //       model is two count aggregations; scoring is one shuffle join
  //       on the bigram key. The 4-decimal rounding makes the float
  //       mean hash-stable against summation-order drift.
  // -------------------------------------------------------------------
  def q83(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Corpus
    sorted(Corpus.lmScore(docs(s, dir), "doc_id", "text"))
  }

  val q83Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     w -> w <> '') AS t
      |  FROM documents
      |), tok AS (
      |  SELECT unnest(t) AS w FROM toks
      |), uni AS (
      |  SELECT w, count(*) AS cw FROM tok GROUP BY 1
      |), v AS (
      |  SELECT count(DISTINCT w) AS v FROM tok
      |), bg AS (
      |  SELECT doc_id, t[g.i] AS w1, t[g.i+1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
      |  WHERE len(t) >= 2
      |), bgc AS (
      |  SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2
      |), scored AS (
      |  SELECT bg.doc_id,
      |         -log2((bgc.cbg + 1.0) / (uni.cw + v.v)) AS nll
      |  FROM bg
      |  JOIN bgc USING (w1, w2)
      |  JOIN uni ON uni.w = bg.w1
      |  CROSS JOIN v
      |)
      |SELECT doc_id, count(*) AS n_bigrams, round(avg(nll), 4) AS nll
      |FROM scored GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q84 — STREAMING NAVIGATOR end-to-end (readStream → journaled
  //       refresh → routed query): the store starts as a declaration-
  //       only (empty) build, the fact arrives as a TWO-micro-batch
  //       file stream (maxFilesPerTrigger=1), each batch folds in via
  //       the journaled refresh (at-least-once replay safe), and the
  //       routed answer after the stream drains must equal the
  //       full-corpus oracle. The whole round trip — parquet stream
  //       source, foreachBatch, two-rename store swap, manifest reload,
  //       smallest-grain routing — sits under one DuckDB hash check.
  //       Work dirs are wiped per call: the refresh journal MUST reset
  //       with its store or bench reps would replay-skip real batches.
  // -------------------------------------------------------------------
  def q84(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator
    import graft.operators.AggregateNavigator.NavMeasure
    import org.apache.spark.sql.streaming.Trigger
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("ship_year", year(col("l_shipdate")))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_q84_nav_" +
      Integer.toHexString(dir.hashCode)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val measures = Seq(
      NavMeasure("sum", "l_quantity", "sum_qty"),
      NavMeasure("count", "*", "n_rows"))
    AggregateNavigator.buildSummaries(li.filter(lit(false)), Seq(
      "rf_ls_year" -> Seq("l_returnflag", "l_linestatus", "ship_year"),
      "rf_ls" -> Seq("l_returnflag", "l_linestatus")),
      measures, s"$base/store")
    li.filter(col("ship_year") < 1996).coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    li.filter(col("ship_year") >= 1996).coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    val stream = s.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = graft.streaming.CubeStreaming.startRefreshSummaries(
      stream, s"$base/store", s"$base/ckpt", Trigger.AvailableNow())
    q.awaitTermination(120000)
    val (sums, ms) = AggregateNavigator.loadStore(s, s"$base/store")
    val (ans, via) = AggregateNavigator.query(s, li, sums,
      Seq("l_returnflag", "l_linestatus"), ms)
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q84Sql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |       count(*) AS n_rows, 'rf_ls' AS routed_via
      |FROM lineitem GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q91 — PRODUCT QUANTIZATION verdict (q31/q50 doctrine — the op is
  //       approximate and not SQL-expressible, so the hash-checked
  //       columns are the deterministic shape plus a robust-margin
  //       verdict): train 4×16-centroid codebooks on the fixture
  //       embeddings (dim 64 → 16 ints per vector, 16× compression),
  //       encode, and require that for ≥ 90% of 20 planted perturbed
  //       queries the source vector surfaces in the PQ top-5 by
  //       asymmetric distance.
  // -------------------------------------------------------------------
  def q91(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Similarity
    val e = emb(s, dir).select("vec_id", "embedding")
    val srcs = e.filter(col("vec_id") % 25 === 0).limit(20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qrnd = new scala.util.Random(11)
    val queries = srcs.toSeq.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * qrnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val model = Similarity.trainPq(e, m = 16, ksub = 16, iters = 3)
    val codes = Similarity.pqEncode(e, model)
    val top = Similarity.pqKnn(queries, codes, model, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = srcs.count { case (id, _) =>
      top.getOrElse(id + 100000L, Set.empty[Long]).contains(id) }
    Seq((srcs.length.toLong, if (hits >= 18) 1 else 0))
      .toDF("n_queries", "recall_ok")
  }

  val q91Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_queries, 1 AS recall_ok"""

  // -------------------------------------------------------------------
  // q93 — LEARNED QUALITY CLASSIFIER verdict: the CCNet/fastText-style
  //       filter — hashed-BoW logistic regression trained to separate
  //       the fixture corpus ("curated") from deterministic id-salted
  //       gibberish ("crawl garbage"), evaluated on a held-out split.
  //       LBFGS coefficients carry fp summation noise, so the
  //       hash-checked columns are the deterministic test size plus a
  //       wide-margin accuracy verdict (q31/q50 doctrine).
  // -------------------------------------------------------------------
  def q93(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Quality
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    // garbage shares a 200-token vocabulary (id-arithmetic draw), so the
    // held-out half is IN-vocabulary — a per-doc-unique salt would make
    // every test token OOV and the verdict would measure the prior
    val garbage = d.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit("gk_"),
          pmod(col("doc_id") * 7 + lit(i * 13), lit(200)))): _*).as("text"))
    val all = d.withColumn("label", lit(1))
      .unionByName(garbage.withColumn("label", lit(0)))
    val train = all.filter(pmod(col("doc_id"), lit(2)) === 0)
    val test = all.filter(pmod(col("doc_id"), lit(2)) === 1)
    val model = Quality.trainQualityClassifier(train, "text", "label",
      numFeatures = 1 << 16, maxIter = 10)
    val scored = Quality.scoreQuality(model, test, "doc_id", "text")
      .join(test.select("doc_id", "label"), "doc_id")
    val row = scored.agg(count(lit(1)).as("n"),
      sum(when((col("quality") >= 0.5).cast("int") === col("label"), 1L)
        .otherwise(0L)).as("correct")).head()
    val (n, correct) = (row.getLong(0), row.getLong(1))
    Seq((n, if (correct >= (n * 0.95).toLong) 1 else 0))
      .toDF("n_test", "acc_ok")
  }

  val q93Sql: String =
    """SELECT CAST((SELECT count(*) FROM documents WHERE doc_id % 2 = 1)
      |          + (SELECT count(*) FROM documents WHERE (doc_id + 100000) % 2 = 1)
      |        AS BIGINT) AS n_test,
      |       1 AS acc_ok""".stripMargin

  // -------------------------------------------------------------------
  // q92 — IVF-PQ SERVING verdict: q91's planted-perturbation check
  //       routed through the PERSISTED compressed index (cells × codes
  //       on disk, no raw vectors) and the static-pruned probe — the
  //       whole save → reload → probe round trip sits under the
  //       verdict. nprobe=8 of nlist=8 keeps the planted cell surely
  //       probed at fixture scale; the compression/pruning contracts
  //       are PipelineOpsSpec's job.
  // -------------------------------------------------------------------
  def q92(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Similarity
    val e = emb(s, dir).select("vec_id", "embedding")
    val srcs = e.filter(col("vec_id") % 25 === 0).limit(20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qrnd = new scala.util.Random(13)
    val queries = srcs.toSeq.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * qrnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q92_ivfpq_" +
      Integer.toHexString(dir.hashCode)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    Similarity.saveIvfPqIndex(e, root, nlist = 8, m = 16, ksub = 16,
      kmeansIters = 2, pqIters = 2, replicate = 2)
    val top = Similarity.ivfPqKnnStored(s, root, queries, k = 5, nprobe = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = srcs.count { case (id, _) =>
      top.getOrElse(id + 100000L, Set.empty[Long]).contains(id) }
    Seq((srcs.length.toLong, if (hits >= 18) 1 else 0))
      .toDF("n_queries", "recall_ok")
  }

  val q92Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_queries, 1 AS recall_ok"""

  // -------------------------------------------------------------------
  // q113 — IVF-PQ WITH EXACT RE-RANKING (the FAISS refine pattern over
  //        q92's index): the compressed index nominates k×refine ADC
  //        candidates, exact cosine against the raw vector table
  //        re-ranks them. Verdict pins (a) refined recall over the
  //        perturbed-query self-retrieval harness and (b) refinement
  //        never losing a hit the unrefined probe found (the candidate
  //        superset argument made empirical).
  // -------------------------------------------------------------------
  def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Similarity
    val e = emb(s, dir).select("vec_id", "embedding")
    val srcs = e.filter(col("vec_id") % 25 === 0).limit(20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qrnd = new scala.util.Random(13)
    val queries = srcs.toSeq.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * qrnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q113_refine_" +
      Integer.toHexString(dir.hashCode)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    Similarity.saveIvfPqIndex(e, root, nlist = 8, m = 16, ksub = 16,
      kmeansIters = 2, pqIters = 2, replicate = 2)
    def hitsOf(df: org.apache.spark.sql.DataFrame): Int = {
      val top = df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      srcs.count { case (id, _) =>
        top.getOrElse(id + 100000L, Set.empty[Long]).contains(id) }
    }
    val plain = hitsOf(
      Similarity.ivfPqKnnStored(s, root, queries, k = 5, nprobe = 8))
    val refined = hitsOf(
      Similarity.ivfPqKnnRefined(s, root, queries, e, k = 5, refine = 4,
        nprobe = 8))
    Seq((srcs.length.toLong, if (refined >= 18) 1 else 0,
      if (refined >= plain) 1 else 0))
      .toDF("n_queries", "recall_ok", "no_regression")
  }

  val q113Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_queries, 1 AS recall_ok,
      |       1 AS no_regression""".stripMargin

  // -------------------------------------------------------------------
  // q90 — per-source duplication report: the corpus-quality summary
  //       (how much of each source is near-dup mass) composed from the
  //       shared shingle index → LSH pairs → transitive closure, joined
  //       back per source — counts are exact integers, the share is a
  //       rounded ratio; oracle recomputes the closure with q34's
  //       recursive CTE and aggregates per source.
  // -------------------------------------------------------------------
  def q90(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(Dedup.dedupReport(d,
      Dedup.minhashLsh(d, "doc_id", "text", n = 3, k = 32, bands = 8,
        threshold = 0.8, maxDf = None, shinglesDf = Some(shingles3(s, dir))),
      "doc_id", "source"))
  }

  val q90Sql: String = {
    val cte = shingleCteWith(Some(Dedup.DefaultMaxDf))
      .replaceFirst("WITH ", "WITH RECURSIVE ")
    cte + """, jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a
      |)
      |SELECT d.source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN c.component IS NOT NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_clustered,
      |       CAST(sum(CASE WHEN c.component IS NOT NULL
      |                 AND d.doc_id <> c.component THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_dropped,
      |       round(sum(CASE WHEN c.component IS NOT NULL
      |                       AND d.doc_id <> c.component THEN 1 ELSE 0 END)
      |             * 1.0 / count(*), 6) AS dup_share
      |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q89 — INCREMENTAL BM25: the store is built from the first half of
  //       the corpus, the second half folds in as an append-only batch
  //       (existing postings never read or rewritten; overlapping ids
  //       fail fast), and the probe — query terms pushed into the
  //       postings scan as literals, df/idf derived from the matched
  //       rows — must rank EXACTLY like a from-scratch index over the
  //       full corpus: the oracle is the same full-corpus BM25 SQL as
  //       q85 (the q55 ≡-plain-anti-join doctrine applied to search).
  // -------------------------------------------------------------------
  def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Corpus
    val d = docs(s, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q89_bm25_" +
      Integer.toHexString(dir.hashCode)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    Corpus.saveBm25Store(d.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", root)
    Corpus.refreshBm25Store(d.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", root)
    val qs = q85Queries.toDF("query_id", "qtext")
    sorted(Corpus.bm25SearchStored(s, root, qs, "query_id", "qtext", k = 10))
  }

  // def, not val: q85Sql is defined LATER in the file — a val here would
  // capture null during object init and silently vanish from oracleSql
  def q89Sql: String = q85Sql

  // -------------------------------------------------------------------
  // q88 — SLIDING-WINDOW DISTINCT from stored sketches: rolling 7-day
  //       distinct users per day, answered from per-day HLL cells (one
  //       event scan ever; each cell feeds ≤ 7 window ends via a
  //       bounded explode — overlapping windows are exactly where
  //       mergeable sketches beat re-aggregation, and windowed COUNT
  //       DISTINCT cannot be decomposed at all). q31/q73 verdict
  //       pattern: the hash-checked columns are the EXACT rolling
  //       counts plus a within-5% verdict on the sketch estimate.
  // -------------------------------------------------------------------
  def q88(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = events(s, dir).withColumn("day", to_date(col("ts")))
    val cells = Sketches.distinctSketchAtGrain(ev, Seq("day"), "user_id")
    val approx = Sketches.slidingDistinct(cells, "day", width = 7,
      "user_id_sketch")
    // exact twin for the verdict: same bounded contribution explode over
    // per-day DISTINCT (day, user) pairs — linear, never a self-join
    val du = ev.select(col("day"), col("user_id")).distinct()
    val ends = du.select(col("day").as("window_end")).distinct()
    val exact = du
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), 6))).as("window_end"))
      .join(ends, "window_end")
      .groupBy("window_end")
      .agg(countDistinct(col("user_id")).as("n_users"))
    sorted(exact.join(approx, Seq("window_end"))
      .select(col("window_end"), col("n_users"),
        (abs(col("approx_distinct") - col("n_users"))
          <= col("n_users") * lit(0.05)).cast("int").as("approx_ok")))
  }

  val q88Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |), ends AS (
      |  SELECT DISTINCT day AS window_end FROM du
      |)
      |SELECT e.window_end, COUNT(DISTINCT du.user_id) AS n_users,
      |       1 AS approx_ok
      |FROM ends e
      |JOIN du ON du.day BETWEEN e.window_end - INTERVAL 6 DAY
      |                      AND e.window_end
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q87 — RANGE-ROUTED navigation: the time-sliced dashboard panel
  //       (d_year >= 1995) answered from the stored seg×year summary —
  //       a range predicate routes exactly like equality because a
  //       summary row is the complete partial of its grain cell, so any
  //       row-level predicate over kept grain columns selects whole
  //       cells. Routing (smaller covering summary) pinned as a
  //       literal; oracle recomputes from the raw star with the same
  //       WHERE.
  // -------------------------------------------------------------------
  def q87(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator.{NavMeasure, NavPred}
    val c = graft.builders.Tpch.cube(s, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q87_nav_" +
      Integer.toHexString(dir.hashCode)
    c.summarize(root, Seq(
      "seg_year_region" -> Seq("c_mktsegment", "d_year", "r_name"),
      "seg_year" -> Seq("c_mktsegment", "d_year")),
      Seq(NavMeasure("sum", "sum_qty", "sum_qty"),
        NavMeasure("sum", "n", "n")))
    val (ans, via) = c.aggregateRoutedWhere(Seq("c_mktsegment"), root,
      Seq(NavPred.range("d_year", lo = Some(1995))))
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q87Sql: String =
    """SELECT c_mktsegment, SUM(l_quantity) AS sum_qty, COUNT(*) AS n,
      |       'seg_year' AS routed_via
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |WHERE year(l_shipdate) >= 1995
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q86 — heavy-hitters sketch cube: per-(source,lang) Misra-Gries term
  //       summaries (ONE token scan, bounded cells), rolled up to
  //       top-5 terms per source FROM THE STORED CELLS — the frequent-
  //       items member of the sketch-cube family (q73 = HLL distinct,
  //       q75 = histogram). k=4096 exceeds the fixture vocabulary, so
  //       the cells are exact and the rollup is the deterministic exact
  //       top-5 the DuckDB oracle computes; the max_undercount column
  //       (Σ n_items/(k+1)) is the error bound a production k carries.
  // -------------------------------------------------------------------
  private val Q86K = 4096

  def q86(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val tok = docs(s, dir).select(col("source"), col("lang"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val cells = Sketches.termSummaryAtGrain(
      tok, Seq("source", "lang"), "term", k = Q86K)
    sorted(Sketches.rollupHeavyHitters(
      cells, Seq("source"), "term_mg", k = Q86K, topK = 5))
  }

  val q86Sql: String =
    s"""WITH tok AS (
      |  SELECT source, lang,
      |         unnest(string_split_regex(trim(text), '\\s+')) AS term
      |  FROM documents
      |), t AS (
      |  SELECT source, term, count(*) AS est_count FROM tok
      |  WHERE term <> '' GROUP BY 1, 2
      |), n AS (
      |  SELECT source, CAST(floor(count(*) / ${Q86K + 1}.0) AS BIGINT)
      |           AS max_undercount
      |  FROM tok WHERE term <> '' GROUP BY 1
      |), ranked AS (
      |  SELECT source, term, est_count,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY est_count DESC, term ASC) AS rnk
      |  FROM t
      |)
      |SELECT r.source, r.term, r.est_count, CAST(r.rnk AS INT) AS rank,
      |       n.max_undercount
      |FROM ranked r JOIN n USING (source)
      |WHERE r.rnk <= 5
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q85 — BM25 ranked retrieval: top-10 docs for 3 fixed queries over a
  //       prebuilt impact-ordered postings index (weights precomputed at
  //       build, query time = broadcast term join + sum + bounded
  //       top-k). Scores rounded to 4 decimals BEFORE ranking so
  //       cross-engine ln()/summation-order drift cannot flip a rank.
  // -------------------------------------------------------------------
  // each query carries plain AND "_0"-suffixed variants of its terms:
  // absent terms fall out of the inner postings join, so at sf the plain
  // forms match and at the 8x validation scale (where make_bigsf.py
  // replica-suffixes every token) the _0 forms match replica 0 — the
  // same literal query set is non-vacuous at both scales
  private val q85Queries: Seq[(Long, String)] = Seq(
    (1L, "spark table scan spark_0 table_0 scan_0"),
    (2L, "customer order value merge customer_0 order_0 value_0 merge_0"),
    (3L, "window agg stream batch sort window_0 agg_0 stream_0 batch_0 sort_0"))

  def q85(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = q85Queries.toDF("query_id", "qtext")
    sorted(graft.operators.Corpus.bm25Search(
      graft.operators.Corpus.bm25Index(docs(s, dir), "doc_id", "text"),
      qs, "query_id", "qtext", k = 10))
  }

  val q85Sql: String = {
    val values = q85Queries
      .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""WITH q(query_id, qtext) AS (VALUES $values),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term <> '' GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
      |), stats AS (
      |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), qt AS (
      |  SELECT DISTINCT query_id, term FROM (
      |    SELECT query_id,
      |           unnest(string_split_regex(trim(qtext), '\\s+')) AS term
      |    FROM q) WHERE term <> ''
      |), scored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         round(sum(
      |           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
      |           * (tf.tf * (1.2 + 1))
      |           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
      |         ), 4) AS score
      |  FROM qt
      |  JOIN tf USING (term)
      |  JOIN dfreq USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT query_id, doc_id, score,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY score DESC, doc_id ASC) AS rnk
      |  FROM scored
      |)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
      |       CAST(rnk AS INT) AS rank, score
      |FROM ranked WHERE rnk <= 10
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q94 — FUZZY STRING JOIN: all pairs of distinct 16-char document
  //       prefixes within Levenshtein distance 3. Candidates come from
  //       rarest-first q-gram prefix filtering (equi-join on single
  //       grams, provably recall-1 — FuzzyJoin scaladoc), verified by
  //       the codegen'd early-exit levenshtein builtin. Distinct keys
  //       by contract: identical-key multiplicity is exact dedup's job
  //       and would be the only quadratic term. Oracle: DuckDB's
  //       levenshtein over the distinct-key cross join.
  // -------------------------------------------------------------------
  def q94(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.FuzzyJoin
    val keys = docs(s, dir).select(substring(col("text"), 1, 16).as("k"))
    sorted(FuzzyJoin.pairsWithinDistance(keys, "k", maxDist = 3))
  }

  val q94Sql: String =
    """WITH k AS (
      |  SELECT DISTINCT substr(text, 1, 16) AS k FROM documents
      |)
      |SELECT a.k AS a, b.k AS b,
      |       CAST(levenshtein(a.k, b.k) AS INT) AS dist
      |FROM k a JOIN k b ON a.k < b.k
      |WHERE levenshtein(a.k, b.k) <= 3
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q95 — ENTITY RESOLUTION: planted-twin record linkage over customers.
  //       Base records are custkey%4==0 (id = custkey*4); %20==0 plants
  //       a DIRTY twin (name with its 10th character dropped — edit
  //       distance 1, id = custkey*4+1, lost balance), %20==8 plants an
  //       EXACT twin (same name, id = custkey*4+2). resolve() blocks on
  //       nation, fuzzy-matches names at distance ≤ 1, transitively
  //       closes (star + representative edges — linear, never
  //       member×member), labels entities by min id; golden records are
  //       one groupBy. Oracle: same construction, exact levenshtein
  //       pairs within nation, recursive-CTE closure.
  // -------------------------------------------------------------------
  def q95(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.EntityResolution
    val c = s.read.parquet(s"$dir/customer.parquet")
    val base = c.filter(col("c_custkey") % 4 === 0)
      .select((col("c_custkey") * 4).as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("nk"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val dirty = c.filter(col("c_custkey") % 20 === 0)
      .select((col("c_custkey") * 4 + 1).as("rid"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 99))
          .as("name"),
        col("c_nationkey").as("nk"), lit(null).cast("decimal(12,2)").as("bal"))
    val exact = c.filter(col("c_custkey") % 20 === 8)
      .select((col("c_custkey") * 4 + 2).as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("nk"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val records = base.unionByName(dirty).unionByName(exact)
    val resolved = EntityResolution.resolve(records, "rid", "name", "nk",
      maxDist = 1)
    sorted(resolved.groupBy("entity_id").agg(
      count(lit(1)).as("n_records"),
      min(col("name")).as("name_canon"),
      sum(col("bal")).cast("double").as("bal_sum")))
  }

  val q95Sql: String =
    """WITH RECURSIVE base AS (
      |  SELECT c_custkey*4 AS rid, c_name AS name, c_nationkey AS nk,
      |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE c_custkey % 4 = 0
      |  UNION ALL
      |  SELECT c_custkey*4+1, substr(c_name,1,9) || substr(c_name,11),
      |         c_nationkey, NULL
      |  FROM customer WHERE c_custkey % 20 = 0
      |  UNION ALL
      |  SELECT c_custkey*4+2, c_name, c_nationkey,
      |         CAST(c_acctbal AS DECIMAL(12,2))
      |  FROM customer WHERE c_custkey % 20 = 8
      |), pairs AS (
      |  SELECT a.rid i, b.rid j FROM base a JOIN base b
      |  ON a.nk = b.nk AND a.rid < b.rid
      |  WHERE levenshtein(a.name, b.name) <= 1
      |), edges AS (
      |  SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS rid, least(a, min(b)) AS comp FROM reach GROUP BY a
      |), lab AS (
      |  SELECT base.rid, coalesce(comp.comp, base.rid) AS entity_id,
      |         base.name, base.bal
      |  FROM base LEFT JOIN comp ON comp.rid = base.rid
      |)
      |SELECT entity_id, count(*) AS n_records, min(name) AS name_canon,
      |       CAST(sum(bal) AS DOUBLE) AS bal_sum
      |FROM lab GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q96 — K-MEANS VERDICT: train spherical k-means on the embeddings
  //       (deterministic id-hash seeds, 3 Lloyd rounds) and check the
  //       algorithm's defining invariants Spark-side — Lloyd's
  //       objective (inertia) is non-increasing vs the seed centroids,
  //       and every row lands in a valid cell. The oracle regenerates
  //       the DuckDB-computable columns (row count, k) and the
  //       construction-true verdicts (q93's verdict pattern — cluster
  //       GEOMETRY is pinned by ClusteringSpec's planted-blob fixture,
  //       not SQL-expressible).
  // -------------------------------------------------------------------
  def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Clustering
    val e = emb(s, dir).select("vec_id", "embedding")
    val k = 12
    val seeds = Clustering.train(e, k, iters = 0)
    val trained = Clustering.train(e, k, iters = 3)
    val i0 = Clustering.inertia(e, seeds)
    val i3 = Clustering.inertia(e, trained)
    val a = Clustering.assign(e, trained)
      .agg(count(lit(1)).as("n"),
        sum(when(col("cluster") >= 0 && col("cluster") < k, 0)
          .otherwise(1)).as("bad"))
      .head()
    Seq((a.getLong(0), k, if (i3 <= i0 + 1e-9) 1 else 0,
      if (a.getLong(1) == 0L) 1 else 0))
      .toDF("n_points", "k", "lloyd_ok", "assign_ok")
  }

  val q96Sql: String =
    """SELECT count(*) AS n_points, 12 AS k, 1 AS lloyd_ok, 1 AS assign_ok
      |FROM embeddings""".stripMargin

  // -------------------------------------------------------------------
  // q97 — DIVERSITY (cluster-balanced) SAMPLING, membership-exact: at
  //       most 20 rows per cluster chosen by ascending (md5-derived
  //       hash, id). The cluster key here is construction-derived
  //       (vec_id % 12) so the ORACLE CHECKS MEMBERSHIP itself — the
  //       same hash arithmetic and (hash-as-double, id) order in DuckDB
  //       (q35's membership-exact pattern); pairing with trained
  //       k-means clusters is ClusteringSpec's job. The selection is
  //       the bounded top-k aggregation — never a data-sized window.
  // -------------------------------------------------------------------
  def q97(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val e = emb(s, dir).withColumn("cluster", pmod(col("vec_id"), lit(12)))
    sorted(Sampling.diversitySample(e, "vec_id", "cluster", quota = 20)
      .select("cluster", "vec_id"))
  }

  val q97Sql: String =
    """WITH a AS (
      |  SELECT vec_id, vec_id % 12 AS cluster,
      |         CAST(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
      |              AS BIGINT) AS DOUBLE) AS h
      |  FROM embeddings
      |), r AS (
      |  SELECT cluster, vec_id,
      |         row_number() OVER (PARTITION BY cluster
      |                            ORDER BY h ASC, vec_id ASC) AS rn
      |  FROM a
      |)
      |SELECT cluster, vec_id FROM r WHERE rn <= 20
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q98 — INCREMENTAL ENTITY RESOLUTION (the q58/q59 doctrine applied
  //       to record linkage): resolve a stored customer corpus once
  //       (q95's base construction), then label a DELTA against the
  //       frozen labels — %20==0 plants a dirty twin (adopts by fuzzy
  //       match), %20==8 an exact twin (adopts), %20==12 two "X-"-
  //       prefixed records (2 edits from every stored name — a NEW
  //       entity, the within-delta twins collapsing to the min id).
  //       Corpus keys are bucketed and scanned, never paired among
  //       themselves; the closure runs on delta-sized node sets.
  //       Oracle: both closures as recursive CTEs + per-component
  //       adoption minimum.
  // -------------------------------------------------------------------
  def q98(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.EntityResolution
    val c = s.read.parquet(s"$dir/customer.parquet")
    val base = c.filter(col("c_custkey") % 4 === 0)
      .select((col("c_custkey") * 4).as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("nk"))
    val stored = EntityResolution.resolve(base, "rid", "name", "nk",
      maxDist = 1)
    val delta = c.filter(col("c_custkey") % 20 === 0)
      .select((col("c_custkey") * 4 + 1).as("rid"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 99))
          .as("name"),
        col("c_nationkey").as("nk"))
      .unionByName(c.filter(col("c_custkey") % 20 === 8)
        .select((col("c_custkey") * 4 + 2).as("rid"), col("c_name").as("name"),
          col("c_nationkey").as("nk")))
      .unionByName(c.filter(col("c_custkey") % 20 === 12)
        .select(explode(array(col("c_custkey") * 4 + 1,
          col("c_custkey") * 4 + 2)).as("rid"),
          concat(lit("X-"), col("c_name")).as("name"),
          col("c_nationkey").as("nk")))
    sorted(EntityResolution.resolveDelta(stored, delta, "rid", "name", "nk",
      maxDist = 1).select("rid", "entity_id"))
  }

  val q98Sql: String =
    """WITH RECURSIVE base AS (
      |  SELECT c_custkey*4 AS rid, c_name AS name, c_nationkey AS nk
      |  FROM customer WHERE c_custkey % 4 = 0
      |), bpairs AS (
      |  SELECT a.rid i, b.rid j FROM base a JOIN base b
      |  ON a.nk = b.nk AND a.rid < b.rid
      |  WHERE levenshtein(a.name, b.name) <= 1
      |), bedges AS (
      |  SELECT i AS a, j AS b FROM bpairs UNION SELECT j, i FROM bpairs
      |), breach(a, b) AS (
      |  SELECT a, b FROM bedges
      |  UNION
      |  SELECT r.a, e.b FROM breach r JOIN bedges e ON r.b = e.a
      |), bcomp AS (
      |  SELECT a AS rid, least(a, min(b)) AS comp FROM breach GROUP BY a
      |), blab AS (
      |  SELECT base.rid, coalesce(bcomp.comp, base.rid) AS entity_id,
      |         base.name, base.nk
      |  FROM base LEFT JOIN bcomp ON bcomp.rid = base.rid
      |), delta AS (
      |  SELECT c_custkey*4+1 AS rid,
      |         substr(c_name,1,9) || substr(c_name,11) AS name,
      |         c_nationkey AS nk
      |  FROM customer WHERE c_custkey % 20 = 0
      |  UNION ALL
      |  SELECT c_custkey*4+2, c_name, c_nationkey
      |  FROM customer WHERE c_custkey % 20 = 8
      |  UNION ALL
      |  SELECT c_custkey*4+1, 'X-' || c_name, c_nationkey
      |  FROM customer WHERE c_custkey % 20 = 12
      |  UNION ALL
      |  SELECT c_custkey*4+2, 'X-' || c_name, c_nationkey
      |  FROM customer WHERE c_custkey % 20 = 12
      |), dpairs AS (
      |  SELECT a.rid i, b.rid j FROM delta a JOIN delta b
      |  ON a.nk = b.nk AND a.rid < b.rid
      |  WHERE levenshtein(a.name, b.name) <= 1
      |), dedges AS (
      |  SELECT i AS a, j AS b FROM dpairs UNION SELECT j, i FROM dpairs
      |), dreach(a, b) AS (
      |  SELECT a, b FROM dedges
      |  UNION
      |  SELECT r.a, e.b FROM dreach r JOIN dedges e ON r.b = e.a
      |), dcomp AS (
      |  SELECT a AS rid, least(a, min(b)) AS comp FROM dreach GROUP BY a
      |), dlab AS (
      |  SELECT delta.rid, coalesce(dcomp.comp, delta.rid) AS comp
      |  FROM delta LEFT JOIN dcomp ON dcomp.rid = delta.rid
      |), adopt AS (
      |  SELECT d.rid, min(bl.entity_id) AS ad
      |  FROM delta d JOIN blab bl
      |  ON bl.nk = d.nk AND levenshtein(bl.name, d.name) <= 1
      |  GROUP BY 1
      |), capt AS (
      |  SELECT dlab.comp, min(adopt.ad) AS ca
      |  FROM dlab LEFT JOIN adopt ON adopt.rid = dlab.rid
      |  GROUP BY 1
      |)
      |SELECT dlab.rid, coalesce(capt.ca, dlab.comp) AS entity_id
      |FROM dlab JOIN capt ON capt.comp = dlab.comp
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q99 — BPE TOKENIZER TRAINING verdict: learn 64 merges from the
  //       corpus (one distributed word-count scan + bounded-dictionary
  //       driver merges — the production trainer shape) and encode the
  //       corpus back through the broadcast segmentation join. The
  //       oracle regenerates the DuckDB-computable columns (doc/word
  //       totals) and the construction-true compression verdict
  //       (n_words ≤ bpe tokens ≤ word chars — each merge strictly
  //       shrinks, char fallback bounds above); the merge SEQUENCE
  //       itself is pinned exactly by BpeSpec's hand-computed classic
  //       fixture (q93's verdict doctrine).
  // -------------------------------------------------------------------
  def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Bpe
    val d = docs(s, dir)
    val model = Bpe.trainBpe(d, "text", numMerges = 64)
    val enc = Bpe.encodeTokenCounts(d, "doc_id", "text", model)
      .agg(sum("n_bpe_tokens"), sum("n_words")).head()
    val (bpe, words) = (enc.getLong(0), enc.getLong(1))
    val chars = d.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .agg(sum(length(col("w")))).head().getLong(0)
    val nDocs = d.count()
    Seq((nDocs, words,
      model.merges.length,
      if (bpe >= words && bpe <= chars) 1 else 0))
      .toDF("n_docs", "n_words", "n_merges", "compress_ok")
  }

  val q99Sql: String =
    """WITH w AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents
      |)
      |SELECT (SELECT count(*) FROM documents) AS n_docs,
      |       (SELECT count(*) FROM w WHERE w <> '') AS n_words,
      |       64 AS n_merges, 1 AS compress_ok""".stripMargin

  // -------------------------------------------------------------------
  // q100 — SEMANTIC DEDUP (SemDeDup): cluster-then-within-cluster
  //        cosine pruning over a planted corpus — %7==0 re-ingested
  //        VERBATIM under vec_id*4+1 (cos 1.0 with its source: an
  //        identical vector ranks cells identically, so the pair shares
  //        every replicated cell and recall is 1 by construction),
  //        %7==1 rotated by 13 (isometry; ≤0.57 cosine vs everything —
  //        the q59 margin pin — so it must SURVIVE). Oracle: exact
  //        pairwise cosine over the same construction, recursive-CTE
  //        closure, min-id drop — the within-cluster restriction is
  //        invisible at recall 1.
  // -------------------------------------------------------------------
  def q100(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    val e = emb(s, dir).select("vec_id", "embedding")
    val rot = concat(slice(col("embedding"), 14, 51),
      slice(col("embedding"), 1, 13))
    val all = e.select((col("vec_id") * 4).as("vec_id"), col("embedding"))
      .unionByName(e.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") * 4 + 1).as("vec_id"), col("embedding")))
      .unionByName(e.filter(col("vec_id") % 7 === 1)
        .select((col("vec_id") * 4 + 1).as("vec_id"), rot.as("embedding")))
    val cents = Clustering.train(all, k = 16, iters = 2)
    val (surv, _) = Clustering.semanticDedup(all, cents, threshold = 0.9,
      replicate = 2)
    sorted(surv.select("vec_id"))
  }

  val q100Sql: String =
    """WITH RECURSIVE allv AS (
      |  SELECT vec_id * 4 AS vid, embedding AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id * 4 + 1, embedding
      |  FROM embeddings WHERE vec_id % 7 = 0
      |  UNION ALL
      |  SELECT vec_id * 4 + 1, embedding[14:] || embedding[:13]
      |  FROM embeddings WHERE vec_id % 7 = 1
      |), p AS (
      |  SELECT a.vid i, b.vid j, a.v va, b.v vb
      |  FROM allv a JOIN allv b ON a.vid < b.vid
      |), ex AS (
      |  SELECT i, j, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM p
      |), wp AS (
      |  SELECT i, j FROM (
      |    SELECT i, j, SUM(x*y)/sqrt(SUM(x*x))/sqrt(SUM(y*y)) cos
      |    FROM ex GROUP BY 1, 2
      |  ) WHERE cos >= 0.9
      |), edges AS (
      |  SELECT i AS a, j AS b FROM wp UNION SELECT j, i FROM wp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS vid, least(a, min(b)) AS component FROM reach GROUP BY a
      |), losers AS (
      |  SELECT vid FROM comp WHERE vid <> component
      |)
      |SELECT vid AS vec_id FROM allv
      |WHERE vid NOT IN (SELECT vid FROM losers)
      |ORDER BY 1 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q101 — MULTI-PASS ENTITY RESOLUTION (OR-of-blocking-keys): q95's
  //        construction PLUS a planted twin with a WRONG nation (1-char
  //        name deletion AND nk rotated by 7) — unreachable under
  //        single-key nation blocking, reachable through a second
  //        name-suffix pass (right(name, 8) survives the deletion: the
  //        customer number's last 8 digits are untouched).
  //        resolveMulti unions the per-pass edge sets before ONE
  //        closure. Oracle: pairs on (same nk OR same suffix) AND
  //        levenshtein ≤ 1, recursive-CTE closure.
  // -------------------------------------------------------------------
  def q101(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.EntityResolution
    val c = s.read.parquet(s"$dir/customer.parquet")
    val base = c.filter(col("c_custkey") % 4 === 0)
      .select((col("c_custkey") * 4).as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("nk"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val dirty = c.filter(col("c_custkey") % 20 === 0)
      .select((col("c_custkey") * 4 + 1).as("rid"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 99))
          .as("name"),
        col("c_nationkey").as("nk"), lit(null).cast("decimal(12,2)").as("bal"))
    val wrongNation = c.filter(col("c_custkey") % 20 === 4)
      .select((col("c_custkey") * 4 + 3).as("rid"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 99))
          .as("name"),
        ((col("c_nationkey") + 7) % 25).as("nk"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val records = base.unionByName(dirty).unionByName(wrongNation)
      .withColumn("sfx", expr("right(name, 8)"))
    val resolved = EntityResolution.resolveMulti(records, "rid", "name",
      Seq(Seq("nk"), Seq("sfx")), maxDist = 1)
    sorted(resolved.groupBy("entity_id").agg(
      count(lit(1)).as("n_records"),
      min(col("name")).as("name_canon"),
      sum(col("bal")).cast("double").as("bal_sum")))
  }

  val q101Sql: String =
    """WITH RECURSIVE base AS (
      |  SELECT c_custkey*4 AS rid, c_name AS name, c_nationkey AS nk,
      |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE c_custkey % 4 = 0
      |  UNION ALL
      |  SELECT c_custkey*4+1, substr(c_name,1,9) || substr(c_name,11),
      |         c_nationkey, NULL
      |  FROM customer WHERE c_custkey % 20 = 0
      |  UNION ALL
      |  SELECT c_custkey*4+3, substr(c_name,1,9) || substr(c_name,11),
      |         (c_nationkey + 7) % 25, CAST(c_acctbal AS DECIMAL(12,2))
      |  FROM customer WHERE c_custkey % 20 = 4
      |), recs AS (
      |  SELECT rid, name, nk, bal, right(name, 8) AS sfx FROM base
      |), pairs AS (
      |  SELECT a.rid i, b.rid j FROM recs a JOIN recs b
      |  ON (a.nk = b.nk OR a.sfx = b.sfx) AND a.rid < b.rid
      |  WHERE levenshtein(a.name, b.name) <= 1
      |), edges AS (
      |  SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS rid, least(a, min(b)) AS comp FROM reach GROUP BY a
      |), lab AS (
      |  SELECT recs.rid, coalesce(comp.comp, recs.rid) AS entity_id,
      |         recs.name, recs.bal
      |  FROM recs LEFT JOIN comp ON comp.rid = recs.rid
      |)
      |SELECT entity_id, count(*) AS n_records, min(name) AS name_canon,
      |       CAST(sum(bal) AS DOUBLE) AS bal_sum
      |FROM lab GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q102 — NAVIGATOR RETRACTION end-to-end (q80's inverse): summaries
  //        built from the FULL fact, then every 1998 row is retracted
  //        WITHOUT rescanning the base — sign-flipped partials merge
  //        cell-wise, fully-retracted cells are deleted (the hidden
  //        row-count partial witnesses emptiness). The routed answer
  //        after retraction must equal a from-scratch rebuild over the
  //        surviving rows exactly. sum/count measures only — min/max
  //        stores reject retraction with a named error (spec-pinned).
  // -------------------------------------------------------------------
  def q102(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator
    import graft.operators.AggregateNavigator.NavMeasure
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("ship_year", year(col("l_shipdate")))
    val measures = Seq(
      NavMeasure("sum", "l_quantity", "sum_qty"),
      NavMeasure("count", "*", "n_rows"))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q102_nav_" +
      Integer.toHexString(dir.hashCode)
    AggregateNavigator.buildSummaries(li,
      Seq(
        "rf_ls_year" -> Seq("l_returnflag", "l_linestatus", "ship_year"),
        "rf_ls" -> Seq("l_returnflag", "l_linestatus")),
      measures, root)
    val after = AggregateNavigator.retractSummaries(
      li.filter(col("ship_year") === 1998), root)
    val (ans, via) = AggregateNavigator.query(s,
      li.filter(col("ship_year") =!= 1998), after,
      Seq("l_returnflag", "l_linestatus"), measures)
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q102Sql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |       count(*) AS n_rows, 'rf_ls' AS routed_via
      |FROM lineitem WHERE year(l_shipdate) <> 1998 GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q103 — QUALITY-AWARE NEAR-DUP SURVIVORS (keep-best policy): q34's
  //        exact-verified MinHash-LSH pair set transitively closed, but
  //        each cluster keeps its HIGHEST-n_chars member (ties → min id)
  //        instead of the min id — the production "keep the best copy"
  //        curation step. One min_by aggregation per component on the
  //        Spark side; the oracle re-derives the winner with a
  //        (n_chars DESC, doc_id) row_number over the recursive-CTE
  //        closure.
  // -------------------------------------------------------------------
  def q103(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docs(s, dir), "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.8,
      maxDf = None, shinglesDf = Some(shingles3(s, dir)))
    sorted(Dedup.dropNearDupsKeepBest(docs(s, dir), pairs,
      "doc_id", "n_chars").select("doc_id", "n_chars"))
  }

  val q103Sql: String = {
    val cte = shingleCteWith(Some(Dedup.DefaultMaxDf))
      .replaceFirst("WITH ", "WITH RECURSIVE ")
    cte + """, jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a
      |), ranked AS (
      |  SELECT c.doc_id,
      |         row_number() OVER (PARTITION BY c.component
      |                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
      |  FROM comp c JOIN documents d USING (doc_id)
      |)
      |SELECT d.doc_id, d.n_chars FROM documents d
      |LEFT JOIN ranked r USING (doc_id)
      |WHERE r.doc_id IS NULL OR r.rn = 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q104 — IMPORTANCE RESAMPLING toward a target distribution (the DSIR
  //        recipe): raw = all documents, target = the English slice;
  //        every doc scored by the add-one-smoothed hashed-unigram
  //        log-likelihood ratio over 256 buckets, the top 50 selected by
  //        the md5-Gumbel-perturbed key. Spark side is two B-bounded
  //        histogram scans + a pure per-row projection; the oracle
  //        replays the identical arithmetic (md5 bucket hash, Laplace
  //        smoothing, natural logs, 4-decimal rounding, Gumbel from the
  //        same md5 uniform).
  // -------------------------------------------------------------------
  def q104(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(Sampling.importanceResample(d, d.filter(col("lang") === "en"),
        "doc_id", "text", budget = 50, buckets = 256)
      .select("doc_id", "logw", "g_key"))
  }

  val q104Sql: String =
    """WITH raww AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |                            w -> w <> '')) AS w
      |  FROM documents
      |), tgtw AS (
      |  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |                            w -> w <> '')) AS w
      |  FROM documents WHERE lang = 'en'
      |), rb AS (
      |  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b,
      |         count(*) AS c
      |  FROM raww GROUP BY 1
      |), tb AS (
      |  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b,
      |         count(*) AS c
      |  FROM tgtw GROUP BY 1
      |), tot AS (
      |  SELECT (SELECT count(*) FROM raww) AS tr,
      |         (SELECT count(*) FROM tgtw) AS tt
      |), perdoc AS (
      |  SELECT r.doc_id,
      |         sum(ln((coalesce(tb.c, 0) + 1.0) / (tot.tt + 256)) -
      |             ln((rb.c + 1.0) / (tot.tr + 256))) AS lw
      |  FROM (SELECT doc_id,
      |               CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b
      |        FROM raww) r
      |  JOIN rb USING (b) LEFT JOIN tb USING (b) CROSS JOIN tot
      |  GROUP BY 1
      |), keyed AS (
      |  SELECT d.doc_id, round(coalesce(p.lw, 0.0), 4) AS logw,
      |         round(round(coalesce(p.lw, 0.0), 4) + -ln(-ln(
      |           CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
      |                AS BIGINT) / 1152921504606846976.0)), 4) AS g_key
      |  FROM documents d LEFT JOIN perdoc p USING (doc_id)
      |)
      |SELECT * FROM (
      |  SELECT doc_id, logw, g_key FROM keyed
      |  ORDER BY g_key DESC, doc_id LIMIT 50
      |) sel
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q105 — DETERMINISTIC SHUFFLE-TO-SHARDS export: every document gets a
  //        shard in [0, 8) and a dense within-shard position, both pure
  //        md5 functions of the id (independent draws for assignment vs
  //        order). The oracle checks the FULL (shard, pos) assignment —
  //        a changed hash, shard arithmetic, or ordering tie-break fails
  //        the row hash.
  // -------------------------------------------------------------------
  def q105(s: SparkSession, dir: String): DataFrame =
    sorted(Sampling.shuffleShards(docs(s, dir), "doc_id", numShards = 8)
      .select("doc_id", "shard", "pos"))

  val q105Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) / 1152921504606846976.0 AS u,
      |         CAST(('0x' || substr(md5('|pos' || CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) / 1152921504606846976.0 AS u2
      |  FROM documents
      |)
      |SELECT doc_id, CAST(least(floor(u * 8), 7) AS INT) AS shard,
      |       CAST(row_number() OVER (
      |              PARTITION BY CAST(least(floor(u * 8), 7) AS INT)
      |              ORDER BY u2, doc_id) - 1 AS BIGINT) AS pos
      |FROM h
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q106 — END-TO-END CURATION PIPELINE, the canonical LLM-data recipe
  //        as ONE composed oracle row: length filter → near-dup dedup
  //        with keep-best survivor selection → DSIR importance
  //        resampling toward the English slice → deterministic
  //        shuffle-to-shards export. Four operators composed exactly as
  //        a user would chain them; the oracle replays the whole chain
  //        (shingle CTE + recursive closure + keep-best ranking + md5
  //        bucket LM + Gumbel selection + shard assignment) in SQL, so
  //        any drift in ANY stage (or in how stages compose) fails one
  //        hash.
  // -------------------------------------------------------------------
  def q106(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val toks = array_remove(TextFunctions.tokens(col("text")), "")
    val filtered = d.filter(size(toks) >= 30)
    val pairs = Dedup.minhashLsh(filtered, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.8)
    val deduped = Dedup.dropNearDupsKeepBest(filtered, pairs,
      "doc_id", "n_chars")
    val resampled = Sampling.importanceResample(deduped,
      deduped.filter(col("lang") === "en"), "doc_id", "text",
      budget = 100, buckets = 256)
    val sharded = Sampling.shuffleShards(resampled, "doc_id", numShards = 4)
    sorted(sharded.select("doc_id", "lang", "logw", "shard", "pos"))
  }

  val q106Sql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, lang, text, n_chars,
      |         string_split_regex(trim(text), '\s+') AS t
      |  FROM documents
      |), f AS (
      |  SELECT * FROM toks
      |  WHERE len(list_filter(t, w -> w <> '')) >= 30
      |), sh0 AS (
      |  SELECT DISTINCT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM f, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, array_to_string(t, ' ') AS s FROM f WHERE len(t) < 3
      |), sh AS (
      |  SELECT * FROM sh0
      |  WHERE s IN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 256)
      |), sizes AS (
      |  SELECT doc_id, count(*) n FROM sh GROUP BY 1
      |), pairs AS (
      |  SELECT a.doc_id i, b.doc_id j, count(*) inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a
      |), ranked AS (
      |  SELECT c.doc_id,
      |         row_number() OVER (PARTITION BY c.component
      |                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
      |  FROM comp c JOIN f d USING (doc_id)
      |), dd AS (
      |  SELECT f.doc_id, f.lang, f.text FROM f
      |  LEFT JOIN ranked r USING (doc_id)
      |  WHERE r.doc_id IS NULL OR r.rn = 1
      |), raww AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |                            w -> w <> '')) AS w
      |  FROM dd
      |), tgtw AS (
      |  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |                            w -> w <> '')) AS w
      |  FROM dd WHERE lang = 'en'
      |), rb AS (
      |  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b,
      |         count(*) AS c
      |  FROM raww GROUP BY 1
      |), tb AS (
      |  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b,
      |         count(*) AS c
      |  FROM tgtw GROUP BY 1
      |), tot AS (
      |  SELECT (SELECT count(*) FROM raww) AS tr,
      |         (SELECT count(*) FROM tgtw) AS tt
      |), perdoc AS (
      |  SELECT r.doc_id,
      |         sum(ln((coalesce(tb.c, 0) + 1.0) / (tot.tt + 256)) -
      |             ln((rb.c + 1.0) / (tot.tr + 256))) AS lw
      |  FROM (SELECT doc_id,
      |               CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b
      |        FROM raww) r
      |  JOIN rb USING (b) LEFT JOIN tb USING (b) CROSS JOIN tot
      |  GROUP BY 1
      |), keyed AS (
      |  SELECT d.doc_id, d.lang, round(coalesce(p.lw, 0.0), 4) AS logw,
      |         round(round(coalesce(p.lw, 0.0), 4) + -ln(-ln(
      |           CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
      |                AS BIGINT) / 1152921504606846976.0)), 4) AS g_key
      |  FROM dd d LEFT JOIN perdoc p USING (doc_id)
      |), sel AS (
      |  SELECT doc_id, lang, logw FROM keyed
      |  ORDER BY g_key DESC, doc_id LIMIT 100
      |), h AS (
      |  SELECT doc_id, lang, logw,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) / 1152921504606846976.0 AS u,
      |         CAST(('0x' || substr(md5('|pos' || CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) / 1152921504606846976.0 AS u2
      |  FROM sel
      |)
      |SELECT doc_id, lang, logw, CAST(least(floor(u * 4), 3) AS INT) AS shard,
      |       CAST(row_number() OVER (
      |              PARTITION BY CAST(least(floor(u * 4), 3) AS INT)
      |              ORDER BY u2, doc_id) - 1 AS BIGINT) AS pos
      |FROM h
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q107 — MULTI-PASS INCREMENTAL ENTITY RESOLUTION (q101 × q98): the
  //        stored corpus resolves under OR-of-blocking (nation OR
  //        name-suffix), then a delta labels against the frozen labels:
  //        %20==0 plants a dirty twin (adoptable through either pass),
  //        %20==4 a dirty twin with a WRONG nation (adoptable ONLY
  //        through the suffix pass — the single-pass delta operator
  //        provably cannot reach it), %20==12 two "X-"-prefixed records
  //        (new entity, within-delta collapse to the min id). Oracle:
  //        q98's two recursive closures + per-component adoption
  //        minimum, with the OR-of-passes predicate everywhere.
  // -------------------------------------------------------------------
  def q107(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.EntityResolution
    val passes = Seq(Seq("nk"), Seq("sfx"))
    val c = s.read.parquet(s"$dir/customer.parquet")
    val base = c.filter(col("c_custkey") % 4 === 0)
      .select((col("c_custkey") * 4).as("rid"), col("c_name").as("name"),
        col("c_nationkey").as("nk"))
      .withColumn("sfx", expr("right(name, 8)"))
    val stored = EntityResolution.resolveMulti(base, "rid", "name",
      passes, maxDist = 1)
    val dirtyName =
      concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 99))
    val delta = c.filter(col("c_custkey") % 20 === 0)
      .select((col("c_custkey") * 4 + 1).as("rid"), dirtyName.as("name"),
        col("c_nationkey").as("nk"))
      .unionByName(c.filter(col("c_custkey") % 20 === 4)
        .select((col("c_custkey") * 4 + 3).as("rid"), dirtyName.as("name"),
          ((col("c_nationkey") + 7) % 25).as("nk")))
      .unionByName(c.filter(col("c_custkey") % 20 === 12)
        .select(explode(array(col("c_custkey") * 4 + 1,
          col("c_custkey") * 4 + 2)).as("rid"),
          concat(lit("X-"), col("c_name")).as("name"),
          col("c_nationkey").as("nk")))
      .withColumn("sfx", expr("right(name, 8)"))
    sorted(EntityResolution.resolveDeltaMulti(stored, delta, "rid", "name",
      passes, maxDist = 1).select("rid", "entity_id"))
  }

  val q107Sql: String =
    """WITH RECURSIVE base AS (
      |  SELECT c_custkey*4 AS rid, c_name AS name, c_nationkey AS nk,
      |         right(c_name, 8) AS sfx
      |  FROM customer WHERE c_custkey % 4 = 0
      |), bpairs AS (
      |  SELECT a.rid i, b.rid j FROM base a JOIN base b
      |  ON (a.nk = b.nk OR a.sfx = b.sfx) AND a.rid < b.rid
      |  WHERE levenshtein(a.name, b.name) <= 1
      |), bedges AS (
      |  SELECT i AS a, j AS b FROM bpairs UNION SELECT j, i FROM bpairs
      |), breach(a, b) AS (
      |  SELECT a, b FROM bedges
      |  UNION
      |  SELECT r.a, e.b FROM breach r JOIN bedges e ON r.b = e.a
      |), bcomp AS (
      |  SELECT a AS rid, least(a, min(b)) AS comp FROM breach GROUP BY a
      |), blab AS (
      |  SELECT base.rid, coalesce(bcomp.comp, base.rid) AS entity_id,
      |         base.name, base.nk, base.sfx
      |  FROM base LEFT JOIN bcomp ON bcomp.rid = base.rid
      |), delta0 AS (
      |  SELECT c_custkey*4+1 AS rid,
      |         substr(c_name,1,9) || substr(c_name,11) AS name,
      |         c_nationkey AS nk
      |  FROM customer WHERE c_custkey % 20 = 0
      |  UNION ALL
      |  SELECT c_custkey*4+3, substr(c_name,1,9) || substr(c_name,11),
      |         (c_nationkey + 7) % 25
      |  FROM customer WHERE c_custkey % 20 = 4
      |  UNION ALL
      |  SELECT c_custkey*4+1, 'X-' || c_name, c_nationkey
      |  FROM customer WHERE c_custkey % 20 = 12
      |  UNION ALL
      |  SELECT c_custkey*4+2, 'X-' || c_name, c_nationkey
      |  FROM customer WHERE c_custkey % 20 = 12
      |), delta AS (
      |  SELECT rid, name, nk, right(name, 8) AS sfx FROM delta0
      |), dpairs AS (
      |  SELECT a.rid i, b.rid j FROM delta a JOIN delta b
      |  ON (a.nk = b.nk OR a.sfx = b.sfx) AND a.rid < b.rid
      |  WHERE levenshtein(a.name, b.name) <= 1
      |), dedges AS (
      |  SELECT i AS a, j AS b FROM dpairs UNION SELECT j, i FROM dpairs
      |), dreach(a, b) AS (
      |  SELECT a, b FROM dedges
      |  UNION
      |  SELECT r.a, e.b FROM dreach r JOIN dedges e ON r.b = e.a
      |), dcomp AS (
      |  SELECT a AS rid, least(a, min(b)) AS comp FROM dreach GROUP BY a
      |), dlab AS (
      |  SELECT delta.rid, coalesce(dcomp.comp, delta.rid) AS comp
      |  FROM delta LEFT JOIN dcomp ON dcomp.rid = delta.rid
      |), adopt AS (
      |  SELECT d.rid, min(bl.entity_id) AS ad
      |  FROM delta d JOIN blab bl
      |  ON (bl.nk = d.nk OR bl.sfx = d.sfx)
      |     AND levenshtein(bl.name, d.name) <= 1
      |  GROUP BY 1
      |), capt AS (
      |  SELECT dlab.comp, min(adopt.ad) AS ca
      |  FROM dlab LEFT JOIN adopt ON adopt.rid = dlab.rid
      |  GROUP BY 1
      |)
      |SELECT dlab.rid, coalesce(capt.ca, dlab.comp) AS entity_id
      |FROM dlab JOIN capt ON capt.comp = dlab.comp
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q108 — SUBSTRING-LEVEL EXACT DEDUP (Lee et al. 2022 ExactSubstr):
  //        every maximal token span covered by some 12-token gram that
  //        appears verbatim in >= 2 distinct docs (the near-dup pairs'
  //        shared regions, boilerplate, templated text). The oracle
  //        replays the whole construction in SQL: k-gram md5 inverted
  //        index → min(doc)<>max(doc) duplicated-gram set → per-doc
  //        gaps-and-islands merge of covered runs.
  // -------------------------------------------------------------------
  def q108(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.duplicateSpans(docs(s, dir), "doc_id", "text",
      minTokens = 12))

  val q108Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, t.i AS start,
      |         md5(array_to_string(ts[t.i:t.i+11], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 10)) AS i) t
      |  WHERE len(ts) >= 12
      |), dup AS (
      |  SELECT h FROM g GROUP BY h HAVING min(doc_id) <> max(doc_id)
      |), ds AS (
      |  SELECT doc_id, start FROM g WHERE h IN (SELECT h FROM dup)
      |), brk AS (
      |  SELECT doc_id, start,
      |         CASE WHEN start > lag(start) OVER (PARTITION BY doc_id
      |                                            ORDER BY start) + 12
      |              THEN 1 ELSE 0 END AS b
      |  FROM ds
      |), isl AS (
      |  SELECT doc_id, start,
      |         sum(b) OVER (PARTITION BY doc_id ORDER BY start) AS grp
      |  FROM brk
      |)
      |SELECT doc_id, CAST(min(start) AS INT) AS span_start,
      |       CAST(max(start) + 11 AS INT) AS span_end
      |FROM isl GROUP BY doc_id, grp
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q109 — SPAN REMOVAL, end-to-end: rebuild every doc with its
  //        duplicated spans dropped and RE-TOKENIZE the rebuilt text.
  //        The oracle computes the expected counts arithmetically
  //        (tokens minus covered positions) without ever seeing the
  //        rebuilt string — a wrong rebuild (off-by-one span boundary,
  //        dropped separator, kept covered token) shifts a count and
  //        fails the hash.
  // -------------------------------------------------------------------
  def q109(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cleaned = Dedup.removeDuplicateSpans(d, "doc_id", "text",
        minTokens = 12)
      .select(col("doc_id"), col("text").as("__ct"))
    sorted(d
      .select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).as("toks_before"))
      .join(cleaned, "doc_id")
      .select(col("doc_id"), col("toks_before"),
        when(col("__ct") === "", 0)
          .otherwise(size(TextFunctions.tokens(col("__ct"))))
          .as("toks_after")))
  }

  val q109Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, t.i AS start,
      |         md5(array_to_string(ts[t.i:t.i+11], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 10)) AS i) t
      |  WHERE len(ts) >= 12
      |), dup AS (
      |  SELECT h FROM g GROUP BY h HAVING min(doc_id) <> max(doc_id)
      |), ds AS (
      |  SELECT doc_id, start FROM g WHERE h IN (SELECT h FROM dup)
      |), brk AS (
      |  SELECT doc_id, start,
      |         CASE WHEN start > lag(start) OVER (PARTITION BY doc_id
      |                                            ORDER BY start) + 12
      |              THEN 1 ELSE 0 END AS b
      |  FROM ds
      |), isl AS (
      |  SELECT doc_id, start,
      |         sum(b) OVER (PARTITION BY doc_id ORDER BY start) AS grp
      |  FROM brk
      |), spans AS (
      |  SELECT doc_id, min(start) AS s, max(start) + 11 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), cov AS (
      |  SELECT doc_id, sum(e - s + 1) AS covered FROM spans GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(t.ts) AS INT) AS toks_before,
      |       CAST(len(t.ts) - coalesce(c.covered, 0) AS INT) AS toks_after
      |FROM tok t LEFT JOIN cov c USING (doc_id)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q110 — NAVIGATOR RETRACTION WITH MIN/MAX GRAINS (q102's extension):
  //        a store holding non-invertible min/max measures retracts via
  //        retractSummariesWithBase — additive partials fold sign-
  //        flipped (delta-sized), min/max columns of the TOUCHED cells
  //        rebuild from the surviving base's touched footprint, and
  //        untouched cells keep stored partials byte-identical. The
  //        routed answer must equal a from-scratch rebuild exactly.
  // -------------------------------------------------------------------
  def q110(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggregateNavigator
    import graft.operators.AggregateNavigator.NavMeasure
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("ship_year", year(col("l_shipdate")))
    val measures = Seq(
      NavMeasure("sum", "l_quantity", "sum_qty"),
      NavMeasure("min", "l_extendedprice", "min_price"),
      NavMeasure("max", "l_quantity", "max_qty"),
      NavMeasure("count", "*", "n_rows"))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q110_nav_" +
      Integer.toHexString(dir.hashCode)
    AggregateNavigator.buildSummaries(li,
      Seq(
        "rf_ls_year" -> Seq("l_returnflag", "l_linestatus", "ship_year"),
        "rf_ls" -> Seq("l_returnflag", "l_linestatus")),
      measures, root)
    val surviving = li.filter(col("ship_year") =!= 1998)
    val after = AggregateNavigator.retractSummariesWithBase(
      li.filter(col("ship_year") === 1998), surviving, root)
    val (ans, via) = AggregateNavigator.query(s, surviving, after,
      Seq("l_returnflag", "l_linestatus"), measures)
    sorted(ans.withColumn("routed_via", lit(via)))
  }

  val q110Sql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |       min(l_extendedprice) AS min_price, max(l_quantity) AS max_qty,
      |       count(*) AS n_rows, 'rf_ls' AS routed_via
      |FROM lineitem WHERE year(l_shipdate) <> 1998 GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q111 — DSIR WITH BIGRAM FEATURES (q104's stronger variant, per the
  //        paper): token bigrams hash into the same bucket space as the
  //        unigrams, so word ORDER carries signal. The oracle replays
  //        the combined unigram+bigram stream bucket-for-bucket.
  // -------------------------------------------------------------------
  def q111(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(Sampling.importanceResample(d, d.filter(col("lang") === "en"),
        "doc_id", "text", budget = 50, buckets = 256, ngrams = 2)
      .select("doc_id", "logw", "g_key"))
  }

  val q111Sql: String =
    """WITH toksrc AS (
      |  SELECT doc_id, lang,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     w -> w <> '') AS t
      |  FROM documents
      |), feats AS (
      |  SELECT doc_id, lang, unnest(t) AS w FROM toksrc
      |  UNION ALL
      |  SELECT doc_id, lang, t[g.i] || ' ' || t[g.i+1] AS w
      |  FROM toksrc, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
      |  WHERE len(t) >= 2
      |), rb AS (
      |  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b,
      |         count(*) AS c
      |  FROM feats GROUP BY 1
      |), tb AS (
      |  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b,
      |         count(*) AS c
      |  FROM feats WHERE lang = 'en' GROUP BY 1
      |), tot AS (
      |  SELECT (SELECT count(*) FROM feats) AS tr,
      |         (SELECT count(*) FROM feats WHERE lang = 'en') AS tt
      |), perdoc AS (
      |  SELECT r.doc_id,
      |         sum(ln((coalesce(tb.c, 0) + 1.0) / (tot.tt + 256)) -
      |             ln((rb.c + 1.0) / (tot.tr + 256))) AS lw
      |  FROM (SELECT doc_id,
      |               CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS b
      |        FROM feats) r
      |  JOIN rb USING (b) LEFT JOIN tb USING (b) CROSS JOIN tot
      |  GROUP BY 1
      |), keyed AS (
      |  SELECT d.doc_id, round(coalesce(p.lw, 0.0), 4) AS logw,
      |         round(round(coalesce(p.lw, 0.0), 4) + -ln(-ln(
      |           CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
      |                AS BIGINT) / 1152921504606846976.0)), 4) AS g_key
      |  FROM documents d LEFT JOIN perdoc p USING (doc_id)
      |)
      |SELECT * FROM (
      |  SELECT doc_id, logw, g_key FROM keyed
      |  ORDER BY g_key DESC, doc_id LIMIT 50
      |) sel
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q112 — HYBRID RETRIEVAL (RRF): BM25 lexical top-20 and brute-force
  //        dense-cosine top-20 per query fused by Reciprocal Rank
  //        Fusion (1/(60+rank), q85's round-before-rank doctrine on the
  //        fused score), fused top-10 returned. The oracle replays BOTH
  //        retrievers and the fusion: q85's BM25 scoring, q22's
  //        unnest-cosine ranking (self NOT excluded — query ids and doc
  //        ids are independent id spaces in hybrid search, and the query
  //        ids here deliberately collide with doc ids 1..3 to pin that),
  //        the same rank-bounded union + rounded RRF sum.
  // -------------------------------------------------------------------
  def q112(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val qs = q85Queries.toDF("query_id", "qtext").join(
      e.select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      "query_id")
    sorted(graft.operators.Retrieval.hybridSearch(
      docs(s, dir), e, qs, k = 10, cand = 20))
  }

  val q112Sql: String = {
    val values = q85Queries
      .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""WITH q(query_id, qtext) AS (VALUES $values),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term <> '' GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
      |), stats AS (
      |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), qt AS (
      |  SELECT DISTINCT query_id, term FROM (
      |    SELECT query_id,
      |           unnest(string_split_regex(trim(qtext), '\\s+')) AS term
      |    FROM q) WHERE term <> ''
      |), lexscored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         round(sum(
      |           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
      |           * (tf.tf * (1.2 + 1))
      |           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
      |         ), 4) AS score
      |  FROM qt
      |  JOIN tf USING (term)
      |  JOIN dfreq USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats
      |  GROUP BY 1, 2
      |), lexrank AS (
      |  SELECT query_id, doc_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY score DESC, doc_id ASC) AS rnk
      |  FROM lexscored
      |), qv AS (
      |  SELECT vec_id AS query_id, embedding AS qe
      |  FROM embeddings WHERE vec_id IN (1, 2, 3)
      |), dp AS (
      |  SELECT qv.query_id, e.vec_id AS doc_id, qv.qe, e.embedding AS ce
      |  FROM qv CROSS JOIN embeddings e
      |), dex AS (
      |  SELECT query_id, doc_id,
      |         unnest(qe)::DOUBLE x, unnest(ce)::DOUBLE y
      |  FROM dp
      |), dcos AS (
      |  SELECT query_id, doc_id,
      |         SUM(x*y) / sqrt(SUM(x*x)) / sqrt(SUM(y*y)) AS cos
      |  FROM dex GROUP BY 1, 2
      |), densrank AS (
      |  SELECT query_id, doc_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, doc_id ASC) AS rnk
      |  FROM dcos
      |), fused AS (
      |  SELECT query_id, doc_id, round(sum(1.0 / (60 + rnk)), 4) AS rrf
      |  FROM (SELECT query_id, doc_id, rnk FROM lexrank WHERE rnk <= 20
      |        UNION ALL
      |        SELECT query_id, doc_id, rnk FROM densrank WHERE rnk <= 20)
      |  GROUP BY 1, 2
      |), final AS (
      |  SELECT query_id, doc_id,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY rrf DESC, doc_id ASC) AS INT)
      |           AS rank,
      |         rrf
      |  FROM fused
      |)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank, rrf
      |FROM final WHERE rank <= 10
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q114 — SPAN-LEVEL DECONTAMINATION (q39/q53's modern upgrade): every
  //        maximal training-doc token span covered by a 12-token gram
  //        appearing verbatim in the eval corpus (source 'src0'). The
  //        engine side goes Bloom-prefilter → exact md5 semi-join →
  //        gaps-and-islands merge; the oracle replays the exact
  //        construction cross-corpus in SQL. Train↔train duplication
  //        must NOT appear (q108 covers that) — only eval leakage.
  // -------------------------------------------------------------------
  def q114(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(graft.operators.Decontaminate.contaminatedSpans(
      d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
      "doc_id", "text", minTokens = 12))
  }

  val q114Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, source, t.i AS start,
      |         md5(array_to_string(ts[t.i:t.i+11], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 10)) AS i) t
      |  WHERE len(ts) >= 12
      |), ev AS (
      |  SELECT DISTINCT h FROM g WHERE source = 'src0'
      |), ds AS (
      |  SELECT doc_id, start FROM g
      |  WHERE source <> 'src0' AND h IN (SELECT h FROM ev)
      |), brk AS (
      |  SELECT doc_id, start,
      |         CASE WHEN start > lag(start) OVER (PARTITION BY doc_id
      |                                            ORDER BY start) + 12
      |              THEN 1 ELSE 0 END AS b
      |  FROM ds
      |), isl AS (
      |  SELECT doc_id, start,
      |         sum(b) OVER (PARTITION BY doc_id ORDER BY start) AS grp
      |  FROM brk
      |)
      |SELECT doc_id, CAST(min(start) AS INT) AS span_start,
      |       CAST(max(start) + 11 AS INT) AS span_end
      |FROM isl GROUP BY doc_id, grp
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q115 — DECONTAMINATION REMOVAL, end-to-end: rebuild every training
  //        doc with its eval-shared spans cut and re-tokenize. Same
  //        arithmetic oracle as q109 (expected counts = tokens minus
  //        covered positions, computed without seeing the rebuilt
  //        string), restricted to the training side; clean docs must
  //        keep toks_after = toks_before.
  // -------------------------------------------------------------------
  def q115(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val train = d.filter(col("source") =!= "src0")
    val cleaned = graft.operators.Decontaminate.removeContaminatedSpans(
        train, d.filter(col("source") === "src0"), "doc_id", "text",
        minTokens = 12)
      .select(col("doc_id"), col("text").as("__ct"))
    sorted(train
      .select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).as("toks_before"))
      .join(cleaned, "doc_id")
      .select(col("doc_id"), col("toks_before"),
        when(col("__ct") === "", 0)
          .otherwise(size(TextFunctions.tokens(col("__ct"))))
          .as("toks_after")))
  }

  val q115Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, source, t.i AS start,
      |         md5(array_to_string(ts[t.i:t.i+11], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 10)) AS i) t
      |  WHERE len(ts) >= 12
      |), ev AS (
      |  SELECT DISTINCT h FROM g WHERE source = 'src0'
      |), ds AS (
      |  SELECT doc_id, start FROM g
      |  WHERE source <> 'src0' AND h IN (SELECT h FROM ev)
      |), brk AS (
      |  SELECT doc_id, start,
      |         CASE WHEN start > lag(start) OVER (PARTITION BY doc_id
      |                                            ORDER BY start) + 12
      |              THEN 1 ELSE 0 END AS b
      |  FROM ds
      |), isl AS (
      |  SELECT doc_id, start,
      |         sum(b) OVER (PARTITION BY doc_id ORDER BY start) AS grp
      |  FROM brk
      |), spans AS (
      |  SELECT doc_id, min(start) AS s, max(start) + 11 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), cov AS (
      |  SELECT doc_id, sum(e - s + 1) AS covered FROM spans GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(t.ts) AS INT) AS toks_before,
      |       CAST(len(t.ts) - coalesce(c.covered, 0) AS INT) AS toks_after
      |FROM tok t LEFT JOIN cov c USING (doc_id)
      |WHERE t.source <> 'src0'
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q116 — PROTOTYPE/OUTLIER PRUNING (Sorscher et al. 2022 / D4):
  //        score every embedding by cosine to its own cluster centroid,
  //        drop the 30% most prototypical (redundant core) and 10%
  //        least (noise tail) per cluster — membership-exact. Cluster
  //        key and centroids are construction-derived (vec_id % 8; the
  //        centroid IS the normalized seed embedding vec_id = cluster),
  //        q97's doctrine: the oracle replays the cosine, the bounded-
  //        histogram order statistics, and the tie-keeping cuts itself;
  //        pairing with TRAINED k-means is ClusteringSpec's job.
  // -------------------------------------------------------------------
  def q116(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Clustering, Similarity}
    val e = emb(s, dir).select("vec_id", "embedding")
    val k = 8
    val cents: Array[Array[Double]] = e.filter(col("vec_id") < k)
      .orderBy("vec_id")
      .select(Similarity.normalize(col("embedding")).as("nv"))
      .collect().map(_.getSeq[Double](0).toArray)
    sorted(Clustering.prototypePrune(
        e.withColumn("cluster", pmod(col("vec_id"), lit(k)).cast("int")),
        cents, pruneFrac = 0.3, outlierFrac = 0.1,
        clusterCol = Some("cluster"))
      .select(col("cluster"), col("vec_id"), col("proto")))
  }

  val q116Sql: String =
    """WITH s AS (
      |  SELECT vec_id AS cid, embedding AS se FROM embeddings
      |  WHERE vec_id < 8
      |), p AS (
      |  SELECT e.vec_id, e.vec_id % 8 AS cluster, e.embedding AS ve, s.se
      |  FROM embeddings e JOIN s ON s.cid = e.vec_id % 8
      |), ex AS (
      |  SELECT vec_id, cluster, unnest(ve)::DOUBLE v, unnest(se)::DOUBLE c
      |  FROM p
      |), d AS (
      |  SELECT vec_id, cluster,
      |         round(SUM(v*c) / sqrt(SUM(v*v)) / sqrt(SUM(c*c)), 4) AS proto
      |  FROM ex GROUP BY 1, 2
      |), hist AS (
      |  SELECT cluster, proto, count(*) AS cnt FROM d GROUP BY 1, 2
      |), cum AS (
      |  SELECT cluster, proto,
      |         sum(cnt) OVER (PARTITION BY cluster ORDER BY proto) AS cum,
      |         sum(cnt) OVER (PARTITION BY cluster) AS n
      |  FROM hist
      |), thr AS (
      |  SELECT cluster,
      |         min(proto) FILTER (WHERE cum >=
      |           floor(CAST(0.1 AS DOUBLE) * n) + 1) AS lo,
      |         min(proto) FILTER (WHERE cum >=
      |           n - floor(CAST(0.3 AS DOUBLE) * n)) AS hi
      |  FROM cum GROUP BY 1
      |)
      |SELECT CAST(d.cluster AS INT) AS cluster, d.vec_id, d.proto
      |FROM d JOIN thr USING (cluster)
      |WHERE d.proto >= thr.lo AND d.proto <= thr.hi
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q117 — CCNet QUALITY BUCKETS (Wenzek et al. 2020 §4.4): score every
  //        doc with the q83 bigram-LM NLL, then bucket per SOURCE into
  //        terciles (0 = lowest NLL = fluent head, 2 = tail) by exact
  //        per-group order statistics over the bounded rounded-score
  //        histogram — never a data-sized sort. The oracle replays LM
  //        scoring AND the ceil(f·n) boundary arithmetic (IEEE double
  //        both sides — fraction literals cast to DOUBLE so DuckDB's
  //        DECIMAL literals can't change the product).
  // -------------------------------------------------------------------
  def q117(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Corpus, Quality}
    val d = docs(s, dir)
    val scoredDocs = Corpus.lmScore(d, "doc_id", "text")
      .join(d.select("doc_id", "source"), "doc_id")
    sorted(Quality.scoreBuckets(scoredDocs, "source", "nll")
      .select("doc_id", "source", "nll", "bucket"))
  }

  val q117Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     w -> w <> '') AS t
      |  FROM documents
      |), tok AS (
      |  SELECT unnest(t) AS w FROM toks
      |), uni AS (
      |  SELECT w, count(*) AS cw FROM tok GROUP BY 1
      |), v AS (
      |  SELECT count(DISTINCT w) AS v FROM tok
      |), bg AS (
      |  SELECT doc_id, t[g.i] AS w1, t[g.i+1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
      |  WHERE len(t) >= 2
      |), bgc AS (
      |  SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2
      |), scored AS (
      |  SELECT bg.doc_id,
      |         -log2((bgc.cbg + 1.0) / (uni.cw + v.v)) AS nll
      |  FROM bg
      |  JOIN bgc USING (w1, w2)
      |  JOIN uni ON uni.w = bg.w1
      |  CROSS JOIN v
      |), sc AS (
      |  SELECT doc_id, round(avg(nll), 4) AS nll FROM scored GROUP BY 1
      |), scd AS (
      |  SELECT sc.doc_id, dd.source, sc.nll
      |  FROM sc JOIN documents dd USING (doc_id)
      |), hist AS (
      |  SELECT source, nll, count(*) AS cnt FROM scd GROUP BY 1, 2
      |), cum AS (
      |  SELECT source, nll,
      |         sum(cnt) OVER (PARTITION BY source ORDER BY nll) AS cum,
      |         sum(cnt) OVER (PARTITION BY source) AS n
      |  FROM hist
      |), thr AS (
      |  SELECT source,
      |         min(nll) FILTER (WHERE cum >=
      |           ceiling(CAST(0.3333333333333333 AS DOUBLE) * n)) AS t1,
      |         min(nll) FILTER (WHERE cum >=
      |           ceiling(CAST(0.6666666666666666 AS DOUBLE) * n)) AS t2
      |  FROM cum GROUP BY 1
      |)
      |SELECT scd.doc_id, scd.source, scd.nll,
      |       CAST(CASE WHEN scd.nll > t2 THEN 2
      |                 WHEN scd.nll > t1 THEN 1 ELSE 0 END AS INT) AS bucket
      |FROM scd JOIN thr USING (source)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q118 — LEAK ATTRIBUTION (q114's audit companion): for every
  //        (training doc, eval doc) pair sharing a verbatim 12-token
  //        gram, the count of DISTINCT shared gram hashes — which eval
  //        item leaked into which page. Bloom-prefiltered exact join on
  //        the engine side; the oracle joins the distinct gram sets
  //        head-on.
  // -------------------------------------------------------------------
  def q118(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(graft.operators.Decontaminate.attributionReport(
      d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
      "doc_id", "text", minTokens = 12))
  }

  val q118Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, source, t.i AS start,
      |         md5(array_to_string(ts[t.i:t.i+11], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 10)) AS i) t
      |  WHERE len(ts) >= 12
      |), tg AS (
      |  SELECT DISTINCT doc_id, h FROM g WHERE source <> 'src0'
      |), eg AS (
      |  SELECT DISTINCT doc_id AS eval_id, h FROM g WHERE source = 'src0'
      |)
      |SELECT tg.doc_id, eg.eval_id, count(*) AS n_shared
      |FROM tg JOIN eg USING (h)
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q119 — END-TO-END CURATION PIPELINE v2, composing the round-12
  //        operators as ONE oracle row (the q106 doctrine): span-level
  //        DECONTAMINATION against the src0 eval slice → bigram-LM
  //        scoring of the REBUILT text (model trained on the cleaned
  //        corpus itself — the stitch-point bigrams matter) → CCNet
  //        per-source terciles keeping head+middle → deterministic
  //        shuffle-to-shards export. The oracle replays every stage in
  //        SQL: the gram census + gaps-and-islands spans, the cleaned
  //        token lists (kept positions re-stitched in order), the
  //        Laplace bigram NLL over the cleaned corpus, the bounded-
  //        histogram tercile cuts, and the md5 shard assignment — drift
  //        in any stage, or in how stages compose, fails one hash.
  //        Docs cleaned below 2 tokens drop out of LM scoring (no
  //        bigrams) and thus out of the pipeline, both sides.
  // -------------------------------------------------------------------
  def q119(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Corpus, Decontaminate, Quality, Sampling}
    val d = docs(s, dir)
    val cleaned = Decontaminate.removeContaminatedSpans(
      d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
      "doc_id", "text", minTokens = 12)
    val scored = Corpus.lmScore(cleaned, "doc_id", "text")
      .join(cleaned.select("doc_id", "source"), "doc_id")
    val kept = Quality.scoreBuckets(scored, "source", "nll")
      .filter(col("bucket") <= 1)
    sorted(Sampling.shuffleShards(kept, "doc_id", numShards = 4)
      .select("doc_id", "source", "nll", "bucket", "shard", "pos"))
  }

  val q119Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, source, t.i AS start,
      |         md5(array_to_string(ts[t.i:t.i+11], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 10)) AS i) t
      |  WHERE len(ts) >= 12
      |), ev AS (
      |  SELECT DISTINCT h FROM g WHERE source = 'src0'
      |), ds AS (
      |  SELECT doc_id, start FROM g
      |  WHERE source <> 'src0' AND h IN (SELECT h FROM ev)
      |), brk AS (
      |  SELECT doc_id, start,
      |         CASE WHEN start > lag(start) OVER (PARTITION BY doc_id
      |                                            ORDER BY start) + 12
      |              THEN 1 ELSE 0 END AS b
      |  FROM ds
      |), isl AS (
      |  SELECT doc_id, start,
      |         sum(b) OVER (PARTITION BY doc_id ORDER BY start) AS grp
      |  FROM brk
      |), spans AS (
      |  SELECT doc_id, min(start) AS s, max(start) + 11 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), tokpos AS (
      |  SELECT doc_id, source, t.i AS i, ts[t.i] AS w
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) t
      |  WHERE source <> 'src0'
      |), keep AS (
      |  SELECT tp.doc_id, tp.source, tp.i, tp.w
      |  FROM tokpos tp
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |                    WHERE sp.doc_id = tp.doc_id
      |                      AND tp.i BETWEEN sp.s AND sp.e)
      |), cl AS (
      |  SELECT doc_id, source,
      |         list_filter(list(w ORDER BY i), x -> x <> '') AS t
      |  FROM keep GROUP BY 1, 2
      |), u AS (
      |  SELECT unnest(t) AS w FROM cl
      |), uni AS (
      |  SELECT w, count(*) AS cw FROM u GROUP BY 1
      |), v AS (
      |  SELECT count(DISTINCT w) AS v FROM u
      |), bg AS (
      |  SELECT doc_id, source, t[g2.i] AS w1, t[g2.i+1] AS w2
      |  FROM cl, LATERAL (SELECT unnest(range(1, len(t))) AS i) g2
      |  WHERE len(t) >= 2
      |), bgc AS (
      |  SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2
      |), scdoc AS (
      |  SELECT bg.doc_id, bg.source,
      |         -log2((bgc.cbg + 1.0) / (uni.cw + v.v)) AS nll
      |  FROM bg JOIN bgc USING (w1, w2) JOIN uni ON uni.w = bg.w1
      |  CROSS JOIN v
      |), sc AS (
      |  SELECT doc_id, source, round(avg(nll), 4) AS nll
      |  FROM scdoc GROUP BY 1, 2
      |), hist AS (
      |  SELECT source, nll, count(*) AS cnt FROM sc GROUP BY 1, 2
      |), cum AS (
      |  SELECT source, nll,
      |         sum(cnt) OVER (PARTITION BY source ORDER BY nll) AS cum,
      |         sum(cnt) OVER (PARTITION BY source) AS n
      |  FROM hist
      |), thr AS (
      |  SELECT source,
      |         min(nll) FILTER (WHERE cum >=
      |           ceiling(CAST(0.3333333333333333 AS DOUBLE) * n)) AS t1,
      |         min(nll) FILTER (WHERE cum >=
      |           ceiling(CAST(0.6666666666666666 AS DOUBLE) * n)) AS t2
      |  FROM cum GROUP BY 1
      |), keptd AS (
      |  SELECT sc.doc_id, sc.source, sc.nll,
      |         CAST(CASE WHEN sc.nll > t2 THEN 2
      |                   WHEN sc.nll > t1 THEN 1 ELSE 0 END AS INT) AS bucket
      |  FROM sc JOIN thr USING (source)
      |  WHERE sc.nll <= t2
      |), h2 AS (
      |  SELECT doc_id, source, nll, bucket,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) / 1152921504606846976.0 AS u,
      |         CAST(('0x' || substr(md5('|pos' || CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) / 1152921504606846976.0 AS u2
      |  FROM keptd
      |)
      |SELECT doc_id, source, nll, bucket,
      |       CAST(least(floor(u * 4), 3) AS INT) AS shard,
      |       CAST(row_number() OVER (
      |              PARTITION BY CAST(least(floor(u * 4), 3) AS INT)
      |              ORDER BY u2, doc_id) - 1 AS BIGINT) AS pos
      |FROM h2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q120 — length-curriculum shards: EXACT global rank by (n_chars,
  //        doc_id) via pivot buckets + keyed window (no global sort),
  //        interleaved into 8 worker shards. The oracle computes the
  //        same rank with one ORDER BY window — legitimate in DuckDB at
  //        oracle scale, exactly what the operator exists to AVOID at
  //        100 TB. pivots=16 forces real multi-bucket offsets at sf0.01.
  // -------------------------------------------------------------------
  def q120(s: SparkSession, dir: String): DataFrame =
    sorted(Sampling.curriculumShards(docs(s, dir), "doc_id",
      col("n_chars").cast("double"), numShards = 8, pivots = 16)
      .select(col("doc_id"), col("shard"), col("pos")))

  val q120Sql: String =
    """WITH r AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE), doc_id)
      |           - 1 AS rk
      |  FROM documents
      |)
      |SELECT doc_id, CAST(rk % 8 AS INT) AS shard,
      |       CAST(rk // 8 AS BIGINT) AS pos
      |FROM r
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q121 — corpus-level source-overlap matrix: one MinHash signature per
  //        SOURCE (k=32 md5-derived hash mins over its 3-gram shingles),
  //        pairwise match fraction as the Jaccard estimate. md5 hashing
  //        makes the ESTIMATE itself replayable — the oracle reproduces
  //        the signature values, not just a reference answer.
  // -------------------------------------------------------------------
  def q121(s: SparkSession, dir: String): DataFrame =
    sorted(graft.operators.Corpus.sourceOverlap(
      docs(s, dir), "source", "text", n = 3, k = 32))

  val q121Sql: String = {
    val k = 32
    val mins = (0 until k).map(i =>
      s"min(CAST(('0x' || substr(md5('$i|' || s), 1, 15)) AS BIGINT)) AS mh$i")
      .mkString(",\n      |         ")
    val matches = (0 until k)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
      |  SELECT source, list_filter(string_split_regex(trim(text), '\\s+'),
      |                             x -> x <> '') t
      |  FROM documents
      |), sh AS (
      |  SELECT source, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) g
      |  WHERE len(t) >= 3
      |  UNION ALL
      |  SELECT source, array_to_string(t, ' ') AS s FROM toks
      |  WHERE len(t) BETWEEN 1 AND 2
      |), mh AS (
      |  SELECT source,
      |         $mins
      |  FROM sh GROUP BY 1
      |)
      |SELECT a.source AS src_a, b.source AS src_b,
      |       CAST($matches AS BIGINT) AS matches,
      |       round(CAST($matches AS DOUBLE) / $k.0, 4) AS est_jaccard
      |FROM mh a JOIN mh b ON a.source < b.source
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q122 — leakage-safe split: near-dup clusters travel together (split
  //        key = connected-component root over the LSH pair graph,
  //        falling back to the id), then q35's exact md5 threshold
  //        arithmetic. Membership-level oracle: the recursive-CTE
  //        closure (q34 vocabulary) + the same hash in DuckDB.
  // -------------------------------------------------------------------
  def q122(s: SparkSession, dir: String): DataFrame =
    sorted(Sampling.leakSafeSplit(docs(s, dir), "doc_id",
      Dedup.minhashLsh(docs(s, dir), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.8,
        maxDf = None, shinglesDf = Some(shingles3(s, dir))))
      .select(col("doc_id"), col("split")))

  val q122Sql: String = {
    val cte = shingleCteWith(Some(Dedup.DefaultMaxDf))
      .replaceFirst("WITH ", "WITH RECURSIVE ")
    cte + """, jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a
      |), h AS (
      |  SELECT d.doc_id,
      |         CAST(('0x' || substr(md5(CAST(coalesce(c.component, d.doc_id)
      |           AS VARCHAR)), 1, 15)) AS BIGINT)
      |           / 1152921504606846976.0 AS u
      |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
      |)
      |SELECT doc_id,
      |       CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM h
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q123 — one-pass column profiler (ingest data-quality gate): counts,
  //        nulls, native-type min/max, HLL++ distinct. Exact fields are
  //        replayed by the oracle; the approximate distinct gets the q31
  //        verdict treatment (in-query 5% check vs exact, oracle pins 1).
  // -------------------------------------------------------------------
  def q123(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(s"$dir/orders.parquet")
    val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority")
    val prof = graft.operators.Profiler.profile(o, cols)
    val exact = o
      .agg(countDistinct(col(cols.head)).as(cols.head),
        cols.tail.map(c => countDistinct(col(c)).as(c)): _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).as("exact"))): _*)).as("e"))
      .select("e.*")
    sorted(prof.join(exact, "column")
      .select(col("column").as("col_name"), col("n_rows"), col("n_null"),
        col("min_value"), col("max_value"),
        (abs(col("approx_distinct") - col("exact"))
          <= col("exact") * lit(0.05)).cast("int").as("distinct_ok")))
  }

  val q123Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |       count(*) - count($c) AS n_null,
         |       CAST(min($c) AS VARCHAR) AS min_value,
         |       CAST(max($c) AS VARCHAR) AS max_value,
         |       CAST(1 AS INT) AS distinct_ok
         |FROM orders""".stripMargin
    Seq("o_custkey", "o_orderstatus", "o_orderpriority").map(one)
      .mkString("", "\nUNION ALL\n", "\n") +
      """ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |         4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q124 — ingest-volume anomaly report: per (event_type, day) counts
  //        z-scored against the trailing-7-day mean/stddev (current day
  //        excluded from its own baseline). NULL zscore while the
  //        baseline is undefined — spelled out on BOTH sides because
  //        engines disagree on x/0 and CASE-over-NULL defaults.
  // -------------------------------------------------------------------
  def q124(s: SparkSession, dir: String): DataFrame =
    sorted(Events.volumeAnomalies(events(s, dir), "ts", Seq("event_type"),
      window = 7, z = 2.0)
      .withColumn("mu", round(col("mu"), 4))
      .withColumn("sigma", round(col("sigma"), 4))
      .withColumn("zscore", round(col("zscore"), 4)))

  val q124Sql: String =
    """WITH d0 AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |), span AS (
      |  SELECT event_type, min(day) AS gmin FROM d0 GROUP BY 1
      |), gmax AS (
      |  SELECT max(day) AS gmax FROM d0
      |), d AS (
      |  SELECT s.event_type, gs.day, coalesce(d0.n, 0) AS n
      |  FROM span s
      |  CROSS JOIN gmax g
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(
      |    s.gmin, g.gmax, INTERVAL 1 DAY)) AS day) gs
      |  LEFT JOIN d0 ON d0.event_type = s.event_type AND d0.day = gs.day
      |), w AS (
      |  SELECT event_type, day, n,
      |         avg(n) OVER win AS mu,
      |         stddev_samp(n) OVER win AS sigma
      |  FROM d
      |  WINDOW win AS (PARTITION BY event_type ORDER BY day
      |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_type, day, n, round(mu, 4) AS mu, round(sigma, 4) AS sigma,
      |       CASE WHEN sigma IS NULL OR sigma = 0 THEN NULL
      |            ELSE round((n - mu) / sigma, 4) END AS zscore,
      |       CASE WHEN sigma IS NULL OR sigma = 0 THEN NULL
      |            WHEN abs((n - mu) / sigma) > 2.0 THEN 1 ELSE 0 END AS is_anomaly
      |FROM w
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
      |         5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q125 — composed pipeline v3: leakage-safe split (near-dup clusters
  //        travel together) → train slice → EXACT length-curriculum
  //        shards, the whole chain under ONE oracle hash (the q106/q119
  //        doctrine): closure, md5 split, and rank arithmetic replayed
  //        stage by stage in DuckDB.
  // -------------------------------------------------------------------
  def q125(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.minhashLsh(d, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.8,
      maxDf = None, shinglesDf = Some(shingles3(s, dir)))
    val train = Sampling.leakSafeSplit(d, "doc_id", pairs)
      .filter(col("split") === "train")
    sorted(Sampling.curriculumShards(train, "doc_id",
      col("n_chars").cast("double"), numShards = 4, pivots = 16)
      .select(col("doc_id"), col("shard"), col("pos")))
  }

  val q125Sql: String = {
    val cte = shingleCteWith(Some(Dedup.DefaultMaxDf))
      .replaceFirst("WITH ", "WITH RECURSIVE ")
    cte + """, jp AS (
      |  SELECT i, j
      |  FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |), edges AS (
      |  SELECT i AS a, j AS b FROM jp UNION SELECT j, i FROM jp
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a
      |), tr AS (
      |  SELECT d.doc_id, d.n_chars
      |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
      |  WHERE CAST(('0x' || substr(md5(CAST(coalesce(c.component, d.doc_id)
      |          AS VARCHAR)), 1, 15)) AS BIGINT)
      |          / 1152921504606846976.0 < 0.8
      |), r AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE), doc_id)
      |           - 1 AS rk
      |  FROM tr
      |)
      |SELECT doc_id, CAST(rk % 4 AS INT) AS shard,
      |       CAST(rk // 4 AS BIGINT) AS pos
      |FROM r
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  // -------------------------------------------------------------------
  // q126 — PARAGRAPH-GRAIN EXACT DEDUP (CCNet stage 1, Wenzek et al.
  //        2020): plant a 3-paragraph corpus where every doc shares a
  //        group boilerplate paragraph (case-varied on even ids to pin
  //        the lowercase normalization), census paragraphs corpus-wide
  //        by normalized hash, keep ONE canonical occurrence (min
  //        (doc, pos) — the keep-best doctrine), drop the rest,
  //        re-stitch. The oracle replays plant, normalization, census,
  //        election, and the string re-stitch — the REBUILT TEXT is
  //        hashed, so an off-by-one position or a dropped separator
  //        fails the row.
  // -------------------------------------------------------------------
  def q126(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 24)
    val ref = t.select(col("doc_id").as("rid"),
      concat_ws(" ", slice(col("ts"), 1, 12)).as("boiler"))
    val planted = t
      .withColumn("rid", col("doc_id") % 7 + 1)
      .join(ref, "rid")
      .select(col("doc_id"), concat_ws("\n",
        concat_ws(" ", slice(col("ts"), 1, 10)),
        when(col("doc_id") % 2 === 0, upper(col("boiler")))
          .otherwise(col("boiler")),
        concat_ws(" ", slice(col("ts"), lit(11), size(col("ts")) - 10)))
        .as("text"))
    val deduped = graft.operators.Dedup.dropDuplicateParagraphs(
      planted, "doc_id", "text", "\n")
    sorted(deduped.select(col("doc_id"),
      size(split(col("text"), "\n", -1)).cast("int").as("paras"),
      col("text")))
  }

  val q126Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), t AS (
      |  SELECT * FROM tok WHERE len(ts) >= 24
      |), ref AS (
      |  SELECT doc_id AS rid, array_to_string(ts[1:12], ' ') AS boiler
      |  FROM t
      |), planted AS (
      |  SELECT t.doc_id,
      |         array_to_string(ts[1:10], ' ') || chr(10) ||
      |         CASE WHEN t.doc_id % 2 = 0 THEN upper(boiler) ELSE boiler END
      |         || chr(10) || array_to_string(ts[11:], ' ') AS text
      |  FROM t JOIN ref ON ref.rid = t.doc_id % 7 + 1
      |), sp AS (
      |  SELECT doc_id, string_split(text, chr(10)) AS ps FROM planted
      |), occ AS (
      |  SELECT doc_id, u.i AS pos, u.para,
      |         trim(regexp_replace(regexp_replace(lower(u.para),
      |           '[^a-z\s]', '', 'g'), '\s+', ' ', 'g')) AS n
      |  FROM sp, LATERAL (SELECT unnest(ps) AS para,
      |                           unnest(range(1, len(ps) + 1)) AS i) u
      |), ranked AS (
      |  SELECT doc_id, pos,
      |         row_number() OVER (PARTITION BY md5(n)
      |                            ORDER BY doc_id, pos) AS rn,
      |         count(*) OVER (PARTITION BY md5(n)) AS c
      |  FROM occ WHERE n <> ''
      |), drops AS (
      |  SELECT doc_id, pos FROM ranked WHERE c > 1 AND rn > 1
      |), kept AS (
      |  SELECT o.doc_id, o.pos, o.para
      |  FROM occ o LEFT JOIN drops d
      |    ON d.doc_id = o.doc_id AND d.pos = o.pos
      |  WHERE d.doc_id IS NULL
      |)
      |SELECT doc_id, CAST(count(*) AS INT) AS paras,
      |       string_agg(para, chr(10) ORDER BY pos) AS text
      |FROM kept GROUP BY doc_id
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q127 — PROFILER QUANTILES (q123's numeric extension): one-pass
  //        approximate percentiles per numeric column, judged with the
  //        q31/q123 verdict doctrine — the EXACT interpolated quantile
  //        is replayed by the oracle (rounded), the approximate sketch
  //        value is pinned in-query to within 2% of the Spark-exact
  //        value, and only the verdict int crosses the hash.
  // -------------------------------------------------------------------
  def q127(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(s"$dir/orders.parquet")
    val qs = Seq(0.25, 0.5, 0.75)
    val qarr = array(qs.map(lit): _*)
    val prof = graft.operators.Profiler.profile(
      o, Seq("o_totalprice", "o_custkey"), quantiles = qs)
    val exact = o.agg(
        percentile(col("o_totalprice").cast("double"), qarr).as("e1"),
        percentile(col("o_custkey").cast("double"), qarr).as("e2"))
      .select(explode(array(
        struct(lit("o_totalprice").as("column"), col("e1").as("ex")),
        struct(lit("o_custkey").as("column"), col("e2").as("ex")))).as("e"))
      .select("e.*")
    sorted(prof.join(exact, "column")
      .select(col("column").as("col_name"),
        posexplode(arrays_zip(col("quantiles"), col("ex"))))
      .select(col("col_name"), (col("pos") + 1).cast("int").as("q_idx"),
        round(col("col.ex"), 4).as("exact_q"),
        (abs(col("col.quantiles") - col("col.ex"))
          <= lit(0.02) * abs(col("col.ex"))).cast("int").as("approx_ok")))
  }

  val q127Sql: String =
    """WITH ex AS (
      |  SELECT quantile_cont(CAST(o_totalprice AS DOUBLE),
      |                       [0.25, 0.5, 0.75]) AS tp,
      |         quantile_cont(CAST(o_custkey AS DOUBLE),
      |                       [0.25, 0.5, 0.75]) AS ck
      |  FROM orders
      |)
      |SELECT col_name, CAST(q_idx AS INT) AS q_idx,
      |       round(v, 4) AS exact_q, CAST(1 AS INT) AS approx_ok
      |FROM (
      |  SELECT 'o_totalprice' AS col_name, u.i AS q_idx, u.v
      |  FROM ex, LATERAL (SELECT unnest(tp) AS v,
      |                           unnest(range(1, 4)) AS i) u
      |  UNION ALL
      |  SELECT 'o_custkey' AS col_name, u.i AS q_idx, u.v
      |  FROM ex, LATERAL (SELECT unnest(ck) AS v,
      |                           unnest(range(1, 4)) AS i) u
      |)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin

  /** name -> (query fn, oracle SQL or null). */
  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q16_text_stats", q16 _, q16Sql),
    ("q17_langid", q17 _, q17Sql),
    ("q18_dedup_exact", q18 _, q18Sql),
    ("q19_dedup_jaccard", q19 _, q19Sql),
    ("q20_dedup_minhash_lsh", q20 _, q20Sql),
    ("q21_dedup_simhash", q21 _, q21Sql),
    ("q22_knn_brute", q22 _, q22Sql),
    ("q23_embedding_near_dup", q23 _, q23Sql),
    ("q24_events_tumbling", q24 _, q24Sql),
    ("q25_sessionize", q25 _, q25Sql),
    ("q26_from_table", q26 _, q26Sql),
    ("q27_count_distinct", q27 _, q27Sql),
    ("q28_winnow_fingerprint", q28 _, q28Sql),
    ("q29_token_bpe", q29 _, q29Sql),
    ("q30_json_props", q30 _, q30Sql),
    ("q31_approx_distinct", q31 _, q31Sql), // exact count + 5% tolerance verdict
    ("q32_events_sliding", q32 _, q32Sql),
    ("q33_sql_views", q33 _, q33Sql),
    ("q34_dedup_components", q34 _, q34Sql),
    ("q35_hash_split", q35 _, q35Sql),
    ("q36_quantiles", q36 _, q36Sql),
    ("q37_salted_join", q37 _, q37Sql),
    ("q38_repetition", q38 _, q38Sql),
    ("q39_decontaminate", q39 _, q39Sql),
    ("q40_pack_sequences", q40 _, q40Sql),
    ("q41_funnel", q41 _, q41Sql),
    ("q42_redact_pii", q42 _, q42Sql),
    ("q43_top_terms", q43 _, q43Sql),
    ("q44_image_near_dup", q44 _, q44Sql), // golden planted-pair set
    ("q45_dedup_corpus", q45 _, q45Sql),
    ("q46_dup_ngram_share", q46 _, q46Sql),
    ("q47_chunking", q47 _, q47Sql),
    ("q48_mixing_weights", q48 _, q48Sql),
    ("q49_attribution", q49 _, q49Sql),
    ("q50_approx_quantiles", q50 _, q50Sql),
    ("q51_trailing_rate", q51 _, q51Sql),
    ("q52_session_native", q52 _, q52Sql),
    ("q53_bloom_decontaminate", q53 _, q53Sql),
    ("q54_skew_report", q54 _, q54Sql),
    ("q55_dedup_delta", q55 _, q55Sql),
    ("q56_sample_to_budget", q56 _, q56Sql),
    ("q57_video_near_dup", q57 _, q57Sql), // golden planted-pair set
    ("q58_neardup_delta", q58 _, q58Sql),
    ("q59_vec_neardup_delta", q59 _, q59Sql),
    ("q60_asof_join", q60 _, q60Sql),
    ("q61_range_join", q61 _, q61Sql),
    ("q62_star_ingest", q62 _, q62Sql),
    ("q63_scd2_dimension", q63 _, q63Sql),
    ("q64_star_retract", q64 _, q64Sql),
    ("q65_stratified_exact", q65 _, q65Sql),
    ("q66_drill_across", q66 _, q66Sql),
    ("q67_semi_additive", q67 _, q67Sql),
    ("q68_time_intelligence", q68 _, q68Sql),
    ("q69_share_of_parent", q69 _, q69Sql),
    ("q70_topk_other", q70 _, q70Sql),
    ("q71_asof_tolerance", q71 _, q71Sql),
    ("q72_scd1_update", q72 _, q72Sql),
    ("q73_sketch_cube", q73 _, q73Sql),
    ("q74_retention_cohorts", q74 _, q74Sql),
    ("q75_histogram_cube", q75 _, q75Sql),
    ("q76_frequent_terms", q76 _, q76Sql),
    ("q77_quality_audit", q77 _, q77Sql),
    ("q78_sketch_ingest", q78 _, q78Sql),
    ("q79_agg_navigator", q79 _, q79Sql),
    ("q80_nav_refresh", q80 _, q80Sql),
    ("q81_cube_routed", q81 _, q81Sql),
    ("q82_rollup_routed", q82 _, q82Sql),
    ("q83_lm_score", q83 _, q83Sql),
    ("q84_nav_stream", q84 _, q84Sql),
    ("q85_bm25_search", q85 _, q85Sql),
    ("q86_heavy_hitters", q86 _, q86Sql),
    ("q87_range_routed", q87 _, q87Sql),
    ("q88_sliding_distinct", q88 _, q88Sql),
    ("q89_bm25_incremental", q89 _, q89Sql),
    ("q90_dedup_report", q90 _, q90Sql),
    ("q91_pq_verdict", q91 _, q91Sql),
    ("q92_ivfpq_stored", q92 _, q92Sql),
    ("q93_quality_classifier", q93 _, q93Sql),
    ("q94_fuzzy_join", q94 _, q94Sql),
    ("q95_entity_resolution", q95 _, q95Sql),
    ("q96_kmeans", q96 _, q96Sql), // verdict + ClusteringSpec geometry
    ("q97_diversity_sample", q97 _, q97Sql),
    ("q98_entity_delta", q98 _, q98Sql),
    ("q99_bpe_train", q99 _, q99Sql), // verdict + BpeSpec exact merges
    ("q100_semantic_dedup", q100 _, q100Sql),
    ("q101_er_multiblock", q101 _, q101Sql),
    ("q102_nav_retract", q102 _, q102Sql),
    ("q103_keepbest_dedup", q103 _, q103Sql),
    ("q104_importance_resample", q104 _, q104Sql),
    ("q105_shuffle_shards", q105 _, q105Sql),
    ("q106_curation_pipeline", q106 _, q106Sql),
    ("q107_er_delta_multiblock", q107 _, q107Sql),
    ("q108_duplicate_spans", q108 _, q108Sql),
    ("q109_span_removal", q109 _, q109Sql),
    ("q110_nav_retract_minmax", q110 _, q110Sql),
    ("q111_dsir_bigram", q111 _, q111Sql),
    ("q112_hybrid_search", q112 _, q112Sql),
    ("q113_ivfpq_refined", q113 _, q113Sql),
    ("q114_span_decontaminate", q114 _, q114Sql),
    ("q115_decontaminate_removal", q115 _, q115Sql),
    ("q116_proto_prune", q116 _, q116Sql),
    ("q117_ccnet_buckets", q117 _, q117Sql),
    ("q118_leak_attribution", q118 _, q118Sql),
    ("q119_curation_v2", q119 _, q119Sql),
    ("q120_curriculum_shards", q120 _, q120Sql),
    ("q121_source_overlap", q121 _, q121Sql),
    ("q122_leaksafe_split", q122 _, q122Sql),
    ("q123_profile", q123 _, q123Sql),
    ("q124_volume_anomalies", q124 _, q124Sql),
    ("q125_split_curriculum", q125 _, q125Sql),
    ("q126_paragraph_dedup", q126 _, q126Sql),
    ("q127_profile_quantiles", q127 _, q127Sql)
  )
}
