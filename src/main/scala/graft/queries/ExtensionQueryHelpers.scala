package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.builders.Tpch
import graft.functions.TextFunctions
import graft.model.{DataCube, Hierarchy, Measure}
import graft.operators.{Dedup, Events, Sampling, Similarity}

/** Shared fixtures, caches, and oracle-SQL building blocks of the
  * [[ExtensionQueries]] families. The query surface is unchanged by the
  * per-family file split — everything still resolves through the single
  * `ExtensionQueries` object; this trait only holds what more than one
  * family needs (`private[queries]`, never wider).
  */
private[queries] trait ExtensionQueryHelpers {


  private[queries] def sorted(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toSeq: _*)

  private[queries] def docs(s: SparkSession, dir: String): DataFrame =
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
  private[queries] val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, () => Unit)]()
  private[queries] def shingles3(s: SparkSession, dir: String): DataFrame = {
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
    // entry was inserted — evict post-insertion (see Tpch.cube), and FAIL
    // rather than hand back frames bound to a stopped context (they would
    // throw on first use downstream with a far less explicit error)
    if (s.sparkContext.isStopped) {
      Option(shingleCache.remove((s, dir))).foreach(_._2.apply())
      throw new IllegalStateException(
        "shingles3: SparkContext stopped during index build")
    }
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
  /** Shared full-corpus MinHash-LSH near-dup pair set + its transitive
    * closure, persisted per (session, dir) — the shingles3 doctrine one
    * level up: SEVEN queries (q20/q34/q45/q90/q103/q122/q125) consume
    * the IDENTICAL `minhashLsh(docs, n=3, k=32, bands=8, threshold=0.8)`
    * pair set over the shared capped index, and five of them also close
    * it; without the cache each re-ran signature aggregation + banded
    * candidate join + exact verification (+ one closure) per query. The
    * components frame is the closure's output relation (local
    * union-find at fixture scale — a LocalRelation, free to reuse;
    * checkpointed labels on the distributed path). The bench accounts
    * the fill on its own `build_neardup_pairs` line (the build-once-
    * query-many model — same contract as build_cube/build_shingles). */
  private[queries] val neardupCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      ((DataFrame, DataFrame), () => Unit)]()
  private[queries] def neardupPairs3(s: SparkSession, dir: String)
  : (DataFrame, DataFrame) = {
    val entry = neardupCache.computeIfAbsent((s, dir), { case (ss, d) =>
      val p = Dedup.minhashLsh(docs(ss, d), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.8,
        maxDf = None, shinglesDf = Some(shingles3(ss, d)))
      if (!sys.env.contains("SPARK_GRAFT_NO_CACHE"))
        p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the closure evaluates `p`, filling its persist; hook registered
      // AFTER the (throwing) build — the Tpch.cube contract
      val comps = Dedup.connectedComponents(p)
      val detach = graft.util.SessionCleanup.onApplicationEnd(ss) { () =>
        neardupCache.remove((ss, d)): Unit
      }
      ((p, comps), detach)
    })
    if (s.sparkContext.isStopped) {
      Option(neardupCache.remove((s, dir))).foreach(_._2.apply())
      throw new IllegalStateException(
        "neardupPairs3: SparkContext stopped during pair-set build")
    }
    entry._1
  }

  /** Force-fill the shared near-dup pair/closure cache (bench
    * `build_neardup_pairs` accounting line). */
  def warmNeardupPairs(s: SparkSession, dir: String): Unit = {
    val (p, _) = neardupPairs3(s, dir)
    p.count(): Unit
  }

  /** Eviction hook: drop + unpersist the shared pair set (the closure
    * frame is a local relation / checkpoint — ContextCleaner reclaims
    * its blocks once the reference drops). */
  def invalidateNeardupPairs(s: SparkSession, dir: String): Unit =
    Option(neardupCache.remove((s, dir))).foreach { case ((p, _), detach) =>
      p.unpersist()
      detach()
      graft.model.Joins.invalidateEstimates()
    }

  private[queries] def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  /** Fixture-generation-robust events reader — see Sources.readEvents
    * (handles both TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)/NTZ). */
  private[queries] def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Sources.readEvents(s, dir)

  /** Shared DuckDB shingle CTE (3-gram, distinct per doc) — the oracle
    * counterpart of Dedup.docShingles, including the short-doc fallback
    * (documents with < n tokens contribute their full token string as the
    * single shingle, so no document vanishes from dedup). `capDf` mirrors
    * the operator's maxDf stop-shingle cap: shingles in more than capDf
    * docs are dropped from the index AND the per-doc sizes, exactly like
    * Dedup.jaccardPairs. */
  private[queries] def shingleCteWith(capDf: Option[Int]): String = {
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
  private[queries] val shingleCte: String = shingleCteWith(None)

  private[queries] val jaccardSelect: String =
    """SELECT i, j, round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
      |FROM pairs JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
      |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
}
