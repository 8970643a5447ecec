package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.builders.Tpch
import graft.functions.TextFunctions
import graft.model.{DataCube, Hierarchy, Measure}
import graft.operators.{Dedup, Events, Sampling, Similarity}

/** Text-analysis, document-dedup, and decontamination queries: stats/lang-
  * ID/quality, exact + n-gram + MinHash + SimHash dedup, connected
  * components, span-level ExactSubstr, eval decontamination, paragraph
  * dedup.
  * Part of the [[ExtensionQueries]] surface (see its scaladoc for the
  * portability conventions every oracle follows).
  */
private[queries] trait TextQueries { self: ExtensionQueryHelpers =>

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
    sorted(neardupPairs3(s, dir)._1
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
  // q34 — near-dup connected components: the canonicalization step after
  //       pair generation (keep/drop must be transitive even though
  //       near-duplication isn't). Spark side: iterative min-label
  //       propagation over the exact-verified MinHash-LSH pairs; oracle:
  //       the same pair set transitively closed with a recursive CTE,
  //       component = min reachable id.
  // -------------------------------------------------------------------
  def q34(s: SparkSession, dir: String): DataFrame =
    sorted(neardupPairs3(s, dir)._2)

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
    sorted(Dedup.dropNearDupsWith(d, neardupPairs3(s, dir)._2, "doc_id")
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
  // q90 — per-source duplication report: the corpus-quality summary
  //       (how much of each source is near-dup mass) composed from the
  //       shared shingle index → LSH pairs → transitive closure, joined
  //       back per source — counts are exact integers, the share is a
  //       rounded ratio; oracle recomputes the closure with q34's
  //       recursive CTE and aggregates per source.
  // -------------------------------------------------------------------
  def q90(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(Dedup.dedupReportWith(d, neardupPairs3(s, dir)._2,
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
  // q103 — QUALITY-AWARE NEAR-DUP SURVIVORS (keep-best policy): q34's
  //        exact-verified MinHash-LSH pair set transitively closed, but
  //        each cluster keeps its HIGHEST-n_chars member (ties → min id)
  //        instead of the min id — the production "keep the best copy"
  //        curation step. One min_by aggregation per component on the
  //        Spark side; the oracle re-derives the winner with a
  //        (n_chars DESC, doc_id) row_number over the recursive-CTE
  //        closure.
  // -------------------------------------------------------------------
  def q103(s: SparkSession, dir: String): DataFrame =
    sorted(Dedup.dropNearDupsKeepBestWith(docs(s, dir),
      neardupPairs3(s, dir)._2,
      "doc_id", "n_chars").select("doc_id", "n_chars"))

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
  /** The planted 3-paragraph corpus shared by q126/q129: per doc, its
    * first-10-token paragraph, its GROUP's boilerplate (the first 12
    * tokens of doc `doc_id % 7 + 1`, upper-cased on even ids to pin the
    * lowercase normalization), and the rest of its tokens. */
  private def plantedParagraphCorpus(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 24)
    val ref = t.select(col("doc_id").as("rid"),
      concat_ws(" ", slice(col("ts"), 1, 12)).as("boiler"))
    t.withColumn("rid", col("doc_id") % 7 + 1)
      .join(ref, "rid")
      .select(col("doc_id"), concat_ws("\n",
        concat_ws(" ", slice(col("ts"), 1, 10)),
        when(col("doc_id") % 2 === 0, upper(col("boiler")))
          .otherwise(col("boiler")),
        concat_ws(" ", slice(col("ts"), lit(11), size(col("ts")) - 10)))
        .as("text"))
  }

  /** Surviving-paragraph count: a doc whose every paragraph dropped
    * (its whole content was someone else's canonical copy — happens at
    * sf0.1, where near-dup texts make BOTH unique-looking paragraphs
    * duplicates) re-stitches to "" and counts 0, not split("")'s [""]. */
  private def paraCount(text: Column): Column =
    when(text === "", 0).otherwise(size(split(text, "\n", -1))).cast("int")

  def q126(s: SparkSession, dir: String): DataFrame = {
    val deduped = graft.operators.Dedup.dropDuplicateParagraphs(
      plantedParagraphCorpus(s, dir), "doc_id", "text", "\n")
    sorted(deduped.select(col("doc_id"),
      paraCount(col("text")).as("paras"), col("text")))
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
      |           '[^\p{L}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
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
      |), reb AS (
      |  SELECT doc_id, count(*) AS paras,
      |         string_agg(para, chr(10) ORDER BY pos) AS text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT p.doc_id, CAST(coalesce(r.paras, 0) AS INT) AS paras,
      |       coalesce(r.text, '') AS text
      |FROM planted p LEFT JOIN reb r ON r.doc_id = p.doc_id
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q129 — INCREMENTAL PARAGRAPH DEDUP (q126's delta twin, the q55/q58
  //        doctrine at paragraph grain): even-id docs of the planted
  //        corpus are the INGESTED store (normalized-hash census saved
  //        to parquet), odd-id docs arrive as the delta — a delta
  //        paragraph drops when its hash is stored (Bloom-prefiltered
  //        exact confirm) or loses the within-delta min-(doc,pos)
  //        election. The oracle replays the plant, the store census,
  //        both drop rules, and the string re-stitch of the delta docs.
  // -------------------------------------------------------------------
  def q129(s: SparkSession, dir: String): DataFrame = {
    val planted = plantedParagraphCorpus(s, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_q129_paras_" +
      Integer.toHexString(dir.hashCode)
    graft.operators.Dedup.saveParagraphStore(
      planted.filter(col("doc_id") % 2 === 0), "doc_id", "text", root)
    val out = graft.operators.Dedup.dropDuplicateParagraphsDelta(
      planted.filter(col("doc_id") % 2 === 1), "doc_id", "text", root)
    sorted(out.select(col("doc_id"),
      paraCount(col("text")).as("paras"), col("text")))
  }

  val q129Sql: String =
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
      |           '[^\p{L}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
      |  FROM sp, LATERAL (SELECT unnest(ps) AS para,
      |                           unnest(range(1, len(ps) + 1)) AS i) u
      |), ev AS (
      |  SELECT DISTINCT md5(n) AS h FROM occ
      |  WHERE doc_id % 2 = 0 AND n <> ''
      |), docc AS (
      |  SELECT doc_id, pos, para, n FROM occ WHERE doc_id % 2 = 1
      |), stored AS (
      |  SELECT doc_id, pos FROM docc
      |  WHERE n <> '' AND md5(n) IN (SELECT h FROM ev)
      |), freshr AS (
      |  SELECT doc_id, pos,
      |         row_number() OVER (PARTITION BY md5(n)
      |                            ORDER BY doc_id, pos) AS rn,
      |         count(*) OVER (PARTITION BY md5(n)) AS c
      |  FROM docc WHERE n <> '' AND md5(n) NOT IN (SELECT h FROM ev)
      |), drops AS (
      |  SELECT doc_id, pos FROM stored
      |  UNION ALL
      |  SELECT doc_id, pos FROM freshr WHERE c > 1 AND rn > 1
      |), kept AS (
      |  SELECT o.doc_id, o.pos, o.para
      |  FROM docc o LEFT JOIN drops d
      |    ON d.doc_id = o.doc_id AND d.pos = o.pos
      |  WHERE d.doc_id IS NULL
      |), reb AS (
      |  SELECT doc_id, count(*) AS paras,
      |         string_agg(para, chr(10) ORDER BY pos) AS text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT p.doc_id, CAST(coalesce(r.paras, 0) AS INT) AS paras,
      |       coalesce(r.text, '') AS text
      |FROM (SELECT DISTINCT doc_id FROM planted WHERE doc_id % 2 = 1) p
      |LEFT JOIN reb r ON r.doc_id = p.doc_id
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q132 — DELTA NOVELTY vs the stored corpus: per delta doc (odd ids),
  //        how many of its distinct 8-token grams occur verbatim in the
  //        stored half (even ids) — novelty = fraction unseen, the
  //        "is this crawl increment new text?" signal. Engine side is
  //        Bloom-prefiltered + exact-join confirmed (EXACT result); the
  //        oracle joins the distinct gram sets head-on.
  // -------------------------------------------------------------------
  def q132(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sorted(graft.operators.Decontaminate.noveltyReport(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", minTokens = 8))
  }

  val q132Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT DISTINCT doc_id,
      |         md5(array_to_string(ts[t.i:t.i+7], ' ')) AS h
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 6)) AS i) t
      |  WHERE len(ts) >= 8
      |), corp AS (
      |  SELECT DISTINCT h FROM g WHERE doc_id % 2 = 0
      |), per AS (
      |  SELECT doc_id, count(*) AS n_grams,
      |         sum(CASE WHEN h IN (SELECT h FROM corp)
      |             THEN 1 ELSE 0 END) AS n_seen
      |  FROM g WHERE doc_id % 2 = 1 GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
      |       CAST(coalesce(p.n_seen, 0) AS BIGINT) AS n_seen,
      |       CASE WHEN p.n_grams > 0
      |            THEN round((p.n_grams - p.n_seen) * 1.0 / p.n_grams, 6)
      |       END AS novelty
      |FROM documents d LEFT JOIN per p USING (doc_id)
      |WHERE d.doc_id % 2 = 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
      |         4 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q137 — HTML → TEXT EXTRACTION (the first stage of a crawl pipeline):
  //        wrap every fixture doc in deterministic markup — title,
  //        script block carrying a bare `<` (the naive-tag-strip trap),
  //        style block, comment, heading/paragraph split mid-text, and
  //        entity-encoded tail — then extract with stripHtml. The
  //        EXTRACTED STRING is hashed, so a leaked script token, welded
  //        words at a tag boundary, or a wrong entity-decode order all
  //        fail the row. The oracle replays the wrap and the exact
  //        regex chain (all RE2-compatible patterns).
  // -------------------------------------------------------------------
  def q137(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 6)
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><script type=\"text/javascript\">var x = 1 < 2;" +
        "</script><style>p { color: red }</style></head><body><h1>"),
      concat_ws(" ", slice(col("ts"), 1, 5)),
      lit("</h1><!-- hidden --><p>"),
      concat_ws(" ", slice(col("ts"), lit(6), size(col("ts")) - 5)),
      lit(" &amp; more &lt;tags&gt;</p></body></html>"))
    val ex = t.select(col("doc_id"), TextFunctions.stripHtml(html).as("text"))
    sorted(ex.select(col("doc_id"), col("text"),
      TextFunctions.nTokens(col("text")).as("n_tokens")))
  }

  val q137Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) >= 6
      |), h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><script type="text/javascript">var x = 1 < 2;' ||
      |    '</script><style>p { color: red }</style></head><body><h1>' ||
      |    array_to_string(ts[1:5], ' ') || '</h1><!-- hidden --><p>' ||
      |    array_to_string(ts[6:len(ts)], ' ') ||
      |    ' &amp; more &lt;tags&gt;</p></body></html>' AS html
      |  FROM t
      |), x AS (
      |  SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |        '(?s)<!--.*?-->', ' ', 'g'),
      |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '<[^>]+>', ' ', 'g'),
      |    '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      |    '&quot;', '"', 'g'), '&#39;', chr(39), 'g'), '&amp;', '&', 'g'),
      |    '\s+', ' ', 'g')) AS text
      |  FROM h
      |)
      |SELECT doc_id, text,
      |       CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
      |         AS n_tokens
      |FROM x
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q138 — URL CANONICALIZATION (the pre-dedup key for crawl corpora):
  //        plant per-doc URLs exercising every rule at once — upper-case
  //        scheme/host, www. prefix, default :80 port, trailing slash,
  //        tracking params (utm_/gclid) mixed INTO the params in two
  //        different orders, fragments — and canonicalize. Docs sharing
  //        (host, path) collapse to one canonical key across all the
  //        surface variants. The canonical STRING is hashed; the oracle
  //        replays the plant and the full rule chain (regex + list
  //        filter/sort — all RE2/portable).
  // -------------------------------------------------------------------
  def q138(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, lit("HTTP")).otherwise(lit("http")), lit("://"),
      when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
      lit("Example"), (id % 50).cast("string"), lit(".COM"),
      when(id % 5 === 0, lit(":80")).otherwise(lit("")),
      lit("/Path/"), (id % 20).cast("string"),
      when(id % 4 === 0, lit("/")).otherwise(lit("")),
      when(id % 2 === 0, lit("?b=2&utm_source=feed&a=1"))
        .otherwise(lit("?a=1&b=2&gclid=xyz")),
      when(id % 7 === 0, lit("#section")).otherwise(lit("")))
    sorted(docs(s, dir).select(col("doc_id"), url.as("url"))
      .withColumn("canonical",
        TextFunctions.canonicalizeUrl(col("url"))))
  }

  val q138Sql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |    'Example' || CAST(doc_id % 50 AS VARCHAR) || '.COM' ||
      |    (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
      |    '/Path/' || CAST(doc_id % 20 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
      |    (CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=feed&a=1'
      |          ELSE '?a=1&b=2&gclid=xyz' END) ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '#section' ELSE '' END) AS url
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, url, trim(url) AS u0,
      |    regexp_replace(trim(url), '#.*$', '', 'g') AS nofrag
      |  FROM u
      |), p AS (
      |  SELECT doc_id, url, u0,
      |    lower(regexp_extract(nofrag,
      |      '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS aft
      |  FROM c
      |), q AS (
      |  SELECT doc_id, url, u0, scheme,
      |    regexp_replace(lower(regexp_extract(aft, '^([^/?]*)', 1)),
      |      '(^|@)www\.', '\1', 'g') AS auth1,
      |    regexp_replace(aft, '^[^/?]*', '') AS pathq
      |  FROM p
      |), r AS (
      |  SELECT doc_id, url, u0, scheme, pathq,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(auth1, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(auth1, ':443$', '')
      |         ELSE auth1 END AS auth,
      |    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
      |      '/+$', '') AS path1,
      |    regexp_extract(pathq, '\?(.*)$', 1) AS qs
      |  FROM q
      |), f AS (
      |  SELECT doc_id, url, u0, scheme, auth,
      |    CASE WHEN path1 = '' THEN '/' ELSE path1 END AS path,
      |    list_sort(list_filter(string_split(qs, '&'), x ->
      |      x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid)(=|$)')))
      |      AS ps
      |  FROM r
      |)
      |SELECT doc_id, url,
      |  CASE WHEN scheme = '' THEN u0
      |       ELSE scheme || '://' || auth || path ||
      |            (CASE WHEN len(ps) > 0
      |                  THEN '?' || array_to_string(ps, '&') ELSE '' END)
      |  END AS canonical
      |FROM f
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // q141 — WITHIN-DOCUMENT REPETITION REMOVAL (the C4/Gopher FIX stage:
  //        salvage a boilerplate-heavy doc instead of dropping it):
  //        plant an 8-line corpus where each doc repeats its OWN boiler
  //        line three times (once case-varied, pinning normalization),
  //        carries a line shared across docs but unique within each
  //        (must be KEPT everywhere — within-doc scope), and a repeated
  //        pure-punctuation line (structure — kept though duplicated).
  //        Drop all-but-first occurrences per doc, re-stitch; the
  //        oracle replays plant, normalization, per-doc census, and the
  //        string re-stitch — the REBUILT TEXT is hashed.
  // -------------------------------------------------------------------
  /** Planted 8-line corpus: per doc with ≥ 24 tokens — own first-10
    * tokens, own boiler (tokens 11..18), the GROUP's common line (first
    * 12 tokens of doc `doc_id % 7 + 1`), a structure line, the boiler
    * again (upper-cased on even ids), the tail tokens, the structure
    * line again, and the boiler a third time. */
  private def plantedRepetitionCorpus(s: SparkSession,
                                      dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 24)
    val ref = t.select(col("doc_id").as("rid"),
      concat_ws(" ", slice(col("ts"), 1, 12)).as("common"))
    def boiler = concat_ws(" ", slice(col("ts"), 11, 8))
    t.withColumn("rid", col("doc_id") % 7 + 1)
      .join(ref, "rid")
      .select(col("doc_id"), concat_ws("\n",
        concat_ws(" ", slice(col("ts"), 1, 10)),
        boiler,
        col("common"),
        lit("### 42 ###"),
        when(col("doc_id") % 2 === 0, upper(boiler)).otherwise(boiler),
        concat_ws(" ", slice(col("ts"), lit(19), size(col("ts")) - 18)),
        lit("### 42 ###"),
        boiler).as("text"))
  }

  def q141(s: SparkSession, dir: String): DataFrame = {
    val fixed = graft.operators.Dedup.removeRepeatedLines(
      plantedRepetitionCorpus(s, dir), "doc_id", "text", "\n")
    sorted(fixed.select(col("doc_id"),
      paraCount(col("text")).as("lines"), col("text")))
  }

  val q141Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), t AS (
      |  SELECT * FROM tok WHERE len(ts) >= 24
      |), ref AS (
      |  SELECT doc_id AS rid, array_to_string(ts[1:12], ' ') AS common
      |  FROM t
      |), planted AS (
      |  SELECT t.doc_id,
      |         array_to_string(ts[1:10], ' ') || chr(10) ||
      |         array_to_string(ts[11:18], ' ') || chr(10) ||
      |         common || chr(10) ||
      |         '### 42 ###' || chr(10) ||
      |         CASE WHEN t.doc_id % 2 = 0
      |              THEN upper(array_to_string(ts[11:18], ' '))
      |              ELSE array_to_string(ts[11:18], ' ') END || chr(10) ||
      |         array_to_string(ts[19:], ' ') || chr(10) ||
      |         '### 42 ###' || chr(10) ||
      |         array_to_string(ts[11:18], ' ') AS text
      |  FROM t JOIN ref ON ref.rid = t.doc_id % 7 + 1
      |), sp AS (
      |  SELECT doc_id, string_split(text, chr(10)) AS ps FROM planted
      |), occ AS (
      |  SELECT doc_id, u.i AS pos, u.para,
      |         trim(regexp_replace(regexp_replace(lower(u.para),
      |           '[^\p{L}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
      |  FROM sp, LATERAL (SELECT unnest(ps) AS para,
      |                           unnest(range(1, len(ps) + 1)) AS i) u
      |), ranked AS (
      |  SELECT doc_id, pos,
      |         row_number() OVER (PARTITION BY doc_id, md5(n)
      |                            ORDER BY pos) AS rn
      |  FROM occ WHERE n <> ''
      |), drops AS (
      |  SELECT doc_id, pos FROM ranked WHERE rn > 1
      |), kept AS (
      |  SELECT o.doc_id, o.pos, o.para
      |  FROM occ o LEFT JOIN drops d
      |    ON d.doc_id = o.doc_id AND d.pos = o.pos
      |  WHERE d.doc_id IS NULL
      |)
      |SELECT doc_id, CAST(count(*) AS INT) AS lines,
      |       string_agg(para, chr(10) ORDER BY pos) AS text
      |FROM kept GROUP BY doc_id
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
}
