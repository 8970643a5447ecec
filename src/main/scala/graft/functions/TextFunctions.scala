package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines —
  * beyond the reference's surface (SURVEY §7.1 step 7 / BASELINE.json
  * north_star). Everything is built from codegen'd native functions
  * (`org.apache.spark.sql.functions`): no UDFs in the hot path, so
  * whole-stage codegen stays unbroken and the expressions push down /
  * prune like any other Catalyst expression.
  *
  * Engine-portability rule (for the DuckDB oracle): only constructs with
  * bit-identical semantics in both engines — whitespace-regex tokenizing,
  * md5, integer arithmetic, exact counts. No locale-dependent ops.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def nTokens(text: Column): Column = size(tokens(text))

  def nChars(text: Column): Column = length(text)

  /** Count of punctuation characters (fixed class, locale-free). */
  def nPunct(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Mean token length — a cheap quality signal. */
  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      nTokens(text).cast("double"))

  /** A small function-word profile per language for the n-gram/stopword
    * language-ID heuristic. Deterministic, tiny, broadcast-free (literal
    * arrays in the plan). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  /** Occurrences of any of `words` among the text's tokens (multiset count:
    * repeated stopwords count every time). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Stopword ratio against a language profile — quality signal. */
  def stopwordRatio(text: Column, words: Seq[String]): Column =
    stopwordHits(text, words).cast("double") / nTokens(text).cast("double")

  /** Language-ID: argmax of per-language stopword hit counts, deterministic
    * lexicographic tie-break (ties resolve to the alphabetically first
    * language; documents with zero hits everywhere get "und" =
    * undetermined). A real deployment would use character n-gram profiles;
    * the plumbing — score vector + argmax in one projection — is identical. */
  def langId(text: Column): Column =
    // let-binding via a single-element transform: the token array is
    // bound ONCE as the lambda variable and the six profile filters read
    // the bound VALUE — referencing `tokens(text)` directly from each
    // filter re-ran the regex split per profile (HOFs take the
    // interpreted path, which gets no common-subexpression elimination:
    // 6 splits per row, and any caller inlining langId into a filter
    // branch multiplied that again)
    element_at(transform(array(tokens(text)), toks => {
      // struct (hits DESC via negation, lang ASC) → array_min = argmax
      val scored = langProfiles.sortBy(_._1).map { case (lang, words) =>
        struct(
          (-size(filter(toks, t => t.isInCollection(words)))).as("neg"),
          lit(lang).as("lang"))
      }
      val best = array_min(array(scored: _*))
      when(best.getField("neg") === 0, lit("und"))
        .otherwise(best.getField("lang"))
    }), 1)

  /** Best-profile hit count (the score behind [[langId]]). */
  def langScore(text: Column): Column = {
    val toks = tokens(text)
    val hits = langProfiles.sortBy(_._1)
      .map { case (_, words) => size(filter(toks, t => t.isInCollection(words))) }
    greatest(hits: _*)
  }

  /** Composite quality score in [0,1]: penalizes extreme length, missing
    * punctuation and stopword-free (non-linguistic) text. Deterministic
    * rational arithmetic; the exact formula is arbitrary but fixed. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenOk = when(nTokens(text).between(10, 1000), lit(1.0)).otherwise(lit(0.5))
    val punctOk = when(nPunct(text) > 0, lit(1.0)).otherwise(lit(0.8))
    val swr = stopwordRatio(text, stopwords)
    val swOk = when(swr > 0.05, lit(1.0)).otherwise(lit(0.6))
    round(lenOk * punctOk * swOk, 6)
  }

  /** Exact-dup fingerprint: md5 of whitespace-normalized lowercase text.
    * md5 is bit-identical across engines (unlike xxhash64, which DuckDB
    * lacks) — the oracle can replicate it. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Portable 60-bit token hash: first 15 hex digits of md5 → BIGINT.
    * Used by simhash/minhash so the DuckDB oracle can reproduce signatures
    * exactly (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`). */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * non-space symbols — the pre-tokenization pass of byte-pair encoders
    * (contraction splitting omitted: the char classes below behave
    * identically in Java regex and RE2, which keeps the DuckDB oracle
    * exact). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def nBpeTokens(text: Column): Column = size(bpeTokens(text))

  /** Winnowing document fingerprints (the rolling-hash fingerprint
    * scheme): hash every character k-gram of the normalized text, keep
    * each w-window's minimum hash — a deterministic ~2/(w+1) sample of
    * positions robust to insertions/reordering. Implemented as a native
    * per-row Expression ([[graft.functions.WinnowFingerprints]]): the
    * higher-order-function formulation re-evaluates the normalization
    * inside every lambda element (O(n²) interpreted). md5-derived hashes
    * keep the DuckDB oracle exact. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    VectorExpressions.winnow(text, k, w)

  /** Word n-gram shingles (space-joined) from a PRE-COMPUTED token-array
    * column. Stage the tokens with [[tokens]] in a projection first: the
    * HOF lambda here is CodegenFallback and re-evaluates its argument
    * subtree per element, so handing it the raw `split` expression costs
    * O(tokens²) re-splits per document — a bound column reference makes
    * each element O(n). */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
    when(size(toks) < n, array(array_join(toks, " "))).otherwise(grams)
  }

  /** Word n-gram shingles (space-joined) of the text, as an array column.
    * Documents shorter than n tokens produce their full token string as the
    * single shingle (so no document silently vanishes from dedup).
    * Convenience form — inside an operator pipeline prefer staging
    * [[tokens]] in its own projection and calling [[shinglesFromTokens]]
    * (see its scaladoc for why). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** PII redaction patterns — deliberately in the Java∩RE2 regex subset so
    * the DuckDB oracle (RE2) replaces byte-identically: no lookarounds, no
    * backrefs, only literal classes and bounded quantifiers. Order
    * matters: emails first (their local parts contain digit runs), then
    * IPv4 (dotted digit groups shorter than the long-number floor), then
    * bare long digit runs (phone/SSN/card numbers). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val LongNumberPattern = "[0-9]{9,}"

  /** Redact PII for training-data scrubbing: emails → `<EMAIL>`, IPv4 →
    * `<IP>`, ≥9-digit runs → `<NUM>`. Three chained codegen'd
    * regexp_replace calls — a pure per-row projection (no shuffle, no UDF)
    * that composes with scan pruning; at 100 TB the scrub is one pass over
    * the text column. Pattern-match recall is the usual regex-PII
    * tradeoff — extend the pattern list per policy, keeping to the
    * Java∩RE2 subset if oracle parity must hold. */
  /** HTML → text extraction, the FIRST stage of every crawl pipeline
    * (the trafilatura/jusText job reduced to its deterministic core):
    * drop comments and `script`/`style` blocks wholesale (their content
    * is code, not prose — a naive tag-strip would leak `var x = 1 < 2`
    * into the corpus), replace every remaining tag with a space (so
    * `</h1><p>` cannot weld two words together), decode the six
    * entities that dominate real markup (`&amp;` LAST, so a literal
    * `&amp;lt;` decodes to the text `&lt;`, not to `<`), and collapse
    * whitespace. Pure per-row regex chain — no UDF, composable with
    * scan pruning; every pattern is RE2-compatible so an external
    * engine replays the extraction byte-for-byte. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?s)<!--.*?-->", " "),
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "),
        "&lt;", "<"),
        "&gt;", ">"),
        "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** [[stripHtml]] preserving PARAGRAPH STRUCTURE: block-level tag
    * boundaries (`p div h1–h6 li ul ol tr table blockquote section
    * article` and `br`) become newlines BEFORE the generic tag strip,
    * so the extracted text keeps one line per block — the shape the
    * paragraph/line dedup stages need (a real extractor emits blocks;
    * [[stripHtml]]'s single-line collapse is the bag-of-words shape).
    * Within lines whitespace collapses to single spaces, newline runs
    * collapse to one, and edge newlines are trimmed. Same comment /
    * script / style removal and entity decode as [[stripHtml]]; every
    * pattern is RE2-compatible for external replay. */
  def stripHtmlBlocks(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?s)<!--.*?-->", " "),
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val withBreaks = regexp_replace(noBlocks,
      "(?i)<(?:/?(?:p|div|h[1-6]|li|ul|ol|tr|table|blockquote|section|" +
        "article)\\b[^>]*|br\\s*/?)>", "\n")
    val noTags = regexp_replace(withBreaks, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "),
        "&lt;", "<"),
        "&gt;", ">"),
        "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    val squashed = regexp_replace(regexp_replace(regexp_replace(decoded,
      "[ \\t\\r\\f]+", " "), " ?\\n ?", "\n"), "\\n+", "\n")
    trim(regexp_replace(squashed, "^\\n+|\\n+$", ""))
  }

  /** URL canonicalization — the standard pre-dedup normalization for
    * crawl corpora (two crawls of one page must map to ONE key before
    * URL-level dedup can work): lowercase scheme and host, strip a
    * leading `www.`, strip the scheme's default port (`:80` for http,
    * `:443` for https — others kept), drop the fragment, drop tracking
    * parameters (`utm_*`, `gclid`, `fbclid`), SORT the surviving query
    * parameters (param order is not page identity), and collapse any
    * trailing slash run on the path (empty path → `/`). Userinfo and
    * non-default ports pass through lowercased — they ARE identity.
    * Strings without a `scheme://` prefix are returned trimmed and
    * untouched (relative links are not canonicalizable without a base).
    *
    * Pure per-row regex + array HOFs (split → filter → sort → rejoin) —
    * no UDF; every pattern is RE2-compatible, so an external engine
    * replays the canonical form byte-for-byte. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val auth0 = lower(regexp_extract(afterScheme, "^([^/?]*)", 1))
    // the host starts after any userinfo '@' — anchor the www-strip to
    // either position so 'u:p@www.site.com' and 'www.site.com' agree
    val auth1 = regexp_replace(auth0, "(^|@)www\\.", "$1")
    val auth = when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .otherwise(auth1)
    val pathq = regexp_replace(afterScheme, "^[^/?]*", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path1 = regexp_replace(path0, "/+$", "")
    val path = when(path1 === "", lit("/")).otherwise(path1)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      // (=|$): a bare '?gclid' (no value) is the same tracker as
      // '?gclid=x' and must not split the dedup key
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)")))
    val qstr = when(size(params) > 0,
      concat(lit("?"), concat_ws("&", params))).otherwise(lit(""))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), auth, path, qstr))
  }

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      LongNumberPattern, "<NUM>")

  /** Within-document n-gram repetition ratio — the repetitive-text quality
    * signal (boilerplate, keyword stuffing, generation loops): fraction of
    * n-gram occurrences that are repeats of an earlier n-gram in the SAME
    * document, `1 - distinct/total` over the (multiset) shingles. 0 = no
    * internal repetition; → 1 as the document degenerates into a loop.
    * Expects a PRE-STAGED shingle array (see [[shinglesFromTokens]]);
    * per-row arithmetic only — no shuffle, no join, composes with scan
    * pruning like every quality score here. */
  def repetitionRatio(shingleArr: Column): Column =
    when(size(shingleArr) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(shingleArr)).cast("double")
        / size(shingleArr).cast("double"))
}
