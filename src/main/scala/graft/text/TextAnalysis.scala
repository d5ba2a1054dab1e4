package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is a narrow (per-row) transformation built from
  * codegen'd `org.apache.spark.sql.functions` — no UDFs, no shuffles.
  * On a 100 TB corpus these run as a single scan with whole-stage
  * codegen; any aggregation the caller adds on top gets map-side
  * partial aggregation for free.
  *
  * Hash parity note: fingerprints use md5 (hex) → first-N-hex-digits →
  * integer, which every engine reproduces bit-for-bit. For pure-speed
  * paths where cross-engine parity is not needed, swap in `xxhash64`
  * (also codegen'd, ~10× faster than md5).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** BPE-ish word/number/punct tokens: runs of letters, runs of digits,
    * or single non-alphanumeric marks — the standard pre-tokenizer shape
    * (regex kept engine-portable: no shorthand classes). */
  val wordTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def wordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(wordTokenPattern), lit(0))

  /** Tiny embedded stopword lists for the language-ID heuristic. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
  val xxStopwords: Seq[String] =
    Seq("le", "la", "der", "die", "el", "los", "und", "et", "des", "du")

  /** Occurrence count of set members — a native expression
    * (graft.functions.StopwordHitCount) instead of the interpreted
    * `size(filter(toks, isInCollection))` HOF; identical results. */
  private def hitCount(toks: Column, words: Seq[String]): Column =
    graft.functions.StopwordHitCount.stopwordHits(toks, words)

  /** Language decision from materialized stopword-hit counts. */
  def langIdFromCounts(en: Column, xx: Column): Column =
    when(en > xx && en >= 2, lit("en"))
      .when(xx > en && xx >= 2, lit("xx"))
      .otherwise(lit("und"))

  /** Adds a `lang_pred` column ("en"/"xx"/"und"): stopword-hit-count
    * language ID (n-gram-free heuristic: function words are the
    * strongest cheap signal). The token array and both hit counts are
    * materialized as real columns first — the when-chain references
    * each count four times, and inline subtrees would re-tokenize the
    * document on every reference (HOFs evaluate interpreted). */
  def withLangPred(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_toks", tokens(col(textCol)))
      .withColumn("_en", hitCount(col("_toks"), enStopwords))
      .withColumn("_xx", hitCount(col("_toks"), xxStopwords))
      .withColumn("lang_pred", langIdFromCounts(col("_en"), col("_xx")))
      .drop("_toks", "_en", "_xx")

  /** Column-level convenience form (tests / one-off use); hot paths go
    * through [[withLangPred]] to avoid per-reference re-tokenization. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    langIdFromCounts(hitCount(t, enStopwords), hitCount(t, xxStopwords))
  }

  /** Fraction of tokens that are (English) stopwords.
    * Convenience form: re-tokenizes per call; batch scoring goes
    * through [[withQualityColumns]] which tokenizes once per row. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    hitCount(t, enStopwords) / size(t)
  }

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", "")) / length(text)

  /** Composite quality score in [0,1]: linear blend of stopword ratio
    * (naturalness), low punctuation density, and length. Deliberately
    * arithmetic-only so external oracles reproduce it exactly.
    * Convenience form — see [[withQualityColumns]] for the hot path. */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text))
    stopwordRatio(text) * 0.5 +
      (lit(1.0) - punctRatio(text)) * 0.3 +
      least(nTok / lit(100.0), lit(1.0)) * 0.2
  }

  /** Adds `n_tokens`, `stop_ratio`, `punct_ratio`, `quality_score` with
    * ONE tokenization and ONE punctuation scan per row: the token array
    * and every count are materialized as real columns first, so the
    * ratio/score arithmetic references cheap ints instead of re-running
    * `split`/`regexp_replace` per sub-expression (same rule as
    * [[withLangPred]] — CollapseProject keeps the boundary because the
    * non-cheap aliases are referenced more than once).
    *
    * Ratios and the composite are emitted UNROUNDED on purpose: they are
    * pure IEEE-double expressions of exact ints, so any engine computing
    * the same tree produces bit-identical doubles — no cross-engine
    * `round(double, n)` tie-breaking semantics involved (Spark rounds the
    * shortest decimal representation, DuckDB the binary value; they
    * disagree within one ulp of a tie).
    */
  def withQualityColumns(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("_toks", tokens(t))
      .withColumn("_ntok", size(col("_toks")))
      .withColumn("_hits", hitCount(col("_toks"), enStopwords))
      .withColumn("_npunct", length(regexp_replace(lower(t), "[a-z0-9 ]", "")))
      .withColumn("n_tokens", col("_ntok"))
      .withColumn("stop_ratio", col("_hits") / col("_ntok"))
      .withColumn("punct_ratio", col("_npunct") / length(t))
      .withColumn("quality_score",
        col("stop_ratio") * 0.5 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(col("_ntok") / lit(100.0), lit(1.0)) * 0.2)
      .drop("_toks", "_ntok", "_hits", "_npunct")
  }

  // ------------------------------------------------------------- PII

  /** PII patterns (Java regex, codegen'd regexp_replace/regexp_count).
    * Deliberately high-recall shapes — a training pipeline prefers a
    * few over-redactions to leaked addresses. Application ORDER
    * matters: email before ip/phone (user@host digits), id before
    * phone (123-45-6789 parses as a phone), ip before phone
    * (192.168.1.1 parses as a phone). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val idPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phonePattern = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Text with emails, SSN-style ids, IPv4s, and phone-like digit runs
    * replaced by type tags. Pure narrow per-row op — four chained
    * codegen'd regex passes, zero shuffles at any corpus size. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailPattern, "<EMAIL>"),
          idPattern, "<ID>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Adds `text_redacted` plus per-type match counts (counted BEFORE
    * redaction, on the same pass ordering, so counts and replacements
    * agree: e.g. an SSN inside a longer digit run counts as the
    * earlier-applied type). */
  def withPiiRedacted(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, emailPattern, "<EMAIL>")
    val afterId = regexp_replace(afterEmail, idPattern, "<ID>")
    val afterIp = regexp_replace(afterId, ipv4Pattern, "<IP>")
    df.withColumn("n_emails", regexp_count(t, lit(emailPattern)))
      .withColumn("n_ids", regexp_count(afterEmail, lit(idPattern)))
      .withColumn("n_ips", regexp_count(afterId, lit(ipv4Pattern)))
      .withColumn("n_phones", regexp_count(afterIp, lit(phonePattern)))
      .withColumn("text_redacted",
        regexp_replace(afterIp, phonePattern, "<PHONE>"))
  }

  /** HTML → text: the first cleaning pass of every web-crawl training
    * pipeline. Tags (`<...>`) become spaces, the five ubiquitous
    * character entities decode, runs of whitespace collapse to one
    * space, ends trim. Engine-portable by construction: the tag
    * pattern `<[^>]*>` and the EXPLICIT whitespace class
    * `[ \t\n\r]+` mean the same thing under Java regex and RE2
    * (`\s` does not — Java's includes \x0B, RE2's doesn't), and
    * entity decoding is plain non-regex replace. Script/style
    * CONTENT is not dropped (that needs an HTML parser, not a
    * regex); this is the cheap first pass that runs on every crawled
    * byte, with parser-grade extraction downstream on survivors. */
  def stripHtml(html: Column): Column = {
    val noTags = regexp_replace(html, "<[^>]*>", " ")
    // `&amp;` decodes LAST (standard unescape order): decoding it
    // first would double-decode escaped entities ('&amp;lt;' must
    // yield the literal '&lt;', not '<')
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** URL CANONICALIZATION — the crawl-dedup key derivation (two
    * fetches of the "same page" differ in host case, default ports,
    * tracking params, fragments, duplicate/trailing slashes; dedup
    * must group them). Steps, all engine-portable regex (no
    * lookaround — RE2-safe, 'g' semantics = Spark's replace-all):
    * scheme+host lowercased; default :80/:443 stripped per scheme;
    * fragment dropped; every `utm_*` query param removed (non-first
    * params, then a leading utm with a successor, then a lone one);
    * duplicate path slashes collapsed; trailing slash dropped
    * (before `?` too). Pure per-row codegen'd kernels — a 100 TB
    * crawl canonicalizes at scan speed. */
  def canonicalizeUrl(url: Column): Column = {
    val shPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val sh1 = lower(regexp_extract(url, shPat, 0))
    val sh2 = when(sh1.startsWith("http://"),
        regexp_replace(sh1, ":80$", ""))
      .when(sh1.startsWith("https://"),
        regexp_replace(sh1, ":443$", ""))
      .otherwise(sh1)
    val rest0 = regexp_replace(url, shPat, "")
    val r1 = regexp_replace(rest0, "#.*$", "")
    val r2 = regexp_replace(r1, "&utm_[^&]*", "")
    val r3 = regexp_replace(r2, "[?]utm_[^&]*&", "?")
    val r4 = regexp_replace(r3, "[?]utm_[^&]*$", "")
    val r5 = regexp_replace(r4, "/{2,}", "/")
    val r6 = regexp_replace(r5, "/[?]", "?")
    val r7 = regexp_replace(r6, "/$", "")
    concat(sh2, r7)
  }

  /** 60-bit content fingerprint: first 15 hex digits of md5(lower(text))
    * as a long. Used for exact-duplicate detection at scale — group or
    * join on the fingerprint instead of the full text (shuffle keys are
    * 8 bytes, not document bodies). */
  def fingerprint64(text: Column): Column =
    conv(substring(md5(lower(text)), 1, 15), 16, 10).cast("long")

  /** Per-document token statistics. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).as("n_ws_tokens"),
      size(wordTokens(col(textCol))).as("n_word_tokens"))
}
