package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID heuristics, quality scoring and
  * fingerprinting. All pure `Column` expressions, no UDFs, no shuffles.
  *
  * Codegen caveat: the helpers built on higher-order array lambdas
  * (`shingles`, `fingerprint`, `simhash64`) evaluate INTERPRETED per
  * element — fine as per-document scalar features, but corpus-scale
  * signature pipelines route through the explode + hash-aggregate
  * variants in [[graft.operators.Dedup]] (`shingleRows`,
  * `minhashSignatures`, `simhashSignatures`) instead. The regex/array
  * built-ins (`tokens`, `wordCount`, `qualityMetrics`, `langId`) are
  * fully codegen'd.
  */
object Texts {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word tokens via a BPE-ish regex (letter runs). Spark 4 `regexp_count`. */
  def wordCount(text: Column): Column = regexp_count(text, lit("[A-Za-z]+"))

  /** Contiguous word n-gram shingles (n >= 1) as an array of strings.
    * `slice` is 1-based; empty array when fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)), i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  def distinctShingles(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Tiny per-language stopword lists for the n-gram language-ID heuristic.
    * Deterministic and SQL-portable (the DuckDB oracle embeds the same
    * lists), not linguistically serious.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "他", "有", "这", "个")
  )

  /** Count of tokens belonging to `lang`'s stopword list. */
  def stopwordHits(text: Column, lang: String): Column =
    size(array_intersect(tokens(text), array(stopwords(lang).map(lit): _*)))

  /** Predicted language = argmax stopword hits (ties → lexicographically
    * LAST language code, from the (hits, lang) struct sort), "und" when no
    * list matches.
    */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(stopwordHits(text, l).as("hits"), lit(l).as("lang")))
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Simple quality metrics: character count, token count, mean token
    * length, punctuation ratio, stopword ratio (any language).
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTokens = size(tokens(text))
    val nPunct = regexp_count(text, lit("[\\p{Punct}]"))
    val allStops = stopwords.values.flatten.toSeq.distinct
    val nStop = size(array_intersect(tokens(text), array(allStops.map(lit): _*)))
    Seq(
      "n_chars" -> nChars.cast("long"),
      "n_tokens" -> nTokens.cast("long"),
      "mean_token_len" -> round((nChars - nTokens + 1).cast("double") / nTokens, 3),
      "punct_ratio" -> round(nPunct.cast("double") / greatest(nChars, lit(1)), 4),
      "stopword_ratio" -> round(nStop.cast("double") / greatest(nTokens, lit(1)), 4)
    )
  }

  /** Crawl HTML → text extraction — the stage BEFORE [[cleanText]] in a
    * web pipeline (raw crawl payloads are markup, not text): drop
    * `<script>`/`<style>` blocks wholesale (their content is code, not
    * prose), turn BLOCK-level tag boundaries into newlines (line
    * structure survives for the line-granular operators downstream),
    * strip every remaining tag, decode the six ubiquitous entities,
    * collapse whitespace runs, trim. Regex-only BY DESIGN —
    * not a conformant HTML5 parser (no DOM libs in a codegen'd column
    * chain, and crawl curation wants throughput over edge-case
    * fidelity; malformed markup degrades to extra stripped text, never
    * an error). Patterns use only Java-regex/RE2-identical constructs
    * (`(?is)` inline flags, lazy block quantifier, classes — no
    * lookaround), so the catalog oracle is exact; entity decode is
    * literal `replace` with `&amp;` LAST (decoding it first would
    * double-decode `&amp;lt;`).
    */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    // BLOCK-level boundaries become newlines so the extracted text keeps
    // its line structure — the downstream line operators (dedup_lines,
    // c4_filter) are line-granular, and flattening here would collapse
    // every page to one line.
    val withBreaks = regexp_replace(noBlocks,
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table)[^>]*>", "\n")
    val noTags = regexp_replace(withBreaks, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    // Collapse non-newline whitespace, tighten spaces around breaks,
    // collapse break runs, trim the ends.
    val oneSpace = regexp_replace(decoded, "[^\\S\\n]+", " ")
    val tight = regexp_replace(oneSpace, " ?\\n ?", "\n")
    val oneNl = regexp_replace(tight, "\\n{2,}", "\n")
    regexp_replace(oneNl, "^\\s+|\\s+$", "")
  }

  /** Gopher/MassiveText line- and word-SHAPE quality rules (Rae et al.,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", 2021, §A1.1) — the document filters that
    * complement [[qualityMetrics]]'s counts and the
    * [[graft.operators.Repetition]] family: what fraction of lines are
    * bullet-led or ellipsis-terminated, how symbol-heavy the text is,
    * and what share of words contain an alphabetic character. Pure
    * codegen'd `regexp_count` chain, zero exchanges; patterns use only
    * constructs with identical semantics in Java regex and RE2
    * (`(?m)`, classes, bounded repetition — no lookaround), so the
    * catalog oracle is exact.
    */
  def gopherMetrics(text: Column): Seq[(String, Column)] = {
    val nWords = size(tokens(text))
    val nLines = size(split(text, "\n"))
    val bulletLines = regexp_count(text, lit("(?m)^ *[-*•]"))
    val ellipsisLines = regexp_count(text, lit("(?m)(\\.\\.\\.|…) *$"))
    val symbols = regexp_count(text, lit("#|\\.\\.\\.|…"))
    // A word containing a letter matches the greedy \S*[A-Za-z]\S*
    // exactly once (leftmost-first and leftmost-longest agree: the
    // whole word); letterless words never match.
    val alphaWords = regexp_count(text, lit("\\S*[A-Za-z]\\S*"))
    Seq(
      "n_lines" -> nLines.cast("long"),
      "frac_bullet_lines" -> round(bulletLines.cast("double") / greatest(nLines, lit(1)), 4),
      "frac_ellipsis_lines" -> round(ellipsisLines.cast("double") / greatest(nLines, lit(1)), 4),
      "symbol_word_ratio" -> round(symbols.cast("double") / greatest(nWords, lit(1)), 4),
      "frac_alpha_words" -> round(alphaWords.cast("double") / greatest(nWords, lit(1)), 4))
  }

  /** Gopher's duplicate-LINE repetition metrics (Rae et al. 2021 Table
    * A1 — the two rows that complete [[graft.operators.Repetition]]'s
    * token/bigram/top-n-gram family): the fraction of a document's
    * lines that repeat an earlier line of the SAME document, and the
    * fraction of its line characters carried by those repeats.
    * Everything is closed-form over the line array (total line chars =
    * text length − separators; distinct-line chars via one per-doc
    * `aggregate` fold — interpreted per element, but per-document line
    * arrays are tens of entries, the acceptable scalar-feature case),
    * so the oracle replays exactly.
    */
  def dupLineMetrics(text: Column, sep: String = "\n"): Seq[(String, Column)] = {
    val lines = split(text, java.util.regex.Pattern.quote(sep))
    val distinct = array_distinct(lines)
    val n = size(lines)
    val nd = size(distinct)
    val totalChars = length(text) - (n - lit(1)) * lit(sep.length)
    val distinctChars =
      aggregate(distinct, lit(0), (acc, l) => acc + length(l))
    Seq(
      "frac_dup_lines" ->
        round((n - nd).cast("double") / greatest(n, lit(1)), 4),
      "frac_dup_line_chars" ->
        round((totalChars - distinctChars).cast("double") /
          greatest(totalChars, lit(1)), 4))
  }

  /** The Gopher keep decision at the published §A1.1 thresholds, over
    * [[qualityMetrics]] + [[gopherMetrics]]: 50 ≤ words ≤ 100 000, mean
    * word length in [3, 10], symbol-to-word ratio < 0.1, < 90% of lines
    * bullet-led, < 30% ellipsis-terminated, > 80% of words alphabetic.
    * (The stopword-presence rule is [[qualityMetrics]]'s
    * `stopword_ratio` > 0, its cross-lingual analogue here.)
    */
  def gopherKeep(text: Column): Column = {
    val q = qualityMetrics(text).toMap
    val g = gopherMetrics(text).toMap
    q("n_tokens").between(50L, 100000L) &&
      q("mean_token_len").between(3.0, 10.0) &&
      g("symbol_word_ratio") < 0.1 &&
      g("frac_bullet_lines") < 0.9 &&
      g("frac_ellipsis_lines") < 0.3 &&
      g("frac_alpha_words") > 0.8 &&
      q("stopword_ratio") > 0.0
  }

  /** PII patterns for [[redactPii]] — deliberately restricted to regex
    * constructs with identical semantics in Java regex (Spark) and RE2
    * (the DuckDB oracle): character classes, bounded repetition, \b.
    * No alternation/backtracking-sensitive syntax, so leftmost-first
    * (Java) and leftmost-longest (RE2) agree on every match.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\+\\d{7,15}\\b")

  /** Per-pattern PII counts over the ORIGINAL text (order-independent). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, pat) =>
      s"n_$name" -> regexp_count(text, lit(pat)).cast("long")
    }

  /** Redacted text: each PII class replaced by its `[CLASS]` marker,
    * applied in [[piiPatterns]] order. Pure codegen'd regexp_replace
    * chain — the scrub step of a training-data pipeline, run over every
    * document exactly once.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, s"[${name.toUpperCase}]")
    }

  /** Cleaned text — the standard pre-filter normalization pass of a
    * crawl pipeline: ASCII control characters (tabs and newlines
    * included) become spaces, space runs collapse to one, ends trimmed.
    * Pure codegen'd regexp chain, zero exchanges; case and punctuation
    * are preserved (casefolding is a modeling decision, not cleaning).
    * Patterns restricted to constructs identical in Java regex and
    * DuckDB's RE2, so the catalog oracle is exact.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1F\\x7F]", " "), " {2,}", " "))

  /** Unicode NFC normalization (UAX #15 canonical composition) — the
    * codepoint-level twin of [[cleanText]]: web crawls mix composed and
    * decomposed forms of the same visible text ("café" as 4 or 5
    * codepoints), which silently defeats exact dedup, tokenizer vocab
    * lookups, and decontamination string matches. Spark has no native
    * normalizer, so this is a compiled UDF over `java.text.Normalizer`
    * (null-preserving); both Java and DuckDB (`nfc_normalize`) implement
    * the same UAX #15 algorithm, so the catalog oracle is exact. NFC is
    * the conservative form — visible text is untouched, only equivalent
    * codepoint sequences unify (NFKC's compatibility folding changes
    * content — e.g. ﬁ → fi — and is a modeling decision, not cleaning).
    */
  def normalizeNfc(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    f(text)
  }

  /** Deterministic 64-bit document fingerprint: order-sensitive polynomial
    * rolling hash over tokens (Rabin–Karp style), built from `xxhash64`
    * token hashes folded with `aggregate` — codegen-friendly, no UDF.
    */
  def fingerprint(text: Column): Column =
    // Fold kept within [0, 2^32) so the multiply never overflows a Long
    // under ANSI arithmetic: acc*1000003 + h32 < 2^52 + 2^32 < 2^63.
    aggregate(
      tokens(text),
      lit(0L),
      (acc, tok) => pmod(acc * lit(1000003L) + pmod(xxhash64(tok), lit(1L << 32)), lit(1L << 32)))

  /** SimHash-64 over whitespace tokens: per bit, sum +1/-1 votes from each
    * token's xxhash64 bit, emit the sign bit. Pure expressions.
    */
  def simhash64(text: Column): Column = {
    val toks = tokens(text)
    val bits = (0 until 64).map { b =>
      val votes = aggregate(
        toks,
        lit(0L),
        (acc, tok) => acc + when(shiftright(xxhash64(tok), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    // bitwise OR, not +: bit 63 is Long.MinValue and ANSI addition overflows.
    bits.reduce(_ bitwiseOR _)
  }
}
