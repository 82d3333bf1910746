package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation — the first stage of every web-scale pretraining pipeline
  * (C4, Raffel et al. 2020; RefinedWeb, Penedo et al. 2023: URL filtering
  * and URL-level dedup run BEFORE any text processing, because they prune
  * at ~byte cost what text dedup would prune at tokenize-and-hash cost).
  *
  * Everything here is pure `Column` expression composition — no UDFs, so
  * the whole family stays inside whole-stage codegen and is expressible
  * verbatim in the DuckDB oracle SQL (same regex constructs, same list
  * HOFs). Per-row cost is a handful of regex extracts; the only exchange
  * in the family is the one `groupBy(url_norm)` shuffle in [[dedupByUrl]]
  * (thin rows: the normalized key + one id), so the operators scale as a
  * map-mostly pass over the corpus.
  *
  * DESIGN CONSTRAINT — expressions here must stay COMPACT, not just
  * correct: Catalyst's predicate pushdown substitutes any alias a filter
  * references, and `CollapseProject`/codegen fusion can re-inline an
  * expression at every use site. An earlier formulation of
  * [[registeredDomain]] via `split` + `element_at` + nested CASEs
  * expanded ~40× under a pushed-down blocklist filter and blew the
  * whole-stage-codegen unit past janino's 64 KB method limit
  * (interpreted fallback). The single-regex forms below keep every
  * substituted copy a handful of nodes, so the operators survive any
  * optimizer placement inside codegen.
  *
  * Parsing contract: a row whose value does not contain a `scheme://`
  * authority is treated as OPAQUE — `host`/`domain` are null and the
  * normalized form is the raw string unchanged. Malformed inputs degrade
  * to pass-through keys rather than nulls that would collapse into one
  * dedup group.
  */
object UrlCuration {

  /** Tracking query parameters stripped by [[normalizeUrl]] — the
    * analytics decorations that fragment otherwise-identical URLs
    * (the RefinedWeb/CCNet normalization step). One regex, shared
    * verbatim with the oracle SQL.
    */
  val TrackingParamRegex = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|ref_src)="

  /** Multi-part public suffixes recognized by [[registeredDomain]] — a
    * deliberately small embedded subset of the public suffix list
    * covering the common ccTLD second-level registries. An approximation
    * (documented as such): a full PSL lookup would be a broadcast join
    * against the published list; for blocklist/stats grouping the common
    * subset captures the overwhelming mass of web hosts.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "com.tr", "com.sg", "com.hk",
    "co.in", "co.kr", "co.za")

  private val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  // Applied to lower(url): scheme class needs no upper-case range.
  private val hostRe = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"
  private val pathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  /** eTLD+1 in ONE regex: `label.<multi-part-suffix>` if the host ends in
    * a recognized suffix, else `label.label` — leftmost-first alternation
    * picks the 3-label form when both match (identical semantics in Java
    * regex and DuckDB's RE2). No match (single-label host) → ''.
    */
  private val domainRe =
    "([^.]+\\.(?:" + MultiPartSuffixes.map(_.replace(".", "\\.")).mkString("|") +
      ")|[^.]+\\.[^.]+)$"

  /** Lowercased scheme, or null when the value has no `scheme://`. */
  def scheme(url: Column): Column = {
    val s = lower(regexp_extract(url, schemeRe, 1))
    when(s === "", lit(null).cast("string")).otherwise(s)
  }

  /** Host before the null-guard: lowercased, userinfo dropped, a
    * well-known default port (`:80`/`:443`) stripped, leading `www.`
    * stripped; '' when the value has no `scheme://` authority.
    * Port canonicalization is scheme-independent by design — a dedup
    * key merging the pathological `http://x:443` with `x` is harmless,
    * and the scheme-conditional form costs 3× the expression size.
    */
  private def rawHost(url: Column): Column =
    regexp_replace(regexp_replace(
      regexp_extract(lower(url), hostRe, 1), ":(80|443)$", ""), "^www\\.", "")

  /** [[rawHost]] with the opaque-input guard: null when unparseable. */
  def host(url: Column): Column = {
    val h = rawHost(url)
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Approximate eTLD+1 over a [[host]] value: last two labels, or last
    * three when the trailing two form a recognized multi-part suffix
    * ([[MultiPartSuffixes]]). Null host → null domain; a single-label
    * host (e.g. `localhost`) is its own domain.
    */
  def registeredDomain(hostCol: Column): Column =
    coalesce(nullif(regexp_extract(hostCol, domainRe, 1), lit("")), hostCol)

  /** Sorted, tracking-free query string ('' when none survives). The
    * non-greedy `^[^#]*?` anchor keeps the match BEFORE any fragment —
    * a bare `\\?(...)` would match a `?` inside the fragment (legal
    * there) and leak fragment content into the canonical key.
    */
  private def normQuery(url: Column): Column =
    array_join(array_sort(filter(
      split(regexp_extract(url, "^[^#]*?\\?([^#]*)", 1), "&"),
      x => x =!= "" && !x.rlike(TrackingParamRegex))), "&")

  /** Canonical URL key for dedup/grouping:
    *   - scheme and host lowercased; userinfo, default port, `www.`,
    *     and the fragment dropped;
    *   - path case PRESERVED (paths are case-sensitive), trailing
    *     slashes trimmed;
    *   - query params: tracking params ([[TrackingParamRegex]]) and
    *     empty segments dropped, the rest sorted byte-wise so
    *     `?b=2&a=1` and `?a=1&b=2` key identically.
    * Opaque (scheme-less) values pass through unchanged.
    */
  def normalizeUrl(url: Column): Column = {
    val h = rawHost(url)
    val sch = lower(regexp_extract(url, schemeRe, 1))
    val path = regexp_replace(regexp_extract(url, pathRe, 1), "/+$", "")
    val qn = normQuery(url)
    when(h === "", url).otherwise(concat(sch, lit("://"), h, path,
      when(qn === "", "").otherwise(concat(lit("?"), qn))))
  }

  /** docs + `host` / `domain` / `url_norm` bound as named columns so the
    * three outputs share one host parse instead of re-deriving it.
    */
  private def withUrlParts(docs: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    docs
      .withColumn("host", host(u))
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("__qn", normQuery(u))
      .withColumn("url_norm",
        when(col("host").isNull, u).otherwise(concat(
          lower(regexp_extract(u, schemeRe, 1)), lit("://"), col("host"),
          regexp_replace(regexp_extract(u, pathRe, 1), "/+$", ""),
          when(col("__qn") === "", "").otherwise(concat(lit("?"), col("__qn"))))))
      .drop("__qn")
  }

  /** `(doc_id, url, url_norm, host, domain)` — the parse/normalize
    * projection; a zero-exchange map over the corpus.
    */
  def parseUrls(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    withUrlParts(docs, urlCol)
      .select(col(idCol), col(urlCol).as("url"),
        col("url_norm"), col("host"), col("domain"))

  /** URL-level dedup: one group per normalized URL with the kept doc
    * (min id — the stable "first crawl wins" rule) and the group size.
    * The family's one shuffle: thin `(url_norm, id)` rows into a
    * map-side-combining min/count aggregate.
    */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    withUrlParts(docs, urlCol)
      .select(col("url_norm"), col(idCol).cast("long").as("__id"))
      .groupBy("url_norm")
      .agg(min("__id").as("keeper"), count(lit(1)).as("n_docs"))

  /** URL quality signals (the RefinedWeb-style URL heuristics — spammy
    * pages telegraph themselves in the URL before any text is fetched):
    * total length, path depth, surviving (non-tracking) param count,
    * tracking-decoration flag, digit count in the host (digit-heavy
    * hosts correlate with generated spam domains). All integer/boolean
    * outputs — deliberately no ratios, so the oracle compare never hits
    * cross-engine float-rounding ties; a filter stage divides as it
    * pleases. Opaque rows get null host_digits (no host evidence), 0
    * depth/params. Zero-exchange map.
    */
  def urlFeatures(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    val u = col(urlCol)
    val path = regexp_extract(u, pathRe, 1)
    val qs = regexp_extract(u, "^[^#]*?\\?([^#]*)", 1)
    val h = host(u)
    val qn = normQuery(u)
    docs.select(
      col(idCol),
      length(u).cast("long").as("url_len"),
      size(filter(split(path, "/"), x => x =!= "")).cast("long").as("path_depth"),
      when(qn === "", lit(0L))
        .otherwise(size(split(qn, "&")).cast("long")).as("n_params"),
      qs.rlike("(^|&)(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|ref_src)=")
        .as("has_tracking"),
      regexp_count(h, lit("[0-9]")).cast("long").as("host_digits"))
  }

  /** Persistable URL-dedup index: identical shape to [[dedupByUrl]]
    * output (`url_norm, keeper, n_docs`) — write once per corpus, then
    * shard ingest goes through [[dedupByUrlIncremental]] without ever
    * re-parsing corpus urls. (Counts and min-ids are the exact
    * sufficient statistic for URL dedup, so the index composes.)
    */
  def urlIndex(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = dedupByUrl(docs, urlCol, idCol)

  /** Incremental URL dedup: the shard's groups folded against a
    * persisted [[urlIndex]] — output rows are EXACTLY the full-corpus
    * [[dedupByUrl]] over (corpus ∪ shard) restricted to url keys the
    * shard touches (parity asserted in UrlCurationSpec). The corpus
    * pays only the index join on the already-normalized key; shard
    * ingest cost is the shard's own parse + one thin aggregate — the
    * 100 TB ingest shape shared by the other `*_incr` dedup families.
    * The refreshed index is this output unioned with the index rows
    * whose `url_norm` the shard did not touch.
    */
  def dedupByUrlIncremental(shard: DataFrame, index: DataFrame,
      urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    require(index.columns.sorted.sameElements(Array("keeper", "n_docs", "url_norm")),
      s"not a urlIndex frame (columns ${index.columns.mkString(",")}); " +
        "re-build it with UrlCuration.urlIndex")
    val s = graft.plans.Materialize(dedupByUrl(shard, urlCol, idCol)
      .select(col("url_norm"), col("keeper").as("__sk"), col("n_docs").as("__sn")))
    // Shard-restriction (the exact-key discipline): only index rows
    // whose url the shard touches can match the left join — an
    // 8-byte-hash broadcast semi-join cuts the index to a columnar scan
    // (hash false positives just fail the exact url_norm equality), so
    // no per-shard shuffle of the standing url index.
    val touched = index.join(
      broadcast(s.select(xxhash64(col("url_norm")).as("__uh"))),
      xxhash64(col("url_norm")) === col("__uh"), "left_semi")
    s.join(touched.select(col("url_norm"), col("keeper").as("__ck"),
          col("n_docs").as("__cn")),
        Seq("url_norm"), "left")
      .select(col("url_norm"),
        least(col("__sk"), coalesce(col("__ck"), col("__sk"))).as("keeper"),
        (col("__sn") + coalesce(col("__cn"), lit(0L))).as("n_docs"))
  }

  /** Blocklist filter on the registered domain (case-normalized both
    * sides) — rows whose domain parses to a blocked entry are dropped;
    * opaque rows (null domain) are KEPT (they carry no domain evidence).
    * The blocklist rides as a literal `isin` — at real scale a large
    * blocklist becomes a broadcast left-anti join, same plan shape.
    */
  def domainFilter(docs: DataFrame, blocked: Seq[String],
      urlCol: String = "url"): DataFrame = {
    val d = registeredDomain(host(col(urlCol)))
    docs.filter(d.isNull || !d.isin(blocked.map(_.toLowerCase): _*))
  }

  /** Post-filter per-domain doc counts — the curation monitoring view
    * (which domains dominate the corpus). One map-side-combining count.
    */
  def domainCounts(docs: DataFrame, blocked: Seq[String] = Nil,
      urlCol: String = "url"): DataFrame = {
    val lowered = blocked.map(_.toLowerCase)
    withUrlParts(docs, urlCol)
      .filter(col("domain").isNotNull &&
        (if (lowered.isEmpty) lit(true) else !col("domain").isin(lowered: _*)))
      .groupBy("domain").agg(count(lit(1)).as("n_docs"))
  }
}
