package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and registrable-domain extraction — the KEY
  * PRODUCERS behind per-domain curation. Web corpora key nearly every
  * curation step on the registrable domain (per-domain caps via
  * [[Sampling.capPerKey]], domain mixing, domain-skew stats), and these are
  * the row-local, shuffle-free operators that produce that key from a raw
  * `url` column.
  *
  * Every step is a deterministic regexp/array chain — RE2-safe patterns (no
  * lookahead, no backreferences) so a DuckDB oracle replays the identical
  * logic — and composes entirely from codegen'd built-ins (no UDF, no
  * custom expression needed: the semantics fit `regexp_*` + array HOFs).
  *
  * Scope: absolute http(s)-style URLs (`scheme://host[:port]/path?query
  * #fragment`). Userinfo (`user:pass@host`) is out of scope — crawled
  * corpora strip credentials long before curation. Scheme-less inputs are
  * canonicalized host-first with no scheme prefix (documented best-effort).
  */
object Urls {

  /** Query parameters dropped by [[canonicalizeUrl]]: the common
    * click-tracking noise (UTM campaign tags, Google/Facebook/Microsoft
    * click ids, mail-campaign ids) whose presence splits one logical page
    * into many distinct URLs. Anchored per-parameter; RE2-safe.
    *
    * Bare `ref` is deliberately NOT in the default set: unlike `utm_*` /
    * `gclid` it widely carries non-tracking payloads (branch/ref selectors,
    * referenced-object ids), so dropping it would merge genuinely distinct
    * pages — the exact over-normalization this file warns against. Callers
    * whose corpora use `ref` purely as a referrer tag pass their own
    * pattern to [[canonicalizeUrl(url:org\.apache\.spark\.sql\.Column,trackingPattern:String)*]].
    */
  val TrackingParamPattern: String =
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|yclid|ref_src)(=.*)?$"

  /** Two-label public suffixes (suffix-list-lite): when a host's last two
    * labels are one of these, the registrable domain is the last THREE
    * labels (`news.bbc.co.uk` → `bbc.co.uk`). A deliberately small, stable
    * subset of the public-suffix list covering the common country-code
    * second-level registries; unlisted suffixes fall back to the last two
    * labels, which is the right default for generic TLDs.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "gov.za", "ac.za",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.br", "net.br", "org.br", "gov.br",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "org.mx", "gob.mx",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.sg", "edu.sg", "gov.sg",
    "com.hk", "org.hk", "edu.hk",
    "com.tw", "org.tw", "gov.tw",
    "com.ar", "com.tr", "com.sa", "com.eg", "com.my", "com.ph", "com.vn",
    "co.id", "or.id", "go.id", "co.th", "or.th", "go.th")

  private def stripFragment(url: Column): Column = regexp_replace(url, "#.*", "")
  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
  private def afterScheme(u: Column): Column =
    regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Lowercased host (no port) of an absolute URL — row-local. A trailing
    * dot is stripped (`example.com.` is the fully-qualified spelling of the
    * same host; without the strip one domain would split into two curation
    * keys).
    */
  def host(url: Column): Column = {
    val hp = regexp_extract(afterScheme(stripFragment(url)), "^([^/?]*)", 1)
    lower(regexp_replace(regexp_replace(hp, ":[0-9]+$", ""), "\\.$", ""))
  }

  /** Canonical form: lowercase scheme and host, default port stripped
    * (`:80` under http, `:443` under https), fragment dropped, tracking
    * query parameters ([[TrackingParamPattern]]) removed with the surviving
    * parameters left in their original order, `?` dropped when the query
    * empties. Path and non-tracking parameters are preserved byte-for-byte
    * (over-normalizing paths merges genuinely distinct pages).
    */
  def canonicalizeUrl(url: Column): Column =
    canonicalizeUrl(url, TrackingParamPattern)

  /** [[canonicalizeUrl]] with a caller-supplied tracking-parameter pattern
    * (anchored per-parameter, RE2-safe) — for corpora whose referrer noise
    * differs from the default set (e.g. sites where bare `ref` IS tracking).
    */
  def canonicalizeUrl(url: Column, trackingPattern: String): Column = {
    val u1 = stripFragment(url)
    val scheme = schemeOf(u1)
    val rest = afterScheme(u1)
    val hostport = regexp_extract(rest, "^([^/?]*)", 1)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val hostL = lower(regexp_replace(regexp_replace(hostport, ":[0-9]+$", ""), "\\.$", ""))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portOut = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val qstr = regexp_extract(pathq, "[?](.*)", 1)
    val cleanQ = array_join(
      filter(split(qstr, "&"), p => p =!= "" && !p.rlike(trackingPattern)),
      "&")
    concat(
      when(scheme =!= "", concat(scheme, lit("://"))).otherwise(lit("")),
      hostL, portOut, path,
      when(cleanQ =!= "", concat(lit("?"), cleanQ)).otherwise(lit("")))
  }

  /** Registrable domain of a (lowercased) host: last two labels, or last
    * THREE when the last two are a listed two-label public suffix
    * ([[MultiPartSuffixes]]). IPv4 literals and one/two-label hosts are
    * their own key. Row-local array slicing — no join against a suffix
    * table; the 60-entry suffix set is a literal IN-list.
    */
  def registrableDomain(hostCol: Column): Column =
    registrableDomain(hostCol, MultiPartSuffixes)

  /** [[registrableDomain]] with a caller-supplied multi-label public-suffix
    * set (e.g. the full ~9k-entry public-suffix list, or a corpus-specific
    * subset). Bound ONCE as a literal IN-list — still row-local, no join.
    * A trailing dot on the host is stripped first (FQDN spelling parity
    * with [[host]]).
    */
  def registrableDomain(hostCol: Column, suffixes: Seq[String]): Column = {
    val h = regexp_replace(hostCol, "\\.$", "")
    val parts = split(h, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(h.rlike("^[0-9.]+$"), h)
      .when(size(parts) <= 2, h)
      .when(last2.isin(suffixes: _*), last3)
      .otherwise(last2)
  }

  /** The per-domain curation key straight from a raw URL column. */
  def domainOf(url: Column): Column = registrableDomain(host(url))
}
