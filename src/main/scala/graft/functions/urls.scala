package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL primitives for web-corpus curation: host extraction and
  * canonicalization (fragment strip, tracking-param removal,
  * case-folded scheme+authority) — the normalize-before-dedup step a
  * crawl pipeline runs ahead of URL-level dedup and domain-level
  * filtering, where raw URLs differing only in `utm_*` decoration or
  * host case must collapse to one identity.
  *
  * The defaults are codegen'd row kernels (one static call per row,
  * sparkbridge/UrlCanon.scala); the *Hof variants are the
  * built-ins-only parity references (regexp_extract / substring_index
  * / filter / array_join), spec-asserted element-identical. Either
  * way the work is scan-local: zero shuffle, linear cost, and the
  * 100 TB plan shape is scan → (cheap) domain groupBy. The DuckDB
  * oracle mirror (q110) uses the HOF definitions via regexp_extract /
  * string_split / list_filter — keep all three in lockstep.
  */
object urls {

  /** scheme://authority prefix of an absolute URL ("" if absent). */
  private val headRe = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

  /** Lower-cased authority (host[:port]) of an absolute URL; empty
    * string when the input has no scheme://authority prefix (the
    * filter-don't-throw convention of the codec functions). Codegen'd
    * row kernel (org.apache.spark.sql.graft.UrlHost), element-identical
    * to [[hostHof]] — spec-asserted. */
  def host(c: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, UrlHost}
    Bridge.column(UrlHost(Bridge.expression(c)))
  }

  /** Canonical URL: drop the fragment, lower-case scheme+authority,
    * drop `utm_*` tracking params (other params keep their order),
    * and drop the '?' when no params survive. Path and query case is
    * preserved — those are case-sensitive per RFC 3986; only the
    * scheme+authority folds. Codegen'd row kernel
    * (org.apache.spark.sql.graft.CanonicalizeUrl), element-identical
    * to [[canonicalizeHof]] — spec-asserted. The HOF form is NOT the
    * default because its sub-expression references multiply under
    * CollapseProject: q110's synthesized-url projection cost ~17
    * CPU-seconds of plan/codegen compilation per session that way,
    * independent of row count. */
  def canonicalize(c: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, CanonicalizeUrl}
    Bridge.column(CanonicalizeUrl(Bridge.expression(c)))
  }

  /** The higher-order-function formulation of [[host]] (parity
    * reference; kept in lockstep with the q110 oracle SQL). */
  def hostHof(c: Column): Column =
    lower(regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))

  /** The higher-order-function formulation of [[canonicalize]] (parity
    * reference; kept in lockstep with the q110 oracle SQL). */
  def canonicalizeHof(c: Column): Column = {
    val noFrag = substring_index(c, "#", 1)
    val head = regexp_extract(noFrag, headRe, 1)
    val tail = noFrag.substr(length(head) + 1, length(noFrag))
    val path = substring_index(tail, "?", 1)
    // after-'?' slice; "" when no query (substr past end yields "")
    val rawQ = tail.substr(length(path) + 2, length(tail))
    val params = filter(split(rawQ, "&"),
      p => p =!= "" && not(p.startsWith("utm_")))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(lower(head), path, query)
  }
}
