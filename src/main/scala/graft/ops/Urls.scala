package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass web-crawl curation
  * runs BEFORE exact dedup, because raw crawl URLs are noisy aliases of
  * one resource: case-shuffled schemes/hosts, default ports, tracking
  * parameters, shuffled query order, fragments, trailing slashes. Exact
  * dedup on the raw string misses all of them; canonicalize-then-group
  * collapses them in one pass.
  *
  * Rules (the conservative, always-safe subset of RFC 3986 §6 plus the
  * universal tracking-param strip):
  *  - scheme and host lowercased (case-insensitive by spec)
  *  - default port dropped (`:443` for https, `:80` for http); any
  *    other port kept — a non-default port IS a different resource
  *  - fragment dropped (never sent to the server)
  *  - `utm_*` query parameters dropped, the rest SORTED bytewise and
  *    rejoined (query order is not significant for the overwhelming
  *    majority of endpoints; sorting makes order-shuffled aliases
  *    collide)
  *  - trailing path slash dropped except for the root path
  *
  * Contract: well-formed inputs are `scheme://host[:port]/path
  * [?query][#fragment]` (the shape a crawler's frontier emits); a
  * string missing the `://` or the path slash canonicalizes to NULL —
  * loudly excluded from the dedup groupBy rather than silently
  * garbled. Entirely ROW-LOCAL — pure
  * string ops, no shuffle, codegen-friendly — so at 100 TB it rides
  * the scan; the dedup after it is one combinable groupBy on the
  * canonical string.
  */
object Urls {

  /** One compiled pass ([[graft.functions.Kernels.canonicalizeUrl]],
    * the Kernels tier precedent): the composed-Column form below
    * generated a ~50-node string-expression tree that re-sliced the
    * input per sub-expression — corpus-linear compute both engines pay,
    * but ours paid it several times over per row. The kernel parses
    * once. [[canonicalizeUrlComposed]] stays as the executable spec;
    * UrlsSpec asserts both forms agree on the alias corpus and edges. */
  def canonicalizeUrl(url: Column): Column =
    graft.functions.GraftFunctions.canonicalUrl(url)

  private[graft] def canonicalizeUrlComposed(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    // exactly one "://" by contract, so the -1 split is the remainder
    val rest = substring_index(noFrag, "://", -1)
    val hp = substring_index(rest, "/", 1)
    val tail = substr(rest, length(hp) + 1, length(rest))
    val qm = instr(tail, "?")
    val path0 = when(qm > 0, substr(tail, lit(1), qm - 1)).otherwise(tail)
    val query = when(qm > 0, substr(tail, qm + 1, length(tail))).otherwise(lit(""))
    val cp = instr(hp, ":")
    val host = lower(when(cp > 0, substr(hp, lit(1), cp - 1)).otherwise(hp))
    val port = when(cp > 0, substr(hp, cp + 1, length(hp))).otherwise(lit(""))
    val portKeep = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = when(length(path0) > 1 && path0.endsWith("/"),
      substr(path0, lit(1), length(path0) - 1)).otherwise(path0)
    val params = filter(split(query, "&"),
      p => length(p) > 0 && !p.startsWith("utm_"))
    val qSorted = array_join(array_sort(params), "&")
    val wellFormed = instr(noFrag, "://") > 0 && instr(rest, "/") > 0
    when(wellFormed,
      concat(scheme, lit("://"), host, portKeep, path,
        when(qSorted =!= "", concat(lit("?"), qSorted)).otherwise(lit(""))))
  }

  /** DuckDB expression replaying [[canonicalizeUrl]] of `u` (a column
    * reference or parenthesized expression). */
  def canonicalizeUrlSql(u: String): String = {
    val noFrag = s"(CASE WHEN strpos($u, '#') > 0" +
      s" THEN substr($u, 1, strpos($u, '#') - 1) ELSE $u END)"
    val scheme = s"lower(substr($noFrag, 1, strpos($noFrag, '://') - 1))"
    val rest = s"substr($noFrag, strpos($noFrag, '://') + 3)"
    val hp = s"substr($rest, 1, strpos($rest, '/') - 1)"
    val tail = s"substr($rest, strpos($rest, '/'))"
    val path0 = s"(CASE WHEN strpos($tail, '?') > 0" +
      s" THEN substr($tail, 1, strpos($tail, '?') - 1) ELSE $tail END)"
    val query = s"(CASE WHEN strpos($tail, '?') > 0" +
      s" THEN substr($tail, strpos($tail, '?') + 1) ELSE '' END)"
    val host = s"lower(CASE WHEN strpos($hp, ':') > 0" +
      s" THEN substr($hp, 1, strpos($hp, ':') - 1) ELSE $hp END)"
    val port = s"(CASE WHEN strpos($hp, ':') > 0" +
      s" THEN substr($hp, strpos($hp, ':') + 1) ELSE '' END)"
    val portKeep = s"(CASE WHEN $port = ''" +
      s" OR ($scheme = 'https' AND $port = '443')" +
      s" OR ($scheme = 'http' AND $port = '80')" +
      s" THEN '' ELSE ':' || $port END)"
    val path = s"(CASE WHEN len($path0) > 1 AND $path0 LIKE '%/'" +
      s" THEN substr($path0, 1, len($path0) - 1) ELSE $path0 END)"
    val qSorted = "COALESCE(array_to_string(list_sort(" +
      s"[p FOR p IN string_split($query, '&')" +
      " IF len(p) > 0 AND NOT starts_with(p, 'utm_')]), '&'), '')"
    s"(CASE WHEN strpos($noFrag, '://') > 0 AND strpos($rest, '/') > 0" +
      s" THEN $scheme || '://' || $host || $portKeep || $path" +
      s" || (CASE WHEN $qSorted <> '' THEN '?' || $qSorted ELSE '' END)" +
      " END)"
  }
}
