package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + URL-level dedup — the FIRST dedup stage of every
 * crawl pipeline (CommonCrawl dedupes by canonical URL before any content
 * hash is computed: it is free compared to text hashing and removes the
 * recrawl bulk). The reference ingests files, not crawls, so this is part
 * of the training-data-pipeline surface, not §2.
 *
 * Canonical form (the standard safe subset of RFC 3986 normalization +
 * tracker-param stripping):
 *   - drop the fragment (`#...` never reaches the server),
 *   - lowercase scheme and host (case-insensitive by RFC),
 *   - strip a leading `www.` and the scheme's default port
 *     (:80 http, :443 https),
 *   - drop tracking query params (utm_*, gclid, fbclid, ref) and SORT the
 *     survivors (param order is almost always non-semantic; sorting makes
 *     `?a=1&b=2` ≡ `?b=2&a=1`),
 *   - collapse trailing slashes on a non-root path.
 *
 * Everything is row-local Column expressions — regex part-extraction plus
 * array HOFs for the param set — so the operator is shuffle-free at any
 * scale; the dedup groupBy that follows shuffles only the narrow
 * (canon_url, id) projection on a well-distributed key.
 */
object UrlOps {

  private val TrackerParams = Seq("utm_", "gclid=", "fbclid=", "ref=")

  /** Canonicalize one URL column. Absolute `scheme://` URLs are fully
    * normalized; anything unparseable (relative path, missing scheme,
    * mailto:) passes through DEFRAGMENTED BUT OTHERWISE UNTOUCHED — a
    * guard, not a normalization: without it the empty regex groups would
    * reassemble every unparseable input onto the near-constant key
    * `:///?query`, and urlDupGroups would falsely merge distinct pages
    * (min-id keep = silent data loss). Crawl frontiers do carry relative
    * hrefs, so the degraded case is real, not theoretical. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[^:]+://([^/?#]*)", 1))
    val auth1 = regexp_replace(auth0, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .otherwise(auth1)
    val path0 = regexp_extract(noFrag, "^[^:]+://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "" || path0 === "/", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query0 = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query0, "&"), p =>
        length(p) > 0 && !TrackerParams
          .map(t => p.startsWith(t)).reduce[Column](_ || _))), "&")
    when(scheme === "", noFrag)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** URL-level dedup groups: canonical URL → number of raw variants that
    * collapse onto it, number of rows, and the keeper (minimum id — the
    * deterministic first-crawled policy). Emits only groups that actually
    * collapsed (n_rows > 1), the actionable recrawl-removal set. */
  def urlDupGroups(df: DataFrame, id: String, url: String): DataFrame =
    df.select(col(id).as("uid"), col(url).as("raw"))
      .withColumn("canon_url", canonicalizeUrl(col("raw")))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("raw")).as("n_variants"),
        min(col("uid")).as("keep_id"))
      .filter(col("n_rows") > 1)

  /** Host and path of an absolute URL (no normalization — feed
    * canonicalizeUrl output when canonical parts are wanted). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[^:]+://([^/?#]*)", 1)
  def urlPath(url: Column): Column = {
    val p = regexp_extract(url, "^[^:]+://[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Robots-style DISALLOW filtering: drop every row whose URL host has a
    * rule whose path-prefix the URL path starts with (the robots.txt
    * `Disallow:` subset every polite crawler implements; also the shape
    * of editorial "kill this section" blocklists). Returns the SURVIVORS.
    *
    * Plan, built for a 100 TB crawl against a rules table of any size:
    * candidates come ONLY from the host equi-join (never a prefix theta
    * join against the whole rules table); the startswith residual
    * evaluates inside that join; matched ids then LEFT-ANTI against the
    * corpus. A URL with no rules on its host never leaves its map task
    * (left-semi probe side). Rules-per-host is bounded in practice
    * (robots files are KBs); a hostile million-rule host fans out only
    * ITS OWN urls × its rules, spread by the hash join. */
  def robotsFilter(df: DataFrame, id: String, url: String,
                   rules: DataFrame): DataFrame = {
    // rules: (host, prefix)
    val u = df.select(col(id).as("rid"),
      urlHost(col(url)).as("h"), urlPath(col(url)).as("p"))
    val blocked = u.join(rules.select(col("host").as("h"),
        col("prefix").as("pre")), Seq("h"), "inner")
      .filter(col("p").startsWith(col("pre")))
      .select(col("rid")).distinct()
    df.join(blocked.withColumnRenamed("rid", id), Seq(id), "left_anti")
  }

  /** Crawl POLITENESS schedule: per host, assign each URL a fetch slot
    * and offset so no host is hit more than once per `delaySeconds` —
    * the frontier-scheduling step between the robots filter and the
    * fetcher fleet. Slot order is (priority DESC, id) within host:
    * deterministic, and high-priority pages fetch first when the crawl
    * is cut short mid-budget.
    *
    * Plan: ONE per-host row_number window. A per-group window is the
    * scale-killer when groups are FEW (the q152/q167 lesson: 20 sources
    * → parallelism 20); here the group is the HOST — crawl frontiers
    * carry millions of them, parallelism is group-cardinality-bound,
    * and per-host state (one external sort of that host's URLs) is
    * exactly the bounded spillable case windows exist for. Same
    * operator, opposite cardinality, opposite verdict — the choice is
    * an argument about |groups|, never a habit. */
  def politenessSchedule(df: DataFrame, id: String, url: String,
                         priority: Column, delaySeconds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_h"))
      .orderBy(priority.desc, col(id))
    df.withColumn("_h", urlHost(col(url)))
      .withColumn("slot", row_number().over(w).cast("long") - 1L)
      .select(col(id), col("_h").as("host"), col("slot"),
        (col("slot") * delaySeconds).as("fetch_offset_s"))
  }
}
