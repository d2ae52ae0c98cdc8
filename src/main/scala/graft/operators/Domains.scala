package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** URL/domain curation — the first filter every web-corpus pipeline runs
  * (VERDICT r10 #2): registered-domain extraction from a crawl URL, a
  * blocklist anti-join, and the per-domain quality/dup-rate rollup that
  * drives domain-level sampling decisions. The reference's own data is
  * keyed by a fetched URL (`fetch.go:30-34` — one source URL per run);
  * a 100 TB crawl has billions, and domain is their primary curation axis.
  *
  * Registered-domain rule: lowercase the host, strip an explicit port,
  * then take the last TWO labels — or the last THREE when the host ends
  * in a known second-level public suffix (`co.nz`, `org.nz`, `ac.nz`,
  * `govt.nz`, `co.uk`, `com.au` — the NZ-centric slice of the public
  * suffix list, matching the reference's home registry; the full PSL is
  * a drop-in replacement for this table). Pure string expressions on
  * both engines — fully SQL-oracled.
  *
  * Scale shape: extraction is a codegen'd projection (no shuffle); the
  * blocklist join broadcasts (a blocklist is KBs); the report is one
  * domain-keyed aggregation with map-side partials. A pathological
  * mega-domain (half the crawl on one CDN host) is the classic skew key —
  * the report's exact distincts would then move to the existing
  * salting/sketch paths (`Skew`/`agg_approx`), kept exact here for the
  * oracle.
  *
  * FIXTURE: documents carry no URL column, so one is synthesized
  * deterministically — host picked from an 8-entry table by `doc_id % 8`
  * covering the edge cases (two-level TLDs, uppercase host, explicit
  * port, blocklisted domains), identical expressions on both engines.
  */
object Domains {

  private val Hosts = Seq(
    "data.example.co.nz",      // 2-level TLD → 3-label registered domain
    "www.example.com",
    "blog.spam-farm.net",      // blocklisted
    "archive.heritage.org.nz", // 2-level TLD
    "EN.Wikipedia.ORG",        // case normalization
    "media.example.com:8080",  // explicit port
    "ads.tracker.io",          // blocklisted
    "api.services.govt.nz")    // 2-level TLD

  private val MultiTlds =
    Seq("co.nz", "org.nz", "ac.nz", "govt.nz", "co.uk", "com.au")

  private val Blocklist = Seq("spam-farm.net", "tracker.io")

  // ------------------------------------------------------ URL synthesis

  private[graft] def fixtureUrlCol: Column =
    concat(lit("https://"),
      element_at(array(Hosts.map(lit): _*),
        (col("doc_id") % Hosts.size + 1).cast("int")),
      lit("/"), col("source"), lit("/"), col("doc_id").cast("string"))

  private[graft] def fixtureUrlSqlExpr: String = {
    val list = Hosts.map(h => s"'$h'").mkString("[", ", ", "]")
    s"concat('https://', ($list)[CAST(doc_id % ${Hosts.size} + 1 AS INT)], " +
      "'/', source, '/', CAST(doc_id AS VARCHAR))"
  }

  // ------------------------------------------------- domain extraction

  /** Frame-in/frame-out: adds `host` and `registered_domain` to any
    * frame with a `url` column — the reusable piece a real pipeline
    * applies straight after `docs_from_warc` (whose `target_uri` is a
    * URL column already).
    */
  def withDomain(df: DataFrame): DataFrame = {
    val hostport = regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1)
    val labels = split(col("host"), "[.]")
    val isMulti = MultiTlds.map(t => col("host").endsWith("." + t))
      .reduce(_ || _) && size(labels) >= 3
    df.withColumn("host",
        lower(regexp_replace(hostport, ":[0-9]+$", "")))
      .withColumn("registered_domain",
        when(isMulti, array_join(slice(labels, -3, 3), "."))
          .when(size(labels) >= 2, array_join(slice(labels, -2, 2), "."))
          .otherwise(col("host")))
  }

  /** SELECT-list snippet deriving `host`/`labels`/`registered_domain`
    * from a `url` column via lateral alias references (DuckDB-native) —
    * the oracle mirror of `withDomain`, shared with the link-graph
    * oracle in `HtmlExtract`.
    */
  private[graft] def domainSelectSql: String = {
    val multi = MultiTlds.map(t => s"host LIKE '%.$t'").mkString(" OR ")
    s"""lower(regexp_replace(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
       |                     ':[0-9]+$$', '')) AS host,
       |string_split(host, '.') AS labels,
       |CASE WHEN ($multi) AND len(labels) >= 3
       |       THEN array_to_string(labels[-3:], '.')
       |     WHEN len(labels) >= 2
       |       THEN array_to_string(labels[-2:], '.')
       |     ELSE host END AS registered_domain""".stripMargin
  }

  /** The fixture-bound extraction CTE both report oracles share. */
  private def domainSqlCte: String =
    s"""u AS (
       |  SELECT doc_id, source, text, $fixtureUrlSqlExpr AS url FROM documents
       |), d AS (
       |  SELECT doc_id, source, text, url,
       |         $domainSelectSql
       |  FROM u)""".stripMargin

  // ------------------------------------------------ curate_domain_filter

  /** Blocklist curation: keep documents whose registered domain is not
    * blocked. The blocklist side is an explicit `broadcast` — at 100 TB
    * the fact side never shuffles for this filter.
    */
  def domainFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urls = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), fixtureUrlCol.as("url"))
    val blocked = Blocklist.toDF("blocked_domain")
    withDomain(urls)
      .join(broadcast(blocked),
        col("registered_domain") === col("blocked_domain"), "left_anti")
      .select(col("doc_id"), col("url"), col("host"),
        col("registered_domain"))
  }

  val domainFilterSql: String = {
    val bl = Blocklist.map(d => s"'$d'").mkString(", ")
    s"""WITH ${domainSqlCte}
       |SELECT doc_id, url, host, registered_domain
       |FROM d WHERE registered_domain NOT IN ($bl)""".stripMargin
  }

  // ------------------------------------------------- stats_domain_report

  /** Per-domain rollup: doc counts, source spread, exact text dup-rate,
    * mean document length, blocklist flag — the table a curation run
    * reads to set per-domain sampling weights. One shuffle on the domain
    * key; distinct counts are exact (oracle-checkable); the 100 TB path
    * for a skewed mega-domain swaps them for approx_count_distinct.
    */
  def domainReport(spark: SparkSession, dir: String): DataFrame = {
    val urls = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), fixtureUrlCol.as("url"))
    withDomain(urls)
      .groupBy(col("registered_domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text"))).as("n_unique_texts"),
        sum(size(split(trim(col("text")), " ")).cast("long"))
          .as("n_words_total"))
      .withColumn("dup_rate",
        round(lit(1.0) -
          col("n_unique_texts").cast("double") / col("n_docs"), 6))
      .withColumn("avg_words",
        round(col("n_words_total").cast("double") / col("n_docs"), 6))
      .withColumn("blocked",
        col("registered_domain").isin(Blocklist: _*))
  }

  val domainReportSql: String = {
    val bl = Blocklist.map(d => s"'$d'").mkString(", ")
    s"""WITH ${domainSqlCte}
       |SELECT registered_domain,
       |       count(*) AS n_docs,
       |       count(DISTINCT source) AS n_sources,
       |       count(DISTINCT md5(text)) AS n_unique_texts,
       |       CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
       |         AS n_words_total,
       |       round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
       |             / count(*), 6) AS dup_rate,
       |       round(CAST(sum(len(string_split(trim(text), ' '))) AS DOUBLE)
       |             / count(*), 6) AS avg_words,
       |       registered_domain IN ($bl) AS blocked
       |FROM d GROUP BY registered_domain""".stripMargin
  }

  // ------------------------------------------------ curate_url_canonical

  /** URL canonicalization — the crawl-dedup key: the same page is
    * fetched under scheme-case, default-port, trailing-slash, fragment,
    * tracking-param and param-order variants, and exact text dedup only
    * catches it AFTER paying the fetch. Canonical form: lowercase
    * scheme+host, default port stripped per scheme, fragment dropped,
    * trailing slashes trimmed, tracking params (`utm_*`, `gclid`,
    * `fbclid`, `ref`) removed, surviving params SORTED. Pure string/
    * array expressions (split → filter → array_sort → join), identical
    * chains on both engines; a codegen'd projection, no shuffle.
    *
    * FIXTURE: six messy variants synthesized per `doc_id % 6`, covering
    * every rule; `n_params_dropped` audits the tracking strip.
    */
  private val UrlVariants = Seq(
    "?utm_source=feed&ref=home",   // host also upper-cased + :443 below
    "/",                           // http + :80 + trailing slash
    "#section-2",                  // fragment
    "?b=2&a=1&utm_campaign=x",     // param order + tracking mix
    "?gclid=abc123",               // tracking-only query
    "")                            // already canonical

  private[graft] def rawUrlCol: Column = {
    val suffix = element_at(array(UrlVariants.map(lit): _*),
      (col("doc_id") % UrlVariants.size + 1).cast("int"))
    val base = when(col("doc_id") % UrlVariants.size === 0,
        concat(lit("https://Docs.Example.NZ:443/doc/"),
          col("doc_id").cast("string")))
      .when(col("doc_id") % UrlVariants.size === 1,
        concat(lit("http://docs.example.nz:80/doc/"),
          col("doc_id").cast("string")))
      .otherwise(concat(lit("https://docs.example.nz/doc/"),
        col("doc_id").cast("string")))
    concat(base, suffix)
  }

  private def rawUrlSqlExpr: String = {
    val n = UrlVariants.size
    val list = UrlVariants.map(v => s"'$v'").mkString("[", ", ", "]")
    s"""concat(
       |  CASE WHEN doc_id % $n = 0
       |         THEN concat('https://Docs.Example.NZ:443/doc/', CAST(doc_id AS VARCHAR))
       |       WHEN doc_id % $n = 1
       |         THEN concat('http://docs.example.nz:80/doc/', CAST(doc_id AS VARCHAR))
       |       ELSE concat('https://docs.example.nz/doc/', CAST(doc_id AS VARCHAR))
       |  END,
       |  ($list)[CAST(doc_id % $n + 1 AS INT)])""".stripMargin
  }

  private val TrackingPrefixes =
    Seq("utm_", "gclid=", "fbclid=", "ref=")

  /** Frame-in/frame-out canonicalization core over any (doc_id,
    * url_raw) frame — STATELESS per-row string algebra, split from the
    * registered op so the fuzz suite can drive it with adversarial
    * URLs (10 kB paths, repeated fragments, regex metacharacters,
    * non-ASCII hosts) the fixture synthesis never produces.
    */
  private[graft] def urlCanonicalCols(urls: DataFrame): DataFrame = {
    val noFrag = regexp_replace(col("url_raw"), "#.*", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "[?](.*)", 1)
    val schemeHostRaw = lower(regexp_extract(base, "^([A-Za-z]+://[^/]*)", 1))
    val schemeHost =
      when(schemeHostRaw.startsWith("http://"),
        regexp_replace(schemeHostRaw, ":80$", ""))
      .when(schemeHostRaw.startsWith("https://"),
        regexp_replace(schemeHostRaw, ":443$", ""))
      .otherwise(schemeHostRaw)
    val path = regexp_replace(
      regexp_replace(base, "^[A-Za-z]+://[^/]*", ""), "/+$", "")
    val rawParams = filter(split(query, "&"), p => p =!= "")
    val kept = array_sort(filter(rawParams, p =>
      TrackingPrefixes.map(t => !p.startsWith(t)).reduce(_ && _)))
    val canonical = concat(schemeHost, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    urls
      .select(col("doc_id"), col("url_raw"),
        canonical.as("url_canonical"),
        (size(rawParams) - size(kept)).cast("long").as("n_params_dropped"))
  }

  def urlCanonical(spark: SparkSession, dir: String): DataFrame =
    urlCanonicalCols(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), rawUrlCol.as("url_raw")))

  val urlCanonicalSql: String = {
    // literal prefix compare (LIKE would read `_` in `utm_` as a
    // wildcard — Spark's startsWith is literal)
    val keepCond = TrackingPrefixes
      .map(t => s"substr(p, 1, ${t.length}) <> '$t'").mkString(" AND ")
    s"""WITH r AS (
       |  SELECT doc_id, $rawUrlSqlExpr AS url_raw FROM documents
       |), s AS (
       |  SELECT doc_id, url_raw,
       |         regexp_replace(url_raw, '#.*', '') AS nofrag,
       |         regexp_extract(nofrag, '^([^?]*)', 1) AS base,
       |         regexp_extract(nofrag, '[?](.*)', 1) AS query,
       |         lower(regexp_extract(base, '^([A-Za-z]+://[^/]*)', 1)) AS shr,
       |         CASE WHEN shr LIKE 'http://%'
       |                THEN regexp_replace(shr, ':80$$', '')
       |              WHEN shr LIKE 'https://%'
       |                THEN regexp_replace(shr, ':443$$', '')
       |              ELSE shr END AS sh,
       |         regexp_replace(regexp_replace(base, '^[A-Za-z]+://[^/]*', ''),
       |                        '/+$$', '') AS path,
       |         list_filter(string_split(query, '&'), p -> p <> '') AS rawp,
       |         list_sort(list_filter(rawp, p -> $keepCond)) AS kept
       |  FROM r)
       |SELECT doc_id, url_raw,
       |       concat(sh, path,
       |              CASE WHEN len(kept) > 0
       |                   THEN concat('?', array_to_string(kept, '&'))
       |                   ELSE '' END) AS url_canonical,
       |       CAST(len(rawp) - len(kept) AS BIGINT) AS n_params_dropped
       |FROM s""".stripMargin
  }

  // ------------------------------------------------ crawl fetch plan

  /** Politeness-constrained fetch scheduling — the crawl-side capacity
    * question: with one request per domain per its robots crawl-delay,
    * a domain's pages fetch SEQUENTIALLY no matter how many workers
    * exist, so per-domain duration = pages × delay and the only free
    * variable is which worker owns which domain. The delay is the REAL
    * per-domain `Crawl-delay` the engine already parses from robots.txt
    * (`robotsRules`; `DefaultCrawlDelaySec` where a domain declares
    * none) — a planner that assumes 1 s everywhere under-budgets a
    * slow-host crawl by the delay ratio. Assignment is BUCKETED
    * rank-round-robin (r11 verdict #3): domains hash into `PlanBuckets`
    * via the first md5 nibble (portable across engines), rank by
    * duration desc within their bucket only, worker =
    * (bucket + rank − 1) mod W — the same deterministic LPT
    * approximation as a global rank, but the window is PARTITIONED so
    * no single-partition sort exists anywhere in the plan: at a
    * 100M-domain web crawl each bucket sorts 1/B of the domains in
    * parallel (raise B with |domains|; W and B are coprime-ish here so
    * the bucket offset staggers heavy ranks across workers). Output per
    * worker: domain count, page total, busy seconds, and the makespan
    * ratio of this worker against the perfectly-balanced ideal — the
    * number that says whether one mega-domain (or one slow-robots
    * domain) serializes the crawl (a domain bigger than total/W bounds
    * the ratio from below regardless of scheduling).
    *
    * Scale: the corpus reduces to |domains| rows before any window;
    * the rank and the worker rollup both live on that tiny frame, and
    * the delay join broadcasts (the rule table is KBs).
    */
  private val DefaultCrawlDelaySec = 1L
  private val CrawlWorkers = 3
  private val PlanBuckets = 8

  def fetchPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDomain = withDomain(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), fixtureUrlCol.as("url")))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_pages"))
    val delays = crawlDelays(spark, dir)
    val pd = perDomain
      .join(broadcast(delays),
        col("registered_domain") === col("d_domain"), "left")
      .withColumn("delay_sec",
        coalesce(col("crawl_delay"), lit(DefaultCrawlDelaySec)))
      .withColumn("seconds", col("n_pages") * col("delay_sec"))
      .withColumn("bucket",
        pmod(ascii(substring(md5(col("registered_domain")), 1, 1)),
          lit(PlanBuckets)))
    val ranked = pd.withColumn("rk", row_number().over(
      Window.partitionBy(col("bucket"))
        .orderBy(col("seconds").desc, col("registered_domain").asc)))
      .withColumn("worker",
        pmod(col("bucket") + col("rk") - 1, lit(CrawlWorkers)).cast("int"))
    val byWorker = ranked.groupBy(col("worker"))
      .agg(count(lit(1)).as("n_domains"), sum(col("n_pages")).as("n_pages"),
        sum(col("seconds")).as("busy_seconds"))
    byWorker
      .withColumn("total",
        sum(col("busy_seconds")).over(Window.partitionBy()))
      .select(col("worker"), col("n_domains"), col("n_pages"),
        col("busy_seconds"),
        round(col("busy_seconds").cast("double") * CrawlWorkers /
          col("total").cast("double"), 6).as("makespan_ratio"))
  }

  // lazy: interpolates robotsRulesSql, declared later in this object
  lazy val fetchPlanSql: String =
    s"""WITH $domainSqlCte,
       |pd AS (
       |  SELECT registered_domain, CAST(count(*) AS BIGINT) AS n_pages
       |  FROM d GROUP BY 1
       |), delays AS (
       |  SELECT registered_domain,
       |         max(TRY_CAST(path_prefix AS BIGINT)) AS crawl_delay
       |  FROM ($robotsRulesSql)
       |  WHERE directive = 'Crawl-delay' GROUP BY 1
       |), pd2 AS (
       |  SELECT p.registered_domain, p.n_pages,
       |         CAST(p.n_pages * COALESCE(dl.crawl_delay,
       |                                   $DefaultCrawlDelaySec) AS BIGINT)
       |           AS seconds,
       |         CAST(ascii(substr(md5(p.registered_domain), 1, 1))
       |              % $PlanBuckets AS INT) AS bucket
       |  FROM pd p LEFT JOIN delays dl USING (registered_domain)
       |), ranked AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY bucket
       |                            ORDER BY seconds DESC,
       |                            registered_domain ASC) AS rk
       |  FROM pd2
       |), bw AS (
       |  SELECT CAST((bucket + rk - 1) % $CrawlWorkers AS INT) AS worker,
       |         CAST(count(*) AS BIGINT) AS n_domains,
       |         CAST(sum(n_pages) AS BIGINT) AS n_pages,
       |         CAST(sum(seconds) AS BIGINT) AS busy_seconds
       |  FROM ranked GROUP BY 1
       |)
       |SELECT worker, n_domains, n_pages, busy_seconds,
       |       round(CAST(busy_seconds AS DOUBLE) * $CrawlWorkers /
       |             CAST(sum(busy_seconds) OVER () AS DOUBLE), 6)
       |         AS makespan_ratio
       |FROM bw""".stripMargin

  // ------------------------------------------------ robots.txt rules

  /** Per-domain robots.txt fixture — deterministic literal text per
    * registered domain (identical CASE on both engines), covering the
    * RFC 9309 shapes a parser must handle: full block (`Disallow: /`),
    * empty-pattern Disallow (no effect — allows all), Allow overriding
    * a shorter Disallow (longest-match), prefix rules that
    * deliberately collide (`/src1` also matches `/src10`..`/src19`),
    * and the de-facto `Crawl-delay` extension (two domains declare
    * one — 10 s and 2 s — feeding the fetch planner's per-domain
    * politeness budget; the rest default).
    */
  private def robotsFixtureCol(domain: Column): Column =
    when(domain.isin("spam-farm.net", "tracker.io"),
      lit("User-agent: *\nDisallow: /"))
      .when(domain === "example.com",
        lit("User-agent: *\nDisallow: /src1\nAllow: /src12\nDisallow: /src3"))
      .when(domain === "example.co.nz",
        lit("User-agent: *\nCrawl-delay: 10\nDisallow: \nDisallow: /src7"))
      .when(domain === "wikipedia.org",
        lit("User-agent: *\nCrawl-delay: 2\nAllow: /"))
      // UA-GROUP fixtures (r14): heritage stacks two UA lines on one
      // group (RFC 9309 §2.1 — adjacent UA lines share their rules) and
      // fully blocks everyone else; services gives the named crawler
      // its own rules + delay while * gets different ones. A crawler
      // that ignores group selection blocks everything on heritage and
      // obeys the wrong Disallow on services.
      .when(domain === "heritage.org.nz",
        lit("User-agent: otherbot\nUser-agent: graftbot\n" +
          "Disallow: /src6\nUser-agent: *\nDisallow: /"))
      .when(domain === "services.govt.nz",
        lit("User-agent: graftbot\nDisallow: /src2\nCrawl-delay: 4\n" +
          "User-agent: *\nDisallow: /src4"))
      .otherwise(lit("User-agent: *\nDisallow: /src5\nAllow: /src5/1"))

  private def robotsFixtureSql(domain: String): String =
    s"""CASE WHEN $domain IN ('spam-farm.net', 'tracker.io')
       |       THEN 'User-agent: *' || chr(10) || 'Disallow: /'
       |     WHEN $domain = 'example.com'
       |       THEN 'User-agent: *' || chr(10) || 'Disallow: /src1' ||
       |            chr(10) || 'Allow: /src12' || chr(10) || 'Disallow: /src3'
       |     WHEN $domain = 'example.co.nz'
       |       THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 10' ||
       |            chr(10) || 'Disallow: ' ||
       |            chr(10) || 'Disallow: /src7'
       |     WHEN $domain = 'wikipedia.org'
       |       THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 2' ||
       |            chr(10) || 'Allow: /'
       |     WHEN $domain = 'heritage.org.nz'
       |       THEN 'User-agent: otherbot' || chr(10) ||
       |            'User-agent: graftbot' || chr(10) ||
       |            'Disallow: /src6' || chr(10) ||
       |            'User-agent: *' || chr(10) || 'Disallow: /'
       |     WHEN $domain = 'services.govt.nz'
       |       THEN 'User-agent: graftbot' || chr(10) ||
       |            'Disallow: /src2' || chr(10) || 'Crawl-delay: 4' ||
       |            chr(10) || 'User-agent: *' || chr(10) ||
       |            'Disallow: /src4'
       |     ELSE 'User-agent: *' || chr(10) || 'Disallow: /src5' ||
       |          chr(10) || 'Allow: /src5/1' END""".stripMargin

  /** Parsed per-domain rule table: (domain, line_no, directive,
    * path_prefix) for every Allow/Disallow/Crawl-delay line (for
    * Crawl-delay the payload column carries the seconds value). At
    * 100 TB this frame is |domains|·|rules| — KBs — and broadcasts into
    * the admission join and the fetch planner's delay lookup;
    * fetching/refreshing robots bodies is the `HttpFetch` path.
    */
  /** The product token this engine crawls as — the name RFC 9309 group
    * selection matches against. One constant, shared by the Spark
    * parser and (textually) the oracle SQL.
    */
  private[graft] val CrawlerUa = "graftbot"

  /** RFC 9309 §2.1 group selection (r14): rules belong to the GROUP
    * opened by the nearest preceding run of `User-agent:` lines
    * (adjacent UA lines share one group), and a crawler obeys the
    * groups naming ITS product token when any exist, else the `*`
    * groups — never both. The returned frame keeps the r13 shape
    * (domain, line_no, directive, path_prefix) and contains ONLY the
    * selected groups' Allow/Disallow/Crawl-delay lines, so every
    * consumer (admission, delays, fetch plan, sitemap gate) obeys the
    * right group for free. Group machinery is per-domain windows over
    * the ≤10-line rule frame — KBs at any corpus size.
    */
  def robotsRules(spark: SparkSession, dir: String): DataFrame =
    robotsRulesFrom(
      withDomain(
        Tables(spark, dir, "documents")
          .select(col("doc_id"), col("source"), fixtureUrlCol.as("url")))
        .select(col("registered_domain")).distinct())

  /** [[robotsRules]] over a caller-supplied domain spine — lets a
    * composition that ALREADY materialized the corpus's
    * (doc_id, registered_domain) frame derive the spine from it instead
    * of re-scanning documents (r18: `crawl_pipeline_report` and
    * `crawl_frontier_rank` each paid 1–2 extra corpus scans just to
    * rebuild this |domains|-sized input).
    */
  private[graft] def robotsRulesFrom(domains: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dirRe = "^(User-agent|Allow|Disallow|Crawl-delay): ?(.*)$"
    val lines = domains
      .select(col("registered_domain"),
        posexplode(split(robotsFixtureCol(col("registered_domain")), "\n"))
          .as(Seq("ln0", "line")))
      .select(col("registered_domain"),
        (col("ln0") + 1).cast("long").as("line_no"),
        regexp_extract(col("line"), dirRe, 1).as("directive"),
        regexp_extract(col("line"), dirRe, 2).as("path_prefix"))
      .where(col("directive") =!= "")
    val byLine = Window.partitionBy(col("registered_domain"))
      .orderBy(col("line_no"))
    val isUa = col("directive") === "User-agent"
    val grouped = lines
      // a UA line whose predecessor is not a UA line STARTS a group;
      // every line belongs to the latest started group
      .withColumn("run_start",
        when(isUa && !coalesce(lag(isUa, 1).over(byLine), lit(false)),
          col("line_no")))
      .withColumn("grp",
        max(col("run_start")).over(byLine
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // group keys stay named registered_domain so every exchange in the
    // rule-frame build is visibly rule-side (DomainsSpec's plan pin)
    val groups = grouped.where(isUa)
      .groupBy(col("registered_domain"), col("grp"))
      .agg(max(when(col("path_prefix") === CrawlerUa, 1).otherwise(0))
          .as("has_ua"),
        max(when(col("path_prefix") === "*", 1).otherwise(0)).as("has_star"))
    val anyUa = groups.groupBy(col("registered_domain"))
      .agg(max(col("has_ua")).as("any_ua"))
    val selected = groups.join(anyUa, Seq("registered_domain"))
      .where((col("any_ua") === 1 && col("has_ua") === 1) ||
        (col("any_ua") === 0 && col("has_star") === 1))
      .select(col("registered_domain"), col("grp"))
    grouped.where(!isUa)
      .join(selected, Seq("registered_domain", "grp"), "left_semi")
      .select(col("registered_domain"), col("line_no"), col("directive"),
        col("path_prefix"))
  }

  val robotsRulesSql: String =
    s"""WITH doms AS (
       |  SELECT DISTINCT registered_domain FROM (
       |    SELECT doc_id, source, url,
       |           $domainSelectSql
       |    FROM (SELECT doc_id, source, $fixtureUrlSqlExpr AS url
       |          FROM documents))
       |), rawlines AS (
       |  SELECT registered_domain,
       |         unnest(string_split(${robotsFixtureSql("registered_domain")},
       |                             chr(10))) AS line,
       |         generate_subscripts(
       |           string_split(${robotsFixtureSql("registered_domain")},
       |                        chr(10)), 1) AS line_no
       |  FROM doms
       |), lines AS (
       |  SELECT registered_domain, CAST(line_no AS BIGINT) AS line_no,
       |         regexp_extract(line,
       |           '^(User-agent|Allow|Disallow|Crawl-delay): ?(.*)$$', 1)
       |           AS directive,
       |         regexp_extract(line,
       |           '^(User-agent|Allow|Disallow|Crawl-delay): ?(.*)$$', 2)
       |           AS path_prefix
       |  FROM rawlines
       |  WHERE regexp_extract(line,
       |          '^(User-agent|Allow|Disallow|Crawl-delay): ?(.*)$$', 1) <> ''
       |), marked AS (
       |  SELECT *,
       |         COALESCE(lag(directive = 'User-agent') OVER
       |             (PARTITION BY registered_domain ORDER BY line_no),
       |           false) AS prev_ua
       |  FROM lines
       |), grouped AS (
       |  SELECT registered_domain, line_no, directive, path_prefix,
       |         max(CASE WHEN directive = 'User-agent' AND NOT prev_ua
       |                  THEN line_no END) OVER
       |           (PARTITION BY registered_domain ORDER BY line_no
       |            ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM marked
       |), groups AS (
       |  SELECT registered_domain, grp,
       |         max(CASE WHEN path_prefix = 'graftbot' THEN 1 ELSE 0 END)
       |           AS has_ua,
       |         max(CASE WHEN path_prefix = '*' THEN 1 ELSE 0 END)
       |           AS has_star
       |  FROM grouped WHERE directive = 'User-agent' GROUP BY 1, 2
       |), anyua AS (
       |  SELECT registered_domain, max(has_ua) AS any_ua
       |  FROM groups GROUP BY 1
       |), selected AS (
       |  SELECT g.registered_domain, g.grp
       |  FROM groups g JOIN anyua a USING (registered_domain)
       |  WHERE (a.any_ua = 1 AND g.has_ua = 1)
       |     OR (a.any_ua = 0 AND g.has_star = 1)
       |)
       |SELECT registered_domain, line_no, directive, path_prefix
       |FROM grouped JOIN selected USING (registered_domain, grp)
       |WHERE directive <> 'User-agent'""".stripMargin

  /** RFC 9309 URL admission: every page checked against its domain's
    * parsed rules — longest matching prefix wins, Allow beats Disallow
    * on equal length, empty-pattern rules have no effect, no match =
    * allowed. The rule frame broadcasts (KBs); the corpus never
    * shuffles — admission is the map-side gate it is in a real
    * frontier.
    */
  /** Per-domain rules collected into ONE array row each (KBs total) for
    * the broadcast admission gate — shared by the batch op and the
    * streaming frontier twin.
    */
  private[graft] def ruleArrays(spark: SparkSession, dir: String): DataFrame =
    ruleArraysFrom(robotsRules(spark, dir))

  /** [[ruleArrays]] over a caller-supplied parsed-rule frame (the
    * `robotsRulesFrom` seam's consumer side). */
  private[graft] def ruleArraysFrom(rules: DataFrame): DataFrame =
    rules
      .where(col("directive").isin("Allow", "Disallow") &&
        length(col("path_prefix")) > 0)
      .groupBy(col("registered_domain").as("r_domain"))
      .agg(collect_list(struct(
        (-length(col("path_prefix"))).as("neg_len"),
        when(col("directive") === "Allow", 0).otherwise(1).as("allow_rk"),
        col("line_no"), col("directive"), col("path_prefix"))).as("rs"))

  /** Per-domain crawl-delay lookup (seconds; absent = caller defaults) —
    * shared by the fetch planner and the frontier scorers.
    */
  private[graft] def crawlDelays(spark: SparkSession, dir: String): DataFrame =
    crawlDelaysFrom(robotsRules(spark, dir))

  /** [[crawlDelays]] over a caller-supplied parsed-rule frame. */
  private[graft] def crawlDelaysFrom(rules: DataFrame): DataFrame =
    rules
      .where(col("directive") === "Crawl-delay")
      .groupBy(col("registered_domain").as("d_domain"))
      .agg(max(col("path_prefix").cast("long")).as("crawl_delay"))

  /** Frame-in/frame-out admission core over any (doc_id,
    * registered_domain, path) frame — STATELESS, so the identical
    * function body serves the batch table scan and a landing stream
    * (the `gopherMetrics` convention). The rule frame broadcasts; the
    * page side has NO exchange at all (pinned in DomainsSpec): a window
    * on doc_id here would shuffle every page just to rank ≤4 rule hits.
    */
  private[graft] def admissionCols(pages: DataFrame,
      ruleArr: DataFrame): DataFrame = {
    val matching = filter(col("rs"),
      r => col("path").startsWith(r("path_prefix")))
    // struct sort orders fields lexicographically: longest prefix
    // first (neg_len), Allow before Disallow on ties, then line order.
    // get() (0-based), not element_at: ANSI mode makes element_at
    // THROW on an empty match array; get returns the null we want
    val best = get(sort_array(matching), lit(0))
    // every input column rides through (the sitemap gate carries loc/
    // lastmod/scope alongside the admission key), verdicts appended
    pages.join(broadcast(ruleArr),
        col("registered_domain") === col("r_domain"), "left")
      .select(pages.columns.map(col) ++ Seq(
        coalesce(best("directive"), lit("default")).as("matched_directive"),
        coalesce(best("path_prefix"), lit("")).as("matched_prefix"),
        (coalesce(best("directive"), lit("Allow")) === "Allow")
          .as("allowed")): _*)
  }

  def urlAllowed(spark: SparkSession, dir: String): DataFrame = {
    val pages = withDomain(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), fixtureUrlCol.as("url")))
      .select(col("doc_id"), col("registered_domain"),
        regexp_replace(col("url"), "^[a-z]+://[^/]+", "").as("path"))
    admissionCols(pages, ruleArrays(spark, dir))
  }

  val urlAllowedSql: String =
    s"""WITH pages AS (
       |  SELECT doc_id, registered_domain,
       |         regexp_replace(url, '^[a-z]+://[^/]+', '') AS path
       |  FROM (
       |    SELECT doc_id, url,
       |           $domainSelectSql
       |    FROM (SELECT doc_id, source, $fixtureUrlSqlExpr AS url
       |          FROM documents))
       |), rules AS (
       |  SELECT * FROM (
       |$robotsRulesSql
       |  ) WHERE directive IN ('Allow', 'Disallow')
       |      AND length(path_prefix) > 0
       |), m AS (
       |  SELECT p.doc_id, p.registered_domain, p.path,
       |         r.directive, r.path_prefix, r.line_no,
       |         row_number() OVER (PARTITION BY p.doc_id ORDER BY
       |           length(r.path_prefix) DESC,
       |           (r.directive = 'Allow') DESC, r.line_no ASC) AS rk
       |  FROM pages p
       |  LEFT JOIN rules r
       |    ON r.registered_domain = p.registered_domain
       |   AND starts_with(p.path, r.path_prefix)
       |)
       |SELECT doc_id, registered_domain, path,
       |       COALESCE(directive, 'default') AS matched_directive,
       |       COALESCE(path_prefix, '') AS matched_prefix,
       |       COALESCE(directive, 'Allow') = 'Allow' AS allowed
       |FROM m WHERE rk = 1""".stripMargin

  // ------------------------------------------------ crawl_sitemap_urls

  /** Per-domain sitemap fixture — deterministic literal XML per
    * registered domain (identical CASE on both engines, the
    * `robotsFixtureCol` convention), covering the sitemaps.org shapes
    * a discovery parser must handle: a plain urlset with and without
    * `<lastmod>`, an entry the domain's OWN robots disallow (sitemaps
    * advertise; robots still gates), a CROSS-HOST entry (the protocol
    * violation crawlers must drop — a sitemap may only list URLs on
    * its own host), a blocked domain's sitemap, and a sitemap INDEX
    * whose entries are child sitemaps, not page URLs. Domains without
    * a sitemap contribute no rows.
    */
  private def sitemapFixtureCol(domain: Column): Column =
    when(domain === "example.com", lit(
      "<urlset>" +
        "<url><loc>https://www.example.com/doc/1</loc>" +
        "<lastmod>2024-01-05</lastmod></url>" +
        "<url><loc>https://www.example.com/src1/page</loc>" +
        "<lastmod>2024-02-11</lastmod></url>" +
        "<url><loc>https://www.example.com/src12/ok</loc></url>" +
        "<url><loc>https://elsewhere.org/stolen</loc>" +
        "<lastmod>2024-03-01</lastmod></url>" +
        "</urlset>"))
      .when(domain === "spam-farm.net", lit(
        "<urlset><url><loc>https://blog.spam-farm.net/x</loc></url></urlset>"))
      .when(domain === "wikipedia.org", lit(
        "<sitemapindex>" +
          "<sitemap><loc>https://en.wikipedia.org/sitemap-0.xml</loc>" +
          "<lastmod>2024-04-01</lastmod></sitemap>" +
          "<sitemap><loc>https://en.wikipedia.org/sitemap-1.xml</loc>" +
          "</sitemap></sitemapindex>"))
      .when(domain === "example.co.nz", lit(
        "<urlset><url><loc>https://data.example.co.nz/a/1</loc></url>" +
          "<url><loc>https://data.example.co.nz/src7/hidden</loc>" +
          "<lastmod>2023-12-31</lastmod></url></urlset>"))
      .otherwise(lit(""))

  private def sitemapFixtureSql(domain: String): String = {
    def q(s: String) = s"'$s'"
    s"""CASE WHEN $domain = 'example.com' THEN ${q(
      "<urlset><url><loc>https://www.example.com/doc/1</loc>" +
        "<lastmod>2024-01-05</lastmod></url>" +
        "<url><loc>https://www.example.com/src1/page</loc>" +
        "<lastmod>2024-02-11</lastmod></url>" +
        "<url><loc>https://www.example.com/src12/ok</loc></url>" +
        "<url><loc>https://elsewhere.org/stolen</loc>" +
        "<lastmod>2024-03-01</lastmod></url></urlset>")}
       |     WHEN $domain = 'spam-farm.net' THEN ${q(
      "<urlset><url><loc>https://blog.spam-farm.net/x</loc></url></urlset>")}
       |     WHEN $domain = 'wikipedia.org' THEN ${q(
      "<sitemapindex><sitemap><loc>https://en.wikipedia.org/sitemap-0.xml</loc>" +
        "<lastmod>2024-04-01</lastmod></sitemap>" +
        "<sitemap><loc>https://en.wikipedia.org/sitemap-1.xml</loc>" +
        "</sitemap></sitemapindex>")}
       |     WHEN $domain = 'example.co.nz' THEN ${q(
      "<urlset><url><loc>https://data.example.co.nz/a/1</loc></url>" +
        "<url><loc>https://data.example.co.nz/src7/hidden</loc>" +
        "<lastmod>2023-12-31</lastmod></url></urlset>")}
       |     ELSE '' END""".stripMargin
  }

  /** Sitemap-driven URL DISCOVERY — the crawl stage between robots and
    * the frontier the family was missing: parse each domain's sitemap
    * (urlset entries AND sitemap-index children), validate the
    * protocol's own-host scope rule, and gate every in-scope page URL
    * through the domain's parsed robots rules — a sitemap ADVERTISES,
    * robots still decides (`allowed` is null for child sitemaps and
    * out-of-scope entries: no admission claim is made where none
    * applies). Block extraction is two non-greedy `[\\s\\S]*?` regex
    * passes (RE2 ≡ Java semantics), per-entry `<loc>`/`<lastmod>`
    * pulls, then the shared broadcast admission gate — per-domain
    * work, KB-sized frames, zero corpus shuffles; at 100 TB sitemap
    * bodies arrive via `HttpFetch` exactly like robots bodies.
    */
  /** Frame-in/frame-out sitemap gate over any (sm_domain, xml) frame —
    * STATELESS (regex block extraction + broadcast admission), so the
    * identical body serves the batch fixture scan and a landing stream
    * of fetched sitemap bodies (the `gopherMetrics` convention).
    */
  private[graft] def sitemapCols(sm: DataFrame,
      ruleArr: DataFrame): DataFrame = {
    def blocksOf(kind: String, tag: String) =
      transform(
        regexp_extract_all(col("xml"), lit(s"<$tag>([\\s\\S]*?)</$tag>"),
          lit(1)),
        b => struct(lit(kind).as("kind"), b.as("block")))
    val entries = sm
      .select(col("sm_domain"),
        explode(concat(blocksOf("url", "url"),
          blocksOf("sitemap", "sitemap"))).as("e"))
      .select(col("sm_domain"), col("e.kind").as("kind"),
        regexp_extract(col("e.block"), "<loc>([^<]*)</loc>", 1).as("loc"),
        when(regexp_extract(col("e.block"),
            "<lastmod>([^<]*)</lastmod>", 1) === "", lit(null))
          .otherwise(regexp_extract(col("e.block"),
            "<lastmod>([^<]*)</lastmod>", 1)).as("lastmod"))
    val scoped = withDomain(entries.withColumn("url", col("loc")))
      .select(col("sm_domain").as("registered_domain"), col("kind"),
        col("loc"), col("lastmod"),
        (col("registered_domain") === col("sm_domain")).as("in_scope"),
        regexp_replace(col("loc"), "^[a-z]+://[^/]+", "").as("path"))
    admissionCols(scoped, ruleArr)
      .select(col("registered_domain").as("domain"), col("kind"),
        col("loc"), col("path"), col("lastmod"), col("in_scope"),
        when(col("kind") === "url" && col("in_scope"), col("allowed"))
          .as("allowed"))
  }

  def sitemapUrls(spark: SparkSession, dir: String): DataFrame = {
    val doms = withDomain(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), fixtureUrlCol.as("url")))
      .select(col("registered_domain")).distinct()
      .select(col("registered_domain").as("sm_domain"),
        sitemapFixtureCol(col("registered_domain")).as("xml"))
    sitemapCols(doms, ruleArrays(spark, dir))
  }

  val sitemapUrlsSql: String =
    s"""WITH doms AS (
       |  SELECT DISTINCT registered_domain FROM (
       |    SELECT doc_id, source, url,
       |           $domainSelectSql
       |    FROM (SELECT doc_id, source, $fixtureUrlSqlExpr AS url
       |          FROM documents))
       |), sm AS (
       |  SELECT registered_domain AS sm_domain,
       |         ${sitemapFixtureSql("registered_domain")} AS xml
       |  FROM doms
       |), blocks AS (
       |  SELECT sm_domain, 'url' AS kind,
       |         unnest(regexp_extract_all(xml, '<url>([\\s\\S]*?)</url>', 1))
       |           AS block
       |  FROM sm
       |  UNION ALL
       |  SELECT sm_domain, 'sitemap',
       |         unnest(regexp_extract_all(xml,
       |                '<sitemap>([\\s\\S]*?)</sitemap>', 1))
       |  FROM sm
       |), e AS (
       |  SELECT sm_domain, kind,
       |         regexp_extract(block, '<loc>([^<]*)</loc>', 1) AS loc,
       |         nullif(regexp_extract(block, '<lastmod>([^<]*)</lastmod>', 1),
       |                '') AS lastmod
       |  FROM blocks
       |), scoped AS (
       |  SELECT sm_domain, kind, loc, lastmod,
       |         registered_domain = sm_domain AS in_scope,
       |         regexp_replace(loc, '^[a-z]+://[^/]+', '') AS path
       |  FROM (SELECT sm_domain, kind, loc, lastmod, url, $domainSelectSql
       |        FROM (SELECT sm_domain, kind, loc, lastmod, loc AS url
       |              FROM e))
       |), rules AS (
       |  SELECT * FROM (
       |${robotsRulesSql.linesIterator.map("    " + _).mkString("\n")}
       |  ) WHERE directive IN ('Allow', 'Disallow')
       |      AND length(path_prefix) > 0
       |), m AS (
       |  SELECT p.sm_domain, p.kind, p.loc, p.path, p.lastmod, p.in_scope,
       |         r.directive,
       |         row_number() OVER (PARTITION BY p.sm_domain, p.kind, p.loc
       |           ORDER BY length(r.path_prefix) DESC,
       |                    (r.directive = 'Allow') DESC, r.line_no ASC) AS rk
       |  FROM scoped p
       |  LEFT JOIN rules r
       |    ON r.registered_domain = p.sm_domain
       |   AND starts_with(p.path, r.path_prefix)
       |)
       |SELECT sm_domain AS domain, kind, loc, path, lastmod, in_scope,
       |       CASE WHEN kind = 'url' AND in_scope
       |            THEN COALESCE(directive, 'Allow') = 'Allow' END AS allowed
       |FROM m WHERE rk = 1""".stripMargin

  // ------------------------------------------------ crawl_seen_bloom

  /** Bloom-filter URL-seen gate — the frontier primitive that makes
    * "have we fetched this URL before?" affordable at 100 TB: exact
    * membership needs an anti-join against ALL crawl history per
    * discovered URL, while the Bloom summarizes history into `BloomBits`
    * bits that BROADCAST (the bit frame is |bits-set| rows ≤ 16 Ki —
    * KBs — vs a billions-row history), so definitely-new URLs skip
    * history entirely and only `maybe_seen` rows pay the exact lookup —
    * the candidates-only confirm discipline the dedup family uses.
    * No false negatives by construction (every history URL sets all its
    * bits), false positives bounded by (1 − e^(−kn/m))^k.
    *
    * Hashes are md5-hex-prefix derived (the portable-across-engines
    * convention the fetch planner's bucketing uses — xxhash64 would be
    * engine-specific and force rows-only), so the oracle recomputes the
    * exact same bit array and the op is hash-exact oracled, unlike any
    * native-hash bloom. Fixture semantics: history = even doc_ids'
    * canonical URLs; the probe set is EVERY canonical URL (a frontier
    * re-discovers old pages alongside new ones), so `actually_seen` has
    * real mass and `false_positive` audits the filter against exact
    * truth on the same row.
    */
  private val BloomBits = 1 << 14
  private val BloomHashes = 3

  /** Core over any (doc_id, url) probe/history frames, parameterized so
    * the spec can shrink the filter and force false positives.
    */
  private[graft] def seenBloomCore(probe: DataFrame, hist: DataFrame,
      mBits: Int, kHashes: Int): DataFrame = {
    def pos(c: Column, i: Int): Column =
      conv(substring(md5(concat(c, lit(s"#$i"))), 1, 8), 16, 10)
        .cast("long") % mBits
    val bits = hist.select(explode(array((0 until kHashes).map(i =>
      pos(col("url"), i)): _*)).as("bit")).distinct()
    val nSet = probe.select(col("doc_id"),
        explode(array((0 until kHashes).map(i =>
          pos(col("url"), i)): _*)).as("bit"))
      .join(broadcast(bits), Seq("bit"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_set"))
    // exact membership via a history join on the URL itself
    val exact = probe
      .join(hist.select(col("url"), lit(true).as("actually_seen"))
        .distinct(), Seq("url"), "left")
    exact.join(nSet, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_set"), lit(0L)) === kHashes).as("maybe_seen"),
        coalesce(col("actually_seen"), lit(false)).as("actually_seen"))
      .withColumn("false_positive",
        col("maybe_seen") && !col("actually_seen"))
  }

  def seenBloom(spark: SparkSession, dir: String): DataFrame = {
    val urls = urlCanonical(spark, dir)
      .select(col("doc_id"), col("url_canonical").as("url"))
    seenBloomCore(urls, urls.where(col("doc_id") % 2 === 0),
      BloomBits, BloomHashes)
  }

  val seenBloomSql: String = {
    def pos(c: String, i: Int): String =
      s"CAST(CAST(concat('0x', substr(md5(concat($c, '#$i')), 1, 8)) " +
        s"AS UBIGINT) % $BloomBits AS BIGINT)"
    val posList = (0 until BloomHashes).map(i => pos("url", i))
      .mkString("[", ", ", "]")
    s"""WITH urls AS (
       |  SELECT doc_id, url_canonical AS url FROM ($urlCanonicalSql)
       |), hist AS (
       |  SELECT * FROM urls WHERE doc_id % 2 = 0
       |), bits AS (
       |  SELECT DISTINCT unnest($posList) AS bit FROM hist
       |), nset AS (
       |  SELECT doc_id, count(*) AS n_set FROM (
       |    SELECT doc_id, unnest($posList) AS bit FROM urls
       |  ) p JOIN bits USING (bit)
       |  GROUP BY doc_id
       |)
       |SELECT u.doc_id,
       |       COALESCE(n_set, 0) = $BloomHashes AS maybe_seen,
       |       (h.url IS NOT NULL) AS actually_seen,
       |       COALESCE(n_set, 0) = $BloomHashes AND h.url IS NULL
       |         AS false_positive
       |FROM urls u
       |LEFT JOIN (SELECT DISTINCT url FROM hist) h ON h.url = u.url
       |LEFT JOIN nset ON nset.doc_id = u.doc_id""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("crawl_sitemap_urls", sitemapUrls _, Some(sitemapUrlsSql)),
    Op("crawl_seen_bloom", seenBloom _, Some(seenBloomSql)),
    Op("crawl_robots_rules", robotsRules _, Some(robotsRulesSql)),
    Op("crawl_url_allowed", urlAllowed _, Some(urlAllowedSql)),
    Op("crawl_fetch_plan", fetchPlan _, Some(fetchPlanSql)),
    Op("curate_domain_filter", domainFilter _, Some(domainFilterSql)),
    Op("stats_domain_report", domainReport _, Some(domainReportSql)),
    Op("curate_url_canonical", urlCanonical _, Some(urlCanonicalSql)),
  )
}
