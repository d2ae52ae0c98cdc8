package graft

import org.apache.spark.sql.functions._

import graft.operators.Domains

/** URL → registered-domain extraction + blocklist curation
  * (VERDICT r10 #2): scheme/port/case edge cases, two-level public
  * suffixes, anti-join semantics, report arithmetic.
  */
class DomainsSpec extends SparkSpec {

  private def extract(urls: String*): Map[String, (String, String)] = {
    import spark.implicits._
    Domains.withDomain(urls.toDF("url"))
      .select(col("url"), col("host"), col("registered_domain"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("host extraction: port stripped, case folded, path/query ignored") {
    val m = extract(
      "https://media.example.com:8080/a/b?q=1",
      "http://EN.Wikipedia.ORG/wiki/NZ",
      "https://data.example.co.nz/x")
    assert(m("https://media.example.com:8080/a/b?q=1") ==
      (("media.example.com", "example.com")))
    assert(m("http://EN.Wikipedia.ORG/wiki/NZ") ==
      (("en.wikipedia.org", "wikipedia.org")))
    assert(m("https://data.example.co.nz/x") ==
      (("data.example.co.nz", "example.co.nz")))
  }

  test("two-level public suffixes take three labels; plain TLDs take two") {
    val m = extract(
      "https://api.services.govt.nz/",
      "https://archive.heritage.org.nz/x",
      "https://a.b.c.example.com/deep",
      "https://shop.example.co.uk/")
    assert(m("https://api.services.govt.nz/")._2 == "services.govt.nz")
    assert(m("https://archive.heritage.org.nz/x")._2 == "heritage.org.nz")
    assert(m("https://a.b.c.example.com/deep")._2 == "example.com")
    assert(m("https://shop.example.co.uk/")._2 == "example.co.uk")
  }

  test("degenerate hosts degrade: single label falls back to host itself") {
    val m = extract("http://localhost/health", "http://intranet:9090/")
    assert(m("http://localhost/health")._2 == "localhost")
    assert(m("http://intranet:9090/")._2 == "intranet")
  }

  test("blocklist anti-join drops exactly the blocked registered domains") {
    import spark.implicits._
    val kept = Domains.domainFilter(spark, sfDir)
    val domains = kept.select(col("registered_domain")).distinct()
      .as[String].collect().toSet
    assert(!domains.contains("spam-farm.net") && !domains.contains("tracker.io"))
    // hosts cycle doc_id % 8: exactly 6 of 8 kept
    val total = Tables(spark, sfDir, "documents").count()
    assert(kept.count() == total - total / 8 * 2 -
      (if (total % 8 >= 3) 1L else 0L) - (if (total % 8 >= 7) 1L else 0L))
  }

  test("report: dup_rate and avg_words arithmetic, blocked flag set") {
    val rows = Domains.domainReport(spark, sfDir).collect()
    val byDom = rows.map(r => r.getString(0) -> r).toMap
    assert(byDom.contains("spam-farm.net") && byDom("spam-farm.net")
      .getBoolean(byDom("spam-farm.net").fieldIndex("blocked")))
    rows.foreach { r =>
      val nDocs = r.getLong(r.fieldIndex("n_docs"))
      val uniq = r.getLong(r.fieldIndex("n_unique_texts"))
      val dup = r.getDouble(r.fieldIndex("dup_rate"))
      assert(nDocs > 0 && uniq <= nDocs)
      assert(math.abs(dup - (1.0 - uniq.toDouble / nDocs)) < 1e-6)
    }
    // every registered domain appears exactly once
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("url canonicalization: every rule, on the planted variants") {
    import spark.implicits._
    val rows = Domains.urlCanonical(spark, sfDir)
      .select(col("doc_id"), col("url_raw"), col("url_canonical"),
        col("n_params_dropped"))
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0: upper-case host + :443 + tracking-only query
    assert(rows(0L)._3 == "https://docs.example.nz/doc/0")
    assert(rows(0L)._4 == 2) // utm_source + ref both dropped
    // doc 1: http :80 + trailing slash
    assert(rows(1L)._3 == "http://docs.example.nz/doc/1")
    // doc 2: fragment dropped
    assert(rows(2L)._3 == "https://docs.example.nz/doc/2")
    // doc 3: params sorted, tracking stripped
    assert(rows(3L)._3 == "https://docs.example.nz/doc/3?a=1&b=2")
    assert(rows(3L)._4 == 1)
    // doc 4: tracking-only query collapses to no query at all
    assert(rows(4L)._3 == "https://docs.example.nz/doc/4")
    // doc 5: already canonical — unchanged
    assert(rows(5L)._2 == rows(5L)._3 && rows(5L)._4 == 0)
    // canonicalization is idempotent: variants of the same doc path
    // differ only in doc_id suffix structure, never reintroduce noise
    rows.values.foreach { case (_, _, canon, _) =>
      assert(!canon.contains("#") && !canon.contains("utm_") &&
        !canon.contains(":443") && !canon.contains(":80/") &&
        !canon.endsWith("/"))
    }
  }

  test("blocklist join is a broadcast (no shuffle of the fact side)") {
    val plan = Domains.domainFilter(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("fetch plan: bucketed-LPT recompute with robots delays, slow domain dominates makespan") {
    val got = graft.operators.Domains.fetchPlan(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet.subsetOf(Set(0, 1, 2)) && got.nonEmpty)
    // scalar recompute from the same fixture-URL convention
    val perDomain = graft.operators.Domains.withDomain(
      graft.Tables(spark, sfDir, "documents").selectExpr("doc_id", "source",
        "concat('https://', element_at(array('data.example.co.nz'," +
        "'www.example.com','blog.spam-farm.net','archive.heritage.org.nz'," +
        "'EN.Wikipedia.ORG','media.example.com:8080','ads.tracker.io'," +
        "'api.services.govt.nz'), CAST(doc_id % 8 + 1 AS INT)), '/', source," +
        "'/', CAST(doc_id AS STRING)) AS url"))
      .groupBy("registered_domain").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // per-domain politeness from the robots fixture's Crawl-delay lines
    def delay(d: String): Long = d match {
      case "example.co.nz"    => 10L
      case "wikipedia.org"    => 2L
      case "services.govt.nz" => 4L // graftbot group's own delay (r14)
      case _                  => 1L
    }
    def bucket(d: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.charAt(0).toInt % 8
    }
    val scheduled = perDomain
      .map { case (d, n) => (d, n, n * delay(d), bucket(d)) }
      .groupBy(_._4).toSeq
      .flatMap { case (b, ds) =>
        ds.sortBy { case (d, _, sec, _) => (-sec, d) }.zipWithIndex
          .map { case ((d, n, sec, _), rk0) => ((b + rk0) % 3, d, n, sec) }
      }
    val byWorker = scheduled.groupBy(_._1)
    val total = scheduled.map(_._4).sum
    for ((w, ds) <- byWorker) {
      val busy = ds.map(_._4).sum
      assert(got(w)._1 == ds.length.toLong, s"worker $w domains")
      assert(got(w)._2 == ds.map(_._3).sum, s"worker $w pages")
      assert(got(w)._3 == busy, s"worker $w busy")
      assert(got(w)._4 == BigDecimal(busy.toDouble * 3 / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the slow-robots domain (10 s/page) must dominate: its worker's
    // busy time bounds the makespan from below, ratio > 1
    val slow = scheduled.find(_._2 == "example.co.nz").get
    assert(got(slow._1)._3 >= slow._4)
    assert(got(slow._1)._4 > 1.0, s"slow domain did not dominate: $got")
    // no worker may beat the heaviest-domain lower bound
    val heaviest = scheduled.map(_._4).max
    assert(got.values.map(_._3).max >= heaviest)
  }

  test("fetch plan: rank window is sharded — no single-partition sort in the plan") {
    val df = graft.operators.Domains.fetchPlan(spark, sfDir)
    df.collect()
    // AQE's toString appends "== Initial Plan ==" — pin the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the domain rank must be a bucket-partitioned window (sharded
    // sort), never a global one
    assert(plan.contains("windowspecdefinition(bucket"),
      s"rank window not partitioned by bucket:\n$plan")
    assert(plan.contains("hashpartitioning(bucket"),
      s"bucketed exchange missing:\n$plan")
    // the only SinglePartition exchange allowed is the final
    // |workers|-sized rollup window (3 rows by construction)
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 1,
      s"extra global exchange:\n$plan")
  }

  test("robots admission: RFC 9309 longest-match, allow-wins, empty-pattern no-op") {
    val hosts = Seq("example.co.nz", "example.com", "spam-farm.net",
      "heritage.org.nz", "wikipedia.org", "example.com", "tracker.io",
      "services.govt.nz") // registered domain by doc_id % 8
    val src = Tables(spark, sfDir, "documents").select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.Domains.urlAllowed(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(3),
        r.getString(4), r.getBoolean(5)))).toMap
    assert(rows.keySet == src.keySet)
    for ((doc, (domain, directive, prefix, allowed)) <- rows) {
      val s = src(doc)
      assert(domain == hosts((doc % 8).toInt), s"doc $doc domain")
      domain match {
        case "spam-farm.net" | "tracker.io" =>
          assert(!allowed && prefix == "/", s"doc $doc: full block")
        case "wikipedia.org" =>
          assert(allowed && directive == "Allow", s"doc $doc: allow-all")
        case "example.com" =>
          if (s == "src12")
            assert(allowed && prefix == "/src12", s"doc $doc: longest match")
          else if (s == "src1" || s.startsWith("src1"))
            assert(!allowed && prefix == "/src1", s"doc $doc: prefix block")
          else if (s == "src3")
            assert(!allowed, s"doc $doc: src3 block")
          else assert(allowed && directive == "default", s"doc $doc")
        case "example.co.nz" =>
          // the empty-pattern Disallow must be a no-op
          if (s == "src7") assert(!allowed, s"doc $doc: src7 block")
          else assert(allowed && directive == "default",
            s"doc $doc: empty Disallow leaked")
        case _ => // heritage.org.nz / services.govt.nz: default ruleset
          if (s == "src5")
            assert(allowed == s"/src5/$doc".startsWith("/src5/1"),
              s"doc $doc src5 admission")
          else assert(allowed && directive == "default", s"doc $doc")
      }
    }
    // default-domain src5 docs: blocked unless the doc path falls under
    // the /src5/1 Allow prefix (doc ids rendering with a leading 1)
    val defaultSrc5 = rows.filter { case (d, (dom, _, _, _)) =>
      (dom == "heritage.org.nz" || dom == "services.govt.nz") &&
        src(d) == "src5"
    }
    // (fixture-size dependent: present at sf>=0.01, may be empty at
    // sf0.001 - the per-doc loop above already covers every present doc)
    defaultSrc5.foreach { case (doc, (_, _, prefix, allowed)) =>
      val underAllow = s"/src5/$doc".startsWith("/src5/1")
      assert(allowed == underAllow, s"doc $doc src5: $prefix $allowed")
    }
    // both admission outcomes occur
    assert(rows.values.exists(_._4) && rows.values.exists(!_._4))
  }

  test("RFC 9309 group selection: named group beats *, stacked UA lines share one group") {
    val rules = Domains.robotsRules(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3)))
    // heritage: a stacked (otherbot + graftbot) group with one rule,
    // then a * group that blocks EVERYTHING — selecting the named
    // group means the full block must never appear
    val heritage = rules.filter(_._1 == "heritage.org.nz").toSet
    assert(heritage == Set(("heritage.org.nz", "Disallow", "/src6")),
      s"stacked graftbot group must win over *'s full block: $heritage")
    // services: the named group carries its own Disallow AND delay;
    // the * group's /src4 must not leak through
    val services = rules.filter(_._1 == "services.govt.nz").toSet
    assert(services == Set(
      ("services.govt.nz", "Disallow", "/src2"),
      ("services.govt.nz", "Crawl-delay", "4")), s"services: $services")
    // star-only domains keep their full rule set
    assert(rules.filter(_._1 == "example.com").map(_._3).toSet ==
      Set("/src1", "/src12", "/src3"))
  }

  test("robots admission plan: fact side never shuffles, one broadcast gate") {
    val df = graft.operators.Domains.urlAllowed(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // windows exist only in the rule-frame build (r14 UA-group
    // selection runs lag/max over the <=10-line per-domain robots
    // text) — every one must be partitioned by the rule key, never a
    // fact-side key like doc_id
    val winParts = "windowspecdefinition\\((\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(winParts.nonEmpty &&
      winParts.forall(_.startsWith("registered_domain")),
      s"fact-side window: $winParts")
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only repartitioning exchanges may build the KB-sized rule
    // array (group machinery + groupBy registered_domain); the page
    // side goes scan -> broadcast join with no exchange at all
    val exchanges = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.forall(_.startsWith("registered_domain")),
      s"fact-side shuffle: $exchanges")
  }

  test("frontier rank: admitted-only, scored from rank/delay/depth, ordered per domain") {
    val rows = graft.operators.HtmlExtract.frontierRank(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val admitted = graft.operators.Domains.urlAllowed(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(5)))).toMap
    // exactly the admitted pages appear
    assert(rows.map(_._1).toSet == admitted.filter(_._2._2).keySet)
    // blocked domains never appear (their every page is disallowed)
    assert(!rows.exists(r => r._2 == "spam-farm.net" || r._2 == "tracker.io"))
    val ranks = graft.operators.HtmlExtract.domainRank(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def delay(d: String) = d match {
      case "example.co.nz" => 10L; case "wikipedia.org" => 2L
      case "services.govt.nz" => 4L; case _ => 1L
    }
    rows.foreach { case (doc, dom, depth, score, _) =>
      val path = admitted(doc)._1
      assert(depth == path.count(_ == '/').toLong, s"doc $doc depth")
      assert(score == ranks(dom) / (delay(dom) * (1 + depth)), s"doc $doc")
    }
    // fetch_order is a dense 1..n ranking per domain following score desc
    rows.groupBy(_._2).foreach { case (dom, ds) =>
      val ordered = ds.sortBy(_._5)
      assert(ordered.map(_._5).toSeq == (1 to ds.length).toSeq, dom)
      assert(ordered.map(-_._4).toSeq == ordered.map(-_._4).toSeq.sorted, dom)
    }
    // the slow domain's pages score below an equally-ranked 1 s domain's
    val slow = rows.filter(_._2 == "example.co.nz").map(_._4).max
    val fast = rows.filter(_._2 == "heritage.org.nz").map(_._4).max
    assert(slow < fast, s"delay did not demote: $slow vs $fast")
  }

  test("seen bloom: no false negatives ever; tiny filter shows flagged FPs") {
    import spark.implicits._
    val hist = (0L until 40L).map(i => (i, s"https://h/$i"))
    // probe re-discovers half of history plus 60 novel URLs
    val probe = hist.take(20) ++ (100L until 160L).map(i => (i, s"https://h/$i"))
    val probeDf = probe.toDF("doc_id", "url")
    val histDf = hist.toDF("doc_id", "url")
    // production-sized filter: exact answers on this tiny set
    val big = Domains.seenBloomCore(probeDf, histDf, 1 << 14, 3).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)))).toMap
    assert(big.size == 80)
    probe.foreach { case (id, _) =>
      val (maybe, actual, fp) = big(id)
      assert(!actual || maybe, s"false negative at $id — bloom contract broken")
      assert(fp == (maybe && !actual), s"fp flag inconsistent at $id")
    }
    assert(hist.take(20).forall { case (id, _) => big(id)._2 })
    // a 16-bit filter saturates: still ZERO false negatives, many
    // flagged false positives — the audit column earns its keep
    val tiny = Domains.seenBloomCore(probeDf, histDf, 16, 3).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)))).toMap
    probe.foreach { case (id, _) =>
      assert(!tiny(id)._2 || tiny(id)._1, s"false negative at $id (tiny)")
    }
    assert(tiny.values.count(_._3) > 0,
      "a saturated filter must show flagged false positives")
  }

  test("sitemap discovery: scope rule, robots still gates, index children make no admission claim") {
    val rows = graft.operators.Domains.sitemapUrls(spark, sfDir).collect()
      .map(r => r.getString(2) -> ((r.getString(0), r.getString(1),
        if (r.isNullAt(4)) null else r.getString(4), r.getBoolean(5),
        if (r.isNullAt(6)) null else r.getBoolean(6)))).toMap
    assert(rows.size == 9)
    // a sitemap ADVERTISES; the domain's own robots still decides
    assert(rows("https://www.example.com/doc/1")._5 == true)
    assert(rows("https://www.example.com/src1/page")._5 == false,
      "Disallow /src1 must gate the advertised URL")
    assert(rows("https://www.example.com/src12/ok")._5 == true,
      "the longer Allow /src12 must override")
    assert(rows("https://data.example.co.nz/src7/hidden")._5 == false)
    assert(rows("https://blog.spam-farm.net/x")._5 == false,
      "a fully blocked domain's sitemap admits nothing")
    // protocol scope rule: a sitemap may only list its own host
    val stolen = rows("https://elsewhere.org/stolen")
    assert(!stolen._4 && stolen._5 == null,
      s"cross-host entry: out of scope, no admission claim: $stolen")
    // index children are sitemap refs, never page admissions
    val child = rows("https://en.wikipedia.org/sitemap-0.xml")
    assert(child._2 == "sitemap" && child._3 == "2024-04-01" &&
      child._5 == null, s"index child: $child")
    // lastmod is nullable, absent entries stay null
    assert(rows("https://data.example.co.nz/a/1")._3 == null)
  }
}
