package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Curation, Dedup, History, TextAnalysis}

/** Pins for the round-7 additions: cross-document span dedup, corpus
  * snapshot diff, tokenizer fertility, and the exact two-sample KS
  * statistic. Oracle parity is the driver's job; these pin the
  * SEMANTICS the oracle can't see failing (span merge rules, diff
  * status assignment, cross-op consistency, plan shape).
  */
class DeltaStatsSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String =
    docsLangDir(rows.map { case (id, t) => (id, t, "en") })

  private def docsLangDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xspan").toString
    rows.map { case (id, t, lang) => (id, t, lang, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("cross spans: overlapping 8-gram hits merge into one exact span") {
    // doc 1: 10 unique words, a 12-word block shared with doc 2, 3 more.
    // The 5 overlapping 8-gram start positions (11..15) must merge into
    // ONE span [11, 22] of 12 words in each document.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> ((1 to 10).map(i => s"a$i").mkString(" ") + " " + shared + " a11 a12 a13"),
      2L -> ((1 to 4).map(i => s"b$i").mkString(" ") + " " + shared),
      3L -> (1 to 30).map(i => s"c$i").mkString(" ")))
    val got = Dedup.crossSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, 11L, 22L, 12L, 5L),
      (2L, 5L, 16L, 12L, 5L)), s"got $got")
  }

  test("cross spans: a 7-word overlap is below the gram size — no span") {
    val seven = (1 to 7).map(i => s"s$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> (seven + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      2L -> (seven + " " + (1 to 10).map(i => s"b$i").mkString(" "))))
    assert(Dedup.crossSpans(spark, dir).count() == 0)
  }

  test("cross spans: blocks separated by more than the gram span stay split") {
    // Two 8-word shared blocks with 12 unique words between them: the
    // dup-gram starts are 9 and 29 (gap 20 > 8) — two spans per doc.
    val b1 = (1 to 8).map(i => s"x$i").mkString(" ")
    val b2 = (1 to 8).map(i => s"y$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> ((1 to 8).map(i => s"a$i").mkString(" ") + " " + b1 + " " +
        (1 to 12).map(i => s"m$i").mkString(" ") + " " + b2),
      2L -> (b1 + " " + (1 to 12).map(i => s"n$i").mkString(" ") + " " + b2)))
    val byDoc = Dedup.crossSpans(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc == Map(1L -> 2, 2L -> 2), s"got $byDoc")
  }

  test("span trim: keeper doc survives intact, the other loses the span") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val d1 = (1 to 10).map(i => s"a$i").mkString(" ") + " " + shared
    val d2 = (1 to 4).map(i => s"b$i").mkString(" ") + " " + shared
    val d3 = (1 to 30).map(i => s"c$i").mkString(" ")
    val dir = docsDir(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    val got = Dedup.spanTrim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // doc 1 is every shared gram's minimum owner: intact. doc 2 keeps
    // only its unique prefix. doc 3 had no duplicated span.
    assert(got(1L) == ((22L, d1)), s"keeper mutated: ${got(1L)}")
    assert(got(2L) == ((4L, "b1 b2 b3 b4")), s"got ${got(2L)}")
    assert(got(3L) == ((30L, d3)))
  }

  test("span trim: a fully duplicated doc trims to the empty string") {
    val t = (1 to 16).map(i => s"s$i").mkString(" ")
    val dir = docsDir(Seq(1L -> t, 2L -> t))
    val got = Dedup.spanTrim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((16L, t)) && got(2L) == ((0L, "")), s"got $got")
  }

  test("span trim: merged island with two owners trims per owner — " +
      "a passage owned by this doc survives here (r7 ADVICE)") {
    // doc2 = X ++ Y adjacent: X shared with doc1 (owner 1), Y shared
    // with doc3 (owner 2 = doc2). The dup-gram runs merge into ONE
    // island in doc2 (position gap 8 <= gram size); trimming by the
    // island-min owner would delete Y in doc2 AND doc3 — surviving
    // nowhere. Per-owner sub-extents keep Y exactly once, in doc2.
    val x = (1 to 12).map(i => s"x$i").mkString(" ")
    val y = (1 to 12).map(i => s"y$i").mkString(" ")
    val d1 = (1 to 10).map(i => s"a$i").mkString(" ") + " " + x
    val d2 = x + " " + y
    val d3 = (1 to 10).map(i => s"b$i").mkString(" ") + " " + y
    val dir = docsDir(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    val got = Dedup.spanTrim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((22L, d1)), s"doc1 mutated: ${got(1L)}")
    assert(got(2L) == ((12L, y)), s"Y must survive in doc2: ${got(2L)}")
    assert(got(3L) == ((10L, (1 to 10).map(i => s"b$i").mkString(" "))),
      s"got ${got(3L)}")
  }

  test("span trim: A-B-A owner island — non-contiguous same-owner runs " +
      "must NOT merge into one covering extent (r8 ADVICE)") {
    // doc2 = X ++ Y ++ Z: X and Z shared with doc1 (owner 1), Y shared
    // with doc3 (owner 2 = doc2). All three dup-gram runs merge into
    // ONE island in doc2 (each gap is exactly the gram size), with the
    // owner sequence 1,2,1 along pos. Grouping per (island, owner)
    // would fuse the two owner-1 runs into a single min..max extent
    // whose INTERIOR covers Y's positions — Y trimmed in doc2 (its own
    // owner doc) and in doc3, surviving nowhere. Contiguous-run
    // segmentation keeps Y exactly once, in doc2.
    val x = (1 to 12).map(i => s"x$i").mkString(" ")
    val y = (1 to 12).map(i => s"y$i").mkString(" ")
    val z = (1 to 12).map(i => s"z$i").mkString(" ")
    val d1 = (1 to 10).map(i => s"a$i").mkString(" ") + " " + x + " " +
      (1 to 10).map(i => s"m$i").mkString(" ") + " " + z
    val d2 = x + " " + y + " " + z
    val d3 = (1 to 10).map(i => s"b$i").mkString(" ") + " " + y
    val dir = docsDir(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    val got = Dedup.spanTrim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((44L, d1)), s"doc1 (owner of X,Z) mutated: ${got(1L)}")
    assert(got(2L) == ((12L, y)),
      s"Y must survive in doc2 (the A-B-A interior): ${got(2L)}")
    assert(got(3L) == ((10L, (1 to 10).map(i => s"b$i").mkString(" "))),
      s"got ${got(3L)}")
  }

  test("line boilerplate: an aligned shared segment is removed from " +
      "EVERY copy; unaligned sharing survives") {
    // block B sits on a segment boundary in doc1 (seg 0) AND doc2
    // (seg 1, after an 8-word prefix) -> removed from both, no keeper.
    // doc3 contains B off-alignment (after 4 words): its segments hash
    // differently, so it keeps everything — the operator is line-dedup,
    // not substring-dedup (that is spanTrim's job).
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val p8 = (1 to 8).map(i => s"p$i").mkString(" ")
    val p4 = (1 to 4).map(i => s"q$i").mkString(" ")
    val d1 = b + " " + (1 to 8).map(i => s"a$i").mkString(" ")
    val d2 = p8 + " " + b
    val d3 = p4 + " " + b + " " + (1 to 4).map(i => s"r$i").mkString(" ")
    val dir = docsDir(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    val got = Dedup.lineBoilerplate(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((8L, 1L, (1 to 8).map(i => s"a$i").mkString(" "))),
      s"doc1: ${got(1L)}")
    assert(got(2L) == ((8L, 1L, p8)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((16L, 0L, d3)), s"doc3: ${got(3L)}")
  }

  test("zipf: slope and intercept reconstruct from planted term counts") {
    // source s1: counts a=4, b=2, c=1 → ranks 1,2,3. s2: uniform counts
    // (flat cloud, slope 0 over distinct ranks? no — y constant → slope
    // exactly 0). Mirror the engine's formula on plain doubles.
    val dir = docsLangDir(Seq(
      (1L, "a a a a b b c", "en"),
      (2L, "u v w x", "en")))
    // doc source is constant "src" in the fixture helper → distinguish
    // by... both docs share source; plant counts via one source instead
    val got = TextAnalysis.zipf(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // merged corpus: a=4, b=2, c=1, u=v=w=x=1 → ranks: a1, b2, then the
    // five singletons in term order c3 u4 v5 w6 x7
    val cnts = Seq(4L, 2L, 1L, 1L, 1L, 1L, 1L)
    val xs = cnts.indices.map(i => math.rint(math.log(i + 1.0) * 1e6) / 1e6)
    val ys = cnts.map(c => math.rint(math.log(c.toDouble) * 1e6) / 1e6)
    val n = cnts.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val (nt, tt, s, ic) = got("src")
    assert(nt == 7L && tt == 11L, s"got $got")
    assert(math.abs(s - slope) < 1e-4, s"slope $s vs $slope")
    assert(math.abs(ic - intercept) < 1e-4, s"intercept $ic vs $intercept")
    assert(s < 0, "a Zipf-ish cloud must slope downward")
  }

  test("readability: words/sentences/syllables reconstruct by hand, " +
      "literal V is not a syllable") {
    import graft.operators.TextAnalysis
    // "Very big cats eat. Dogs run!" — words 6, sentences 2, vowel
    // runs: V-e-y? 'Very'→e,y(2)... counted per the engine's rule:
    // maximal [aeiouyAEIOUY]+ runs over the WHOLE text.
    val text = "Very big cats eat. Dogs V run!"
    val dir = docsDir(Seq(1L -> text))
    val r = TextAnalysis.readability(spark, dir).collect().head
    val runs = "[aeiouyAEIOUY]+".r.findAllIn(text).length
    val words = text.split(" ").length
    val sentences = text.count(c => c == '.' || c == '!' || c == '?')
    assert(r.getInt(1) == words && r.getInt(2) == sentences,
      s"got $r want words=$words sent=$sentences")
    assert(r.getInt(3) == runs,
      s"syllables ${r.getInt(3)} != vowel-run count $runs " +
        "(a literal 'V' must not count)")
    val fk = 0.39 * words.toDouble / sentences +
      11.8 * runs.toDouble / words - 15.59
    assert(math.abs(r.getDouble(4) - fk) < 1e-3, s"fk ${r.getDouble(4)} vs $fk")
  }

  test("plan shapes: readability is shuffle-free; zipf and gini " +
      "windows are partitioned, never global") {
    import graft.operators.{Analytics, TextAnalysis}
    // the zero-shuffle claim IS readability's scale story — a shuffle
    // appearing here means the projection stopped fusing into the scan
    val rp = TextAnalysis.readability(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!rp.contains("Exchange"), s"readability gained a shuffle:\n$rp")
    // vocab windows must be keyed (source/grp) — an unpartitioned
    // Window here would single-task the corpus at scale
    Seq(TextAnalysis.zipf(spark, sfDir), Analytics.gini(spark, sfDir))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        plan.linesIterator.filter(_.contains("Window")).foreach { l =>
          assert(!l.contains("specifiedwindowframe") || l.contains("#"),
            l)
        }
        // concrete check: no "Window [" node without a partition spec —
        // Spark prints partitionBy columns inside the node; a global
        // window renders as windowspecdefinition() with empty partition
        assert(!plan.contains("windowspecdefinition()"),
          s"global window in:\n$plan")
      }
  }

  test("assortativity: the decimal-moment pearson equals a collected " +
      "per-edge computation") {
    import graft.operators.Graph
    val Array(r0) = Graph.assortativity(spark, sfDir).collect()
    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
      .join(spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val ds = edges.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val dc = edges.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val xs = edges.map(e => ds(e._1))
    val ys = edges.map(e => dc(e._2))
    val n = edges.length.toDouble
    val r = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) /
      (math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        math.sqrt(n * ys.map(a => a * a).sum - ys.sum * ys.sum))
    assert(r0.getLong(0) == edges.length.toLong)
    assert(math.abs(r0.getDouble(1) - r) < 1e-4,
      s"${r0.getDouble(1)} vs $r")
  }

  test("qq: each decile is the inclusive-rank order statistic of its " +
      "group") {
    import graft.operators.Analytics
    val got = Analytics.qq(spark, sfDir).collect()
      .map(r => math.rint(r.getDouble(0) * 10).toInt ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val byGrp = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .filter(r => r.getDouble(1) > 0 &&
        Set("1-URGENT", "5-LOW").contains(r.getString(0)))
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r =>
        math.floor(r.getDouble(1) * 100).toLong).sorted).toMap
    def q(xs: Array[Long], p: Double): Long =
      xs(math.ceil(xs.length * p).toInt - 1)
    (1 to 9).foreach { i =>
      val p = i / 10.0
      assert(got(i)._1 == q(byGrp("1-URGENT"), p),
        s"p=$p urgent ${got(i)._1}")
      assert(got(i)._2 == q(byGrp("5-LOW"), p), s"p=$p low ${got(i)._2}")
    }
  }

  test("gini: the histogram rank formula equals the quadratic " +
      "mean-absolute-difference definition") {
    import graft.operators.Analytics
    val got = Analytics.gini(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val cents = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .filter(_.getDouble(1) > 0)
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => math.floor(r.getDouble(1) * 100).toLong))
      .toMap
    cents.foreach { case (grp, xs) =>
      val n = xs.length
      // independent definition: G = Σ|xi−xj| / (2 n² μ)
      val mu = xs.map(BigInt(_)).sum
      val sorted = xs.sorted
      // Σ|xi−xj| = 2·Σ_i (2i−n+1)·x_(i) over the sorted sample (0-based)
      val sad = 2 * sorted.zipWithIndex
        .map { case (x, i) => BigInt(2 * i - n + 1) * x }.sum
      val g = sad.toDouble / (2.0 * n * mu.toDouble)
      assert(math.abs(got(grp)._2 - g) < 1e-4,
        s"$grp: ${got(grp)._2} vs $g")
      assert(got(grp)._1 == n.toLong)
      assert(got(grp)._2 > 0 && got(grp)._2 < 1)
    }
  }

  test("benford: digit census and chi-square reconstruct from the " +
      "order totals") {
    import graft.operators.Analytics
    val rows = Analytics.benford(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(5)))).toMap
    assert(rows.keySet == (1 to 9).toSet)
    // independent digit census via string heads of exact cents
    val prices = spark.read
      .parquet(s"$sfDir/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0)).filter(_ > 0)
    val counts = prices.groupBy(p =>
      math.floor(p * 100).toLong.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    (1 to 9).foreach { d =>
      assert(rows(d)._1 == counts.getOrElse(d, 0L),
        s"digit $d: ${rows(d)._1} vs ${counts.getOrElse(d, 0L)}")
    }
    val n = counts.values.sum.toDouble
    val chi2 = (1 to 9).map { d =>
      val p = math.log10(1.0 + 1.0 / d)
      math.pow(counts.getOrElse(d, 0L) - n * p, 2) / (n * p)
    }.sum
    assert(math.abs(rows(1)._2 - chi2) < 0.01,
      s"chi2 ${rows(1)._2} vs $chi2")
    // all rows carry the same total
    assert(rows.values.map(_._2).toSet.size == 1)
  }

  test("bpe pairs: adjacent char-pair counts are instance-weighted and " +
      "cut under the total order") {
    import graft.operators.TextAnalysis
    // "abab ab" + "ab": pairs ab,ba,ab | ab | ab -> ab:4, ba:1;
    // single-char word "x" contributes nothing
    val dir = docsDir(Seq(1L -> "abab ab x", 2L -> "ab"))
    val got = TextAnalysis.bpePairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("ab" -> 4L, "ba" -> 1L), s"got ${got.toSeq}")
  }

  test("epoch plan: equal shares fill via repetition, the 4-epoch cap " +
      "binds small sources and reports the deficit") {
    import graft.operators.Curation
    // two sources; doc helper pins source="src" — use lang? No: the
    // planner groups by source, so plant via a custom frame
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("epoch").toString
    Seq((1L, (1 to 90).map(_ => "w").mkString(" "), "en", "big", 90L),
      (2L, (1 to 10).map(_ => "w").mkString(" "), "en", "small", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // ta=100, k=2, budget=200, target=100 each. big: planned
    // min(100, 360)=100 -> 1.1111 epochs, uncapped. small: planned
    // min(100, 40)=40 -> 4 epochs, capped, deficit 60.
    val got = Curation.epochPlan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5), r.getLong(6))))
      .toMap
    assert(got("big") == ((90L, 100L, 100L, 1.1111, false, 0L)),
      s"big: ${got("big")}")
    assert(got("small") == ((10L, 100L, 40L, 4.0, true, 60L)),
      s"small: ${got("small")}")
  }

  test("dsir: importance weights reconstruct by hand, target-like docs rank first") {
    // target (en) corpus: 4× 'good'. raw pool adds 'bad'. By-hand LM:
    // raw: good 6, bad 6; V=2, Nr=12, Nt=4.
    // lr(good) = ln((5/6)/(7/14)) = ln(5/3)  = 0.510826 (6 dp)
    // lr(bad)  = ln((1/6)/(7/14)) = ln(1/3)  = -1.098612
    val dir = docsLangDir(Seq(
      (1L, "good good good good", "en"),
      (2L, "bad bad bad bad", "xx"),
      (3L, "good good bad bad", "xx")))
    val got = Curation.dsir(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, 4L, 2.043304),
      (3L, 4L, -1.175572),
      (2L, 4L, -4.394448)), s"got ${got.toSeq}")
  }

  test("containment: a doc swallowed by a larger one is found at " +
      "containment 1 despite low jaccard") {
    // doc 1 is verbatim inside doc 2 (with ~4x padding): every one of
    // doc 1's char-12-grams is shared (containment = 1), while the
    // symmetric jaccard sits far below the 0.8 near-dup threshold —
    // exactly the pair minhash banding rightly never surfaces. doc 3
    // is unrelated.
    val inner = (1 to 20).map(i => s"core$i").mkString(" ")
    val d2 = (1 to 30).map(i => s"pad$i").mkString(" ") + " " + inner +
      " " + (1 to 30).map(i => s"tail$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> inner, 2L -> d2,
      3L -> (1 to 40).map(i => s"zz$i").mkString(" ")))
    val got = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set((1L, 2L)), s"got $got")
    val (c, j) = got((1L, 2L))
    assert(c == 1.0, s"containment $c")
    assert(j < 0.8, s"jaccard $j should be below the near-dup threshold")
  }

  test("trim family is idempotent: a second pass over its own output " +
      "rewrites nothing") {
    // after one spanTrim pass every duplicated passage survives exactly
    // once; after one boilerplate pass no segment recurs across docs —
    // so a second pass must be the identity on the rebuilt text.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      1L -> ((1 to 10).map(i => s"a$i").mkString(" ") + " " + shared),
      2L -> ((1 to 4).map(i => s"c$i").mkString(" ") + " " + shared),
      3L -> (b + " " + (1 to 8).map(i => s"d$i").mkString(" ")),
      4L -> ((1 to 8).map(i => s"e$i").mkString(" ") + " " + b),
      5L -> (1 to 20).map(i => s"f$i").mkString(" "))
    def rerun(f: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Unit = {
      val dir1 = docsDir(docs)
      val out1 = f(spark, dir1).select("doc_id", "trimmed_text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val dir2 = docsDir(out1.toSeq.map { case (id, t) => (id, t) })
      val out2 = f(spark, dir2).select("doc_id", "trimmed_text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out2 == out1, s"second pass rewrote: ${
        out2.collect { case (k, v) if out1(k) != v => (k, out1(k), v) }}")
    }
    rerun(Dedup.spanTrim)
    rerun(Dedup.lineBoilerplate)
  }

  test("mixture solver: integer waterfilling reconstructs from availability") {
    val rep = Curation.mixtureSolver(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(rep.nonEmpty)
    val total = rep.values.map(_._1).sum
    val k = rep.size
    rep.foreach { case (src, (avail, target, planned, deficit)) =>
      assert(target == total / k, s"$src target")
      assert(planned == math.min(avail, target), s"$src planned")
      assert(deficit == target - planned && deficit >= 0, s"$src deficit")
    }
  }

  test("span incremental: vs-history only, batch-internal dups ignored") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val bshared = (1 to 10).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq(
      // history (even ids): doc 2 carries the span doc 1 lifted
      2L -> ((1 to 6).map(i => s"h$i").mkString(" ") + " " + shared),
      4L -> (1 to 20).map(i => s"k$i").mkString(" "),
      // batch (odd ids): doc 1 lifts from history; docs 3 and 5 share
      // a span only WITH EACH OTHER — out of scope by contract
      1L -> (shared + " " + (1 to 5).map(i => s"a$i").mkString(" ")),
      3L -> (bshared + " b1 b2"),
      5L -> (bshared + " c1 c2")))
    val df = Dedup.spanIncremental(spark, dir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 10L)), s"got $got")
    // plan pin for the candidates-only rule: the history re-gram feeds
    // through a LEFT SEMI join on the candidate doc ids — its absence
    // would mean every batch re-processes the full history text
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val semis = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }
    assert(semis.nonEmpty,
      "candidates-only semi-join missing from the span-incremental plan")
  }

  test("corpus diff: status census reconstructs from the version rules") {
    val docs = Tables(spark, sfDir, "documents").cache()
    try {
      val added = docs.where(col("doc_id") % 10 === 0).count()
      val removed = docs.where(col("doc_id") % 10 === 1).count()
      val changed = docs.where(col("doc_id") % 7 === 0 &&
        col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1 &&
        upper(col("text")) =!= col("text")).count()
      val got = History.corpusDiff(spark, sfDir).groupBy("status").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("added" -> added, "removed" -> removed,
        "changed" -> changed), s"got $got")
    } finally docs.unpersist()
  }

  test("fertility: aggregating text_tokens per slice reproduces the report") {
    val perDoc = TextAnalysis.tokens(spark, sfDir)
      .join(Tables(spark, sfDir, "documents")
        .select("doc_id", "lang", "source"), "doc_id")
      .groupBy("lang", "source")
      .agg(sum("n_ws_tokens").as("ws"), sum("n_bpe_tokens").as("bpe"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val rep = TextAnalysis.fertility(spark, sfDir).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (ws, bpe) = perDoc((r.getString(0), r.getString(1)))
      assert(r.getLong(3) == ws && r.getLong(4) == bpe)
      assert(math.abs(r.getDouble(6) - bpe.toDouble / ws) < 1e-6,
        s"fertility drifted for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("mann-whitney: integer rank sums match a collected reference") {
    val vals = Tables(spark, sfDir, "events")
      .where(col("event_type").isin("click", "view") && col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val s1 = vals.collect { case ("click", v) => v }
    val s2 = vals.collect { case ("view", v) => v }
    val all = (s1 ++ s2).sorted
    // average ranks with ties, 1-based
    val rankOf = all.distinct.map { v =>
      val lo = all.indexWhere(_ == v) + 1
      val hi = all.lastIndexWhere(_ == v) + 1
      v -> (lo + hi) / 2.0
    }.toMap
    val r1 = s1.map(rankOf).sum
    val u1 = r1 - s1.length.toLong * (s1.length + 1) / 2.0
    val n1 = s1.length.toDouble
    val n2 = s2.length.toDouble
    val n = n1 + n2
    val ties = all.groupBy(identity).values
      .map(g => g.length.toDouble).map(c => c * c * c - c).sum
    val z = (u1 - n1 * n2 / 2.0) /
      math.sqrt(n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1))))
    val row = Analytics.statsMannWhitney(spark, sfDir).collect().head
    assert(row.getLong(0) == s1.length && row.getLong(1) == s2.length)
    assert(math.abs(row.getDouble(2) - u1) < 1e-6,
      s"U ${row.getDouble(2)} != reference $u1")
    assert(math.abs(row.getDouble(3) - z) < 1e-5,
      s"z ${row.getDouble(3)} != reference $z")
  }

  test("rfm: scores reconstruct from collected quartiles, segments concat") {
    import graft.operators.Events
    val rows = Events.rfm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Independent inclusive-rank order statistic (quantile_disc):
    // smallest value with cumulative count >= ceil(p*n). Deliberately
    // NOT Spark's interpolating formula — the r7 verdict flagged the
    // old reconstruction as self-confirming.
    def q(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.ceil(p * s.length).toInt - 1)
    }
    val rec = rows.map(_.getLong(1).toDouble)
    val fre = rows.map(_.getLong(2).toDouble)
    val mon = rows.map(_.getDouble(3))
    val (r1, r3) = (q(rec, 0.25), q(rec, 0.75))
    val (f1, f3) = (q(fre, 0.25), q(fre, 0.75))
    val (m1, m3) = (q(mon, 0.25), q(mon, 0.75))
    rows.foreach { r =>
      val rs = 3 - (if (r.getLong(1) > r1) 1 else 0) -
        (if (r.getLong(1) > r3) 1 else 0)
      val fs = 1 + (if (r.getLong(2) > f1) 1 else 0) +
        (if (r.getLong(2) > f3) 1 else 0)
      val ms = 1 + (if (r.getDouble(3) > m1) 1 else 0) +
        (if (r.getDouble(3) > m3) 1 else 0)
      assert(r.getInt(4) == rs && r.getInt(5) == fs && r.getInt(6) == ms,
        s"user ${r.getLong(0)} scores ${r.getInt(4)}${r.getInt(5)}${r.getInt(6)} != $rs$fs$ms")
      assert(r.getString(7) == s"$rs$fs$ms")
    }
    // all three score levels must actually occur on the fixture
    assert(rows.map(_.getInt(5)).distinct.sorted.toSeq == Seq(1, 2, 3))
  }

  test("rfm sketch twin: same shape as exact, scores in range, " +
      "rank contract green on the fixture") {
    import graft.operators.Events
    val exact = Events.rfm(spark, sfDir)
    val sk = Events.rfmSketch(spark, sfDir)
    assert(sk.schema == exact.schema,
      s"serving twin must be shape-compatible: ${sk.schema} vs ${exact.schema}")
    val rows = sk.collect()
    assert(rows.length == exact.count())
    assert(rows.forall(r => (4 to 6).forall(i =>
      r.getInt(i) >= 1 && r.getInt(i) <= 3)))
    val check = Events.rfmSketchCheck(spark, sfDir).collect()
    assert(check.length == 6 && check.forall(_.getBoolean(2)),
      s"rank contract: ${check.mkString(", ")}")
  }

  test("forecast: the Holt recurrence reconstructs by hand and the " +
      "horizon extrapolates the final trend") {
    import spark.implicits._
    import graft.operators.Events
    // daily counts 10,12,14,16,18 (clean trend +2/day)
    val dir = java.nio.file.Files.createTempDirectory("holt").toString
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime
    val rows = for {
      d <- 0 until 5; k <- 0 until (10 + 2 * d)
    } yield ((d * 100 + k).toLong,
      new java.sql.Timestamp(t0 + d * 86400000L + k * 1000L),
      1L, "click", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.forecast(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getDouble(2))
      .toMap
    // hand mirror
    val xs = Seq(10.0, 12.0, 14.0, 16.0, 18.0)
    var l = xs(0); var b = xs(1) - xs(0)
    val levels = scala.collection.mutable.ArrayBuffer(l)
    (1 until 5).foreach { t =>
      val pl = l
      l = 0.3 * xs(t) + 0.7 * (l + b)
      b = 0.1 * (l - pl) + 0.9 * b
      levels += l
    }
    (0 until 5).foreach { d =>
      val day = f"2024-05-0${d + 1}%d"
      assert(math.abs(got((day, "level")) - levels(d)) < 1e-3,
        s"$day: ${got((day, "level"))} vs ${levels(d)}")
    }
    // a clean linear series forecasts ~linearly: +b per day
    (1 to 7).foreach { h =>
      val day = f"2024-05-0${5 + h}%02d".replace("2024-05-012", "2024-05-12")
      val key = (java.time.LocalDate.parse("2024-05-05").plusDays(h)
        .toString, "forecast")
      assert(math.abs(got(key) - (l + h * b)) < 1e-3, s"h=$h ${got.get(key)}")
    }
    assert(got.count(_._1._2 == "forecast") == 7)
  }

  test("changepoint: CUSUM peaks at a planted level shift") {
    import spark.implicits._
    import graft.operators.Events
    // 6 days at 10 events/day then 6 days at 30: the CUSUM extreme
    // must land exactly on the last low day (day 6)
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = for {
      d <- 0 until 12
      k <- 0 until (if (d < 6) 10 else 30)
    } yield ((d * 100 + k).toLong,
      new java.sql.Timestamp(t0 + d * 86400000L + k * 1000L),
      1L, "click", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.changepoint(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.size == 12)
    // μ = 240/12 = 20; S_6 = 60 − 120 = −60 is the extreme
    assert(got("2024-03-06") == ((10L, -60.0, true)),
      s"got ${got("2024-03-06")}")
    assert(got.count(_._2._3) == 1, s"one change day: $got")
    assert(got("2024-03-12")._2 == 0.0, "CUSUM must return to zero")
  }

  test("survival: Kaplan-Meier reconstructs by hand, last-day users " +
      "are censored not dead") {
    import spark.implicits._
    import graft.operators.Events
    // 6 users, last days: u1,u2 -> d1; u3 -> d2; u4,u5,u6 -> d3 (= max
    // day, CENSORED). KM: d1: n=6 d=2 -> S=4/6; d2: n=4 d=1 -> S=1/2;
    // d3: n=3 d=0 -> S unchanged.
    val dir = java.nio.file.Files.createTempDirectory("surv").toString
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0$day%d 12:00:00")
    val rows = Seq(
      (1L, ts(1), 1L), (2L, ts(1), 2L), (3L, ts(1), 3L), (4L, ts(1), 4L),
      (5L, ts(2), 3L), (6L, ts(2), 5L),
      (7L, ts(3), 4L), (8L, ts(3), 5L), (9L, ts(3), 6L))
      .map { case (e, t, u) => (e, t, u, "click", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.survival(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet ==
      Set("2024-01-01", "2024-01-02", "2024-01-03"), s"got $got")
    assert(got("2024-01-01") == ((6L, 2L, 0.666667)), s"d1 ${got("2024-01-01")}")
    assert(got("2024-01-02") == ((4L, 1L, 0.5)), s"d2 ${got("2024-01-02")}")
    val (n3, d3, s3) = got("2024-01-03")
    assert(n3 == 3L && d3 == 0L && s3 == 0.5,
      s"censored day must not move the curve: ${got("2024-01-03")}")
  }

  test("markov stationary: the 8-step integer iteration reconstructs " +
      "by hand, mass conserved on a closed chain") {
    import spark.implicits._
    import graft.operators.Events
    // one user, sequence A B A B B → transitions A→B:2, B→A:1, B→B:1
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Seq("A", "B", "A", "B", "B").zipWithIndex
      .map { case (ty, i) =>
        (i.toLong, new java.sql.Timestamp(t0 + i * 1000L), 1L, ty, 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // integer mirror: v'(A) = v(B) div 2; v'(B) = v(A)*2 div 2 + v(B) div 2
    var (va, vb) = (500000L, 500000L)
    (1 to 8).foreach { _ =>
      val (na, nb) = (vb / 2, va * 2 / 2 + vb / 2)
      va = na; vb = nb
    }
    val got = Events.markovStationary(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("A") == ((va, math.rint(va / 1e6 * 1e6) / 1e6)),
      s"A: ${got("A")} expect $va")
    assert(got("B")._1 == vb, s"B: ${got("B")} expect $vb")
    // floor division sheds at most 1 micro-unit per odd halving —
    // identical in the mirror, so the totals agree exactly
    assert(got("A")._1 + got("B")._1 == va + vb)
    assert(got("A")._1 + got("B")._1 >= 1000000L - 8)
  }

  test("cuped: theta and adjusted means reconstruct from raw events") {
    import graft.operators.Events
    val ev = Tables(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val cutoff = d0.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(d0, d1) / 2)
    def dec2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val pu = ev.groupBy(_._1).map { case (u, es) =>
      val x = es.filter(_._2.isBefore(cutoff)).map(e => dec2(e._3)).sum
      val y = es.filter(e => !e._2.isBefore(cutoff)).map(e => dec2(e._3)).sum
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      val arm = if (((md(0) >> 4) & 0xF) < 8) "control" else "treatment"
      (arm, x.toDouble, y.toDouble)
    }.toSeq
    val n = pu.size.toDouble
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val sxy = pu.map(p => p._2 * p._3).sum
    val sxx = pu.map(p => p._2 * p._2).sum
    val varx = sxx / n - (sx / n) * (sx / n)
    val theta = if (varx <= 0) 0.0 else (sxy / n - (sx / n) * (sy / n)) / varx
    val got = Events.cuped(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    pu.groupBy(_._1).foreach { case (a, us) =>
      val (na, gotRow) = (us.size, got(a))
      val my = us.map(_._3).sum / na
      val adj = my - theta * (us.map(_._2).sum / na - sx / n)
      assert(gotRow._1 == na.toLong, s"$a n")
      assert(math.abs(gotRow._2 - my) < 1e-4, s"$a mean_y ${gotRow._2} vs $my")
      assert(math.abs(gotRow._3 - adj) < 1e-4, s"$a cuped ${gotRow._3} vs $adj")
      assert(math.abs(gotRow._4 - theta) < 1e-4, s"$a theta")
    }
    // the adjustment must preserve the pooled mean (CUPED is unbiased
    // up to arm-mean recentering): adjusted deltas shrink toward the
    // raw delta by theta * (arm covariate imbalance)
    assert(got.size == 2)
  }

  test("ab proportions: z reconstructs from per-user purchase counts") {
    import graft.operators.Events
    val byUser = Tables(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allUsers = Tables(spark, sfDir, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    def arm(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((md(0) >> 4) & 0xF) < 8) "control" else "treatment"
    }
    val conv = allUsers.map(u => arm(u) -> (byUser.getOrElse(u, 0L) >= 14L))
    val (nc, xc) = (conv.count(_._1 == "control"),
      conv.count(c => c._1 == "control" && c._2))
    val (nt, xt) = (conv.count(_._1 == "treatment"),
      conv.count(c => c._1 == "treatment" && c._2))
    val p = (xc + xt).toDouble / (nc + nt)
    val denom = math.sqrt(p * (1 - p) * (1.0 / nc + 1.0 / nt))
    val z = if (denom == 0) 0.0
      else (xc.toDouble / nc - xt.toDouble / nt) / denom
    val row = Events.abProportions(spark, sfDir).collect().head
    assert(row.getLong(0) == nc && row.getLong(1) == xc &&
      row.getLong(2) == nt && row.getLong(3) == xt,
      s"counts ${row.toSeq} vs ($nc,$xc,$nt,$xt)")
    assert(math.abs(row.getDouble(4) - z) < 1e-5,
      s"z ${row.getDouble(4)} vs $z")
    assert(row.getBoolean(5) == (math.abs(z) > 1.96))
    // the proportion must be interior on the fixture — a saturated
    // p (0 or 1) would make this test vacuous
    assert(xc + xt > 0 && xc + xt < nc + nt)
  }

  test("ab srm: md5 assignment reconstructs, chi-square matches by hand") {
    import graft.operators.Events
    val users = Tables(spark, sfDir, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    def arm(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((md(0) >> 4) & 0xF) < 8) "control" else "treatment"
    }
    val nc = users.count(arm(_) == "control").toLong
    val nt = users.length - nc
    val e = users.length / 2.0
    val chi2 = math.pow(nc - e, 2) / e + math.pow(nt - e, 2) / e
    val row = Events.abSrm(spark, sfDir).collect().head
    assert(row.getLong(0) == nc && row.getLong(1) == nt,
      s"assignment mismatch: ${row.getLong(0)}/${row.getLong(1)} vs $nc/$nt")
    assert(math.abs(row.getDouble(2) - chi2) < 1e-6)
    assert(row.getBoolean(3) == (chi2 > 3.841))
  }

  test("welch t equals the collected two-sample computation") {
    val vals = Tables(spark, sfDir, "events")
      .where(col("event_type").isin("click", "view") && col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val s1 = vals.collect { case ("click", v) => v }
    val s2 = vals.collect { case ("view", v) => v }
    def stats(s: Array[Double]) = {
      val n = s.length
      val m = s.sum / n
      (n, m, s.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = stats(s1)
    val (n2, m2, v2) = stats(s2)
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    val row = Analytics.statsWelch(spark, sfDir).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - (m1 - m2)) < 1e-6)
    assert(math.abs(row.getDouble(3) - t) < 1e-5, s"t ${row.getDouble(3)} != $t")
    assert(math.abs(row.getDouble(4) - df) < 1e-3 * df,
      s"df ${row.getDouble(4)} != $df")
  }

  test("auc equals the collected pair-counting AUC") {
    val vals = Tables(spark, sfDir, "events")
      .where(col("event_type").isin("purchase", "error") && col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val pos = vals.collect { case ("purchase", v) => v }
    val neg = vals.collect { case ("error", v) => v }
    // AUC = P(pos > neg) + P(pos = neg)/2, counted pairwise
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.length.toDouble * neg.length)
    val row = Analytics.statsAuc(spark, sfDir).collect().head
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(math.abs(row.getDouble(2) - expected) < 1e-6,
      s"AUC ${row.getDouble(2)} != pairwise $expected")
  }

  test("graph jaccard equals the collected neighbor-overlap computation") {
    import graft.operators.Graph
    val edges = Tables(spark, sfDir, "lineitem").as("l")
      .join(Tables(spark, sfDir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .where(col("l.l_quantity") >= 49 &&
        month(col("l.l_shipdate")).isin(1, 2))
      .select(col("l.l_suppkey").as("s"), col("o.o_custkey").as("c"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp: Map[Long, Set[Long]] =
      edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nbrs: Map[Long, Set[Long]] =
      edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    val pairs: Set[(Long, Long)] = bySupp.values.toSeq.flatMap { cs =>
      for (a <- cs.toSeq; b <- cs.toSeq if a < b) yield (a, b)
    }.toSet
    val expected: Seq[(Long, Long, Long, Double)] = pairs.toSeq.map {
      case (a, b) =>
        val common = (nbrs(a) & nbrs(b)).size
        (a, b, common.toLong,
          common.toDouble / (nbrs(a).size + nbrs(b).size - common))
    }.sortBy { case (a, b, _, j) => (-j, a, b) }.take(20)
      .map { case (a, b, c, j) => (a, b, c, math.rint(j * 1e6) / 1e6) }
    val got = Graph.jaccardNeighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("stats_ks equals the collected brute-force KS; windows stay sharded") {
    val vals = Tables(spark, sfDir, "events")
      .where(col("event_type").isin("click", "view") && col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val s1 = vals.collect { case ("click", v) => v }.sorted
    val s2 = vals.collect { case ("view", v) => v }.sorted
    val expected = (s1 ++ s2).distinct.map { v =>
      math.abs(s1.count(_ <= v).toDouble / s1.length -
        s2.count(_ <= v).toDouble / s2.length)
    }.max
    val df = Analytics.statsKs(spark, sfDir)
    val row = df.collect().head
    assert(row.getLong(0) == s1.length && row.getLong(1) == s2.length)
    assert(math.abs(row.getDouble(2) - expected) < 1e-6,
      s"KS ${row.getDouble(2)} != brute-force $expected")
    // Plan pin for the sharded-prefix-sum contract: the ECDF must never
    // run under an UNPARTITIONED window (single-task global sort of the
    // distinct-value frame at corpus scale) — every Window node carries
    // the range-bin partition key.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => WinNode}
    val windows = df.queryExecution.optimizedPlan.collect { case w: WinNode => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "unpartitioned Window in stats_ks — the sharded ECDF decomposition " +
        "was lost; see Analytics.statsKs scaladoc"))
  }

  test("poisson bootstrap: constant values collapse the CI to the mean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    ((0 until 200).map(i => (i.toLong, ts, i.toLong % 7, "buy", 5.0, "{}")) ++
     (0 until 50).map(i => (1000L + i, ts, i.toLong % 3, "view",
       1.0 + (i % 10), "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = graft.operators.Analytics.bootstrapCi(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    // every resample of a constant column has mean == the constant
    val (nBuy, mBuy, loBuy, hiBuy, okBuy) = rows("buy")
    assert(nBuy == 200L && mBuy == 5000000.0)
    assert(loBuy == 5000000.0 && hiBuy == 5000000.0 && okBuy)
    // spread values: a proper interval that still brackets the mean
    val (nV, mV, loV, hiV, okV) = rows("view")
    assert(nV == 50L && loV < hiV && okV && loV <= mV && mV <= hiV)
  }

  test("plan shapes: bootstrap is one scan one shuffle; deflate is shuffle-free") {
    val df = graft.operators.Analytics.bootstrapCi(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // 32 resamples must NOT multiply scans or shuffles: one exchange
    // (the per-type aggregation), everything else map-side
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"bootstrap gained a shuffle:\n$plan")
    assert("FileScan".r.findAllIn(plan).size <= 1,
      s"bootstrap re-scans the corpus:\n$plan")
    val dp = graft.operators.TextAnalysis.compressRatio(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!dp.contains("Exchange"), s"deflate signal gained a shuffle:\n$dp")
  }

  test("plan shapes: sharded walks carry the shard key; bm25 serves the snapshot") {
    // the r15 scale contract: every ShardedPrefix rider's window
    // exchange must partition by (group, _sp_pid), never the small
    // group key alone — the straggler shape the rewrite removed
    for ((name, df) <- Seq(
        "events_sprt" -> graft.operators.Events.sprt(spark, sfDir),
        "events_cusum" -> graft.operators.Events.cusum(spark, sfDir),
        "text_zipf" -> TextAnalysis.zipf(spark, sfDir),
        "text_vocab_growth" -> TextAnalysis.vocabGrowth(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_sp_pid"),
        s"$name lost the shard key from its window exchange")
    }
    // the served-BM25 split: the registered query path must read the
    // persisted postings snapshot, not rebuild the inverted index
    val bm = graft.operators.Retrieval.bm25TopK(spark, sfDir)
    val bplan = bm.queryExecution.executedPlan.toString
    assert(bplan.contains("bm25_postings_full"),
      "bm25TopK no longer serves the content-addressed postings snapshot")
  }

  test("theil-sen: outlier day barely moves the median slope") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts").toString
    // 5 days of clean slope-2 growth (2,4,6,8,10 events) plus one
    // massive outlier day for the same type
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2026-01-${d + 1}%02d 12:00:00")
    var id = 0L
    val rows = (0 until 5).flatMap { d =>
      (0 until 2 * (d + 1)).map { _ => id += 1
        (id, day(d), id % 7, "buy", 1.0, "{}") }
    } ++ (0 until 500).map { _ => id += 1
      (id, day(5), id % 7, "buy", 1.0, "{}") } // outlier day 6
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = graft.operators.Analytics.theilSen(spark, dir).head()
    assert(r.getString(0) == "buy" && r.getLong(1) == 6L && r.getLong(2) == 15L)
    val slope = r.getDouble(3)
    // least squares would report ~ +70/day under the outlier; the
    // Theil-Sen median stays at the clean trend
    assert(slope >= 2.0 && slope <= 3.0, s"median slope $slope")
  }

  test("xi: perfect monotone dependence hits the n=5 theoretical max") {
    import spark.implicits._
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2026-01-${d + 1}%02d 12:00:00")
    def mkDir(ys: Seq[Int]): String = {
      val dir = java.nio.file.Files.createTempDirectory("xi").toString
      var id = 0L
      val rows = ys.zipWithIndex.flatMap { case (y, d) =>
        (0 to d).map { _ => id += 1                    // x = d + 1 views
          (id, day(d), 1L, "view", 1.0, "{}") } ++
        (0 until y).map { _ => id += 1
          (id, day(d), 1L, "click", 1.0, "{}") }
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      dir
    }
    // y = x: rank jumps are all 1 → xi = 1 − n(n−1)/(2·Σl(n−l)) = (n−2)/(n+1)
    val mono = graft.operators.Analytics
      .xiCorrelation(spark, mkDir(Seq(1, 2, 3, 4, 5))).head()
    assert((mono.getLong(0), mono.getLong(1), mono.getLong(2)) ==
      ((5L, 4L, 20L)))
    assert(mono.getDouble(3) == 0.5) // (5−2)/(5+1)
    // rise-fall y = (1,3,5,4,2): jumps 2+2+1+2 = 7 → 1 − 35/40
    val bump = graft.operators.Analytics
      .xiCorrelation(spark, mkDir(Seq(1, 3, 5, 4, 2))).head()
    assert(bump.getLong(1) == 7L && bump.getDouble(3) == 0.125)
  }

  test("kendall: tau-b matches the hand count with tie corrections") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kend").toString
    // daily (clicks, views) over 4 days: x = (1,2,2,3), y = (2,1,1,3)
    // pairs: C=3, D=2, x-ties n1=1, y-ties n2=1, n0=6
    // tau-b = (3-2)/sqrt((6-1)(6-1)) = 0.2
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2026-01-${d + 1}%02d 12:00:00")
    val xs = Seq(1, 2, 2, 3); val ys = Seq(2, 1, 1, 3)
    var id = 0L
    val rows = (0 until 4).flatMap { d =>
      (0 until xs(d)).map { _ => id += 1
        (id, day(d), 1L, "click", 1.0, "{}") } ++
      (0 until ys(d)).map { _ => id += 1
        (id, day(d), 1L, "view", 1.0, "{}") }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = graft.operators.Analytics.kendall(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 6L, 3L, 2L)))
    assert(r.getDouble(4) == 0.2)
  }
}
