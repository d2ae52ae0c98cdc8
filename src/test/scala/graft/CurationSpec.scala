package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("k-anonymity: under-k classes flag, risk share counts rows not classes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    // class A: 6 identical quasi-tuples (safe); class B: 2 (at risk);
    // class C: 1 (at risk) — risk share = (2+1)/9 rows
    val rows =
      (1 to 6).map(i => (i.toLong, s"a$i", 1, 1500.0, "BUILDING")) ++
      (7 to 8).map(i => (i.toLong, s"b$i", 2, 2500.0, "AUTO")) ++
      Seq((9L, "c9", 3, 3500.0, "MACHINERY"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = Curation.kAnonymity(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4), r.getDouble(5)))
    assert(out.length == 3)
    val byNation = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byNation(1) == ((6L, false)))
    assert(byNation(2) == ((2L, true)))
    assert(byNation(3) == ((1L, true)))
    // share is row mass, not class count: 3/9, on every row
    assert(out.forall(_._4 == math.rint(3.0 / 9.0 * 1e6) / 1e6))
  }

  test("pack: token conservation, greedy fill, shard-local bin ids") {
    val packs = Curation.pack(spark, sfDir).collect()
    val corpusTokens = Tables(spark, sfDir, "documents")
      .agg(sum(size(split(trim(col("text")), " ")))).collect()(0).getLong(0)
    // every token lands in exactly one pack
    assert(packs.map(_.getLong(3)).sum == corpusTokens)
    assert(packs.forall(_.getLong(2) >= 1)) // n_docs
    // Greedy start-bin assignment reconstructs exactly from the output:
    // each next pack's id equals the shard's running token prefix div
    // the budget. (Underfull mid-shard packs are the spill of an
    // overfull predecessor — the doc that crossed the boundary carried
    // its tokens into the earlier pack — so no naive "only the tail is
    // underfull" claim holds, but the prefix arithmetic is exact.)
    val byShard = packs.groupBy(_.getLong(0))
    byShard.values.foreach { ps =>
      val sorted = ps.sortBy(_.getLong(1)).toSeq
      assert(sorted.head.getLong(1) == 0L, "first pack of a shard is bin 0")
      var run = 0L
      for (pair <- sorted.sliding(2) if pair.length == 2) {
        run += pair(0).getLong(3)
        assert(pair(1).getLong(1) == run / 512,
          s"pack ${pair(1).getLong(1)} does not continue prefix $run")
      }
    }
  }

  test("contamination: a lifted benchmark phrase flags, fresh text does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contam").toString
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    Seq(
      (1L, benchText, "en", "bench", 0L),      // benchmark member
      // corpus doc lifting 9 consecutive benchmark words => two 8-grams
      (30L, "prefix words " + benchText.split(" ").take(9).mkString(" ") + " suffix", "en", "web", 0L),
      // corpus doc sharing ONE 8-gram only (first 8 words then diverges)
      (31L, benchText.split(" ").take(8).mkString(" ") + " completely different ending here", "en", "web", 0L),
      (32L, "entirely unrelated content with no overlap whatsoever at all today", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Curation.contamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((30L, 1L)), s"lifted phrase not flagged: $got")
    assert(got((30L, 1L)) == 2L) // 9 lifted words = exactly two 8-grams
    assert(!got.keySet.exists(_._1 == 31L), "single-gram coincidence must stay below threshold")
    assert(!got.keySet.exists(_._1 == 32L))
  }

  test("quality gate keeps exactly the top-quintile tail, threshold attached") {
    val d = Tables(spark, sfDir, "documents")
    val total = d.count()
    val rows = Curation.qualityGate(spark, sfDir).collect()
    val thr = rows.head.getDouble(3)
    assert(rows.forall(_.getLong(2) >= thr), "a kept doc fell below the threshold")
    assert(rows.forall(_.getDouble(3) == thr)) // one global threshold
    // exact-percentile gate keeps ~20%: ties can push it slightly over
    assert(rows.length >= total / 5 && rows.length <= total * 3 / 10,
      s"${rows.length} of $total kept — not a 20% gate")
    // nothing ABOVE the threshold was dropped
    val above = d.where(col("n_chars") >= thr).count()
    assert(rows.length.toLong == above)
  }

  test("balanced sample (exact check): every language keeps exactly min count") {
    val d = Tables(spark, sfDir, "documents")
    val classCounts = d.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = classCounts.values.min
    val sample = Curation.balancedSampleExact(spark, sfDir).collect()
    val byLang = sample.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang.keySet == classCounts.keySet, "a class vanished from the sample")
    assert(byLang.values.forall(_.toLong == m),
      s"unbalanced sample: $byLang (min class $m)")
    // deterministic: a second run picks the same documents
    val again = Curation.balancedSampleExact(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(again == sample.map(_.getLong(0)).toSet)
  }

  test("balanced sample serving path: hash threshold, no sort, counts near m") {
    val d = Tables(spark, sfDir, "documents")
    val classCounts = d.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = classCounts.values.min
    val df = Curation.balancedSample(spark, sfDir)
    val sample = df.collect()
    val byLang = sample.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang.keySet == classCounts.keySet, "a class vanished from the sample")
    // the smallest class short-circuits to keep-all = exactly m
    val minLang = classCounts.minBy(_._2)._1
    assert(byLang(minLang).toLong == m)
    // other classes: Binomial(c, m/c) concentrates at m; 4·√m is ~4σ
    val tol = 4 * math.sqrt(m.toDouble)
    byLang.foreach { case (lang, n) =>
      assert(math.abs(n - m) <= tol,
        s"$lang kept $n docs, expected $m ± $tol")
    }
    // deterministic: a second run picks the same documents
    val again = Curation.balancedSample(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(again == sample.map(_.getLong(0)).toSet)
    // the scale contract: one scan + broadcast joins — no Sort, no
    // Window, no per-class rank anywhere in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"serving path grew a Window:\n$plan")
    assert(!plan.contains("Sort ["), s"serving path grew a Sort:\n$plan")
  }

  test("curriculum: equal-size phases, quality monotone across phases") {
    val rows = Curation.curriculum(spark, sfDir).collect()
    val byPhase = rows.groupBy(_.getLong(3))
    assert(byPhase.keySet == (1L to 4L).toSet)
    val sizes = byPhase.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unequal phases: $sizes") // ntile contract
    // phase 1 holds the highest-quality tail (mean order is the
    // tie-robust form of the ordering claim)
    val meanBy = byPhase.view.mapValues(rs =>
      rs.map(_.getLong(2)).sum.toDouble / rs.length).toMap
    assert(meanBy(1L) > meanBy(2L) && meanBy(2L) > meanBy(3L) &&
      meanBy(3L) > meanBy(4L), s"phase means not descending: $meanBy")
  }

  test("curriculum plan: ntile-exact with no Window and no global Sort") {
    import org.apache.spark.sql.expressions.Window
    // sf0.1, not the default sf0.001: the round-5 partitioning bug
    // (sampled range bounds diverging between branches) only surfaced
    // at 5000 rows — parity here must cover that scale.
    val bigDir = "/root/testdata/sf0.1"
    val df = Curation.curriculum(spark, bigDir)
    // exact parity with the single-partition windowed form it replaced
    val ref = Tables(spark, bigDir, "documents")
      .select(col("doc_id"),
        ntile(4).over(Window.orderBy(col("n_chars").desc, col("doc_id").asc))
          .cast("long").as("phase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == ref, "rank-arithmetic phases diverge from ntile")
    val plan = df.queryExecution.executedPlan.toString
    // every Window must partition on the percentile bin — a window with
    // no partition key is the single-task shape this operator removes
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected the bin-local rank window in:\n$plan")
    specs.foreach { s =>
      assert(s.contains("pid#"),
        s"window not partitioned by bin: windowspecdefinition($s)\n$plan")
    }
    // Sort prints as "Sort [keys], <global>, 0" — every sort must be
    // partition-local (global=false); a global sort would mean the
    // single-task shape this operator exists to avoid.
    assert(!plan.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"),
      s"curriculum plan contains a GLOBAL sort:\n$plan")
  }

  test("mixture: per-source kept tokens track the weighted budgets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mix").toString
    // 4 docs × 10 tokens per source; src0 weight 1.0, src1 weight 0.5
    val text = ('a' to 'j').mkString(" ") // 10 single-letter tokens
    (0 until 8).map(i => (i.toLong, text, "en", s"src${i % 2}", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // total 80 tokens, keep half = 40; budgets: src0 = 1/1.5·40 = 26.67,
    // src1 = 0.5/1.5·40 = 13.33 → greedy keeps 3 docs of src0, 2 of src1
    val kept = Curation.mixture(spark, dir).collect()
    val bySource = kept.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySource == Map("src0" -> 3, "src1" -> 2), s"got $bySource")
    // deterministic: same documents on a second run
    val again = Curation.mixture(spark, dir).collect().map(_.getLong(1)).toSet
    assert(again == kept.map(_.getLong(1)).toSet)
  }

  test("mixture: sharded prefix sums reproduce the global per-source window") {
    import org.apache.spark.sql.expressions.Window
    val df = Curation.mixture(spark, sfDir)
    // global-window reference formulation, computed inline
    val d = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("tokens"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = d.withColumn("cum", sum(col("tokens")).over(w))
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(3)).toMap
    val got = df.collect()
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(ref(key) == r.getLong(3),
        s"sharded cum ${r.getLong(3)} != global cum ${ref(key)} for $key")
    }
    assert(got.nonEmpty)
    // the only Window in the plan partitions on (source, shard): the
    // per-source single-task window this rewrite removes would print
    // windowspecdefinition(source#N, <sort>...) with no shard key
    val plan = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected a window in:\n$plan")
    specs.foreach { s =>
      assert(s.contains("source#") && s.contains("shard#"),
        s"window not sharded: windowspecdefinition($s)")
    }
  }

  test("split: deterministic, stratification-free hash assignment near 80/10/10") {
    val rows = Curation.split3(spark, sfDir).collect()
    val bySplit = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    val n = rows.length
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 205/23/28 of 256 buckets; allow wide slack at fixture size
    assert(bySplit("train") > n * 7 / 10 && bySplit("train") < n * 9 / 10, s"$bySplit")
    // a document's split never changes: stable under re-run and corpus growth
    val again = Curation.split3(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(rows.forall(r => again(r.getLong(0)) == r.getString(3)))
  }

  test("temperature sample: flattens the language distribution, never inverts it") {
    val corpus = Tables(spark, sfDir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.temperatureSample(spark, sfDir).collect()
    val rates = kept.map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(rates.keySet == corpus.keySet, "every language survives sampling")
    // T=0.5 monotonicity: rarer languages keep a HIGHER fraction …
    val byCount = corpus.toSeq.sortBy(_._2)
    for (Seq((rare, _), (common, _)) <- byCount.sliding(2))
      assert(rates(rare) >= rates(common), s"$rare rate < $common rate")
    // … but sampled counts still rank in corpus order (flattened, not
    // inverted): expected kept ∝ sqrt(n), monotone in n
    val keptByLang = kept.groupBy(_.getString(1)).view.mapValues(_.length)
    for (Seq((rare, _), (common, _)) <- byCount.sliding(2))
      assert(keptByLang(common) >= keptByLang(rare) * 4 / 5,
        s"inverted: $common kept ${keptByLang(common)} < $rare ${keptByLang(rare)}")
    // kept counts concentrate on n·rate (binomial, generous 3σ-ish slack)
    corpus.foreach { case (l, n) =>
      val expect = n * rates(l)
      assert(math.abs(keptByLang(l) - expect) < 3 * math.sqrt(expect) + 3,
        s"$l kept ${keptByLang(l)} vs expected $expect")
    }
  }

  test("group-aware split: no near-dup pair straddles splits; plain split does leak") {
    import graft.operators.Dedup
    val split = Curation.splitGroupAware(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dups $a/$b split across ${split(a)}/${split(b)}")
    }
    // every document is assigned, buckets roughly 80/10/10
    val d = Tables(spark, sfDir, "documents").count()
    assert(split.size == d)
    val byBucket = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byBucket.keySet == Set("train", "val", "test"))
    assert(byBucket("train") > byBucket("val") &&
      byBucket("train") > byBucket("test"))
    // sanity of the MOTIVATION: the per-document split leaks on this
    // corpus (some near-dup pair straddles) — if it ever stops leaking,
    // the fixture no longer exercises the group-aware guarantee
    val plain = Curation.split3(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(pairs.exists { case (a, b) => plain(a) != plain(b) },
      "per-document split no longer leaks; test fixture too weak")
  }

  test("PPS sample: exact target draws on near-uniform weights, heavy docs overrepresented") {
    import org.apache.spark.sql.functions._
    val s = Curation.ppsSample(spark, sfDir).cache()
    // fixture weights are bounded well below W/target, so the
    // systematic crossing rule yields EXACTLY the target draw count
    assert(s.count() == 100L, s"draws ${s.count()}")
    // inclusion ∝ weight: the sampled mean weight must exceed the
    // corpus mean (heavier docs cross multiples more often)
    val sMean = s.agg(avg(col("weight"))).head().getDouble(0)
    val cMean = Tables(spark, sfDir, "documents")
      .agg(avg(greatest(col("n_chars"), lit(1L)))).head().getDouble(0)
    assert(sMean > cMean, s"sampled mean $sMean <= corpus mean $cMean")
    // sharded prefix decomposition: cum is globally consistent — the
    // max cum equals the total corpus weight only on the last row, and
    // every selected row's crossing test holds when recomputed globally
    val tw = Tables(spark, sfDir, "documents")
      .agg(sum(greatest(col("n_chars"), lit(1L)))).head().getLong(0)
    val bad = s.where(
      expr(s"(cum * 100) div ${tw}L") <= expr(s"((cum - weight) * 100) div ${tw}L"))
      .count()
    assert(bad == 0, s"$bad rows fail the crossing test against the global total")
    s.unpersist()
  }

  test("loss band keeps the middle of the score distribution, drops both tails") {
    import org.apache.spark.sql.functions._
    val all = graft.operators.TextAnalysis.perplexity(spark, sfDir)
    val kept = Curation.lossBand(spark, sfDir).cache()
    val n = all.count(); val k = kept.count()
    assert(k > 0 && k < n, s"band kept $k of $n — not a band")
    // every kept score inside [band_lo, band_hi]; at least one doc
    // dropped on EACH side (two-sided, unlike qualityGate)
    val row = kept.agg(min(col("cross_entropy")), max(col("cross_entropy")),
      first(col("band_lo")), first(col("band_hi"))).head()
    assert(row.getDouble(0) >= row.getDouble(2) && row.getDouble(1) <= row.getDouble(3))
    val below = all.where(col("cross_entropy") < row.getDouble(2)).count()
    val above = all.where(col("cross_entropy") > row.getDouble(3)).count()
    assert(below > 0 && above > 0, s"tails not dropped: below=$below above=$above")
    // the thresholds really are the ceil(q*n) order statistics
    assert(below <= (0.2 * n).ceil.toLong && above <= n - (0.8 * n).ceil.toLong + 1)
    kept.unpersist()
  }

  test("loss band window runs over the reduced histogram, never the corpus") {
    // Plan pin for the boundedness invariant documented at
    // Curation.lossBand: the unpartitioned Window is tolerable only
    // because its input is the distinct-score HISTOGRAM (bounded by the
    // 4-dp score rounding), so every Window node in the optimized plan
    // must have the cross_entropy groupBy aggregate somewhere below it.
    // A rounding change that feeds the window corpus-sized rows would
    // remove that aggregate and fail here before it ships.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => WinNode}
    val plan = Curation.lossBand(spark, sfDir).queryExecution.optimizedPlan
    val windows = plan.collect { case w: WinNode => w }
    assert(windows.nonEmpty, "expected the histogram cumulative window")
    for (w <- windows) {
      val histAggBelow = w.collect {
        case a: Aggregate if a.groupingExpressions.exists(
          _.references.exists(_.name == "cross_entropy")) => a
      }
      assert(histAggBelow.nonEmpty,
        "Window input is not the distinct-score histogram aggregate — " +
          "the unpartitioned window would scan corpus-sized input; see " +
          "the boundedness invariant in Curation.lossBand scaladoc")
    }
  }

  test("PPS sample survives corpus-scale weights without 64-bit overflow") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 docs of 1e17 chars each: total weight 1e18, so cum·target hits
    // 1e20 — far past Long.MaxValue (~9.2e18). The old BIGINT crossing
    // products wrapped silently; the DECIMAL(38,0) form must select
    // every doc (each spans exactly target/10 = 10 multiples of W/100).
    val dir = java.nio.file.Files.createTempDirectory("ppsbig").toString
    (1 to 10).map(i => (i.toLong, "en", "x", 100000000000000000L))
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val s = Curation.ppsSample(spark, dir).collect()
    assert(s.length == 10,
      s"overflow in the crossing products: selected ${s.length} of 10")
    // and cum itself stayed exact (last row = total weight)
    assert(s.map(_.getAs[Long]("cum")).max == 1000000000000000000L)
  }

  test("quality LR: score is the sigmoid of keep's margin, split is real") {
    val rows = Curation.qualityLr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (score, keep) = (r.getDouble(2), r.getBoolean(3))
      assert(score > 0.0 && score < 1.0, s"score out of range: $r")
      // keep ⇔ z ≥ 0 ⇔ σ(z) ≥ 0.5 — the two outputs must agree
      assert(keep == (score >= 0.5), s"keep/score disagree: $r")
    }
    // weights were tuned for a genuine split, not a constant gate
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length, s"degenerate gate: $kept/${rows.length}")
  }

  test("quality LR: z matches a scalar recomputation on raw features") {
    // recompute z from the raw document text in plain Scala for a
    // sample; the engine's double must match exactly (fixed expression)
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    val scored = Curation.qualityLr(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    docs.foreach { case (id, text) =>
      val words = text.trim.split(" ", -1)
      val z = -4.0 + 1.0 * math.log(words.length.toDouble + 1.0) +
        8.0 * (words.count(stop).toDouble / words.length) -
        0.1 * (text.length.toDouble / words.length)
      val expect = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(scored(id) - expect) < 1e-9,
        s"doc $id: engine ${scored(id)} vs scalar $expect")
    }
  }

  test("ccnet buckets: per-lang thresholds order head <= middle <= tail") {
    val rows = Curation.ccnetBucket(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.max <= m.min, s"$lang: head above middle")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max <= t.min, s"$lang: middle above tail")
      // terciles: no bucket may hold more than ~2/3 of a language with
      // continuous scores (ties collapse buckets only at degeneracy)
      val n = rs.length
      if (n >= 9)
        byBucket.values.foreach(b =>
          assert(b.length <= 2 * n / 3 + 1, s"$lang skewed: ${byBucket.view.mapValues(_.length).toMap}"))
    }
  }

  test("gopher filter: each rule fails in isolation on planted docs") {
    import spark.implicits._
    val w60 = Seq.fill(60)("word").mkString(" ")
    val bulletLine = "- word word word word the a"
    val ellLine = Seq.fill(9)("word").mkString(" ") + " the a word..."
    val docs = Seq(
      (1L, w60 + " the a"),                                   // keep
      (2L, "the of tiny docs"),                               // words only
      (3L, w60 + " " + Seq.fill(10)("#").mkString(" ") + " the a of"), // symbols only
      (4L, Seq.fill(10)(bulletLine).mkString("\n")),          // bullets only
      (5L, Seq.fill(10)(ellLine).mkString("\n")),             // ellipsis lines only
      (6L, Seq.fill(62)("extraordinarily").mkString(" ") + " the a"), // mean len only
      (7L, w60),                                              // stops only
      (8L, Seq.fill(40)("word").mkString(" ") + " " +
        Seq.fill(15)("1234").mkString(" ") + " the a of")     // alpha only
    ).toDF("doc_id", "text")
    val m = Curation.gopherMetrics(docs).collect()
      .map(r => r.getLong(0) -> r.getValuesMap[Any](r.schema.fieldNames))
      .toMap
    def flags(id: Long): Map[String, Boolean] = m(id).collect {
      case (k, v: Boolean) if k.startsWith("pass_") => k -> v
    }.toMap
    val all = Seq("pass_words", "pass_mean_len", "pass_stops", "pass_alpha",
      "pass_symbols", "pass_bullets", "pass_ellipsis")
    def onlyFails(id: Long, failing: Set[String]): Unit = {
      val f = flags(id)
      all.foreach(k => assert(f(k) == !failing(k), s"doc $id $k: $f"))
      assert(m(id)("keep") == failing.isEmpty, s"doc $id keep")
    }
    onlyFails(1L, Set.empty)
    onlyFails(2L, Set("pass_words"))
    onlyFails(3L, Set("pass_symbols"))
    onlyFails(4L, Set("pass_bullets"))
    onlyFails(5L, Set("pass_ellipsis"))
    onlyFails(6L, Set("pass_mean_len"))
    onlyFails(7L, Set("pass_stops"))
    onlyFails(8L, Set("pass_alpha"))
    // spot-check the measured values behind doc 1's flags
    assert(m(1L)("n_words") == 62L)
    assert(m(1L)("mean_word_len") == // (60*4 + 3 + 1) / 62, rounded to 6
      BigDecimal(244.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(m(1L)("stop_hits") == 2L)
    assert(m(1L)("alpha_frac") == 1.0)
  }

  test("gopher filter: fixture is non-degenerate and keep is the flag conjunction") {
    val rows = Curation.gopherFilter(spark, sfDir).collect()
    assert(rows.length == graft.Tables(spark, sfDir, "documents").count())
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length, s"degenerate: $kept/${rows.length}")
    rows.foreach { r =>
      val conj = Seq("pass_words", "pass_mean_len", "pass_stops",
        "pass_alpha", "pass_symbols", "pass_bullets", "pass_ellipsis")
        .forall(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") == conj, r.toString)
    }
  }

  test("gopher fast path: equals the chain on planted edge cases, bit-for-bit") {
    import spark.implicits._
    val cases = Seq(
      (1L, ""),                                 // split("") -> [""] both axes
      (2L, " "),                                // separator-only -> [] words
      (3L, " leading and trailing "),           // kept leading empty token
      (4L, "a\n\nb\n"),                         // interior empty line kept, trailing dropped
      (5L, "the a of to in is and"),            // all stops
      (6L, "# ## .... ...... . .."),            // dot runs and hashes
      (7L, "- bullet\n* star\n\u2022 dot\nplain"), // all three bullet forms
      (8L, "ends with dots...\nmid... not end"),
      (9L, "caf\u00e9 na\u00efve r\u00e9sum\u00e9"), // multibyte chars in tokens
      (10L, Seq.fill(60)("word").mkString(" ") + " the a")) // the keep doc
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).sortBy(_.head.toString).toList
    assert(canon(Curation.gopherMetricsFast(cases)) ==
      canon(Curation.gopherMetrics(cases)))
  }

  test("gopher fast path: fuzz equality with the chain over the rule alphabet") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val atoms = Seq("word", "the", "a", "of", "extraordinarily", "x1",
      "#", "...", ".", "-", "*", "\u2022", "caf\u00e9", " ", " ", "\n")
    val docs = (1L to 120L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))(atoms(rnd.nextInt(atoms.length)))
        .mkString(rnd.nextInt(3) match {
          case 0 => " "
          case 1 => "  "
          case _ => "\n"
        }))
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).sortBy(_.head.toString).toList
    assert(canon(Curation.gopherMetricsFast(docs)) ==
      canon(Curation.gopherMetrics(docs)))
  }

  test("pipeline report: monotone funnel, stage sets recompute exactly") {
    val rows = Curation.pipelineReport(spark, sfDir).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(x => (x._1, x._2)).toSeq == Seq((0, "raw"),
      (1, "domain_filter"), (2, "gopher_rules"), (3, "exact_dedup")))
    // monotone non-increasing mass
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"funnel grew: $a -> $b")
    }
    // independent recompute of every cumulative stage
    val d0 = Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS toks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = graft.operators.Domains.domainFilter(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Curation.gopherFilter(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s3 = graft.operators.Dedup.keepBest(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cum = Seq(d0.keySet, d0.keySet & s1, d0.keySet & s1 & s2,
      d0.keySet & s1 & s2 & s3)
    for ((ids, r) <- cum.zip(rows)) {
      assert(r._3 == ids.size.toLong, s"stage ${r._1} docs")
      assert(r._4 == ids.toSeq.map(d0).sum, s"stage ${r._1} tokens")
      assert(r._5 == BigDecimal(ids.size.toDouble / d0.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the funnel must actually cut somewhere on the fixture
    assert(rows.last._3 < rows.head._3)
  }

  test("lr training: gradient descent genuinely learns the Gopher labels") {
    val steps = graft.operators.Curation.lrTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(steps.length == 20)
    val labels = graft.operators.Curation.gopherFilter(spark, sfDir)
      .select("keep").collect().map(_.getBoolean(0))
    val n = labels.length.toLong
    val majority = math.max(labels.count(identity),
      labels.count(!_)).toLong
    // training accuracy must END above the majority-class baseline —
    // the all-reject/all-keep degenerate solutions are beaten
    assert(steps.last._7 > majority,
      s"final acc ${steps.last._7} <= majority $majority")
    // and improve over training (first vs last; the curve is the output)
    assert(steps.last._7 > steps.head._7)
    // predictions are a genuine split, counts in range
    assert(steps.last._6 > 0 && steps.last._6 < n)
    steps.foreach { s =>
      assert(s._6 >= 0 && s._6 <= n && s._7 >= 0 && s._7 <= n)
      assert(!s._2.isNaN && !s._3.isNaN && !s._4.isNaN && !s._5.isNaN)
    }
    // train→serve composition: the trained scorer's keep/score agree
    // with the final training step's own prediction counts
    val served = graft.operators.Curation.qualityLrTrained(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(served.length.toLong == n)
    assert(served.count(_._3).toLong == steps.last._6,
      "served keep count != final step n_keep_pred")
    served.foreach { case (_, score, keep) =>
      assert(score >= 0.0 && score <= 1.0)
      assert(keep == (score >= 0.5) ||
        math.abs(score - 0.5) < 1e-6) // keep is z>=0; σ rounds at 6dp
    }
  }

  test("dp counts: noise is md5-determined symmetric geometric, release clamps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dp").toString
    Seq(
      (1L, "t", "en", "src0", 1L),
      (2L, "t", "en", "src0", 1L),
      (3L, "t", "mi", "src1", 1L),
      (4L, "t", "de", "src2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val md = java.security.MessageDigest.getInstance("MD5")
    // difference of two iid geometric(1/2) leading-zero draws = the
    // GRS two-sided geometric at eps = ln 2
    def expected(lang: String, source: String): Long = {
      val hex = md.digest(s"dp1:$lang:$source".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def geo(word: String): Long = {
        val h = java.lang.Long.parseLong(word, 16).toInt
        if (h == 0) 24L
        else (Integer.numberOfLeadingZeros(h) - 8).toLong // 24-bit draw
      }
      geo(hex.substring(0, 6)) - geo(hex.substring(6, 12))
    }
    val rows = graft.operators.Curation.dpCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.size == 3)
    rows.foreach { case ((lang, source), (t, noise, noisy, released)) =>
      assert(noise == expected(lang, source),
        s"$lang/$source: CASE chain disagrees with numberOfLeadingZeros")
      assert(math.abs(noise) <= 24 && noisy == t + noise)
      assert(released == math.max(0L, noisy) && released >= 0)
    }
    assert(rows(("en", "src0"))._1 == 2L)
  }

  test("dp mean: clamped sum, composed noise, zero-count slice degrades to null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpm").toString
    // lang "en": two docs, one with n_chars far past the clamp bound --
    // the released sum must reflect the CLAMPED contribution (200), not
    // the outlier
    Seq(
      (1L, "t", "en", "s", 50L),
      (2L, "t", "en", "s", 999999L),
      (3L, "t", "mi", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Curation.dpMean(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nEn, sumEn, nRelEn, sumRelEn) = rows("en")
    assert(nEn == 2L && sumEn == 250L) // 50 + clamp(999999 -> 200)
    // noise is bounded: |count noise| <= 24, |sum noise| <= 24 * 200
    assert(math.abs(nRelEn - nEn) <= 24L)
    assert(math.abs(sumRelEn - sumEn) <= 24L * 200L)
    val (nMi, sumMi, _, _) = rows("mi")
    assert(nMi == 1L && sumMi == 100L)
  }

  test("seqlen plan: truncation, padding, and packed lower bound by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seqlen").toString
    // token counts 200 / 100 / 3
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    Seq((1L, doc(200), "en", "s", 1L), (2L, doc(100), "en", "s", 1L),
      (3L, doc(3), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Curation.seqlenPlan(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(9))).toMap
    // L=128: doc(200) truncates (lost 72), kept 128+100+3=231,
    // pad (unpacked) 0+28+125=153, packed lower bound ceil(231/128)=2
    assert(rows(128L) == ((1L, 231L, 72L, 153L, 2L)))
    // L=256: nothing truncates, kept 303, pad 56+156+253=465, lb 2
    assert(rows(256L) == ((0L, 303L, 0L, 465L, 2L)))
  }
}
