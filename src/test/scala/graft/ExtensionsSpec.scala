package graft

import org.apache.spark.sql.graft.GraftExtensions

/** SQL-surface registration of native expressions. */
class ExtensionsSpec extends SparkSpec {

  test("html_clean callable from SQL; equals the regexp chain") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT html_clean('<p>a &amp; b</p><script>x</script>') AS t")
      .collect()(0)
    assert(row.getString(0) == "a & b")
  }

  test("cosine_sim callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c1,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c0
        |""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 0.0)
  }

  test("KLL pipeline callable from pure SQL: sketch, store, merge, quantile") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (1 to 10000).map(i => (i % 20, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_vals")
    // the full store-then-rollup shape in one SQL statement: per-group
    // sketches (as they would be persisted), merged, then read
    val q = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5) AS p50,
        |       kll_quantile(kll_merge_agg(sk, 200), CAST(0.9 AS DOUBLE)) AS p90
        |FROM (SELECT g, kll_sketch_agg(v) AS sk FROM kll_vals GROUP BY g)
        |""".stripMargin).head()
    val tol = 2.0 * org.apache.spark.sql.graft.KllColumn.normalizedRankError() * 10000
    assert(math.abs(q.getDouble(0) - 5000.0) <= tol, s"p50 ${q.getDouble(0)}")
    assert(math.abs(q.getDouble(1) - 9000.0) <= tol, s"p90 ${q.getDouble(1)}")
    // literal-argument validation fails loudly, not mysteriously
    val ex = intercept[Exception](
      spark.sql("SELECT kll_quantile(kll_sketch_agg(v), v) FROM kll_vals"))
    assert(ex.getMessage.contains("literal"))
  }

  test("extensions class injects without error and codegen path evaluates") {
    // construction-time wiring (the injectFunction list is consumed on
    // session build; here we exercise the builder function itself)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // codegen path over a real column
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val c = spark.sql("SELECT cosine_sim(a, b) FROM vecs").head().getDouble(0)
    assert(math.abs(c - 10.0 / 14.0) < 1e-12)
  }

  test("hash_embed_vec md5 family matches the SQL md5 arithmetic per token") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT hash_embed_vec(array('alpha'), 64) AS v,
        |       CAST(conv(substring(md5('alpha'), 1, 8), 16, 10) AS BIGINT) AS hv
        |""".stripMargin).head()
    val vec = r.getSeq[Long](0)
    val hv = r.getLong(1)
    assert(vec.length == 64)
    val expectedSign = if ((hv / 64) % 2 == 0) 1L else -1L
    assert(vec((hv % 64).toInt) == expectedSign, "slot/sign mismatch vs md5 SQL")
    assert(vec.count(_ != 0L) == 1)
  }

  test("HashEmbedVec xx64 family reproduces the builtin xxhash64 per token") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one token per row: the fold's slot/sign must equal the builtin's
    // (a wrong seed or hash variant passes conservation checks but not this)
    val df = Seq("alpha", "beta", "gamma", "7", "").toDF("t")
      .select(col("t"), xxhash64(col("t")).as("hv"),
        org.apache.spark.sql.graft.HashEmbedVec(
          array(col("t")), 64, xx64 = true).as("v"))
    df.collect().foreach { r =>
      val hv = r.getLong(1)
      val vec = r.getSeq[Long](2)
      val slot = (hv & 63L).toInt
      val sign = if (((hv >> 6) & 1L) == 0L) 1L else -1L
      assert(vec(slot) == sign, s"token '${r.getString(0)}' slot/sign mismatch")
      assert(vec.count(_ != 0L) == 1)
    }
  }

  test("text_stats callable from SQL; counters match the regex twin") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT text_stats('Very big cats eat. Dogs V run!') AS s").collect()
    assert(r.head.getSeq[Int](0) == Seq(7, 2, 7), s"got ${r.head}")
    // empty string: one (empty) word, floor of one sentence, no runs
    val e = spark.sql("SELECT text_stats('') AS s").collect()
    assert(e.head.getSeq[Int](0) == Seq(1, 1, 0))
  }

  test("zvalue callable from SQL; matches the per-bit reference and the Column API") {
    GraftExtensions.register(spark)
    def refZ(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 21) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val row = spark.sql(
      """SELECT zvalue(3L, 5L) AS a, zvalue(0L, 0L) AS b,
        |       zvalue(2097151L, 2097151L) AS c,
        |       zvalue(CAST(NULL AS BIGINT), 1L) AS d""".stripMargin).head()
    assert(row.getLong(0) == refZ(3L, 5L) && row.getLong(0) == 39L)
    assert(row.getLong(1) == 0L)
    assert(row.getLong(2) == refZ(2097151L, 2097151L))
    assert(row.isNullAt(3)) // null-propagating like every binary op
    // interpreted helper == the expression the writer/report now use
    assert(org.apache.spark.sql.graft.ZValue.interleave(1234L, 4321L) ==
      refZ(1234L, 4321L))
  }

  test("AnnAssign equals the HOF transform+array_sort formulation, incl. degenerate rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(20260815)
    val m = 8; val dsub = 8
    val cents: Seq[(Long, Seq[Float])] = (0L until 16L).map(i =>
      (i, Seq.tabulate(64)(_ => rnd.nextFloat() * 4 - 2)))
    val book: Seq[(Int, Int, Seq[Float])] = for {
      mm <- 0 until m; code <- 0 until 32
    } yield (mm, code, Seq.tabulate(dsub)(_ => rnd.nextFloat() * 4 - 2))
    // random vectors + the degenerate shapes the kernel must order
    // exactly like Spark's struct sort: an all-zero vector (null
    // cosine), a SHORT vector (null d2 in trailing sub-spaces, null
    // cosine vs 64-dim centroids), a long vector
    val vecs: Seq[(Long, Seq[Float])] =
      (0L until 40L).map(i =>
        (i, Seq.tabulate(64)(_ => rnd.nextFloat() * 6 - 3))) ++
      Seq((100L, Seq.fill(64)(0f)), (101L, Seq.fill(60)(1f)),
        (102L, Seq.fill(70)(0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    // the r13 HOF reference formulation, verbatim
    import org.apache.spark.sql.Column
    def pqL2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    val centLit = typedLit(cents)
    val scored = transform(centLit, c =>
      struct((-org.apache.spark.sql.graft.CosineSim(
        col("embedding"), c("_2"))).as("negcos"), c("_1").as("id")))
    val cellRef = get(array_sort(scored), lit(0))("id")
    val codeRefs = (0 until m).map { mm =>
      val bm = typedLit(book.filter(_._1 == mm).map(b => (b._2, b._3)))
      val sub = slice(col("embedding"), mm * dsub + 1, dsub)
      val cand = transform(bm, b =>
        struct(pqL2(sub, b("_2")).as("d2"), b("_1").as("code")))
      get(array_sort(cand), lit(0))("code")
    }
    val ref = df.select(col("vec_id"), cellRef.as("cell"),
        array(codeRefs: _*).as("codes")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Int](2)))).toMap
    val assign = org.apache.spark.sql.graft.AnnAssign(
      col("embedding"), cents, book, m, dsub)
    val got = df.select(col("vec_id"), assign.as("a"))
      .select(col("vec_id"), col("a.cell"), col("a.codes")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Int](2)))).toMap
    assert(got.size == ref.size)
    ref.foreach { case (id, exp) =>
      assert(got(id) == exp, s"native/HOF divergence at vec $id: " +
        s"${got(id)} vs $exp")
    }
  }
}
