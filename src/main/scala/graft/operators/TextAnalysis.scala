package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Text-analysis operators for a large-scale training-data pipeline
  * (north-star extensions; BASELINE.json "north_star"): token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All are embarrassingly parallel scans — no shuffle, fully inside
  * whole-stage codegen (built-in string/array/regex functions only, no
  * UDFs), so they scale linearly with input splits at 100 TB.
  *
  * Every expression is chosen to evaluate identically in Spark and the
  * DuckDB oracle: literal-space splits, RE2-compatible regexes, exact
  * integer counts, and doubles only as a final rounded division of exact
  * integers (identical IEEE result in both engines).
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")
  private[operators] def stopwordList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-alphanumeric marks — the
    * coarse shape of a byte-pair pre-tokenizer's initial split).
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .cast("long").as("n_bpe_tokens"))

  val tokensSql: String =
    """SELECT doc_id,
      |       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens
      |FROM documents""".stripMargin

  /** Quality scoring: length stats, mean word length, stopword ratio, and
    * a composite keep/drop flag — the usual first-pass filters before
    * expensive dedup/model scoring in a data pipeline.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val words = split(trim(col("text")), " ")
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(words).cast("long").as("n_words"),
        expr(s"size(filter(split(trim(text), ' '), w -> w IN ($stopwordList)))")
          .cast("long").as("n_stopwords"))
      .withColumn("avg_word_len",
        round(col("n_chars").cast("double") / col("n_words"), 6))
      .withColumn("stopword_ratio",
        round(col("n_stopwords").cast("double") / col("n_words"), 6))
      .withColumn("keep",
        col("n_words").between(5, 10000) && col("stopword_ratio") < 0.5)
  }

  val qualitySql: String =
    s"""SELECT doc_id, n_chars, n_words, n_stopwords,
       |       round(CAST(n_chars AS DOUBLE) / n_words, 6) AS avg_word_len,
       |       round(CAST(n_stopwords AS DOUBLE) / n_words, 6) AS stopword_ratio,
       |       (n_words BETWEEN 5 AND 10000)
       |         AND round(CAST(n_stopwords AS DOUBLE) / n_words, 6) < 0.5 AS keep
       |FROM (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len(string_split(trim(text), ' ')) AS n_words,
       |         len(list_filter(string_split(trim(text), ' '),
       |                         w -> w IN ($stopwordList))) AS n_stopwords
       |  FROM documents)""".stripMargin

  /** Language-ID by stopword voting: count marker-word hits per language,
    * argmax with a deterministic precedence order. (The fixture corpus is
    * same-vocabulary word salad, so the interesting part is the operator
    * shape — a scan-only scoring pass — not the labels.)
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und", "ein"),
    "fr" -> Seq("le", "la", "et", "un"))

  private def langScoreCols: Seq[Column] = markers.map { case (l, ws) =>
    val list = ws.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split(trim(text), ' '), w -> w IN ($list)))")
      .cast("long").as(s"score_$l")
  }

  // Fold over ALL languages (the last one needs its own WHEN branch
  // too, with earlier languages winning ties via their >= tests — a
  // langs.init fold made the final language unreachable).
  private def langPredCol: Column = {
    val langs = markers.map(_._1)
    langs.foldRight(lit("und")) { (l, rest) =>
      val geAll = langs.filter(_ != l)
        .map(o => col(s"score_$l") >= col(s"score_$o"))
        .reduce(_ && _)
      when(col(s"score_$l") > 0 && geAll, lit(l)).otherwise(rest)
    }
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id") +: langScoreCols: _*)
      .withColumn("lang_pred", langPredCol)

  val langIdSql: String = {
    val scores = markers.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(trim(text), ' '), w -> w IN ($list))) AS score_$l"
    }.mkString(",\n         ")
    val langs = markers.map(_._1)
    val cases = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN score_$l > 0 AND $geAll THEN '$l'"
    }.mkString("\n            ")
    s"""SELECT doc_id, score_en, score_es, score_de, score_fr,
       |       CASE $cases
       |            ELSE 'und' END AS lang_pred
       |FROM (
       |  SELECT doc_id,
       |         $scores
       |  FROM documents)""".stripMargin
  }

  /** Language-label audit: the confusion matrix between the DECLARED
    * `lang` column and the stopword-voting prediction — the check that
    * tells you whether a source's language metadata can be trusted
    * before a language-conditioned sampling step (like
    * `curate_temperature_sample`) consumes it. Scan-only scoring pass,
    * then one rollup to the ≤ (|langs|+1)² matrix; the row share rides
    * a window over that matrix frame, never the corpus.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val byDeclared = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    Tables(spark, dir, "documents")
      .select(col("lang") +: langScoreCols: _*)
      .withColumn("lang_pred", langPredCol)
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_share",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(byDeclared), 6))
  }

  val langConfusionSql: String = {
    val scores = markers.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(trim(text), ' '), w -> w IN ($list))) AS score_$l"
    }.mkString(",\n           ")
    val langs = markers.map(_._1)
    val cases = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN score_$l > 0 AND $geAll THEN '$l'"
    }.mkString("\n              ")
    s"""WITH scored AS (
       |  SELECT lang,
       |         CASE $cases
       |              ELSE 'und' END AS lang_pred
       |  FROM (
       |    SELECT lang,
       |           $scores
       |    FROM documents)
       |)
       |SELECT lang, lang_pred, count(*) AS n_docs,
       |       round(CAST(count(*) AS DOUBLE) /
       |             sum(count(*)) OVER (PARTITION BY lang), 6) AS row_share
       |FROM scored GROUP BY 1, 2""".stripMargin
  }

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text — the canonical-form hash used as an exact-dedup key that is
    * robust to case/whitespace variation.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          .as("fingerprint"))

  val fingerprintSql: String =
    """SELECT doc_id,
      |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents""".stripMargin

  /** PII redaction — the training-data scrub step (emails, then
    * phone-shaped digit runs) as one codegen'd projection over the scan.
    * Patterns stay inside the RE2 ∩ java.util.regex common syntax
    * (bracket classes only, no escapes) so the DuckDB oracle executes
    * the IDENTICAL expressions — dialect-divergent regex is the classic
    * silent-corruption source in cross-engine scrub pipelines. Match
    * counts are taken on the RAW text, so the operator's work is
    * oracle-observable even on a corpus where redaction is a no-op.
    */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
  private val PhonePat = "[+]?[0-9][0-9()., -]{6,}[0-9]"

  /** Frame-in/frame-out form: a pure stateless projection, so it
    * composes onto ANY `(doc_id, text)` frame — batch or readStream —
    * unchanged. The driver-contract entry below binds it to the fixture
    * table.
    */
  def redactColumns(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), lit(EmailPat), lit("<EMAIL>")),
        lit(PhonePat), lit("<PHONE>")).as("text_redacted"),
      regexp_count(col("text"), lit(EmailPat)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhonePat)).cast("long").as("n_phones"))

  def redact(spark: SparkSession, dir: String): DataFrame =
    redactColumns(Tables(spark, dir, "documents"))

  val redactSql: String =
    s"""SELECT doc_id,
       |       regexp_replace(regexp_replace(text, '$EmailPat', '<EMAIL>', 'g'),
       |                      '$PhonePat', '<PHONE>', 'g') AS text_redacted,
       |       CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$PhonePat')) AS BIGINT) AS n_phones
       |FROM documents""".stripMargin

  /** Document chunking — the context-window prep step: each document is
    * split into overlapping token windows (64 tokens, stride 48) and each
    * window re-joined to text, so downstream embedding/training jobs see
    * bounded-length rows. One generator expression over the scan
    * (sequence + explode + slice, all codegen'd); output size is
    * n_tokens/stride rows per doc with no shuffle, so it scales as a pure
    * map at 100 TB. Start offsets and slices clamp identically in both
    * engines (Spark `slice` and DuckDB 1-based inclusive list slicing
    * both truncate at the list end).
    */
  private val ChunkLen = 64
  private val ChunkStride = 48

  /** Frame-in/frame-out form (stateless generator — streaming-safe). */
  def chunkColumns(df: DataFrame): DataFrame =
    df.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(ChunkStride))).as("s"))
      .select(
        col("doc_id"),
        expr(s"CAST(s div $ChunkStride AS BIGINT)").as("chunk_id"),
        size(expr(s"slice(w, s + 1, $ChunkLen)")).cast("long").as("n_tokens"),
        array_join(expr(s"slice(w, s + 1, $ChunkLen)"), " ").as("chunk_text"))

  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunkColumns(Tables(spark, dir, "documents"))

  val chunkSql: String =
    s"""SELECT doc_id,
       |       CAST(s // $ChunkStride AS BIGINT) AS chunk_id,
       |       CAST(len(w[s + 1 : s + $ChunkLen]) AS BIGINT) AS n_tokens,
       |       array_to_string(w[s + 1 : s + $ChunkLen], ' ') AS chunk_text
       |FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |     unnest(range(0, len(w), $ChunkStride)) AS t(s)""".stripMargin

  /** TF-IDF top terms per document. Ranking is deliberately
    * integer/string-only (tf desc, df asc, term asc) so the top-3 SET is
    * bit-deterministic across engines; the tf-idf VALUE is reported
    * (rounded) but never drives the ranking — cross-engine last-ulp `ln`
    * divergence can reorder float ranks, the classic flaky-oracle trap.
    * Shape: ONE scan/explode of the corpus, reduced map-side to
    * (doc, term, tf); the document frequency is a window over that
    * already-reduced frame rather than a second explode-and-aggregate
    * pass (the same single-scan lesson as `bigramCommonality` — a
    * self-join formulation re-reads and re-explodes the corpus), and the
    * per-doc rank window is pruned by WindowGroupLimit before any row
    * leaves the sort. The corpus doc count joins in as a broadcast
    * scalar, never a driver constant.
    */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTerm = Window.partitionBy(col("term"))
    val rankW = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    val n = Tables(spark, dir, "documents")
      .agg(count(lit(1)).cast("double").as("n_docs"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= 3)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
  }

  val tfidfTopSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), n AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
      |)
      |SELECT doc_id, rank, term, tf, df,
      |       round(tf * ln(n_docs / df), 6) AS tfidf
      |FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
      |         CAST(row_number() OVER (PARTITION BY tf.doc_id
      |                ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS BIGINT) AS rank
      |  FROM tf JOIN df USING (term), n)
      |WHERE rank <= 3""".stripMargin

  /** Feature-hashing vectorizer (hashing trick / CountSketch form) —
    * the featurization step that turns raw text into fixed-width
    * vectors without a vocabulary: each token hashes to one of 64
    * slots and contributes ±1 (the sign from an independent hash bit
    * unbiases collisions), giving an integer sketch whose dot products
    * approximate token-overlap. Everything is exact integer arithmetic
    * on a cross-engine-identical hash (an md5 hex prefix parsed as an
    * int — Spark's `xxhash64` and DuckDB's `hash` are incompatible, the
    * usual blocker for oracle-checking hash featurizers), so the oracle
    * matches bit-for-bit; the L2 norm is one sqrt of an exact integer.
    * Shape: explode → two map-side-combined aggregations keyed by
    * (doc, slot) then doc — the dense 64-vector materializes from the
    * per-doc map, never via a vocabulary broadcast or a driver loop.
    * The vector rides out as a canonical CSV string (the arrow list
    * field-name mismatch would fail strict schema compares).
    */
  private val HashDim = 64

  /** (doc_id, slot, sign) → the dense HashDim-vector row: two map-side-
    * combined aggregations then a pure projection; shared by the
    * oracle-parity (md5) and production (xxhash64) hash families. */
  /** Dense-vector summary columns shared by the embed variants. */
  private def vecStats(withVec: DataFrame): DataFrame =
    withVec
      .select(col("doc_id"),
        expr("array_join(transform(vec, x -> CAST(x AS STRING)), ',')").as("vec_csv"),
        round(sqrt(expr("aggregate(vec, 0L, (a, x) -> a + x * x)").cast("double")), 6)
          .as("l2norm"),
        expr("CAST(size(filter(vec, x -> x != 0)) AS BIGINT)").as("nnz"))

  /** One-pass projection via the native `HashEmbedVec` fold: no explode,
    * no shuffle — the whole operator is scan-parallel (the previous
    * explode → two keyed aggregations shape shuffled every token row
    * twice; same md5 slot/sign arithmetic, so the oracle is unchanged).
    * Null-text documents drop, matching the explode-of-null semantics
    * the SQL twin's unnest has.
    */
  def hashEmbed(spark: SparkSession, dir: String): DataFrame =
    vecStats(Tables(spark, dir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.graft.HashEmbedVec(
          split(trim(col("text")), " "), HashDim).as("vec"))
      .where(col("vec").isNotNull))

  /** Production-hash variant of `hashEmbed`: slot and sign come straight
    * off Spark's native `xxhash64` — one codegen'd long hash per token,
    * no md5 bytes→hex→`conv` detour (the md5 form is the documented
    * oracle-parity tax: DuckDB has no xxhash64 twin, and at 1.27 s/sf0.1
    * it was the bench's largest pure-hash cost). Slot = low 6 bits
    * (HashDim is a power of two), sign = bit 6 — disjoint bit fields of
    * one hash, mirroring the md5 form's (hv % dim, hv/dim parity) split.
    * Same native one-pass `HashEmbedVec` fold as `hashEmbed` (the xx64
    * family calls the literal `XxHash64Function` the built-in uses, so
    * the fold reproduces `xxhash64(term)` exactly); not row-oracled
    * (different hash family ⇒ different slots) — `hashEmbedFastCheck`
    * carries the oracle-checkable claims instead, and the suite pins
    * distributional agreement with the md5 form.
    */
  def hashEmbedFast(spark: SparkSession, dir: String): DataFrame =
    vecStats(Tables(spark, dir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.graft.HashEmbedVec(
          split(trim(col("text")), " "), HashDim, xx64 = true).as("vec"))
      .where(col("vec").isNotNull))

  /** Oracle-checkable conservation claims over the fast variant: every
    * token lands in exactly one slot with sign ±1, so per document the
    * vector has exactly HashDim entries, total mass Σ|c| never exceeds
    * the token count, and Σc has the token count's parity. A broken slot
    * projection (dropped/duplicated tokens, out-of-range slots) breaks
    * one of these; the hash family itself stays engine-local.
    */
  def hashEmbedFastCheck(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
    hashEmbedFast(spark, dir)
      .select(col("doc_id"),
        expr("transform(split(vec_csv, ','), x -> CAST(x AS BIGINT))").as("v"))
      .join(toks, Seq("doc_id"))
      .select(col("doc_id"),
        (size(col("v")) === HashDim).as("n_dims_ok"),
        (expr("aggregate(v, 0L, (a, x) -> a + abs(x))") <= col("n_tokens"))
          .as("mass_ok"),
        (abs(expr("aggregate(v, 0L, (a, x) -> a + x)") - col("n_tokens")) % 2 === 0)
          .as("parity_ok"))
  }

  val hashEmbedFastCheckSql: String =
    """SELECT doc_id, TRUE AS n_dims_ok, TRUE AS mass_ok, TRUE AS parity_ok
      |FROM documents""".stripMargin

  val hashEmbedSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
       |), sl AS (
       |  SELECT doc_id, hv % $HashDim AS slot,
       |         CASE WHEN (hv // $HashDim) % 2 = 0 THEN 1 ELSE -1 END AS sign
       |  FROM (SELECT doc_id,
       |               CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS hv
       |        FROM toks)
       |), agg AS (
       |  SELECT doc_id, slot, CAST(sum(sign) AS BIGINT) AS c FROM sl GROUP BY 1, 2
       |), dense AS (
       |  SELECT d.doc_id, r.i AS slot, coalesce(a.c, 0) AS c
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range(0, $HashDim)) AS i) r
       |  LEFT JOIN agg a ON a.doc_id = d.doc_id AND a.slot = r.i
       |)
       |SELECT doc_id,
       |       array_to_string(list(CAST(c AS VARCHAR) ORDER BY slot), ',') AS vec_csv,
       |       round(sqrt(CAST(sum(c * c) AS DOUBLE)), 6) AS l2norm,
       |       CAST(count(*) FILTER (WHERE c != 0) AS BIGINT) AS nnz
       |FROM dense GROUP BY doc_id""".stripMargin

  /** Two-pass corpus statistic: per-document ratio of bigrams that are
    * corpus-frequent (count ≥ 25) — an n-gram language-model-style
    * fluency signal with exact integer semantics (no float-accumulation
    * ordering, so the oracle matches bit-for-bit).
    *
    * ONE scan, no cache, no broadcast assumption: the exploded bigrams
    * are first reduced to (bigram, doc_id) occurrence counts (partial
    * aggregation collapses duplicates map-side), the global frequency is
    * read off a window over that reduced frame, and the per-document
    * rollup is a second small aggregation. The previous formulation
    * built the exploded frame twice (global-count pass + join pass,
    * uncached — double scan + double explode, second-slowest query in
    * the round-1 bench) and broadcast the frequent set, which is
    * vocab²-bounded but still a driver-memory wager at 100 TB; here
    * every step is a plain shuffle on already-reduced data.
    */
  def bigramCommonality(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"))
        .as("bigram"))
    val counts = bigrams.groupBy(col("bigram"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val global = sum(col("c"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("bigram")))
    counts.withColumn("g", global)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        sum(when(col("g") >= 25, col("c")).otherwise(0L)).as("n_common"))
      .withColumn("common_ratio",
        round(col("n_common").cast("double") / col("n_bigrams"), 6))
  }

  val bigramCommonalitySql: String =
    """WITH b AS (
      |  SELECT doc_id, concat_ws(' ', w[i], w[i+1]) AS bigram
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w
      |        FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
      |       unnest(range(1, len(w))) AS t(i)
      |), f AS (
      |  SELECT bigram FROM b GROUP BY bigram HAVING count(*) >= 25
      |)
      |SELECT b.doc_id, count(*) AS n_bigrams,
      |       CAST(sum(CASE WHEN f.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |       round(CAST(sum(CASE WHEN f.bigram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS common_ratio
      |FROM b LEFT OUTER JOIN f ON b.bigram = f.bigram
      |GROUP BY b.doc_id""".stripMargin

  /** Repetition metrics (the Gopher-style quality rules): per document,
    * the duplicate-bigram fraction and the single most repeated bigram's
    * share of all bigrams; documents past the duplicate threshold are
    * flagged. Bigrams shuffle as md5 keys (16 bytes, never text) into a
    * per-(doc, gram) count, then reduce per doc — two shuffles, both of
    * already-reduced frames, the same shape as `tfidfTop`. The fractions
    * are a single IEEE division each, so they compare exactly across
    * engines.
    */
  private val DupFracFlag = 0.2

  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> md5(concat_ws(' ', slice(w, i, 2))))")).as("g"))
    val dupFrac = lit(1.0) -
      col("n_distinct").cast("double") / col("n_bigrams")
    grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_rep"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        round(dupFrac, 6).as("dup_frac"),
        round(col("max_rep").cast("double") / col("n_bigrams"), 6)
          .as("top_share"),
        (dupFrac > DupFracFlag).as("repetitive"))
  }

  val repetitionSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
       |  WHERE len(string_split(trim(text), ' ')) >= 2
       |), g AS (
       |  SELECT doc_id,
       |         md5(array_to_string(list_slice(w, i, i + 1), ' ')) AS g
       |  FROM s, unnest(range(1, len(w))) AS t(i)
       |), cnt AS (
       |  SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g
       |), agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |         count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS max_rep
       |  FROM cnt GROUP BY doc_id
       |)
       |SELECT doc_id, n_bigrams, n_distinct,
       |       round(1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams, 6) AS dup_frac,
       |       round(CAST(max_rep AS DOUBLE) / n_bigrams, 6) AS top_share,
       |       (1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams) > $DupFracFlag AS repetitive
       |FROM agg""".stripMargin

  /** Unigram cross-entropy scoring — the perplexity-proxy quality signal
    * (a document of globally-rare tokens scores high, boilerplate scores
    * low): H(doc) = −mean over tokens of ln p(token), with p from the
    * corpus's own unigram counts. Shape at scale: token stream →
    * map-side-combined vocabulary count (vocab-sized, shuffled on the
    * token hash), stream re-joined to the vocab on the token key, per-doc
    * mean. The scalar corpus total broadcasts. The per-doc mean is
    * rounded to 4 decimals: each ln() can differ across engines in its
    * last ulp (~1e-15 abs), and the sum-order slack of a per-doc float
    * mean is of the same magnitude — 1e-4 rounding leaves ~11 orders of
    * headroom, the same determinism argument as every rounded double in
    * this suite.
    */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    // corpus token total = Σ vocab counts: a reduction over the (already
    // reduced) vocab frame, saving a third full corpus scan
    val total = vocab.agg(sum(col("c")).as("t"))
    toks.join(vocab, Seq("w"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        log(col("c").cast("double") / col("t")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(col("lp")), 4).as("cross_entropy"))
  }

  val perplexitySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
      |  FROM documents
      |), v AS (
      |  SELECT w, count(*) AS c FROM toks GROUP BY w
      |)
      |SELECT doc_id, count(*) AS n_tokens,
      |       round(-avg(ln(CAST(c AS DOUBLE) / (SELECT count(*) FROM toks))), 4)
      |         AS cross_entropy
      |FROM toks JOIN v USING (w)
      |GROUP BY doc_id""".stripMargin

  /** Bigram-conditional cross-entropy — the second-order companion to
    * `perplexity`: H(doc) = −mean over bigrams of ln P(b|a), with
    * P(b|a) = (c(a,b)+1) / (c(a)+V) Laplace-smoothed from the corpus's
    * own counts (so unseen contexts are well-defined and the model is
    * fully determined by the data — no training artifact to ship).
    * Boilerplate scores LOW (its bigrams are corpus-frequent), genuinely
    * novel word order scores high — a sharper fluency signal than
    * unigram rarity. Shape at scale: bigram pairs are generated as a
    * pure projection (transform over the split array, no self-join);
    * the count frames shuffle on token/pair keys (reduced,
    * map-side-combined); V reuses the unigram reduction's row count
    * rather than re-scanning the corpus; the per-doc mean rounds to
    * 1e-4 under the same ln-ulp argument as `perplexity`.
    */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    val bg = d.where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(w)), " +
          "i -> struct(element_at(w, i-1) AS a, element_at(w, i) AS b))"))
        .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val cu = d.select(explode(col("w")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("ca"))
    val v = cu.agg(count(lit(1)).as("v"))
    val cb = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    bg.join(cb, Seq("a", "b")).join(cu, Seq("a"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        log((col("cab").cast("double") + 1) /
          (col("ca") + col("v")).cast("double")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(col("lp")), 4).as("bigram_cross_entropy"))
  }

  val bigramLmSql: String =
    """WITH s AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |  WHERE len(string_split(trim(text), ' ')) >= 2
      |), bg AS (
      |  SELECT doc_id, w[i-1] AS a, w[i] AS b
      |  FROM s, unnest(range(2, len(w) + 1)) AS t(i)
      |), cu AS (
      |  SELECT a, count(*) AS ca FROM (
      |    SELECT unnest(string_split(trim(text), ' ')) AS a FROM documents)
      |  GROUP BY 1
      |), vs AS (
      |  SELECT count(*) AS v FROM cu
      |), cb AS (
      |  SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(-avg(ln((CAST(cab AS DOUBLE) + 1) /
      |                     CAST(ca + v AS DOUBLE))), 4) AS bigram_cross_entropy
      |FROM bg JOIN cb USING (a, b) JOIN cu USING (a) CROSS JOIN vs
      |GROUP BY doc_id""".stripMargin

  // ------------------------------------------------ chunk-level retrieval
  private val RagK = 5
  private val RagQueryDocs = 5 // chunks of doc_id < 5 are the query set
  /** Dense vector assembly as a PURE PROJECTION — no shuffle: each
    * chunk row computes its token hash array once (the same md5 slot /
    * sign scheme as `hashEmbed`, integer-exact cross-engine), then
    * folds it into the HashDim-slot count vector with nested
    * higher-order functions. Per-row work is O(chunk·dim) bounded
    * integer ops; the alternative (explode → two keyed aggregations)
    * shuffles every posting row twice. Zero-norm chunks drop (the
    * cosine is undefined and the oracle's HAVING does the same).
    * Chunk key = doc_id·4096 + chunk_id (chunk_id < 4096 holds for any
    * document under ~196k tokens — the chunker's stride bound).
    */
  private def ragDense(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(ChunkStride))).as("s"))
      .select(
        (col("doc_id") * 4096 + expr(s"CAST(s div $ChunkStride AS BIGINT)"))
          .as("ckey"),
        col("doc_id"),
        // native one-pass fold (HashEmbedVec): md5 each token once,
        // scatter its ±1 into a primitive accumulator — the HOF
        // formulations measured 6.7–37 s at sf0.1 vs sub-second here.
        // The token window is sliced straight off the split array (same
        // tokens `chunkColumns` emits as chunk_text, without the
        // array_join/re-split round trip).
        org.apache.spark.sql.graft.HashEmbedVec(
          expr(s"slice(w, s + 1, $ChunkLen)"), HashDim).as("vec"))
      .withColumn("nsq", expr("aggregate(vec, 0L, (acc, v) -> acc + v * v)"))
      .where(col("nsq") > 0)
      .select(col("ckey"), col("doc_id"), col("vec"),
        sqrt(col("nsq").cast("double")).as("nrm"))

  /** Chunk-level retrieval (the RAG indexing/query shape, end-to-end
    * in one plan): documents are chunked (`chunkColumns`), each chunk is
    * feature-hash embedded (the md5 hashing trick of `hashEmbed`), and
    * each query chunk retrieves its top-k nearest chunks from OTHER
    * documents by cosine — EXACT, fully oracled.
    *
    * Scale shape: the bounded query side (chunks of `RagQueryDocs`
    * docs) is broadcast as DENSE vectors against the corpus scan, so
    * the dot products run map-side with zero pair-row shuffle; the only
    * exchange is the final per-query `TopKAgg`, whose PARTIAL buffers
    * are bounded (k entries per task), shuffling O(partitions · Q · k)
    * rows at any corpus size. This replaces the earlier posting-list
    * slot join, whose partial products shuffled Q·N·dim rows — at
    * dim=64 with ±1 hashed weights there is no impact skew for an
    * inverted index to exploit (a measured top-16-slot prune collapsed
    * recall to 0.33), so the dense broadcast is the shape that holds at
    * 100 TB under this operator's bounded-query contract; unbounded
    * query sets are what the IVF/LSH ANN paths are for.
    *
    * The shared-slot filter reproduces the posting-join candidate set
    * exactly (a pair surfaces iff some slot is nonzero in both), and
    * every product/sum is exact integer arithmetic on the cross-engine
    * md5 hash, so the oracle matches bit-for-bit; ranking ties break on
    * the integer chunk key.
    */
  def ragChunkTopk(spark: SparkSession, dir: String): DataFrame = {
    val dense = ragDense(spark, dir)
    val qDense = dense.where(col("doc_id") < RagQueryDocs)
      .select(col("ckey").as("q_key"), col("doc_id").as("q_doc"),
        col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    val scored = dense
      .join(broadcast(qDense), col("doc_id") =!= col("q_doc"))
      // LongDotShared fuses the exact integer dot with the posting-join
      // candidate contract: NULL (dropped) unless some slot is nonzero
      // in both vectors — one native pass instead of two HOF traversals
      .select(col("q_key"), col("ckey"), col("q_nrm"), col("nrm"),
        org.apache.spark.sql.graft.LongDotShared(col("q_vec"), col("vec"))
          .as("dot"))
      .where(col("dot").isNotNull)
      .select(col("q_key"), col("ckey"),
        (col("dot").cast("double") / (col("q_nrm") * col("nrm"))).as("cos"))
    val topk = udaf(new graft.functions.TopKAgg(RagK))
    scored.groupBy(col("q_key"))
      .agg(topk(col("ckey"), col("cos")).as("top"))
      .select(col("q_key").as("query_key"),
        posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("query_key"), (col("pos") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_key"), round(col("n.score"), 6).as("cos"))
  }


  val ragChunkTopkSql: String =
    s"""WITH chunks AS (
       |  SELECT doc_id * 4096 + CAST(s // $ChunkStride AS BIGINT) AS ckey,
       |         doc_id,
       |         array_to_string(w[s + 1 : s + $ChunkLen], ' ') AS chunk_text
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
       |       unnest(range(0, len(w), $ChunkStride)) AS t(s)
       |), sl AS (
       |  SELECT ckey, doc_id, hv % $HashDim AS slot,
       |         CASE WHEN (hv // $HashDim) % 2 = 0 THEN 1 ELSE -1 END AS sign
       |  FROM (SELECT ckey, doc_id,
       |               CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS hv
       |        FROM (SELECT ckey, doc_id,
       |                     unnest(string_split(chunk_text, ' ')) AS term
       |              FROM chunks))
       |), agg AS (
       |  SELECT ckey, doc_id, slot, CAST(sum(sign) AS BIGINT) AS c
       |  FROM sl GROUP BY 1, 2, 3
       |), nrm AS (
       |  SELECT ckey, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nrm
       |  FROM agg GROUP BY ckey HAVING sqrt(CAST(sum(c * c) AS DOUBLE)) > 0
       |), dots AS (
       |  SELECT q.ckey AS q_key, a.ckey,
       |         CAST(sum(q.c * a.c) AS BIGINT) AS dot
       |  FROM (SELECT * FROM agg WHERE doc_id < $RagQueryDocs) q
       |  JOIN agg a USING (slot)
       |  WHERE a.doc_id != q.doc_id
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT d.q_key AS query_key, d.ckey AS neighbor_key,
       |         CAST(d.dot AS DOUBLE) / (qn.nrm * an.nrm) AS cos,
       |         CAST(row_number() OVER (PARTITION BY d.q_key
       |                ORDER BY CAST(d.dot AS DOUBLE) / (qn.nrm * an.nrm) DESC,
       |                         d.ckey ASC) AS BIGINT) AS rank
       |  FROM dots d
       |  JOIN nrm qn ON qn.ckey = d.q_key
       |  JOIN nrm an ON an.ckey = d.ckey
       |)
       |SELECT query_key, rank, neighbor_key, round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $RagK""".stripMargin

  /** Tokenizer-fertility report per (lang, source) — the corpus-mix
    * diagnostic a pretraining run reads before setting sampling weights:
    * how many sub-word tokens a slice costs per whitespace word
    * (`fertility`) and per character (`chars_per_bpe`). High-fertility
    * slices (non-Latin scripts, code, noisy OCR) consume
    * disproportionate training budget per document; this surfaces that
    * per slice using the same whitespace + BPE-ish tokenizations as
    * `text_tokens`, so the two ops agree by construction.
    *
    * Scale shape: one scan, all ratios computed AFTER the (lang, source)
    * aggregation — per-doc token counts reduce map-side into ≤ |langs| ×
    * |sources| groups; nothing corpus-sized survives the shuffle.
    */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws"),
        size(expr(
          "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .cast("long").as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("ws_tokens"),
        sum("bpe").as("bpe_tokens"),
        sum("chars").as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("ws_tokens"), col("bpe_tokens"), col("n_chars"),
        round(col("bpe_tokens").cast("double") / col("ws_tokens"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("bpe_tokens"), 6)
          .as("chars_per_bpe"))

  val fertilitySql: String =
    """WITH t AS (
      |  SELECT lang, source,
      |         len(string_split_regex(trim(text), '\s+')) AS ws,
      |         len(regexp_extract_all(text,
      |             '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe,
      |         length(text) AS chars
      |  FROM documents)
      |SELECT lang, source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
      |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
      |       CAST(sum(chars) AS BIGINT) AS n_chars,
      |       round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS fertility,
      |       round(CAST(sum(chars) AS DOUBLE) / sum(bpe), 6) AS chars_per_bpe
      |FROM t GROUP BY lang, source""".stripMargin

  // ------------------------------------------------------ Zipf slope

  /** Per-source Zipf fit — the corpus-health diagnostic for a training
    * mix: natural language runs log(freq) ≈ a + s·log(rank) with
    * s ≈ −1; a source whose slope drifts far from −1 is boilerplate-
    * heavy (flat head), templated (stair-stepped), or ID-noise (heavy
    * tail) and earns a curation look. Reported per source as the
    * least-squares slope and intercept over the full (ln rank, ln
    * count) cloud.
    *
    * Determinism across engines: ranks and counts are integers, both
    * engines compute ln from the same integer-derived doubles, each ln
    * is rounded to 6 dp and FIXED AS DECIMAL(18,6), so all four
    * moments (Σx, Σy, Σxy, Σx²) are exact decimal sums — no float
    * accumulation order anywhere (the `curate_dsir`/`agg_pareto`
    * discipline); slope and intercept are then one fixed double
    * expression over identical scalars, rounded at the boundary.
    *
    * Scale shape: the corpus reduces to per-source term counts
    * (map-side combined); the rank (the order statistic IS the
    * semantics) rides [[ShardedPrefix]] so no task ever sorts a whole
    * source's vocabulary; moments are one more map-side-combined
    * reduce to a |sources|-row frame.
    */
  def zipf(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(split(trim(col("text")), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
    // rank within source by (cnt desc, term asc) — a plain per-source
    // window would sort each source's WHOLE vocabulary in one task, so
    // the rank rides ShardedPrefix on the negated count (ascending ≡
    // count descending; count ties stay within one shard, where the
    // term tiebreak pins the order)
    val ranked = ShardedPrefix.cumsum(spark,
      tc.withColumn("neg_cnt", -col("cnt")), Seq("source"), "neg_cnt",
      Nil, rnCol = Some("rank"), tiebreaks = Seq(col("term").asc))
    val xy = ranked
      .select(col("source"), col("cnt"),
        round(log(col("rank").cast("double")), 6)
          .cast("decimal(18,6)").as("x"),
        round(log(col("cnt").cast("double")), 6)
          .cast("decimal(18,6)").as("y"))
    val m = xy.groupBy("source").agg(
      count(lit(1)).as("n_terms"),
      sum(col("cnt")).as("total_tokens"),
      sum(col("x")).cast("decimal(38,6)").as("sx"),
      sum(col("y")).cast("decimal(38,6)").as("sy"),
      sum(col("x") * col("y")).cast("decimal(38,12)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(38,12)").as("sxx"))
      .where(col("n_terms") >= 3)
    val n = col("n_terms").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxy, sxx) = (col("sxy").cast("double"), col("sxx").cast("double"))
    m.select(col("source"), col("n_terms"), col("total_tokens"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).as("slope_raw"),
        n.as("nd"), sx.as("sxd"), sy.as("syd"))
      .select(col("source"), col("n_terms"), col("total_tokens"),
        round(col("slope_raw"), 6).as("slope"),
        round((col("syd") - col("slope_raw") * col("sxd")) / col("nd"), 6)
          .as("intercept"))
  }

  val zipfSql: String =
    """WITH tc AS (
      |  SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS term
      |        FROM documents)
      |  WHERE length(term) > 0
      |  GROUP BY source, term
      |), xy AS (
      |  SELECT source, cnt,
      |         CAST(round(ln(CAST(row_number() OVER (PARTITION BY source
      |                ORDER BY cnt DESC, term ASC) AS DOUBLE)), 6)
      |           AS DECIMAL(18,6)) AS x,
      |         CAST(round(ln(CAST(cnt AS DOUBLE)), 6)
      |           AS DECIMAL(18,6)) AS y
      |  FROM tc
      |), m AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
      |         CAST(sum(cnt) AS BIGINT) AS total_tokens,
      |         CAST(sum(x) AS DECIMAL(38,6)) AS sx,
      |         CAST(sum(y) AS DECIMAL(38,6)) AS sy,
      |         CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
      |         CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx
      |  FROM xy GROUP BY source HAVING count(*) >= 3
      |), s AS (
      |  SELECT source, n_terms, total_tokens,
      |         (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |         (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_raw,
      |         CAST(n_terms AS DOUBLE) AS nd,
      |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |  FROM m)
      |SELECT source, n_terms, total_tokens,
      |       round(slope_raw, 6) AS slope,
      |       round((syd - slope_raw * sxd) / nd, 6) AS intercept
      |FROM s""".stripMargin

  // ----------------------------------------------- BPE pair induction

  private val BpeTopPairs = 20

  /** The first round of BPE vocabulary induction (Sennrich et al.
    * 2016): count every ADJACENT CHARACTER PAIR across all word
    * occurrences (instance-weighted, as the merge rule requires — not
    * distinct words) and report the top merge candidates under the
    * total order (count DESC, pair ASC). Subsequent merge rounds
    * re-run this over re-segmented symbols; round one is the
    * corpus-heavy step — later rounds operate on the shrinking pair
    * table — so it is the one that must be a distributed scan.
    *
    * Scale shape: explode is corpus×word-length sized but reduces
    * map-side to the pair vocabulary (bounded by |alphabet|² —
    * thousands, not corpus-sized); top-K is a TakeOrdered.
    */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(BpeTopPairs)
  }

  val bpePairsSql: String =
    s"""WITH w AS (
       |  SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
       |), p AS (
       |  SELECT unnest([substr(w, i, 2) for i in range(1, length(w))])
       |           AS pair
       |  FROM w WHERE length(w) >= 2)
       |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
       |FROM p GROUP BY pair
       |ORDER BY cnt DESC, pair ASC
       |LIMIT $BpeTopPairs""".stripMargin

  // ----------------------------------------------------- readability

  /** Flesch–Kincaid grade level per document — the classic readability
    * cut used to route corpora by audience (and to spot machine-
    * generated filler: very low variance across a source is a tell).
    * Words = whitespace tokens; sentences = runs ended by `.`/`!`/`?`
    * (min 1); syllables = vowel GROUPS (`[aeiouyAEIOUY]+`) per word —
    * the standard dictionary-free approximation. All three are exact
    * integers on both engines (the regex classes involved behave
    * identically in Java and RE2 — simple character classes only), so
    * the grade is one fixed double expression, rounded at the
    * boundary.
    *
    * Scale shape: pure per-row projection — no shuffle at all; the
    * whole operator fuses into the scan's codegen stage.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    // ONE primitive byte pass for all three counters (the native
    // `TextStats` expression) instead of three regexp_replace walks —
    // same integers by construction, so the DuckDB twin keeps the
    // declarative regex formulation untouched. Measured 1.92 → 0.26 s
    // at sf1 (BENCH_NOTES).
    val stats = org.apache.spark.sql.graft.TextStats(trim(col("text")))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), stats.as("st"))
      .select(col("doc_id"), col("st")(0).as("n_words"),
        col("st")(1).as("n_sentences"), col("st")(2).as("n_syllables"))
      .where(col("n_words") > 0)
      .withColumn("fk_grade",
        round(lit(0.39) * (col("n_words").cast("double") /
          col("n_sentences").cast("double")) +
          lit(11.8) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")) - lit(15.59), 4))
  }

  val readabilitySql: String =
    """SELECT doc_id,
      |       CAST(len(string_split(trim(text), ' ')) AS INT) AS n_words,
      |       CAST(greatest(1, length(regexp_replace(trim(text),
      |              '[^.!?]', '', 'g'))) AS INT) AS n_sentences,
      |       CAST(length(regexp_replace(trim(text),
      |              '[aeiouyAEIOUY]+', 'x', 'g')) -
      |            length(regexp_replace(trim(text),
      |              '[aeiouyAEIOUY]+', '', 'g')) AS INT)
      |         AS n_syllables,
      |       round(0.39 * (CAST(len(string_split(trim(text), ' '))
      |                       AS DOUBLE) /
      |                     CAST(greatest(1, length(regexp_replace(
      |                       trim(text), '[^.!?]', '', 'g'))) AS DOUBLE)) +
      |             11.8 * (CAST(length(regexp_replace(trim(text),
      |                       '[aeiouyAEIOUY]+', 'x', 'g')) -
      |                     length(regexp_replace(trim(text),
      |                       '[aeiouyAEIOUY]+', '', 'g'))
      |                       AS DOUBLE) /
      |                     CAST(len(string_split(trim(text), ' '))
      |                       AS DOUBLE)) - 15.59, 4) AS fk_grade
      |FROM documents
      |WHERE len(string_split(trim(text), ' ')) > 0""".stripMargin

  // ------------------------------------------------- PII redaction v2

  /** Extended PII scrub (VERDICT r10 #3): emails and phones (as
    * `text_redact`) plus strict-octet IPv4 addresses and credit-card
    * numbers with a LUHN CHECK — the two classes the basic scrub misses.
    *
    * Patterns stay in the RE2 ∩ java.util.regex common syntax; RE2 has
    * no lookahead, so the card shape `(?:[0-9][ -]?){12,18}[0-9]` bounds
    * itself structurally: exactly 13–19 digits with at most one space or
    * dash between digits, and the closing `\b` rejects longer digit runs
    * in BOTH engines (leftmost-first semantics agree — a 25-digit run has
    * no boundary-terminated sub-match from a boundary start). Counts are
    * per pattern family on the UNREDACTED text (families can overlap —
    * an IP is also phone-shaped; documented, deterministic); redaction
    * applies email → card → ip → phone, so a 16-digit card is labeled
    * `<CARD>` before the looser phone pattern can see it. The Luhn count
    * uses Spark's codegen'd `luhn_check` on the separator-stripped
    * digits; the oracle recomputes Luhn with an explicit
    * double-every-second-from-right lambda — an independent
    * implementation pair, so a semantics drift in either side reds the
    * driver row.
    *
    * FIXTURE: the corpus has no planted PII, so `text2` appends a
    * deterministic per-doc PII suffix (valid + invalid-octet IP,
    * Luhn-valid + Luhn-invalid card, email + phone) built identically in
    * both engines — every pattern family and both Luhn branches are
    * driver-exercised, not just spec-exercised.
    */
  private val OctetPat = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  private val IpPat = s"\\b$OctetPat([.]$OctetPat){3}\\b"
  private val CardPat = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  private val PiiPlants = Seq(
    " srv 192.168.1.77 or 999.999.999.999",     // valid + invalid-octet IP
    " pay 4111 1111 1111 1111 now",             // Luhn-valid Visa test PAN
    " ref 4111-1111-1111-1112 x",               // Luhn-invalid
    " mail a@b.co.nz or +64 21 555 0199")       // email + NZ phone

  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val text2 = concat(col("text"),
      element_at(array(PiiPlants.map(lit): _*),
        (col("doc_id") % PiiPlants.size + 1).cast("int")))
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), text2.as("text2"))
    val cards = regexp_extract_all(col("text2"), lit(CardPat), lit(0))
    val luhnValid = filter(cards, c =>
      call_function("luhn_check", regexp_replace(c, "[ -]", "")))
    val redacted = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(col("text2"), lit(EmailPat), lit("<EMAIL>")),
      lit(CardPat), lit("<CARD>")),
      lit(IpPat), lit("<IP>")),
      lit(PhonePat), lit("<PHONE>"))
    base.select(
      col("doc_id"),
      redacted.as("text_redacted"),
      size(regexp_extract_all(col("text2"), lit(EmailPat), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text2"), lit(PhonePat), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(col("text2"), lit(IpPat), lit(0)))
        .cast("long").as("n_ipv4"),
      size(cards).cast("long").as("n_card_candidates"),
      size(luhnValid).cast("long").as("n_cards_luhn"))
  }

  val redactPiiSql: String = {
    val plants = PiiPlants.map(p => s"'$p'").mkString("[", ", ", "]")
    // independent Luhn: d = separator-stripped candidate, 1-based char
    // index i, double when the 0-based-from-right position is odd
    val d = "regexp_replace(c, '[ -]', '', 'g')"
    val digit = s"CAST(($d)[i] AS INT)"
    val luhn =
      s"""list_sum(list_transform(range(1, length($d) + 1), i ->
         |  CASE WHEN (length($d) - i) % 2 = 1
         |       THEN CASE WHEN $digit > 4 THEN $digit * 2 - 9
         |                 ELSE $digit * 2 END
         |       ELSE $digit END)) % 10 = 0""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id,
       |         concat(text, ($plants)[CAST(doc_id % ${PiiPlants.size} + 1 AS INT)])
       |           AS text2
       |  FROM documents
       |)
       |SELECT doc_id,
       |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |         text2, '$EmailPat', '<EMAIL>', 'g'),
       |         '$CardPat', '<CARD>', 'g'),
       |         '$IpPat', '<IP>', 'g'),
       |         '$PhonePat', '<PHONE>', 'g') AS text_redacted,
       |       CAST(len(regexp_extract_all(text2, '$EmailPat')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text2, '$PhonePat')) AS BIGINT) AS n_phones,
       |       CAST(len(regexp_extract_all(text2, '$IpPat')) AS BIGINT) AS n_ipv4,
       |       CAST(len(regexp_extract_all(text2, '$CardPat')) AS BIGINT) AS n_card_candidates,
       |       CAST(len(list_filter(regexp_extract_all(text2, '$CardPat'), c ->
       |         $luhn)) AS BIGINT) AS n_cards_luhn
       |FROM t""".stripMargin
  }

  // ---------------------------------------------------- vocabulary growth

  /** Heaps-law vocabulary growth per source: after each document (in
    * doc_id order within its source), how many tokens have streamed past
    * and how many DISTINCT words have been seen — the saturation curve
    * that tells a corpus builder whether a source still contributes new
    * vocabulary or has gone repetitive (flat curve → candidates for
    * dedup/downweighting; compare sources by curve shape).
    *
    * Shape at scale: "new word" is attributed via min(doc_id) per
    * (source, word) — one shuffle on the word key with map-side
    * combine — then both running sums ride [[ShardedPrefix]]: a
    * per-source window over the |docs|-sized spine would bound
    * parallelism by |sources| (a handful), so the spine is range-
    * sharded on doc_id and each row's global cum = broadcast shard
    * entry offset + within-shard prefix, exact at any corpus size.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(split(trim(col("text")), " ")).as("w"))
    val perDoc = toks.groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    val firstSeen = toks.groupBy(col("source"), col("w"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_new_words"))
    val spine = perDoc.join(firstSeen, Seq("source", "doc_id"), "left_outer")
      .select(col("source"), col("doc_id"), col("n_tokens"),
        coalesce(col("n_new_words"), lit(0L)).as("n_new"))
    ShardedPrefix.cumsum(spark, spine, Seq("source"), "doc_id",
        Seq("n_tokens", "n_new"))
      .select(col("source"), col("doc_id"),
        col("n_tokens_cum").as("cum_tokens"),
        col("n_new_cum").as("cum_vocab"))
  }

  val vocabGrowthSql: String =
    """WITH toks AS (
      |  SELECT source, doc_id, unnest(string_split(trim(text), ' ')) AS w
      |  FROM documents),
      |per_doc AS (
      |  SELECT source, doc_id, count(*) AS n_tokens
      |  FROM toks GROUP BY source, doc_id),
      |first_seen AS (
      |  SELECT source, min_doc AS doc_id, count(*) AS n_new_words
      |  FROM (SELECT source, w, min(doc_id) AS min_doc
      |        FROM toks GROUP BY source, w)
      |  GROUP BY source, min_doc)
      |SELECT p.source, p.doc_id,
      |       CAST(sum(p.n_tokens) OVER win AS BIGINT) AS cum_tokens,
      |       CAST(sum(COALESCE(f.n_new_words, 0)) OVER win AS BIGINT)
      |         AS cum_vocab
      |FROM per_doc p
      |LEFT JOIN first_seen f ON f.source = p.source AND f.doc_id = p.doc_id
      |WINDOW win AS (PARTITION BY p.source ORDER BY p.doc_id ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
      .stripMargin

  /** Per-document n-gram novelty: of a document's DISTINCT 3-word
    * shingles, what fraction appears in no earlier document (gram
    * ownership = global minimum doc_id — the `dedup_repeated_ngrams`
    * attribution convention)? The curation signal between exact dedup
    * and near-dup: a late document whose grams are all old is a remix
    * even when no single pair-level match fires; streaming-corpus
    * admission gates read exactly this curve.
    *
    * Shape: the gram build is one per-doc-partitioned window (lead×2 on
    * word position — no self-join), the ownership reduce shuffles
    * 8-byte (hash-groupable) gram keys once, and the per-doc rollup
    * rides the same distinct frame. Corpus-linear like every gram op;
    * ownership could swap to the persisted gram-index snapshot for the
    * incremental variant (the `dedup_span_incremental` path).
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = words
      .select(col("doc_id"), concat_ws(" ", col("w"),
        lead(col("w"), 1).over(byDoc), lead(col("w"), 2).over(byDoc))
        .as("gram"),
        lead(col("w"), 2).over(byDoc).isNotNull.as("full"))
      .where(col("full")).select(col("doc_id"), col("gram")).distinct()
    val owners = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    val perDoc = grams.join(owners, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    Tables(spark, dir, "documents").select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          round(col("n_novel").cast("double") /
            col("n_grams").cast("double"), 6))
          .otherwise(lit(0.0)).as("novelty_frac"))
  }

  val ngramNoveltySql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents
      |), g0 AS (
      |  SELECT doc_id,
      |         concat_ws(' ', w,
      |           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos),
      |           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos))
      |           AS gram,
      |         lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
      |           IS NOT NULL AS is_full
      |  FROM w
      |), grams AS (
      |  SELECT DISTINCT doc_id, gram FROM g0 WHERE is_full
      |), owners AS (
      |  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY 1
      |), perdoc AS (
      |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |         CAST(sum(CASE WHEN o.first_doc = g.doc_id THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_novel
      |  FROM grams g JOIN owners o USING (gram) GROUP BY 1
      |)
      |SELECT d.doc_id,
      |       COALESCE(p.n_grams, 0) AS n_grams,
      |       COALESCE(p.n_novel, 0) AS n_novel,
      |       CASE WHEN COALESCE(p.n_grams, 0) > 0
      |            THEN round(CAST(p.n_novel AS DOUBLE) /
      |                       CAST(p.n_grams AS DOUBLE), 6)
      |            ELSE 0.0 END AS novelty_frac
      |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id"""
      .stripMargin

  /** RAKE keyphrase extraction (Rose et al. 2010) — the unsupervised
    * keyword pass a corpus-exploration/topic-tagging stage runs:
    * candidate phrases are maximal stopword-free token runs; a word
    * scores deg/freq (deg = Σ length of phrases containing it, freq =
    * its occurrence count — words living in LONG phrases with few solo
    * appearances win); a phrase scores the sum of its members. Every
    * quantity is an integer count and the word score is INTEGER
    * division in micro-units, so the whole operator is exact integer
    * arithmetic end-to-end — no float anywhere, fully oracled.
    *
    * Scale shape: the phrase-id window partitions by doc_id (bounded
    * by document length, never corpus-wide); phrases and word stats
    * are vocab-bounded groupBys with map-side combine; the global
    * top-10 is orderBy+limit → TakeOrderedAndProject.
    */
  def rakeKeyphrases(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), " ")).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("w"))
      .withColumn("is_stop", col("w").isin(stopwords: _*))
    val phrased = toks
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L))
        .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .where(!col("is_stop") && col("w") =!= "")
    val phrases = phrased.groupBy(col("doc_id"), col("pid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .select(col("doc_id"), col("pid"),
        expr("transform(pw, x -> x.w)").as("ws"))
      .select(col("doc_id"), col("pid"),
        concat_ws(" ", col("ws")).as("phrase"),
        size(col("ws")).cast("long").as("n_words"), col("ws"))
    val wstats = phrases
      .select(explode(col("ws")).as("w"), col("n_words"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
      .withColumn("wscore_micro", expr("deg * 1000000L div freq"))
    val occScores = phrases
      .select(col("doc_id"), col("pid"), col("phrase"), col("n_words"),
        explode(col("ws")).as("w"))
      .join(wstats.select(col("w"), col("wscore_micro")), Seq("w"))
      .groupBy(col("doc_id"), col("pid"), col("phrase"), col("n_words"))
      .agg(sum(col("wscore_micro")).as("score_micro"))
    // identical phrase text ⇒ identical member multiset ⇒ identical
    // score, so max() below is just "the" score; occurrences counted
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_micro").desc, col("phrase").asc)
    occScores.groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(10)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .select(col("rank"), col("phrase"), col("n_words"),
        col("n_occurrences"), col("score_micro"))
  }

  val rakeKeyphrasesSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, i AS pos, w[i] AS w,
       |         w[i] IN ($stopwordList) AS is_stop
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w
       |        FROM documents),
       |       unnest(range(1, len(w) + 1)) AS t(i)
       |), phrased AS (
       |  SELECT doc_id, pos, w,
       |         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
       |  FROM toks QUALIFY NOT is_stop AND w != ''
       |), phrases AS (
       |  SELECT doc_id, pid,
       |         array_to_string(list(w ORDER BY pos), ' ') AS phrase,
       |         CAST(count(*) AS BIGINT) AS n_words,
       |         list(w ORDER BY pos) AS ws
       |  FROM phrased GROUP BY doc_id, pid
       |), members AS (
       |  SELECT doc_id, pid, phrase, n_words, unnest(ws) AS w FROM phrases
       |), wstats AS (
       |  SELECT w, CAST((sum(n_words) * 1000000) // count(*) AS BIGINT)
       |           AS wscore_micro
       |  FROM members GROUP BY w
       |), occ AS (
       |  SELECT m.doc_id, m.pid, m.phrase, m.n_words,
       |         CAST(sum(ws.wscore_micro) AS BIGINT) AS score_micro
       |  FROM members m JOIN wstats ws USING (w)
       |  GROUP BY m.doc_id, m.pid, m.phrase, m.n_words
       |), agg AS (
       |  SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
       |         CAST(count(*) AS BIGINT) AS n_occurrences,
       |         CAST(max(score_micro) AS BIGINT) AS score_micro
       |  FROM occ GROUP BY phrase
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, phrase ASC)
       |         AS BIGINT) AS rank,
       |       phrase, n_words, n_occurrences, score_micro
       |FROM agg
       |ORDER BY score_micro DESC, phrase ASC
       |LIMIT 10""".stripMargin

  /** Interpolated Kneser–Ney bigram probabilities for the corpus's
    * top-20 bigrams — the smoothing that actually ships in n-gram LMs
    * (Chen & Goodman '98): the discounted bigram estimate backs off to
    * a CONTINUATION unigram (how many distinct histories a word
    * follows, not how often it occurs), which is what keeps
    * high-frequency-but-fixed-context words ("Francisco") from
    * stealing mass. All five ingredients are integer counts off ONE
    * bigram frame (c(w1 w2), c(w1·), N1+(w1,·), N1+(·,w2), total
    * bigram types); the probability is a single rational expression of
    * those integers (d = 0.75 — NO transcendentals), quantized to
    * micro-units, ranking integer/string-only. Fully oracled.
    *
    * Scale shape: corpus reduces to the vocab²-bounded bigram-count
    * frame in one explode + map-side combine; every derived count is a
    * groupBy of THAT frame; the top-20 window prunes via
    * WindowGroupLimit. Nothing corpus-sized crosses a second shuffle.
    */
  def bigramKn(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(split(trim(col("text")), " ").as("w"))
    val bg = d.where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(w)), " +
          "i -> struct(element_at(w, i-1) AS w1, element_at(w, i) AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = cb.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("ncont"))
    val hist = cb.groupBy(col("w2")).agg(count(lit(1)).as("nhist"))
    val types = cb.agg(count(lit(1)).as("ntypes"))
    val pkn = (greatest(col("c12").cast("double") - lit(0.75), lit(0.0)) +
      (lit(0.75) * col("ncont").cast("double")) *
        (col("nhist").cast("double") / col("ntypes").cast("double"))) /
      col("c1").cast("double")
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
    cb.join(c1, Seq("w1")).join(hist, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("ncont"), col("nhist"),
        floor(pkn * lit(1000000.0) + lit(0.5)).as("pkn_micro"))
      // global top-20 as orderBy+limit → TakeOrderedAndProject (each
      // task keeps 20 rows, no single-partition sort of the bigram
      // frame); the rank window then runs on 20 rows only
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(20)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("c12"), col("c1"),
        col("ncont"), col("nhist"), col("pkn_micro"))
  }

  val bigramKnSql: String =
    """WITH s AS (
      |  SELECT string_split(trim(text), ' ') AS w FROM documents
      |  WHERE len(string_split(trim(text), ' ')) >= 2
      |), bg AS (
      |  SELECT w[i-1] AS w1, w[i] AS w2
      |  FROM s, unnest(range(2, len(w) + 1)) AS t(i)
      |), cb AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
      |), c1 AS (
      |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
      |         CAST(count(*) AS BIGINT) AS ncont
      |  FROM cb GROUP BY 1
      |), hist AS (
      |  SELECT w2, CAST(count(*) AS BIGINT) AS nhist FROM cb GROUP BY 1
      |), types AS (
      |  SELECT CAST(count(*) AS BIGINT) AS ntypes FROM cb
      |)
      |SELECT rank, w1, w2, c12, c1, ncont, nhist, pkn_micro
      |FROM (
      |  SELECT w1, w2, c12, c1, ncont, nhist,
      |         CAST(floor(
      |           ((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
      |             + (0.75 * CAST(ncont AS DOUBLE))
      |               * (CAST(nhist AS DOUBLE) / CAST(ntypes AS DOUBLE)))
      |            / CAST(c1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |           AS pkn_micro,
      |         CAST(row_number() OVER (ORDER BY c12 DESC, w1 ASC, w2 ASC)
      |           AS BIGINT) AS rank
      |  FROM cb JOIN c1 USING (w1) JOIN hist USING (w2), types)
      |WHERE rank <= 20""".stripMargin

  /** Compression-ratio quality signal (the CCNet/RedPajama deflate
    * heuristic): highly repetitive/templated text compresses far below
    * prose, random noise barely compresses — `ratio_micro` (deflated
    * bytes per input byte, integer micro-units) is the cheap one-pass
    * proxy curation stacks gate on before any model-based scoring.
    * Deflate runs in the native `DeflateLen` expression inside
    * whole-stage codegen; the division is integer, so every emitted
    * value is exact. Rows-only BY DESIGN: DuckDB has no deflate, so
    * no SQL oracle can reproduce the byte counts — the `_check` twin
    * pins what IS oracle-expressible.
    *
    * Scale shape: a pure projection — one scan, no shuffle at all;
    * the flag threshold (0.35) is the conventional "mostly repeated
    * content" knee, tunable downstream.
    */
  /** The stateless deflate-signal projection, shared verbatim by the
    * batch registration and `CorpusStream.deflateGateStream` — batch ≡
    * stream parity is by construction (the `gopherStream` pattern).
    * Input needs a `text` column; all other columns pass through.
    */
  private[graft] def compressCols(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_bytes", expr("octet_length(text)").cast("long"))
      .where(col("n_bytes") > 0)
      .withColumn("deflate_len",
        org.apache.spark.sql.graft.DeflateLen(col("text")).cast("long"))
      .withColumn("ratio_micro",
        (col("deflate_len") * lit(1000000L) / col("n_bytes")).cast("long"))
      .withColumn("flag_repetitive", col("ratio_micro") < 350000L)

  def compressRatio(spark: SparkSession, dir: String): DataFrame =
    compressCols(Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text")))
      .drop("text")

  /** Oracled invariants for the deflate signal: count parity, output
    * bounds (deflate of a non-empty input is positive and can exceed
    * the input by at most the stored-block overhead), and the
    * repetition law — doubling a document must compress BETTER than
    * twice the original (the second copy is one back-reference) for
    * any doc past trivial size. The oracle pins the booleans TRUE and
    * the count from the table (the `sim_recall_audit` pattern), so a
    * broken Deflater integration or a platform-divergent zlib reds
    * CORRECTNESS, not just the spec suite.
    */
  def compressRatioCheck(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(
        expr("octet_length(text)").cast("long").as("n_bytes"),
        org.apache.spark.sql.graft.DeflateLen(col("text")).cast("long")
          .as("dl"),
        org.apache.spark.sql.graft.DeflateLen(
          concat(col("text"), col("text"))).cast("long").as("dl2"))
    d.agg(
      count(lit(1)).as("n_docs"),
      coalesce(bool_and(col("dl") > 0 && col("dl") <= col("n_bytes") + 64),
        lit(true)).as("all_bounds_ok"),
      coalesce(bool_and(col("n_bytes") < 64 || col("dl2") < col("dl") * 2),
        lit(true)).as("repeat_compresses"))
  }

  val compressRatioCheckSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |       true AS all_bounds_ok,
      |       true AS repeat_compresses
      |FROM documents""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("text_compress_ratio", compressRatio _, None),
    Op("text_compress_ratio_check", compressRatioCheck _,
      Some(compressRatioCheckSql)),
    Op("text_ngram_novelty", ngramNovelty _, Some(ngramNoveltySql)),
    Op("text_vocab_growth", vocabGrowth _, Some(vocabGrowthSql)),
    Op("text_redact_pii", redactPii _, Some(redactPiiSql)),
    Op("text_fertility", fertility _, Some(fertilitySql)),
    Op("text_readability", readability _, Some(readabilitySql)),
    Op("text_zipf", zipf _, Some(zipfSql)),
    Op("text_bpe_pairs", bpePairs _, Some(bpePairsSql)),
    Op("text_tokens", tokens _, Some(tokensSql)),
    Op("text_repetition", repetition _, Some(repetitionSql)),
    Op("text_perplexity", perplexity _, Some(perplexitySql)),
    Op("text_bigram_lm", bigramLm _, Some(bigramLmSql)),
    Op("text_bigram_kn", bigramKn _, Some(bigramKnSql)),
    Op("text_rake_keyphrases", rakeKeyphrases _, Some(rakeKeyphrasesSql)),
    Op("rag_chunk_topk", ragChunkTopk _, Some(ragChunkTopkSql)),
    Op("text_quality", quality _, Some(qualitySql)),
    Op("text_langid", langId _, Some(langIdSql)),
    Op("text_lang_confusion", langConfusion _, Some(langConfusionSql)),
    Op("text_fingerprint", fingerprint _, Some(fingerprintSql)),
    Op("text_redact", redact _, Some(redactSql)),
    Op("text_chunk", chunk _, Some(chunkSql)),
    Op("text_tfidf_top", tfidfTop _, Some(tfidfTopSql)),
    Op("text_hash_embed", hashEmbed _, Some(hashEmbedSql)),
    Op("text_hash_embed_fast", hashEmbedFast _, None),
    Op("text_hash_embed_fast_check", hashEmbedFastCheck _, Some(hashEmbedFastCheckSql)),
    Op("text_bigram_commonality", bigramCommonality _, Some(bigramCommonalitySql)),
  )
}
