package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Slowly-changing-dimension history — turning an append-only change log
  * into SCD-type-2 validity intervals, the standard warehouse shape for
  * "what was this entity's state at time t". The reference's snapshot
  * layout (fetch.go:49-66 keeps every dated database version) answers
  * that question by storing full copies; the SCD2 form answers it
  * relationally: one row per (entity, state-run) with
  * [valid_from, valid_to) bounds, NULL valid_to marking the open run.
  *
  * Built from the orders log as the fixture change stream: a customer's
  * order status over order time stands in for any entity-attribute
  * change feed (CDC topic, snapshot diff, audit log).
  *
  * Scale shape: every window partitions by the entity key — parallelism
  * is the key-hash partitioning at any log size, no global ordering
  * anywhere. The two windows (change detection, then interval close)
  * share one (custkey)-keyed exchange: the second window's sort on the
  * COLLAPSED frame rides the partitioning the first already installed.
  * At 100 TB the log shuffles once on the entity key — the minimum any
  * per-entity ordering can pay.
  */
object History {

  /** SCD2 intervals of per-customer order status:
    *  1. order the entity's log by (event time, log sequence) — the
    *     orderkey tiebreak makes same-timestamp runs deterministic;
    *  2. keep CHANGE rows only (status differs from the previous row's
    *     — `lag` over the entity window; the first row always starts a
    *     run);
    *  3. close each interval with the NEXT change's start (`lead` over
    *     the collapsed frame); the open run keeps NULL and
    *     `is_current = true`;
    *  4. `version` numbers the entity's runs in order.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val byEntity = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val changes = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"),
        col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(byEntity))
      .where(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
    val collapsed = Window.partitionBy(col("custkey"))
      .orderBy(col("valid_from").asc, col("o_orderkey").asc)
    changes
      .select(col("o_custkey").as("custkey"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"), col("o_orderkey"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(collapsed))
      .withColumn("version", row_number().over(collapsed).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("o_orderkey")
  }

  val scd2Sql: String =
    """WITH log AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev
      |  FROM orders
      |), changes AS (
      |  SELECT o_custkey AS custkey, o_orderstatus AS status,
      |         o_orderdate AS valid_from, o_orderkey
      |  FROM log
      |  WHERE prev IS NULL OR prev <> o_orderstatus
      |)
      |SELECT custkey, status, valid_from,
      |       lead(valid_from) OVER w AS valid_to,
      |       CAST(row_number() OVER w AS BIGINT) AS version,
      |       lead(valid_from) OVER w IS NULL AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY custkey
      |             ORDER BY valid_from ASC, o_orderkey ASC)""".stripMargin

  /** Point-in-time lookup riding the SCD2 frame: each entity's state at
    * a fixed timestamp — the query SCD2 exists to make cheap. Exactly
    * one row per entity with history at or before the probe instant
    * (`valid_from <= t < valid_to`, open intervals unbounded above), so
    * the filter is index-shaped: at scale it prunes on `valid_from`
    * partitioning rather than replaying the log.
    */
  def asOfState(spark: SparkSession, dir: String): DataFrame = {
    val t = lit("1998-06-01").cast("timestamp")
    scd2(spark, dir)
      .where(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .select(col("custkey"), col("status"), col("valid_from"),
        col("version"))
  }

  val asOfStateSql: String =
    s"""WITH log AS (
       |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
       |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
       |           ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev
       |  FROM orders
       |), changes AS (
       |  SELECT o_custkey AS custkey, o_orderstatus AS status,
       |         o_orderdate AS valid_from, o_orderkey
       |  FROM log
       |  WHERE prev IS NULL OR prev <> o_orderstatus
       |), scd AS (
       |  SELECT custkey, status, valid_from,
       |         lead(valid_from) OVER w AS valid_to,
       |         CAST(row_number() OVER w AS BIGINT) AS version
       |  FROM changes
       |  WINDOW w AS (PARTITION BY custkey
       |               ORDER BY valid_from ASC, o_orderkey ASC)
       |)
       |SELECT custkey, status, valid_from, version
       |FROM scd
       |WHERE valid_from <= TIMESTAMP '1998-06-01'
       |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-06-01')""".stripMargin

  /** Snapshot-to-snapshot corpus diff — the query a versioned snapshot
    * layout exists to answer (the reference keeps every dated snapshot
    * plus a latest pointer, `fetch.go:247-265`; SnapshotStore mirrors
    * that layout): which documents were added, removed, or changed
    * between two corpus versions? The demonstration derives both
    * versions deterministically from `documents` (v_old drops
    * `doc_id % 10 = 0`, v_new drops `% 10 = 1` and rewrites `% 7 = 0`),
    * the same convention the incremental-dedup ops use for their
    * history/batch split.
    *
    * Scale shape (100 TB): text never reaches the join — each side
    * reduces to (doc_id, md5 fingerprint) in its scan, so the full-outer
    * join shuffles 24-byte rows keyed by doc_id. With both snapshot
    * versions bucketed by doc_id at write time (sources/Bucketing), the
    * diff runs exchange-free; `unchanged` rows (the overwhelming bulk of
    * any real delta) are filtered before output.
    */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    // NULL-SAFE fingerprints + presence decided by each side's OWN key
    // (not fp nullness): md5(NULL) is NULL, so a NULL-text doc present
    // in both versions would read as 'added' and always pass the change
    // filter if classification rode the fingerprint (r7 ADVICE). The
    // keys stay un-coalesced through the join so absence is absence.
    val vOld = docs.where($"doc_id" % 10 =!= 0)
      .select($"doc_id".as("o_id"),
        md5(coalesce($"text", lit(""))).as("o_fp"))
    val vNew = docs.where($"doc_id" % 10 =!= 1)
      .select($"doc_id".as("n_id"),
        md5(coalesce(when($"doc_id" % 7 === 0, upper($"text"))
          .otherwise($"text"), lit(""))).as("n_fp"))
    vOld.join(vNew, $"o_id" === $"n_id", "full_outer")
      .where($"o_id".isNull || $"n_id".isNull || $"o_fp" =!= $"n_fp")
      .select(coalesce($"o_id", $"n_id").as("doc_id"),
        when($"o_id".isNull, "added")
          .when($"n_id".isNull, "removed")
          .otherwise("changed").as("status"))
  }

  val corpusDiffSql: String =
    """WITH v_old AS (
      |  SELECT doc_id, md5(COALESCE(text, '')) AS fp FROM documents
      |  WHERE doc_id % 10 <> 0),
      |v_new AS (
      |  SELECT doc_id,
      |         md5(COALESCE(CASE WHEN doc_id % 7 = 0 THEN upper(text)
      |                  ELSE text END, '')) AS fp
      |  FROM documents WHERE doc_id % 10 <> 1)
      |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |       CASE WHEN o.doc_id IS NULL THEN 'added'
      |            WHEN n.doc_id IS NULL THEN 'removed'
      |            ELSE 'changed' END AS status
      |FROM v_old o FULL OUTER JOIN v_new n ON o.doc_id = n.doc_id
      |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("scd2_history", scd2 _, Some(scd2Sql)),
    Op("scd2_asof_state", asOfState _, Some(asOfStateSql)),
    Op("corpus_diff", corpusDiff _, Some(corpusDiffSql)),
  )
}
